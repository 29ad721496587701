"""Self-consistent field: RHF/UHF/ROHF and RKS/UKS/ROKS.

The reference consumes a converged PySCF ``mf`` object
(`xtddft/XTDA.py:22`, SURVEY.md §1 L0→L1 interface); this module produces
the equivalent converged mean field natively.  ROHF/ROKS orbitals are
canonicalized with the Roothaan effective Fock (same convention as
pyscf.scf.rohf, which the reference's spin-adapted ΔA terms assume).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from xtddft_tpu.chem.molecule import Molecule
from xtddft_tpu.scf.diis import DIIS
from xtddft_tpu.scf.env import Env
from xtddft_tpu.xc import registry as xc_registry
from xtddft_tpu.xc import interface as xci


@dataclasses.dataclass
class MeanField:
    mol: Molecule
    env: Env
    kind: str  # rhf|uhf|rohf|rks|uks|roks
    xc: xc_registry.XCSpec | None
    mo_coeff: np.ndarray  # (nao, nmo) or (2, nao, nmo)
    mo_energy: np.ndarray
    mo_occ: np.ndarray
    e_tot: float
    converged: bool
    fock_a: np.ndarray  # AO-basis converged alpha Fock (h+veff_a)
    fock_b: np.ndarray
    # static external AO potential the SCF ran with (embedding hook);
    # persisted so consumers that rebuild hcore-dependent quantities
    # (checkpoint reload, gradients) see the same Hamiltonian
    v_ext: np.ndarray | None = None

    @property
    def is_restricted_open(self) -> bool:
        return self.kind in ("rohf", "roks")

    @property
    def is_unrestricted(self) -> bool:
        return self.kind in ("uhf", "uks")

    @property
    def is_ks(self) -> bool:
        return self.kind in ("rks", "uks", "roks")

    def make_rdm1(self):
        if self.is_unrestricted:
            ca = self.mo_coeff[0][:, self.mo_occ[0] > 0]
            cb = self.mo_coeff[1][:, self.mo_occ[1] > 0]
            return np.stack([ca @ ca.T, cb @ cb.T])
        if self.is_restricted_open:
            ca = self.mo_coeff[:, self.mo_occ >= 1]
            cb = self.mo_coeff[:, self.mo_occ >= 2]
            return np.stack([ca @ ca.T, cb @ cb.T])
        c = self.mo_coeff[:, self.mo_occ > 0]
        return 2.0 * (c @ c.T)

    def spin_square(self):
        if self.is_unrestricted:
            S = np.asarray(self.env.S)
            ca = self.mo_coeff[0][:, self.mo_occ[0] > 0]
            cb = self.mo_coeff[1][:, self.mo_occ[1] > 0]
            na, nb = ca.shape[1], cb.shape[1]
            sab = ca.T @ S @ cb
            sz = 0.5 * (na - nb)
            ss = sz * sz + 0.5 * (na + nb) - np.einsum("ij,ij->", sab, sab)
            return ss, 2.0 * np.sqrt(ss + 0.25)
        s = 0.5 * self.mol.spin
        return s * (s + 1.0), 2.0 * s + 1.0


def _sym_orth(S: np.ndarray) -> np.ndarray:
    w, v = np.linalg.eigh(S)
    keep = w > 1e-10
    return v[:, keep] / np.sqrt(w[keep])[None, :]


def _gwh_guess(h: np.ndarray, S: np.ndarray) -> np.ndarray:
    d = np.diag(h)
    return 0.875 * S * (d[:, None] + d[None, :])


def _eig(F, X):
    f = X.T @ F @ X
    e, c = np.linalg.eigh(f)
    return e, X @ c


class SCF:
    """Unified SCF driver; use the RHF/UHF/ROHF/RKS/UKS/ROKS wrappers."""

    def __init__(
        self,
        mol: Molecule,
        kind: str,
        xc: str | None = None,
        grid_level: int = 3,
        env: Env | None = None,
        df: bool | None = None,
        aux_beta: float = 2.2,
        aux_mode: str = "full",
        v_ext=None,
        x2c: bool = False,
        engine: str = "host",
    ):
        """v_ext: optional static external AO potential (nao, nao) added to
        the core Hamiltonian — the embedding/solvation hook (the reference
        adds a pyscf `v_solvent` the same way, `/root/reference/xtddft/
        sTDA/os_sTDA.py:446-447`; a fixed reaction field is the scope
        here, no self-consistent PCM solver)."""
        self.mol = mol
        self.kind = kind
        self.v_ext = None if v_ext is None else np.asarray(v_ext)
        self.xc = xc_registry.resolve(xc) if xc is not None else None
        if env is None:
            if df is None:
                # auto: above ~120 AOs the nao^4 in-core tensor (>1.7 GB)
                # stops being the right default
                from xtddft_tpu.ints import build_layout

                df = build_layout(mol).nao > 120
            env = Env(mol, grid_level=grid_level, df=df, aux_beta=aux_beta,
                      aux_mode=aux_mode, x2c=x2c)
        self.env = env
        self.conv_tol = 1e-11
        self.conv_tol_grad = 1e-7
        self.max_cycle = 200
        self.diis_space = 10
        # damped startup (see kernel): damp=0 disables; the gate is high
        # enough that any healthily-converging run never damps
        self.damp = 0.5
        self.diis_start_grad = 50.0
        self.device_start_mode = "bf16"  # see kernel: 'f32'/'refined' skip
                                         # noise-dominated early modes
        self.verbose = 0
        # engine="device": chip-resident mixed-precision DF veff builds
        # (scf/jk_device.py) with a bf16 -> f32 -> compensated-refined
        # precision schedule; requires df=True.  The host engine computes
        # everything at f64 on the default JAX device (the test/golden
        # path).
        self.engine = engine
        self._dev = None
        if engine == "device":
            if not self.env.df:
                raise ValueError("engine='device' requires df=True")
            self.conv_tol = max(self.conv_tol, 1e-9)
            self.conv_tol_grad = max(self.conv_tol_grad, 5e-7)
            # the compensated-refined engine's Fock carries ~1e-7-scale
            # rounding noise, so the iteration jitters at a gradient-norm
            # floor instead of meeting the host tolerances; when
            # refined-mode progress stalls, the best-Fock snapshot is
            # accepted as converged iff its |g| cleared this bar.  The
            # floor is SIZE-dependent (the error-matrix norm aggregates
            # per-element noise over nao^2 entries at the system's Fock
            # scale; measured: ~3e-6 at TTM/sto-3g 182 AO, ~1.0e-5 at
            # TTM/dzp 598 AO), so the bar scales with nao — at 598 AO a
            # flat 1e-5 sat exactly ON the floor and 200 refined cycles
            # ground past it without accepting (r4 log)
            self.device_accept_grad = max(1e-5, 3e-8 * self.env.nao)
            # B storage on the chip: 'auto' packs the symmetric pair axis
            # when the full f32 tensor would blow the HBM budget
            # (`jk_device.DeviceVeff`); force 'packed'/'full' for tests
            self.device_b_storage = "auto"

    # -- Fock/energy builders ---------------------------------------------
    def _veff_and_exc(self, da, db):
        """(veff_a, veff_b, e2) two-electron + xc potential and energy."""
        env = self.env
        dtot = da + db
        J = env.get_j(dtot)
        spec = self.xc
        hyb = spec.hyb if spec is not None else 1.0
        alpha = spec.alpha if spec is not None else 1.0
        omega = spec.omega if spec is not None else 0.0
        exc = 0.0
        va = jnp.zeros_like(J)
        vb = jnp.zeros_like(J)
        if spec is not None and spec.components:
            rho = self._rho_pair(da, db)
            exc, va, vb = xci.vxc_matrices(spec, env.ao, env.grid_weights, rho)
        ka = kb = None
        if hyb != 0.0 or (omega != 0.0 and alpha != 0.0):
            ka = hyb * env.get_k(da)
            kb = hyb * env.get_k(db)
            if omega != 0.0 and abs(alpha - hyb) > 1e-12:
                ka = ka + (alpha - hyb) * env.get_k(da, omega=omega)
                kb = kb + (alpha - hyb) * env.get_k(db, omega=omega)
        veff_a = J + va - (ka if ka is not None else 0.0)
        veff_b = J + vb - (kb if kb is not None else 0.0)
        e2 = 0.5 * jnp.einsum("pq,qp->", dtot, J)
        if ka is not None:
            e2 = e2 - 0.5 * (
                jnp.einsum("pq,qp->", da, ka) + jnp.einsum("pq,qp->", db, kb)
            )
        e2 = e2 + exc
        return veff_a, veff_b, float(e2)

    def _rho_pair(self, da, db):
        ao = self.env.ao
        if self.xc is not None and self.xc.needs_tau:
            ra, ga, ta = xci.cache_rho(ao, jnp.asarray(da), tau=True)
            rb, gb, tb = xci.cache_rho(ao, jnp.asarray(db), tau=True)
            return (ra, rb, ga, gb, ta, tb)
        ra, ga = xci.cache_rho(ao, jnp.asarray(da))
        rb, gb = xci.cache_rho(ao, jnp.asarray(db))
        return (ra, rb, ga, gb)

    def _roothaan_fock(self, fa, fb, dc, do_, S):
        """pyscf.scf.rohf.get_roothaan_fock, dc/do_ = closed/open densities."""
        fc = 0.5 * (fa + fb)
        nao = S.shape[0]
        pc = dc @ S
        po = do_ @ S
        pv = np.eye(nao) - pc - po
        f = 0.5 * (pc.T @ fc @ pc)
        f += 0.5 * (po.T @ fc @ po)
        f += 0.5 * (pv.T @ fc @ pv)
        f += po.T @ fb @ pc
        f += po.T @ fa @ pv
        f += pv.T @ fc @ pc
        return f + f.T

    # -- occupation selection ---------------------------------------------
    @staticmethod
    def _select_by_overlap(c_new, S, c_ref, nocc):
        """Maximum-overlap (MOM) occupied-orbital selection."""
        proj = c_new.T @ S @ c_ref  # (nmo, nocc_ref)
        score = np.einsum("ij,ij->i", proj, proj)
        idx = np.sort(np.argsort(-score)[:nocc])
        return idx

    # -- main loop ---------------------------------------------------------
    def kernel(self, occ=None, init=None) -> MeanField:
        """Run the SCF.

        occ:  optional (alpha_indices, beta_indices) selecting a non-aufbau
              state; held by maximum-overlap selection through the iterations.
        init: optional starting mo_coeff ((nao,nmo) or (2,nao,nmo)), e.g. a
              converged aufbau solution whose orbital indices `occ` refers to.
        """
        mol = self.mol
        env = self.env
        S = np.asarray(env.S)
        h = np.asarray(env.hcore)
        if self.v_ext is not None:
            h = h + self.v_ext
        X = _sym_orth(S)
        na, nb = mol.nalpha, mol.nbeta
        enuc = mol.energy_nuc()
        restricted_closed = self.kind in ("rhf", "rks")
        unrestricted = self.kind in ("uhf", "uks")
        if restricted_closed and na != nb:
            raise ValueError("closed-shell SCF requires spin=0")

        f0 = _gwh_guess(h, S)
        if unrestricted:
            e_mo_a, c_a = _eig(f0, X)
            e_mo_b, c_b = e_mo_a.copy(), c_a.copy()
            if init is not None:
                init = np.asarray(init)
                if init.ndim == 2:
                    init = np.stack([init, init])
                c_a, c_b = init[0].copy(), init[1].copy()
        else:
            e_mo, c = _eig(f0, X)
            if init is not None:
                init = np.asarray(init)
                c = (init[0] if init.ndim == 3 else init).copy()

        # occupation control (MOM): `occ` = (alpha_indices, beta_indices)
        # selects a non-aufbau state, replacing pyscf's irrep_nelec pinning
        # used by the reference examples (XSF_TDA.ipynb cell 1).
        mom_ref_a = mom_ref_b = None
        if occ is not None:
            occ_a0 = np.asarray(occ[0], dtype=int)
            occ_b0 = np.asarray(occ[1], dtype=int)
            assert len(occ_a0) == na and len(occ_b0) == nb
            if unrestricted:
                mom_ref_a = c_a[:, occ_a0]
                mom_ref_b = c_b[:, occ_b0]
            else:
                mom_ref_a = c[:, occ_a0]
                mom_ref_b = c[:, occ_b0]

        diis = DIIS(self.diis_space)
        e_old = 0.0
        # damped-Fock startup: at production sizes (598-AO DZ+P TTM) the
        # GWH guess is far from the basin and feeding raw early Focks to
        # DIIS diverges by thousands of Ha (r3 phase-b log).  While the
        # orbital gradient is above `diis_start_grad`, diagonalize
        # F_damped = (1-a) F_new + a F_damped_prev instead and keep the
        # DIIS history empty; once |g| drops below the gate, DIIS takes
        # over from a sane point.  (The reference inherits pyscf's
        # SAD/damping machinery; this is the in-house equivalent.)
        f_damp_state = None
        diis_live = False

        def _stabilize(f_new, err_norm):
            nonlocal f_damp_state, diis_live, diis
            if err_norm > self.diis_start_grad and self.damp > 0.0:
                if diis_live:
                    diis = DIIS(self.diis_space)  # drop divergent history
                    diis_live = False
                f_damp_state = (f_new if f_damp_state is None else
                                (1.0 - self.damp) * f_new
                                + self.damp * f_damp_state)
                return f_damp_state, True
            diis_live = True
            return f_new, False
        # device-engine precision schedule: each mode runs until its
        # residual-norm progress stalls at that mode's noise floor (the
        # floors are size-dependent, so no absolute thresholds), then
        # advances bf16 -> f32 -> refined
        # start mode: 'bf16' earns its keep only when descending from a
        # crude guess on a small-Fock-scale system.  At production Fock
        # scales (TTM/dzp: elements ~6e3) the bf16 error-vector norm is
        # ~2e3 — pure noise — and three noise diagonalizations destroy
        # even a projected init before the stall logic advances the mode
        # (r3 logs: projected E0 = -4775 exploding to +5900 by cycle 3).
        # Callers seeding from a cross-basis projection start at 'f32'.
        mode = getattr(self, "device_start_mode", "bf16")
        best_g = np.inf
        stall = 0
        snap = None  # best refined-mode state: (g, fa, fb, e_tot, orbs)
        from collections import deque

        f_acc = deque(maxlen=8)  # refined floor-window (fa, fb, e_tot)
        if self.engine == "device" and self._dev is None:
            from xtddft_tpu.scf.jk_device import DeviceVeff

            self._dev = DeviceVeff(self.env, self.xc,
                                   b_storage=self.device_b_storage)
        converged = False
        fa = fb = None
        idx_a = np.arange(na)
        idx_b = np.arange(nb)
        for cycle in range(self.max_cycle):
            if unrestricted:
                if mom_ref_a is not None:
                    idx_a = self._select_by_overlap(c_a, S, mom_ref_a, na)
                    idx_b = self._select_by_overlap(c_b, S, mom_ref_b, nb)
                    mom_ref_a = c_a[:, idx_a]
                    mom_ref_b = c_b[:, idx_b]
                da = c_a[:, idx_a] @ c_a[:, idx_a].T
                db = c_b[:, idx_b] @ c_b[:, idx_b].T
            else:
                if mom_ref_a is not None:
                    idx_a = self._select_by_overlap(c, S, mom_ref_a, na)
                    # doubly-occupied chosen among the occupied set
                    sub = self._select_by_overlap(c[:, idx_a], S, mom_ref_b, nb)
                    idx_b = idx_a[sub]
                    mom_ref_a = c[:, idx_a]
                    mom_ref_b = c[:, idx_b]
                da = c[:, idx_a] @ c[:, idx_a].T
                db = c[:, idx_b] @ c[:, idx_b].T
            if self.engine == "device":
                if unrestricted:
                    ca_occ, cb_occ = c_a[:, idx_a], c_b[:, idx_b]
                else:
                    ca_occ, cb_occ = c[:, idx_a], c[:, idx_b]
                veff_a, veff_b, e2 = self._dev.veff(ca_occ, cb_occ, mode)
            else:
                veff_a, veff_b, e2 = self._veff_and_exc(
                    jnp.asarray(da), jnp.asarray(db))
            fa = h + np.asarray(veff_a)
            fb = h + np.asarray(veff_b)
            e_tot = float(np.einsum("pq,qp->", h, da + db)) + e2 + enuc

            if restricted_closed:
                err = X.T @ (fa @ (2 * da) @ S - S @ (2 * da) @ fa) @ X
                f_use, damped = _stabilize(fa, np.linalg.norm(err))
                f_eff = (f_use if damped
                         else diis.update(f_use, err).reshape(fa.shape))
                e_mo, c = _eig(f_eff, X)
            elif unrestricted:
                erra = X.T @ (fa @ da @ S - S @ da @ fa) @ X
                errb = X.T @ (fb @ db @ S - S @ db @ fb) @ X
                err = np.concatenate([erra.ravel(), errb.ravel()])
                fcat = np.concatenate([fa.ravel(), fb.ravel()])
                f_use, damped = _stabilize(fcat, np.linalg.norm(err))
                fboth = f_use if damped else diis.update(f_use, err)
                fa_d = fboth[: fa.size].reshape(fa.shape)
                fb_d = fboth[fa.size :].reshape(fb.shape)
                e_mo_a, c_a = _eig(fa_d, X)
                e_mo_b, c_b = _eig(fb_d, X)
            else:  # restricted open shell
                dc = db  # doubly-occ part
                do_ = da - db
                f_ro = self._roothaan_fock(fa, fb, dc, do_, S)
                dtot = da + db
                err = X.T @ (f_ro @ dtot @ S - S @ dtot @ f_ro) @ X
                f_use, damped = _stabilize(f_ro, np.linalg.norm(err))
                f_eff = (f_use if damped
                         else diis.update(f_use, err).reshape(fa.shape))
                e_mo, c = _eig(f_eff, X)
            if restricted_closed:
                gnorm = np.linalg.norm(err)
            elif unrestricted:
                gnorm = np.linalg.norm(err)
            else:
                gnorm = np.linalg.norm(err)
            de = abs(e_tot - e_old)
            e_old = e_tot
            if self.verbose:
                print(f"cycle {cycle:3d}  E = {e_tot:.12f}  dE = {de:.2e}  |g| = {gnorm:.2e}")
            if self.engine == "device":
                if gnorm < 0.97 * best_g:
                    best_g, stall = gnorm, 0
                else:
                    stall += 1
                advance = (stall >= 3 or
                           (de < self.conv_tol and gnorm < self.conv_tol_grad
                            and cycle > 1))
                if mode != "refined" and advance:
                    mode = {"bf16": "f32", "f32": "refined"}[mode]
                    if self.verbose:
                        print(f"  -> precision mode {mode}")
                    diis = DIIS(self.diis_space)  # stale-precision history
                    best_g, stall = np.inf, 0
                    continue  # do not evaluate convergence on mixed modes
                if mode == "refined":
                    if snap is None or gnorm < snap[0]:
                        orbs = ((c_a.copy(), c_b.copy(), e_mo_a, e_mo_b)
                                if unrestricted else (c.copy(), e_mo))
                        snap = (gnorm, fa, fb, e_tot, orbs)
                    if gnorm < 3.0 * best_g:
                        # floor-window Fock accumulator: rounding noise is
                        # quasi-independent across cycles (different C
                        # inputs), so the window mean beats any single
                        # cycle by ~sqrt(len)
                        f_acc.append((fa, fb, e_tot))
                    if gnorm > 5.0 * best_g and cycle > 1:
                        # DIIS destabilized by rounding-noise error vectors
                        # (near-linearly-dependent B matrix): restart it
                        diis = DIIS(self.diis_space)
                    if stall >= 5:
                        if (snap[0] < self.device_accept_grad
                                and len(f_acc) >= 4):
                            # stalled AT the engine noise floor and the
                            # floor clears the production bar: accept
                            gnorm, _, _, e_tot, orbs = snap
                            if unrestricted:
                                c_a, c_b, e_mo_a, e_mo_b = orbs
                            else:
                                c, e_mo = orbs
                            converged = True
                            if self.verbose:
                                print(f"  -> refined floor |g| = "
                                      f"{gnorm:.2e}; accepted")
                            break
                        # stalled above the bar (e.g. mid-descent after
                        # the mode switch): restart DIIS and keep going
                        diis = DIIS(self.diis_space)
                        stall = 0
            if de < self.conv_tol and gnorm < self.conv_tol_grad and cycle > 1:
                converged = True
                break

        if self.engine == "device" and converged and len(f_acc) >= 4:
            # noise-averaged polish: the floor-window mean Fock carries
            # ~sqrt(len) less rounding noise than any single cycle; one
            # DIIS-free diagonalization of it is the engine's final answer
            fa = np.mean([t[0] for t in f_acc], axis=0)
            fb = np.mean([t[1] for t in f_acc], axis=0)
            e_tot = float(np.mean([t[2] for t in f_acc]))
            if restricted_closed:
                e_mo, c = _eig(fa, X)
            elif unrestricted:
                e_mo_a, c_a = _eig(fa, X)
                e_mo_b, c_b = _eig(fb, X)
            else:
                da = c[:, idx_a] @ c[:, idx_a].T
                db = c[:, idx_b] @ c[:, idx_b].T
                f_ro = self._roothaan_fock(fa, fb, db, da - db, S)
                e_mo, c = _eig(f_ro, X)

        nmo = X.shape[1]
        if unrestricted:
            mo_coeff = np.stack([c_a, c_b])
            mo_energy = np.stack([e_mo_a, e_mo_b])
            mo_occ = np.zeros((2, nmo))
            mo_occ[0, idx_a] = 1.0
            mo_occ[1, idx_b] = 1.0
        else:
            mo_coeff = c
            mo_energy = e_mo
            mo_occ = np.zeros(nmo)
            if restricted_closed:
                mo_occ[idx_a] = 2.0
            else:
                mo_occ[idx_a] = 1.0
                mo_occ[idx_b] = 2.0
        return MeanField(
            mol=mol,
            env=env,
            kind=self.kind,
            xc=self.xc,
            mo_coeff=mo_coeff,
            mo_energy=mo_energy,
            mo_occ=mo_occ,
            e_tot=e_tot,
            converged=converged,
            fock_a=fa,
            fock_b=fb,
            v_ext=self.v_ext,
        )


def RHF(mol, **kw):
    return SCF(mol, "rhf", **kw)


def UHF(mol, **kw):
    return SCF(mol, "uhf", **kw)


def ROHF(mol, **kw):
    return SCF(mol, "rohf", **kw)


def RKS(mol, xc="lda", **kw):
    return SCF(mol, "rks", xc=xc, **kw)


def UKS(mol, xc="lda", **kw):
    return SCF(mol, "uks", xc=xc, **kw)


def ROKS(mol, xc="lda", **kw):
    return SCF(mol, "roks", xc=xc, **kw)
