"""Analytic excited-state nuclear gradients via a differentiable Lagrangian.

The reference implements excited-state gradients as hand-derived Z-vector
codes over libcint derivative integrals (`/root/reference/grad_jp/grad/
xtdhf.py:15-433` ``grad_elec`` for X-CIS on ROHF; `usfcis*.py`,
`rtdhf.py`, `utdhf.py`).  Here the same physics is obtained from three
autodiff ingredients over the differentiable integral layer
(`ints/jaxints.py`) — no derivative-integral ladders, no hand-coded
coupled-perturbed equations:

1.  Orbitals are parametrized as C(kappa, R) = C_orth(R) expm(K) where
    C_orth(R) re-orthonormalizes the converged MOs against S(R) (a smooth
    Cholesky connection) and K is an antisymmetric rotation over the
    nonredundant pairs.  SCF convergence means g = dE_scf/dkappa = 0.
2.  The Z-vector equation  H z = d(omega)/d(kappa)  is solved by CG with
    Hessian-vector products from ``jax.jvp`` of the kappa-gradient
    (H = d2 E_scf / dkappa2, the electronic orbital Hessian).
3.  The total gradient is one ``jax.grad`` over coordinates of
        Phi(R) = E_scf(R, 0) + omega(R, 0) - z . g(R, 0),
    which is the standard Lagrangian result
    dE/dR = partial_R(E_scf + omega) - z . partial_R g.

The excitation energy omega is written directly as the quadratic form
X^T A(C) X of each method (CIS / UCIS / X-CIS with the spin-adapted dA of
`xtddft/XTDA.py:291-331`), and the eigenvector itself is obtained from
``jax.hessian`` of that same expression — the gradient and the
eigenproblem cannot drift apart.

KS-DFT references are supported through the differentiable XC
quadrature (`grad/xcgrid.py`): E_xc(R, D) joins the Lagrangian, vxc
enters the Fock by ``jax.grad`` over the density matrices, and the
TDA fxc term is the directional second derivative of E_xc along the
transition density — no hand-coded kernel derivatives anywhere.
Range-separated hybrids and DFT spin-flip kernels are the remaining
gaps (guarded; see GAPS.md).  Validated against the FD harness in
tests/test_grad_analytic.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from xtddft_tpu.ints.jaxints import make_integral_fn

__all__ = ["ExcitedGradients", "scf_gradient"]


def _nuclear_repulsion(coords, charges):
    d = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + jnp.eye(coords.shape[0]))
    zz = charges[:, None] * charges[None, :]
    off = 1.0 - jnp.eye(coords.shape[0])
    return 0.5 * jnp.sum(off * zz / r)


def _jk_energy(eri, da, db, hyb: float = 1.0):
    dt = da + db
    J = jnp.einsum("pqrs,sr->pq", eri, dt)
    Ka = jnp.einsum("prsq,rs->pq", eri, da)
    Kb = jnp.einsum("prsq,rs->pq", eri, db)
    e2 = 0.5 * jnp.einsum("pq,qp->", dt, J)
    e2 -= 0.5 * hyb * (
        jnp.einsum("pq,qp->", da, Ka) + jnp.einsum("pq,qp->", db, Kb)
    )
    return e2, J, Ka, Kb


def _rot_pairs(kind: str, nmo: int, na: int, nb: int):
    """Nonredundant orbital-rotation index pairs (rows, cols).

    rhf: occ-vir; rohf: closed-open, closed-vir, open-vir (the three
    variational spaces of the Roothaan solution); uhf: per-spin occ-vir
    (two stacked pair sets, the kappa vector is their concatenation)."""
    if kind in ("rhf", "rks"):
        occ = np.arange(nb)
        vir = np.arange(nb, nmo)
        pi, pj = np.meshgrid(occ, vir, indexing="ij")
        return [(pi.ravel(), pj.ravel())]
    if kind in ("rohf", "roks"):
        pairs = []
        c = np.arange(nb)
        o = np.arange(nb, na)
        v = np.arange(na, nmo)
        for rows, cols in ((c, o), (c, v), (o, v)):
            if len(rows) and len(cols):
                pi, pj = np.meshgrid(rows, cols, indexing="ij")
                pairs.append((pi.ravel(), pj.ravel()))
        return [tuple(np.concatenate(x) for x in zip(*pairs))]
    if kind in ("uhf", "uks"):
        out = []
        for n in (na, nb):
            occ = np.arange(n)
            vir = np.arange(n, nmo)
            pi, pj = np.meshgrid(occ, vir, indexing="ij")
            out.append((pi.ravel(), pj.ravel()))
        return out
    raise ValueError(kind)


def _orthonormalize(C0, S):
    """Smooth orbital connection: C_orth(R) = C0 L^{-T} with
    L = chol(C0^T S(R) C0); equals C0 at the reference geometry."""
    M = C0.T @ S @ C0
    L = jnp.linalg.cholesky(M)
    return jax.scipy.linalg.solve_triangular(L, C0.T, lower=True).T


def _rotate(C, kvec, pairs, nmo):
    K = jnp.zeros((nmo, nmo))
    K = K.at[pairs[0], pairs[1]].set(kvec)
    K = K.at[pairs[1], pairs[0]].add(-kvec)
    return C @ jax.scipy.linalg.expm(K)


@dataclasses.dataclass
class ExcitedGradients:
    """Analytic gradients of CIS-type excited states of an HF reference.

    method: 'cis' (RHF, singlet), 'cis-triplet', 'ucis' (UHF),
    'xcis' (spin-adapted X-CIS on ROHF, the HF limit of X-TDA), or
    'sfcis-up' (spin-flip-up CIS on ROHF/UHF, the HF limit of
    SF-TDA-up — the reference's SF gradient target,
    `grad_hb/tdroks_sfu.py:184`).
    """

    mf: object
    method: str = "xcis"
    # spin-flip xc kernel for method='sfcis-up': 0 = ALDA0 transverse,
    # 1 = multicollinear (the SF drivers' `method` convention)
    sf_method: int = 0

    def __post_init__(self):
        mf = self.mf
        # The Lagrangian rebuilds hcore differentiably: T(R) + V(R) for
        # nonrelativistic references, the picture-changed sfx2c h1e(R)
        # (`grad/x2c_diff.py` — uncontracted S/T/V/pVp + smooth projector
        # decoupling) for `SCF(x2c=True)` references, plus an optional
        # static external AO potential (the reference's `v_solvent`
        # pattern, `os_sTDA.py:457`) as a geometry-independent constant
        # matrix — Tr(D v_ext) contributes to E but not to dE/dR beyond
        # the density response, which the Lagrangian handles exactly.
        self.v_ext = (jnp.asarray(np.asarray(mf.v_ext, dtype=np.float64))
                      if getattr(mf, "v_ext", None) is not None else None)
        self._x2c_fn = None  # built below (needs _block_jit)
        self.spec = mf.xc
        self.hyb = 1.0
        self.omega = 0.0
        self.hyb_lr = 0.0  # long-range K coefficient (alpha - hyb)
        self._exc = None
        self._sf_xc = None
        if (self.spec is not None and self.spec.needs_tau
                and self.method == "sfcis-up" and self.sf_method != 1):
            raise NotImplementedError(
                "analytic gradients: the ALDA0 spin-flip kernel is not "
                "defined for MGGA functionals — use sf_method=1 (the "
                "multicollinear kernel carries the tau channel)")
        if self.spec is not None:
            self.hyb = self.spec.hyb
            if abs(self.spec.omega) > 1e-12:
                self.omega = self.spec.omega
                self.hyb_lr = self.spec.alpha - self.spec.hyb
            from xtddft_tpu.grad.xcgrid import make_exc_fn, make_sf_alda0_fn

            self._exc = make_exc_fn(mf.mol, mf.env.layout, self.spec,
                                    level=mf.env.grid_level)
            if self.method == "sfcis-up":
                # spin-flip channel: ALDA0 transverse (sf_method=0) or
                # multicollinear (sf_method=1) kernel, both
                # differentiated straight through their quadratures
                if self.sf_method == 1:
                    from xtddft_tpu.grad.xcgrid import make_sf_mcol_fn

                    self._sf_xc = make_sf_mcol_fn(mf.mol, mf.env.layout,
                                                  self.spec,
                                                  level=mf.env.grid_level)
                else:
                    self._sf_xc = make_sf_alda0_fn(mf.mol, mf.env.layout,
                                                   self.spec,
                                                   level=mf.env.grid_level)
        self.kind = mf.kind
        mol = mf.mol
        self.coords0 = np.asarray(mol.coords, dtype=np.float64)
        self.charges = jnp.asarray(np.asarray(mol.charges, dtype=np.float64))
        self.na, self.nb = mol.nalpha, mol.nbeta
        # block_jit: each integral class block compiles separately (and
        # the coordinate gradient differentiates eagerly through them) —
        # a monolithic jit of the full integral graph takes >30 min of
        # XLA time at DZ scale (VERDICT r1 item 5), driven by the high-L
        # hermite recursions of d shells; small s/p-only bases keep the
        # faster monolithic jit.
        layout = mf.env.layout
        self._block_jit = (max(sh.l for sh in layout.shells) >= 2
                           or mf.env.nao > 40)
        self._ints = make_integral_fn(layout, omega_lr=self.omega,
                                      block_jit=self._block_jit)
        if getattr(mf.env, "x2c", False):
            from xtddft_tpu import units
            from xtddft_tpu.grad.x2c_diff import make_x2c_hcore_fn

            self._x2c_fn = make_x2c_hcore_fn(
                layout, units.C_AU, block_jit=self._block_jit)
        if self._exc is not None:
            self._exc = jax.jit(self._exc)  # one self-contained unit
        if self._sf_xc is not None:
            self._sf_xc = jax.jit(self._sf_xc)
        if self.kind in ("uhf", "uks"):
            self.C0 = [jnp.asarray(mf.mo_coeff[0]), jnp.asarray(mf.mo_coeff[1])]
            self.nmo = self.C0[0].shape[1]
        else:
            self.C0 = [jnp.asarray(mf.mo_coeff)]
            self.nmo = self.C0[0].shape[1]
        self.pairs = _rot_pairs(self.kind, self.nmo, self.na, self.nb)
        self.nk = sum(len(p[0]) for p in self.pairs)

    # -- orbital parametrization -------------------------------------------
    def _orbs(self, ints, kvec):
        """C(kappa, R) per spin channel."""
        S = ints["S"]
        if self.kind in ("uhf", "uks"):
            n0 = len(self.pairs[0][0])
            Ca = _rotate(_orthonormalize(self.C0[0], S), kvec[:n0],
                         self.pairs[0], self.nmo)
            Cb = _rotate(_orthonormalize(self.C0[1], S), kvec[n0:],
                         self.pairs[1], self.nmo)
            return Ca, Cb
        C = _rotate(_orthonormalize(self.C0[0], S), kvec, self.pairs[0],
                    self.nmo)
        return C, C

    def _ints0(self):
        """Integrals at the reference geometry, computed once and cached —
        every kappa-space derivative (Ritz Hessian, Z-vector RHS, CG HVPs)
        reuses them instead of re-tracing the integral build.  Eager call:
        self._ints runs through per-block jits (see make_integral_fn)."""
        if getattr(self, "_ints0_cache", None) is None:
            fn = self._ints if self._block_jit else jax.jit(self._ints)
            self._ints0_cache = fn(jnp.asarray(self.coords0))
        return self._ints0_cache

    def _hcore(self, ints):
        """Differentiable one-electron Hamiltonian: T+V, or the sfx2c
        picture-changed h1e(R), plus any static external potential."""
        if self._x2c_fn is not None:
            h = self._x2c_fn(ints["coords"])
        else:
            h = ints["T"] + ints["V"]
        if self.v_ext is not None:
            h = h + self.v_ext
        return h

    # -- SCF energy -----------------------------------------------------------
    def _e_elec(self, ints, kvec):
        Ca, Cb = self._orbs(ints, kvec)
        da = Ca[:, : self.na] @ Ca[:, : self.na].T
        db = Cb[:, : self.nb] @ Cb[:, : self.nb].T
        h = self._hcore(ints)
        e2, _, _, _ = _jk_energy(ints["eri"], da, db, self.hyb)
        if self.hyb_lr != 0.0:
            _, _, Kla, Klb = _jk_energy(ints["eri_lr"], da, db)
            e2 -= 0.5 * self.hyb_lr * (
                jnp.einsum("pq,qp->", da, Kla) + jnp.einsum("pq,qp->", db, Klb)
            )
        e1 = jnp.einsum("pq,qp->", h, da + db)
        if self._exc is not None:
            e2 = e2 + self._exc(ints["coords"], da, db)
        return e1 + e2

    def _e_scf(self, coords, kvec):
        return self._e_elec(self._ints(coords), kvec) + _nuclear_repulsion(
            coords, self.charges
        )

    # -- excitation energy as a quadratic form -------------------------------
    def _x_dims(self):
        na, nb, nmo = self.na, self.nb, self.nmo
        if self.method in ("cis", "cis-triplet", "rtdhf", "rtdhf-triplet"):
            return [(nb, nmo - nb)]
        if self.method in ("ucis", "utdhf"):
            return [(na, nmo - na), (nb, nmo - nb)]
        if self.method in ("xcis", "xtdhf"):
            # X-TDA space: alpha (na x nv_a) + beta (nb x nv_b)
            return [(na, nmo - na), (nb, nmo - nb)]
        if self.method == "sfcis-up":
            # flip-up: occupied beta -> virtual alpha
            return [(nb, nmo - na)]
        raise ValueError(self.method)

    @property
    def is_tdhf(self) -> bool:
        return self.method in ("rtdhf", "rtdhf-triplet", "utdhf", "xtdhf")

    @property
    def xdim(self) -> int:
        d = sum(o * v for o, v in self._x_dims())
        return 2 * d if self.is_tdhf else d  # packed [X; Y]

    def _omega(self, coords, kvec, x):
        return self._omega_i(self._ints(coords), kvec, x)

    def _omega_i(self, ints, kvec, x):
        """omega = X^T A X for the chosen method; x is the packed,
        unit-norm eigenvector."""
        eri = ints["eri"]
        Ca, Cb = self._orbs(ints, kvec)
        h = self._hcore(ints)
        na, nb = self.na, self.nb
        da = Ca[:, :na] @ Ca[:, :na].T
        db = Cb[:, :nb] @ Cb[:, :nb].T
        hyb = self.hyb
        _, J, Ka, Kb = _jk_energy(eri, da, db, hyb)
        Fa = h + J - hyb * Ka
        Fb = h + J - hyb * Kb
        if self.hyb_lr != 0.0:
            _, _, Kla, Klb = _jk_energy(ints["eri_lr"], da, db)
            Fa = Fa - self.hyb_lr * Kla
            Fb = Fb - self.hyb_lr * Klb

        def kx(tl, tr):
            """Exchange contraction with the RSH-combined kernel."""
            out = hyb * jnp.einsum("pr,pqrs,qs->", tl, eri, tr)
            if self.hyb_lr != 0.0:
                out = out + self.hyb_lr * jnp.einsum(
                    "pr,pqrs,qs->", tl, ints["eri_lr"], tr)
            return out

        if self._exc is not None:
            vxa = jax.grad(self._exc, argnums=1)(ints["coords"], da, db)
            vxb = jax.grad(self._exc, argnums=2)(ints["coords"], da, db)
            Fa = Fa + vxa
            Fb = Fb + vxb
        Fa_mo = Ca.T @ Fa @ Ca
        Fb_mo = Cb.T @ Fb @ Cb

        def fxc_dir(Ta, Tb):
            """Directional second derivative of E_xc along the transition
            density: the quadratic fxc term of the TDA A-matrix.
            Forward-over-forward (jvp of jvp) so the outer reverse pass
            of the nuclear gradient stays a single backward sweep."""
            if self._exc is None:
                return 0.0
            coords = ints["coords"]

            def g(lam):
                return self._exc(coords, da + lam * Ta, db + lam * Tb)

            def dg(lam):
                return jax.jvp(g, (lam,), (1.0,))[1]

            return jax.jvp(dg, (0.0,), (1.0,))[1]

        def fxc_bilinear(TaX, TbX, TaY, TbY):
            """Bilinear fxc coupling between two transition-density pairs
            via the polarization identity over the quadratic form."""
            if self._exc is None:
                return 0.0
            return 0.25 * (
                fxc_dir(TaX + TaY, TbX + TbY) - fxc_dir(TaX - TaY, TbX - TbY)
            )

        def kxb(t1x, t1y):
            """RPA B-matrix exchange contraction: sum_{iajb} (ib|ja)
            x_ia y_jb over AO transition densities t1 = Co z Cv^T
            (t1[p,s]: p occupied-side AO, s virtual-side AO), with the
            RSH-combined kernel (mirrors `response/tdhf.py:
            _exchange_ibja`).  Index derivation: (ib|ja) x_ia y_jb =
            eri[pqrs] (Co x Cv^T)[p,s] (Co y Cv^T)[r,q] — note the
            TRANSPOSED second density; the "pqrs,ps,qr" form collapses by
            p<->q symmetry to the A-type (ij|ab) exchange instead.
            Validated against the dense B in tests/test_grad_tdhf.py."""
            out = hyb * jnp.einsum("pqrs,ps,rq->", eri, t1x, t1y)
            if self.hyb_lr != 0.0:
                out = out + self.hyb_lr * jnp.einsum(
                    "pqrs,ps,rq->", ints["eri_lr"], t1x, t1y)
            return out

        dims = self._x_dims()

        if self.method in ("rtdhf", "rtdhf-triplet"):
            # omega[X,Y] = X^T A X + Y^T A Y + 2 X^T B Y with the RPA
            # amplitudes fixed at their converged values; the functional
            # is stationary under norm-preserving amplitude variations
            # (X^T X - Y^T Y = 1), so the Lagrangian Z-vector only needs
            # the orbital response — exactly the structure the reference
            # consumes from pyscf in `grad_jp/grad/rtdhf.py:13`.
            singlet = self.method == "rtdhf"
            no, nv = dims[0]
            zx = x[: no * nv].reshape(no, nv)
            zy = x[no * nv:].reshape(no, nv)
            Co, Cv = Ca[:, :no], Ca[:, no:]

            def a_form(z):
                w = jnp.einsum("ia,ab,ib->", z, Fa_mo[no:, no:], z)
                w -= jnp.einsum("ia,ij,ja->", z, Fa_mo[:no, :no], z)
                t1 = Co @ z @ Cv.T
                t1s = 0.5 * (t1 + t1.T) / jnp.sqrt(2.0)
                if singlet:
                    w += 2.0 * jnp.einsum("pq,pqrs,rs->", t1, eri, t1)
                    w += fxc_dir(t1s, t1s)
                else:
                    w += fxc_dir(t1s, -t1s)
                return w - kx(t1, t1)

            def b_form(z1, z2):
                t1 = Co @ z1 @ Cv.T
                t2 = Co @ z2 @ Cv.T
                t1s = 0.5 * (t1 + t1.T) / jnp.sqrt(2.0)
                t2s = 0.5 * (t2 + t2.T) / jnp.sqrt(2.0)
                if singlet:
                    w = 2.0 * jnp.einsum("pq,pqrs,rs->", t1, eri, t2)
                    w += fxc_bilinear(t1s, t1s, t2s, t2s)
                else:
                    w = fxc_bilinear(t1s, -t1s, t2s, -t2s)
                return w - kxb(t1, t2)

            return a_form(zx) + a_form(zy) + 2.0 * b_form(zx, zy)

        if self.method == "utdhf":
            (noa, nva), (nob, nvb) = dims
            da_len = noa * nva + nob * nvb
            xs, ys = x[:da_len], x[da_len:]

            def split(v):
                return (v[: noa * nva].reshape(noa, nva),
                        v[noa * nva:].reshape(nob, nvb))

            zxa, zxb = split(xs)
            zya, zyb = split(ys)
            Coa, Cva = Ca[:, :noa], Ca[:, noa:]
            Cob, Cvb = Cb[:, :nob], Cb[:, nob:]

            def t_ao(za, zb):
                return Coa @ za @ Cva.T, Cob @ zb @ Cvb.T

            def a_form(za, zb):
                w = jnp.einsum("ia,ab,ib->", za, Fa_mo[noa:, noa:], za)
                w -= jnp.einsum("ia,ij,ja->", za, Fa_mo[:noa, :noa], za)
                w += jnp.einsum("ia,ab,ib->", zb, Fb_mo[nob:, nob:], zb)
                w -= jnp.einsum("ia,ij,ja->", zb, Fb_mo[:nob, :nob], zb)
                t1a, t1b = t_ao(za, zb)
                dt = t1a + t1b
                w += jnp.einsum("pq,pqrs,rs->", dt, eri, dt)
                w -= kx(t1a, t1a) + kx(t1b, t1b)
                w += fxc_dir(0.5 * (t1a + t1a.T), 0.5 * (t1b + t1b.T))
                return w

            def b_form(za1, zb1, za2, zb2):
                t1a, t1b = t_ao(za1, zb1)
                t2a, t2b = t_ao(za2, zb2)
                w = jnp.einsum("pq,pqrs,rs->", t1a + t1b, eri, t2a + t2b)
                w -= kxb(t1a, t2a) + kxb(t1b, t2b)
                w += fxc_bilinear(0.5 * (t1a + t1a.T), 0.5 * (t1b + t1b.T),
                                  0.5 * (t2a + t2a.T), 0.5 * (t2b + t2b.T))
                return w

            return (a_form(zxa, zxb) + a_form(zya, zyb)
                    + 2.0 * b_form(zxa, zxb, zya, zyb))

        if self.method == "sfcis-up":
            # A_{ia,jb} = d_ij F^a_ab - d_ab F^b_ij - hyb (ab|ji)
            # [+ ALDA0 SF kernel for KS]: no Coulomb term in the
            # spin-flip channel (`xtddft/SF_TDA.py:269-271`)
            no_, nv_ = dims[0]
            z = x.reshape(no_, nv_)
            Cob, Cva = Cb[:, :no_], Ca[:, na:]
            w = jnp.einsum("ia,ab,ib->", z, Fa_mo[na:, na:], z)
            w -= jnp.einsum("ia,ij,ja->", z, Fb_mo[:no_, :no_], z)
            t = Cva @ z.T @ Cob.T  # t_ps = sum_ia Cva[p,a] z_ia Cob[s,i]
            w -= hyb * jnp.einsum("pqrs,ps,qr->", eri, t, t)
            if self.hyb_lr != 0.0:
                w -= self.hyb_lr * jnp.einsum(
                    "pqrs,ps,qr->", ints["eri_lr"], t, t)
            if self._sf_xc is not None:
                w += self._sf_xc(ints["coords"], da, db, t)
            return w
        if self.method in ("cis", "cis-triplet"):
            no, nv = dims[0]
            z = x.reshape(no, nv)
            Co, Cv = Ca[:, :no], Ca[:, no:]
            w = jnp.einsum("ia,ab,ib->", z, Fa_mo[no:, no:], z)
            w -= jnp.einsum("ia,ij,ja->", z, Fa_mo[:no, :no], z)
            t1 = Co @ z @ Cv.T  # AO transition density
            # per-spin-channel transition density is t1/sqrt(2) in the
            # spatial singlet/triplet convention (the same spin algebra
            # that makes the Coulomb term 2(ia|jb) and exchange 1x)
            t1s = 0.5 * (t1 + t1.T) / jnp.sqrt(2.0)
            if self.method == "cis":
                w += 2.0 * jnp.einsum("pq,pqrs,rs->", t1, eri, t1)
                w += fxc_dir(t1s, t1s)
            else:  # triplet: antisymmetric spin channels
                w += fxc_dir(t1s, -t1s)
            w -= kx(t1, t1)
            return w

        (noa, nva), (nob, nvb) = dims
        d_u = noa * nva + nob * nvb
        Coa, Cva = Ca[:, :noa], Ca[:, noa:]
        Cob, Cvb = Cb[:, :nob], Cb[:, nob:]

        def split(v):
            return (v[: noa * nva].reshape(noa, nva),
                    v[noa * nva:].reshape(nob, nvb))

        def a_form_u(za, zb):
            w = jnp.einsum("ia,ab,ib->", za, Fa_mo[noa:, noa:], za)
            w -= jnp.einsum("ia,ij,ja->", za, Fa_mo[:noa, :noa], za)
            w += jnp.einsum("ia,ab,ib->", zb, Fb_mo[nob:, nob:], zb)
            w -= jnp.einsum("ia,ij,ja->", zb, Fb_mo[:nob, :nob], zb)
            t1a = Coa @ za @ Cva.T
            t1b = Cob @ zb @ Cvb.T
            dt = t1a + t1b
            w += jnp.einsum("pq,pqrs,rs->", dt, eri, dt)  # Coulomb
            w -= kx(t1a, t1a)  # same-spin exchange (RSH-combined kernel)
            w -= kx(t1b, t1b)
            w += fxc_dir(0.5 * (t1a + t1a.T), 0.5 * (t1b + t1b.T))
            return w

        # X-CIS spin adaptation: dA from the HF-flavored alpha/beta Fock
        # difference on the SCF density, with the S-dependent factors of
        # `xtddft/XTDA.py:298-307` (same math as response/sigma_df.py).
        # For a KS reference the dA Fock pair is a *ROHF* veff on the DFT
        # density (`xtddft/XTDA.py:608-612`): dF = Fb_hf - Fa_hf = Ka - Kb
        # with FULL exchange, regardless of the functional's hyb.
        def da_form(za, zb):
            nc, no = nb, na - nb
            si = 0.5 * no
            f1 = 0.5 * (1.0 - jnp.sqrt((si + 1) / si) + 1.0 / (2 * si))
            f2 = 0.5 * (-1.0 + jnp.sqrt((si + 1) / si) + 1.0 / (2 * si))
            fx = 0.5 / (2.0 * si)
            if self._exc is None:
                dF = Fb_mo - Fa_mo  # ROHF: same C for both spins
            else:
                dF = Ca.T @ (Ka - Kb) @ Ca
            dFV = dF[na:, na:]
            dFC = dF[:nc, :nc]
            zac = za[:nc, :]          # CV(alpha) rows
            zbv = zb[:, no:]          # CV(beta) columns
            coup_a = f1 * jnp.einsum("ib,ab->ia", zac, dFV) + f2 * jnp.einsum(
                "ja,ij->ia", zac, dFC
            )
            cross_b = fx * (
                jnp.einsum("ib,ab->ia", zbv, dFV)
                + jnp.einsum("ja,ij->ia", zbv, dFC)
            )
            coup_b = f2 * jnp.einsum("ib,ab->ia", zbv, dFV) + f1 * jnp.einsum(
                "ja,ij->ia", zbv, dFC
            )
            cross_a = fx * (
                jnp.einsum("ib,ab->ia", zac, dFV)
                + jnp.einsum("ja,ij->ia", zac, dFC)
            )
            w = jnp.einsum("ia,ia->", zac, coup_a - cross_b)
            w += jnp.einsum("ia,ia->", zbv, coup_b - cross_a)
            return w

        if self.method == "ucis":
            return a_form_u(*split(x))
        if self.method == "xcis":
            za, zb = split(x)
            return a_form_u(za, zb) + da_form(za, zb)

        # xtdhf: spin-adapted X-TDHF pencil.  B has no dA analog (RPA B
        # elements <0|H|double> carry no one-electron parts; see
        # `response/tdhf.py:xtdhf_dense`), so only the A forms get dA.
        def b_form(za1, zb1, za2, zb2):
            t1a, t1b = Coa @ za1 @ Cva.T, Cob @ zb1 @ Cvb.T
            t2a, t2b = Coa @ za2 @ Cva.T, Cob @ zb2 @ Cvb.T
            w = jnp.einsum("pq,pqrs,rs->", t1a + t1b, eri, t2a + t2b)
            w -= kxb(t1a, t2a) + kxb(t1b, t2b)
            w += fxc_bilinear(0.5 * (t1a + t1a.T), 0.5 * (t1b + t1b.T),
                              0.5 * (t2a + t2a.T), 0.5 * (t2b + t2b.T))
            return w

        zxa, zxb = split(x[:d_u])
        zya, zyb = split(x[d_u:])
        return (a_form_u(zxa, zxb) + da_form(zxa, zxb)
                + a_form_u(zya, zyb) + da_form(zya, zyb)
                + 2.0 * b_form(zxa, zxb, zya, zyb))

    # -- eigenstates (consistency by construction) ----------------------------
    def _driver_states(self, nstates: int):
        """(e, X) from the method drivers (host-engine dense solves) with
        the blocked->packed layout conversion.  The jax.hessian route
        below batches nstates x xdim passes over the full ERI graph —
        O(xdim * nao^4) transient memory, which OOMs at DZ scale
        (VERDICT r1 item 5) — while the drivers build the same matrix
        once via the host MO-ERI engine.  Consistency of the two routes
        is asserted in tests/test_grad_analytic.py."""
        from xtddft_tpu.methods import drivers as drv
        from xtddft_tpu.response.spaces import order_interleaved2blocked

        mf = self.mf
        m = self.method
        nc, no = self.nb, self.na - self.nb
        nv = self.nmo - self.na
        inv = np.argsort(order_interleaved2blocked(nc, no, nv))

        def unblock(v):
            return np.asarray(v)[inv]

        if m in ("cis", "cis-triplet"):
            r = drv.TDA(mf, nstates=nstates, singlet=(m == "cis")).kernel()
            V = np.asarray(r.v)
        elif m in ("rtdhf", "rtdhf-triplet"):
            r = drv.TDHF(mf, nstates=nstates,
                         singlet=(m == "rtdhf")).kernel()
            V = np.concatenate([0.5 * (np.asarray(r.v) + np.asarray(r.v_xmy)),
                                0.5 * (np.asarray(r.v) - np.asarray(r.v_xmy))])
        elif m == "ucis":
            r = drv.UTDA(mf, nstates=nstates).kernel()
            V = unblock(r.v)
        elif m == "xcis":
            r = drv.XTDA(mf, nstates=nstates, backend="dense").kernel()
            V = unblock(r.v)
        elif m == "utdhf":
            r = drv.UTDHF(mf, nstates=nstates).kernel()
            V = np.concatenate([0.5 * (unblock(r.v) + unblock(r.v_xmy)),
                                0.5 * (unblock(r.v) - unblock(r.v_xmy))])
        elif m == "xtdhf":
            r = drv.XTDHF(mf, nstates=nstates).kernel()
            V = np.concatenate([0.5 * (unblock(r.v) + unblock(r.v_xmy)),
                                0.5 * (unblock(r.v) - unblock(r.v_xmy))])
        elif m == "sfcis-up":
            r = drv.SFTDA(mf, nstates=nstates, extype="up",
                          method=self.sf_method).kernel()
            V = np.asarray(r.v)
        else:
            raise ValueError(m)
        return np.asarray(r.e)[:nstates], V[:, :nstates]

    def states(self, nstates: int = 5, source: str | None = None):
        """(e, X) of the excited states.

        source='hessian' (default at small scale): dense eigenproblem of
        THIS module's quadratic form, A = 1/2 d2(omega)/dX2 — the
        gradient and the eigenproblem cannot drift apart.
        source='driver' (auto above ~DZ scale): the method drivers'
        host-engine dense solve, layout-converted (`_driver_states`).

        TDHF methods return packed [X; Y] columns with X^T X - Y^T Y = 1,
        solved from the (A, B) pencil whose blocks are second derivatives
        of the SAME omega functional the gradient differentiates."""
        if source is None:
            # the batched hessian materializes ~xdim copies of eri-sized
            # intermediates: gate on that footprint (bytes).  MGGA also
            # routes to the driver: jax.hessian of omega is 4th-order AD
            # through the functional (omega's fxc term is already a
            # nested jvp), and the TPSS chain's XLA:CPU compile at that
            # order runs >1 h even for H2 — the drivers build the same
            # matrix through the host response quadrature instead.
            footprint = self.xdim * float(self.mf.env.nao) ** 4 * 8.0
            mgga = self.spec is not None and self.spec.needs_tau
            source = "driver" if (footprint > 5e8 or mgga) else "hessian"
        if source == "driver":
            return self._driver_states(nstates)
        k0 = jnp.zeros(self.nk)
        ints0 = self._ints0()

        @jax.jit
        def hess(x0):
            return 0.5 * jax.hessian(
                lambda x: self._omega_i(ints0, k0, x)
            )(x0)

        if not self.is_tdhf:
            A = hess(jnp.zeros(self.xdim))
            e, v = np.linalg.eigh(np.asarray(A))
            return e[:nstates], v[:, :nstates]

        from xtddft_tpu.response.tdhf import solve_casida

        # full Hessian of omega[X,Y] is [[2A, 2B], [2B, 2A]]
        H = np.asarray(hess(jnp.zeros(self.xdim)))
        d = self.xdim // 2
        A = H[:d, :d]
        B = H[:d, d:]
        e, xpy, xmy = solve_casida(A, B, nstates)
        v = np.concatenate([0.5 * (xpy + xmy), 0.5 * (xpy - xmy)], axis=0)
        return e, v

    # -- the gradient ---------------------------------------------------------
    def kernel(self, state: int = 0, nstates: int | None = None,
               cg_tol: float = 1e-9, verbose: bool = False):
        """(natm, 3) gradient of E_scf + omega_state.  Returns
        (grad, omega_state)."""
        import time as _time

        def _log(msg, t0):
            if verbose:
                print(f"  [grad] {msg}: {_time.time()-t0:.0f}s", flush=True)

        t0 = _time.time()
        nst = state + 1 if nstates is None else nstates
        e, v = self.states(nst)
        _log("states", t0)
        x = jnp.asarray(v[:, state])
        k0 = jnp.zeros(self.nk)
        c0 = jnp.asarray(self.coords0)
        t0 = _time.time()
        ints0 = self._ints0()
        jax.block_until_ready(ints0["S"])
        _log("ints0", t0)

        # kappa-space pieces at the reference geometry reuse the cached
        # integrals (Enuc has no kappa dependence)
        gk_elec = jax.grad(self._e_elec, argnums=1)
        t0 = _time.time()
        b = jax.jit(jax.grad(self._omega_i, argnums=1))(ints0, k0, x)
        b = jax.block_until_ready(b)
        _log("z-vector rhs", t0)

        @jax.jit
        def hvp(vv):
            return jax.jvp(lambda k: gk_elec(ints0, k), (k0,), (vv,))[1]

        t0 = _time.time()
        z, _ = jax.scipy.sparse.linalg.cg(hvp, b, tol=cg_tol, maxiter=400)
        z = jax.block_until_ready(z)
        _log("z-vector cg", t0)

        def phi(coords):
            ints = self._ints(coords)
            g_k = jax.grad(self._e_elec, argnums=1)(ints, k0)
            return (
                self._e_elec(ints, k0)
                + _nuclear_repulsion(coords, self.charges)
                + self._omega_i(ints, k0, x)
                - jnp.dot(z, g_k)
            )

        # block_jit: eager grad differentiates through the per-block
        # integral jits, compiling one small forward+backward per block
        # instead of a monolithic graph (see make_integral_fn)
        t0 = _time.time()
        gfn = jax.grad(phi) if self._block_jit else jax.jit(jax.grad(phi))
        g = jax.block_until_ready(gfn(c0))
        _log("phi grad", t0)
        return np.asarray(g), float(e[state])


def scf_gradient(mf) -> np.ndarray:
    """(natm, 3) analytic ground-state HF gradient by pure autodiff:
    jax.grad of E_scf(R, kappa=0) — SCF stationarity kills the orbital
    response, the Cholesky connection carries the Pulay terms."""
    eg = ExcitedGradients(mf, method="cis")  # method only shapes the X space
    c0 = jnp.asarray(eg.coords0)
    k0 = jnp.zeros(eg.nk)
    gfn = (jax.grad(eg._e_scf) if eg._block_jit
           else jax.jit(jax.grad(eg._e_scf)))
    return np.asarray(gfn(c0, k0))
