"""Immutable response reference state extracted from a converged MeanField.

This is the L0->L1 interface of SURVEY.md §1: every method driver in the
reference takes a converged PySCF ``mf``; here the equivalent data is
packed once into a `Reference`:

- UKS-style orbital view (a ROKS reference is expanded to equal alpha/beta
  orbitals, `xtddft/XTDA.py:63-76`)
- MO-basis converged Fock matrices F_alpha, F_beta
- the auxiliary *ROHF-flavored* Fock pair: HF J/K evaluated on the DFT
  density (`xtddft/XTDA.py:608-612`, `xtddft/XSF_TDA.py:317-328`), which
  the spin-adapted dA corrections are built from
- orbital-class layout: core (doubly occ) | open (singly occ) | virtual,
  re-ordered so the c|o|v block structure always holds (the reference
  assumes energy ordering does this; with MOM/non-aufbau states we enforce
  it explicitly)
- xc specification (hyb/alpha/omega) and cached grid densities
"""

from __future__ import annotations

import dataclasses

import numpy as np

from xtddft_tpu.scf.driver import MeanField
from xtddft_tpu.scf.env import Env
from xtddft_tpu.xc.registry import XCSpec


@dataclasses.dataclass
class Reference:
    mf: MeanField
    env: Env
    spec: XCSpec | None
    restricted_open: bool  # ROKS/ROHF (spin-adapted dA available)
    # UKS-style orbital view, re-ordered core|open|virtual
    mo_a: np.ndarray  # (nao, nmo)
    mo_b: np.ndarray
    nc: int
    no: int
    nv: int
    # converged MO Fock matrices in that ordering
    fock_a_mo: np.ndarray
    fock_b_mo: np.ndarray
    # HF-flavored Fock pair on the SCF density (dA ingredients); None for UKS
    fock_a_hf_mo: np.ndarray | None
    fock_b_hf_mo: np.ndarray | None

    @property
    def nocc_a(self) -> int:
        return self.nc + self.no

    @property
    def nocc_b(self) -> int:
        return self.nc

    @property
    def nvir_a(self) -> int:
        return self.nv

    @property
    def nvir_b(self) -> int:
        return self.no + self.nv

    @property
    def nmo(self) -> int:
        return self.mo_a.shape[1]

    @property
    def hyb(self) -> float:
        return self.spec.hyb if self.spec is not None else 1.0

    @property
    def alpha(self) -> float:
        return self.spec.alpha if self.spec is not None else 1.0

    @property
    def omega(self) -> float:
        return self.spec.omega if self.spec is not None else 0.0

    @property
    def si(self) -> float:
        """Reference spin S (the open-shell count / 2)."""
        return 0.5 * self.no

    # -- convenience orbital slices (c|o|v ordering) -----------------------
    @property
    def orbo_a(self):
        return self.mo_a[:, : self.nocc_a]

    @property
    def orbv_a(self):
        return self.mo_a[:, self.nocc_a :]

    @property
    def orbo_b(self):
        return self.mo_b[:, : self.nocc_b]

    @property
    def orbv_b(self):
        return self.mo_b[:, self.nocc_b :]


def _cov_order(mo_occ: np.ndarray) -> np.ndarray:
    """Permutation putting orbitals in core|open|virtual order (each block
    kept in its original relative order)."""
    core = np.where(mo_occ >= 2)[0]
    open_ = np.where(mo_occ == 1)[0]
    virt = np.where(mo_occ == 0)[0]
    return np.concatenate([core, open_, virt])


def make_reference(mf: MeanField, jk: str = "auto",
                   fock_hf_mo=None) -> Reference:
    """jk: how the dA ingredient (HF-flavored Fock on the SCF density)
    is built for restricted-open references — 'host' contracts the
    host-dressed DF tensors / in-core ERIs (`env.get_j/get_k`; fine to
    ~200 AO), 'device' routes through the chip J/K engine in
    compensated refined mode (the only viable path at production sizes,
    where the host dressing is 1e16 flops).  'auto' picks 'device' for
    DF references above 300 AO on a non-CPU backend.

    fock_hf_mo: optional precomputed (fa_hf_mo, fb_hf_mo) pair in the
    c|o|v MO ordering (e.g. reloaded from a production state cache) —
    skips the J/K build entirely."""
    env = mf.env
    if mf.is_unrestricted:
        occ_a, occ_b = mf.mo_occ[0], mf.mo_occ[1]
        order_a = np.argsort(-occ_a, kind="stable")
        order_b = np.argsort(-occ_b, kind="stable")
        mo_a = mf.mo_coeff[0][:, order_a]
        mo_b = mf.mo_coeff[1][:, order_b]
        nc = int((occ_b > 0).sum())
        no = int((occ_a > 0).sum()) - nc
        nv = mo_a.shape[1] - nc - no
        restricted_open = False
        fa_hf_mo = fb_hf_mo = None
    else:
        occ = mf.mo_occ
        order = _cov_order(occ)
        mo_a = mo_b = mf.mo_coeff[:, order]
        nc = int((occ >= 2).sum())
        no = int((occ == 1).sum())
        nv = mo_a.shape[1] - nc - no
        restricted_open = mf.is_restricted_open
        fa_hf_mo = fb_hf_mo = None

    fock_a_mo = mo_a.T @ mf.fock_a @ mo_a
    fock_b_mo = mo_b.T @ mf.fock_b @ mo_b

    if restricted_open and fock_hf_mo is not None:
        fa_hf_mo, fb_hf_mo = fock_hf_mo
    elif restricted_open:
        if jk == "auto":
            from xtddft_tpu import config as _config

            jk = ("device" if (env.df and env.nao > 300
                               and _config.is_tpu()) else "host")
        if jk == "device":
            from xtddft_tpu.scf.jk_device import DeviceVeff

            Ca = np.asarray(mo_a[:, : nc + no], dtype=np.float64)
            Cb = np.asarray(mo_b[:, : nc], dtype=np.float64)
            # spec=None -> hyb=1: veff = J-K.  One veff call total, so
            # trade a little compute for HBM safety: packed-symmetric B
            # whenever the full f32 tensor is multi-GB (the full layout
            # OOM'd at 598 AO on the fragmented post-dressing arena even
            # with HBM nominally free, r4 log)
            b_half = env.aux_layout.nao * env.nao * env.nao * 4
            dev = DeviceVeff(env, None,
                             b_storage="packed" if b_half > 3e9 else "auto")
            va, vb, _ = dev.veff(Ca, Cb, mode="refined")
            del dev  # free the AO-basis device B before the response build
            h = np.asarray(env.hcore)
            fa_hf_mo = mo_a.T @ (h + va) @ mo_a
            fb_hf_mo = mo_b.T @ (h + vb) @ mo_b
        else:
            # HF-flavored veff on the converged (DFT) density
            import jax.numpy as jnp

            dm = mf.make_rdm1()
            da, db = jnp.asarray(dm[0]), jnp.asarray(dm[1])
            J = env.get_j(da + db)
            Ka = env.get_k(da)
            Kb = env.get_k(db)
            h = np.asarray(env.hcore)
            fa_hf = h + np.asarray(J - Ka)
            fb_hf = h + np.asarray(J - Kb)
            fa_hf_mo = mo_a.T @ fa_hf @ mo_a
            fb_hf_mo = mo_b.T @ fb_hf @ mo_b

    return Reference(
        mf=mf,
        env=env,
        spec=mf.xc,
        restricted_open=restricted_open,
        mo_a=mo_a,
        mo_b=mo_b,
        nc=nc,
        no=no,
        nv=nv,
        fock_a_mo=fock_a_mo,
        fock_b_mo=fock_b_mo,
        fock_a_hf_mo=fa_hf_mo,
        fock_b_hf_mo=fb_hf_mo,
    )
