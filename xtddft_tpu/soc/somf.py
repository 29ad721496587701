"""SO-DKH1 spin-orbit mean-field (SOMF) Vso builder.

Re-derivation of `x2c_hamiltonian/sfX2C_soDKH1.py:692-852`
(`get_soDKH1_somf`): the 3-component AO spin-orbit matrix

    Vso = (alpha^2/4) * (hso1e + fso2e)

with hso1e from the one-electron Wso integrals picture-changed by X/R+,
and fso2e from the mean-field contraction of the derivative-ERI tensor K
with the spin-averaged large/small densities (Mol. Phys. 111, 3741,
Eqs. 34-53).  iop='x2c' uses the sfX2C decoupling; iop='bp' is the
Breit-Pauli limit (X=R+=1).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from xtddft_tpu import units
from xtddft_tpu.ints import soc_ints
from xtddft_tpu.ints.one_electron import kinetic, nuclear_attraction, overlap
from xtddft_tpu.ints.shell import BasisLayout, build_layout
from xtddft_tpu.soc import x2c as x2c_mod


def nuclear_deriv2(layout: BasisLayout):
    """One pass over atoms giving both the spin-free W (pnucp) and the
    spin-orbit Wso vector (shares the per-atom <d_i mu|1/r_A|d_j nu>)."""
    mol = layout.mol
    nao = layout.nao
    w_sf = np.zeros((nao, nao))
    w_so = np.zeros((3, nao, nao))
    for Z, C in zip(mol.charges, mol.coords):
        W = soc_ints.rinv_deriv2(layout, C)
        w_sf -= Z * (W[0, 0] + W[1, 1] + W[2, 2])
        w_so -= Z * np.einsum("lmn,mnpq->lpq", soc_ints._EPS, W)
    return w_sf, w_so


def fso2e_contract(kint, x, rp, pLL, pLS, pSS):
    """Mean-field 2e SO contraction (`sfX2C_soDKH1.py:257-292`, Eq. 42):
    fso2e = R+^T [GsoLL + GsoLS X + X^T(-GsoLS^T) + X^T GsoSS X] R+."""
    nb = x.shape[0]
    out = np.zeros((3, nb, nb))
    for ic in range(3):
        k = kint[ic]
        gsoLL = -2.0 * np.einsum("lmkn,lk->mn", k, pSS)
        gsoLS = -np.einsum("mlkn,lk->mn", k, pLS)
        gsoLS -= np.einsum("lmkn,lk->mn", k, pLS)
        gsoSS = -2.0 * np.einsum("mnkl,lk->mn", k, pLL)
        gsoSS -= 2.0 * np.einsum("mnlk,lk->mn", k, pLL)
        gsoSS += 2.0 * np.einsum("mlnk,lk->mn", k, pLL)
        f = gsoLL + gsoLS @ x + x.T @ (-gsoLS.T) + x.T @ (gsoSS @ x)
        out[ic] = rp.T @ f @ rp
    return out


def fso2e_direct(layout, x, rp, pLL, pLS, pSS, use_1c: bool = True):
    """Streaming fso2e: identical result to
    ``fso2e_contract(soc_ints.kint(...), ...)`` but the Gso matrices are
    accumulated per shell-quartet block from `soc_ints.kint_blocks` —
    peak memory O(nao^2) instead of the 3*nao^4 tensor.  This is the
    TPU-native analog of the reference's 'direct'/'block-par' impls
    (`sfX2C_soDKH1.py:65-141`, chosen there by a psutil memory probe)."""
    from xtddft_tpu.ints import soc_ints

    nb = x.shape[0]
    gsoLL = np.zeros((3, nb, nb))
    gsoLS = np.zeros((3, nb, nb))
    gsoSS = np.zeros((3, nb, nb))
    for sa, sb, sc, sd, t in soc_ints.kint_blocks(layout, use_1c=use_1c):
        # index order of t is K_l[a, b, c, d]; each term below maps the
        # einsum strings of fso2e_contract onto the block slices
        gsoLL[:, sb, sd] += -2.0 * np.einsum(
            "labcd,ac->lbd", t, pSS[sa, sc])           # "lmkn,lk->mn"
        gsoLS[:, sa, sd] += -np.einsum(
            "labcd,bc->lad", t, pLS[sb, sc])           # "mlkn,lk->mn"
        gsoLS[:, sb, sd] += -np.einsum(
            "labcd,ac->lbd", t, pLS[sa, sc])           # "lmkn,lk->mn"
        gsoSS[:, sa, sb] += -2.0 * np.einsum(
            "labcd,dc->lab", t, pLL[sd, sc])           # "mnkl,lk->mn"
        gsoSS[:, sa, sb] += -2.0 * np.einsum(
            "labcd,cd->lab", t, pLL[sc, sd])           # "mnlk,lk->mn"
        gsoSS[:, sa, sc] += 2.0 * np.einsum(
            "labcd,bd->lac", t, pLL[sb, sd])           # "mlnk,lk->mn"
    out = np.zeros((3, nb, nb))
    for ic in range(3):
        f = (gsoLL[ic] + gsoLS[ic] @ x + x.T @ (-gsoLS[ic].T)
             + x.T @ (gsoSS[ic] @ x))
        out[ic] = rp.T @ f @ rp
    return out


def _available_memory_bytes() -> int | None:
    try:
        return os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (AttributeError, OSError, ValueError):
        return None


def resolve_mf2e_impl(nao: int, impl: str = "auto") -> str:
    """'full' (materialize the 3*nao^4 K tensor; fastest contraction) or
    'direct' (streaming, O(nao^2) accumulators) — chosen by a memory
    probe when 'auto', mirroring `sfX2C_soDKH1.py:119-141`."""
    if impl != "auto":
        if impl not in ("full", "direct"):
            raise ValueError(f"mf2e_impl={impl!r} not in "
                             "('auto', 'full', 'direct')")
        return impl
    need = 3 * nao**4 * 8 * 1.25  # K tensor + contraction temporaries
    avail = _available_memory_bytes()
    if avail is None or need < 0.5 * avail:
        return "full"
    return "direct"


@dataclasses.dataclass
class VsoResult:
    vso: np.ndarray  # (3, nao, nao) in the contracted AO basis
    hso1e: np.ndarray  # uncontracted-basis pieces (for diagnostics)
    fso2e: np.ndarray | None
    x: np.ndarray
    rp: np.ndarray


def build_vso(mf, iop: str = "x2c", include_mf2e: bool = True,
              use_1c: bool = True, c: float = units.C_AU,
              mf2e_impl: str = "auto") -> VsoResult:
    """AO-basis SOMF spin-orbit matrix Vso (3, nao, nao), antisymmetric per
    component.  ``mf`` is a converged MeanField (any flavor).

    mf2e_impl: 'auto' picks 'full' vs 'direct' (streaming) by a memory
    probe against the 3*nao^4 K-tensor footprint (`resolve_mf2e_impl`)."""
    env = mf.env
    layout = env.layout
    unc, contr = x2c_mod.uncontract(layout)
    w_sf, w_so = nuclear_deriv2(unc)
    if iop == "x2c":
        t = kinetic(unc)
        v = nuclear_attraction(unc)
        s = overlap(unc)
        x, rp, _ = x2c_mod.sfx2c1e(t, v, w_sf, s, c)
    elif iop == "bp":
        x = np.eye(unc.nao)
        rp = np.eye(unc.nao)
    else:
        raise ValueError(f"iop={iop!r} not in ('x2c', 'bp')")

    dm = mf.make_rdm1()
    dm = np.asarray(dm)
    if dm.ndim == 3:
        dm = 0.5 * (dm[0] + dm[1])
    else:
        dm = 0.5 * dm
    dm_unc = contr @ dm @ contr.T
    pLL, pLS, pSS = x2c_mod.get_p(dm_unc, x, rp)

    a4 = 0.25 / c**2
    hso1e = np.stack([rp.T @ x.T @ w_so[ic] @ x @ rp for ic in range(3)])
    vso = a4 * hso1e.copy()
    fso2e = None
    if include_mf2e:
        if resolve_mf2e_impl(unc.nao, mf2e_impl) == "full":
            kint = soc_ints.kint(unc, use_1c=use_1c)
            fso2e = fso2e_contract(kint, x, rp, pLL, pLS, pSS)
        else:
            fso2e = fso2e_direct(unc, x, rp, pLL, pLS, pSS, use_1c=use_1c)
        vso += a4 * fso2e
    vso_contr = np.stack([contr.T @ vso[ic] @ contr for ic in range(3)])
    return VsoResult(vso=vso_contr, hso1e=hso1e, fso2e=fso2e, x=x, rp=rp)
