"""Spin-orbit / X2C derivative integrals.

Provides the integrals the reference pulls from libcint for its
relativistic layer (`/root/reference/x2c_hamiltonian/sfX2C_soDKH1.py`):

- ``rinv_deriv2``  <d_i mu | 1/r_C | d_j nu>            (cint1e_iprinvip-like)
- ``pnucp``        p.Vnuc.p spin-free W                  (int1e_pnucp, :761)
- ``wso``          eps_lmn <d_m mu| Vnuc |d_n nu>        (cint1e_prinvxp, :202-216)
- ``kint``         eps_lij (d_i mu nu | d_j ka la)       (int2e_ip1ip2, :218-243)

All computed with the in-house McMurchie-Davidson derivative shell pairs
(`ints/mcmurchie.py: make_shell_pair_deriv`).
"""

from __future__ import annotations

import numpy as np

from xtddft_tpu.ints import mcmurchie as md
from xtddft_tpu.ints.shell import BasisLayout, Shell, cart2sph, ncart
from xtddft_tpu.ints.two_electron import _quartet_cart, _sph4

_EPS = np.zeros((3, 3, 3))
for _x, _y, _z in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
    _EPS[_x, _y, _z] = 1.0
    _EPS[_x, _z, _y] = -1.0


def _sph_block(mat_cart: np.ndarray, la: int, lb: int) -> np.ndarray:
    Ca = cart2sph(la)
    Cb = cart2sph(lb)
    return Ca.T @ mat_cart.reshape(Ca.shape[0], Cb.shape[0]) @ Cb


def rinv_deriv2(layout: BasisLayout, center) -> np.ndarray:
    """(3, 3, nao, nao) tensor <d_i mu | 1/|r-C| | d_j nu> (positive kernel)."""
    C = np.asarray(center, dtype=np.float64)
    nao = layout.nao
    out = np.zeros((3, 3, nao, nao))
    shells = layout.shells
    for sha in shells:
        for shb in shells:
            sa = slice(sha.ao_offset, sha.ao_offset + sha.nao)
            sb = slice(shb.ao_offset, shb.ao_offset + shb.nao)
            for i in range(3):
                for j in range(3):
                    sp = md.make_shell_pair_deriv(sha, shb, d_bra=i, d_ket=j)
                    PC = sp.P - C[None, :]
                    R = md.hermite_coulomb(sp.L, sp.p, PC)
                    pref = 2.0 * np.pi / sp.p
                    blk = np.einsum("chp,hp,p->c", sp.H, R, pref)
                    out[i, j, sa, sb] = _sph_block(blk, sha.l, shb.l)
    return out


def pnucp(layout: BasisLayout) -> np.ndarray:
    """Spin-free W = p . Vnuc . p = sum_d <d_d mu| Vnuc |d_d nu>
    (Vnuc = -sum_A Z_A / r_A); symmetric (int1e_pnucp)."""
    mol = layout.mol
    nao = layout.nao
    w = np.zeros((nao, nao))
    for Z, C in zip(mol.charges, mol.coords):
        W = rinv_deriv2(layout, C)
        w -= Z * (W[0, 0] + W[1, 1] + W[2, 2])
    return w


def wso(layout: BasisLayout) -> np.ndarray:
    """One-electron spin-orbit vector integrals
    Wso_l = eps_{lmn} <d_m mu| Vnuc |d_n nu>  (antisymmetric per component).

    Matches the reference's `get_wso` = -sum_A Z_A * cint1e_prinvxp
    (`sfX2C_soDKH1.py:202-216`)."""
    mol = layout.mol
    nao = layout.nao
    out = np.zeros((3, nao, nao))
    for Z, C in zip(mol.charges, mol.coords):
        W = rinv_deriv2(layout, C)
        # Vnuc contribution of this center = -Z/r
        out -= Z * np.einsum("lmn,mnpq->lpq", _EPS, W)
    return out


def _deriv_pair_stack(sha: Shell, shb: Shell):
    """Stacked Hermite coefficients of the three bra-derivative pairs of a
    shell pair: H (3, ncab, nherm(L+1), npair) + shared (p, P)."""
    sps = [md.make_shell_pair_deriv(sha, shb, d_bra=d) for d in range(3)]
    H = np.stack([sp.H for sp in sps])
    return H, sps[0].p, sps[0].P, sps[0].L


def kint_blocks(layout: BasisLayout, use_1c: bool = False):
    """Generator over spherical shell-quartet blocks of the SO 2e tensor.

    Yields ``(sl_a, sl_b, sl_c, sl_d, t)`` with ``t`` of shape
    (3, nA, nB, nC, nD) = K_l[A, B, C, D].  Each unordered
    (bra-pair, ket-pair) combination is yielded once; the quartet-swap
    mirror K[cd,ab] = -K[ab,cd] is yielded as a second explicit block so
    consumers accumulate single-path.  This is the memory-adaptive core:
    the streaming fso2e contraction (`soc/somf.py:fso2e_direct`) never
    materializes the 3*nao^4 tensor (the reference's 'direct'/'block-par'
    impls, `sfX2C_soDKH1.py:65-141`)."""
    from xtddft_tpu.ints.two_electron import _comb_index, _herm_sign

    shells = layout.shells
    nsh = len(shells)

    def sl(sh: Shell):
        return slice(sh.ao_offset, sh.ao_offset + sh.nao)

    # stacked derivative pairs per ordered shell pair
    stacks = {}

    def stack(i, j):
        if (i, j) not in stacks:
            stacks[(i, j)] = _deriv_pair_stack(shells[i], shells[j])
        return stacks[(i, j)]

    pair_list = [
        (i, j)
        for i in range(nsh)
        for j in range(nsh)
        if not use_1c or shells[i].atom_index == shells[j].atom_index
    ]
    for ip, (ib, jb) in enumerate(pair_list):
        Hb, pb, Pb, Lb = stack(ib, jb)
        for (kb, lb_) in pair_list[: ip + 1]:
            if use_1c and shells[ib].atom_index != shells[kb].atom_index:
                continue
            Hk, pk, Pk, Lk = stack(kb, lb_)
            nbp, nkp = pb.shape[0], pk.shape[0]
            pq = pb[:, None] * pk[None, :]
            psum = pb[:, None] + pk[None, :]
            alpha = (pq / psum).ravel()
            PQ = (Pb[:, None, :] - Pk[None, :, :]).reshape(-1, 3)
            R = md.hermite_coulomb(Lb + Lk, alpha, PQ)
            R = R * (2.0 * np.pi**2.5 / (pq * np.sqrt(psum))).ravel()[None, :]
            cidx = _comb_index(Lb, Lk)
            R4 = R[cidx].reshape(cidx.shape[0], cidx.shape[1], nbp, nkp)
            sign = _herm_sign(Lk)
            Hks = Hk * sign[None, None, :, None]
            # all 9 derivative combos in one contraction
            blocks = np.einsum(
                "dahp,hkpq,ebkq->deab", Hb, R4, Hks, optimize=True
            )
            so = np.einsum("lde,deab->lab", _EPS, blocks)
            la_, lb2 = shells[ib].l, shells[jb].l
            lc_, ld_ = shells[kb].l, shells[lb_].l
            t = np.stack([
                _sph4(so[l_].reshape(-1), la_, lb2, lc_, ld_)
                for l_ in range(3)
            ])
            yield (sl(shells[ib]), sl(shells[jb]), sl(shells[kb]),
                   sl(shells[lb_]), t)
            if (kb, lb_) != (ib, jb):
                # K[ab,cd] = -K[cd,ab]
                yield (sl(shells[kb]), sl(shells[lb_]), sl(shells[ib]),
                       sl(shells[jb]), -np.transpose(t, (0, 3, 4, 1, 2)))


def kint(layout: BasisLayout, use_1c: bool = False) -> np.ndarray:
    """SO two-electron tensor K_l[mu,nu,ka,la] = eps_{lij}
    (d_i mu nu | d_j ka la), chemists' notation (`sfX2C_soDKH1.py:218-243`).

    The Hermite-Coulomb R tensor is built once per (bra-pair, ket-pair) and
    shared across all nine derivative combinations; the quartet-swap
    antisymmetry K[mu nu ka la] = -K[ka la mu nu] halves the pair loop.
    With ``use_1c`` only AO quartets whose four shells share one atom are
    evaluated (the one-center approximation, `get_fso2e_1c`:294)."""
    nao = layout.nao
    out = np.zeros((3, nao, nao, nao, nao))
    for sa, sb, sc, sd, t in kint_blocks(layout, use_1c=use_1c):
        out[:, sa, sb, sc, sd] = t
    return out
