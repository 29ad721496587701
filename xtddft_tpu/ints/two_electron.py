"""Two-electron repulsion integrals (4-center, 3-center, 2-center).

Replaces libcint's int2e / ao2mo paths.  All routines support an optional
``omega`` for erf(omega*r12)/r12 attenuated integrals (range-separated
hybrids): the attenuation only rescales the Hermite Coulomb argument,
alpha -> alpha*omega^2/(alpha+omega^2), with an overall sqrt factor.
"""

from __future__ import annotations

import numpy as np

from xtddft_tpu.ints import mcmurchie as md
from xtddft_tpu.ints.shell import BasisLayout, Shell, cart2sph, ncart, nsph
from xtddft_tpu.ints.mcmurchie import ShellPair, herm_index_map, herm_indices


def _herm_sign(L: int) -> np.ndarray:
    return np.array([(-1.0) ** sum(tuv) for tuv in herm_indices(L)])


def _comb_index(L1: int, L2: int) -> np.ndarray:
    """(nh1, nh2) int array mapping Hermite index pairs to the combined
    index in herm_indices(L1+L2)."""
    h1 = herm_indices(L1)
    h2 = herm_indices(L2)
    full = herm_index_map(L1 + L2)
    out = np.empty((len(h1), len(h2)), dtype=np.int64)
    for i, a in enumerate(h1):
        for j, b in enumerate(h2):
            out[i, j] = full[(a[0] + b[0], a[1] + b[1], a[2] + b[2])]
    return out


def _coulomb_R(L, alpha, PQ, omega):
    if omega is None or omega == 0:
        return md.hermite_coulomb(L, alpha, PQ)
    theta = omega * omega / (alpha + omega * omega)
    return md.hermite_coulomb(L, alpha * theta, PQ) * np.sqrt(theta)


def _quartet_cart(spb: ShellPair, spk: ShellPair, omega=None) -> np.ndarray:
    """Contracted Cartesian (ab|cd) block, shape (ncab, nccd)."""
    pb = spb.p  # (nb,)
    pk = spk.p  # (nk,)
    P = spb.P
    Q = spk.P
    nb, nk = pb.shape[0], pk.shape[0]
    pq = pb[:, None] * pk[None, :]
    psum = pb[:, None] + pk[None, :]
    alpha = (pq / psum).ravel()
    PQ = (P[:, None, :] - Q[None, :, :]).reshape(-1, 3)
    L = spb.L + spk.L
    R = _coulomb_R(L, alpha, PQ, omega)  # (nherm, nb*nk)
    pref = (2.0 * np.pi**2.5 / (pq * np.sqrt(psum))).ravel()
    R = R * pref[None, :]
    cidx = _comb_index(spb.L, spk.L)
    R4 = R[cidx].reshape(cidx.shape[0], cidx.shape[1], nb, nk)
    sign = _herm_sign(spk.L)
    Hk = spk.H * sign[None, :, None]
    # (ab| block: sum over bra hermite h, ket hermite k, prim pairs p,q
    return np.einsum("ahp,hkpq,bkq->ab", spb.H, R4, Hk, optimize=True)


def _sph4(block_cart, la, lb, lc, ld):
    Ca, Cb, Cc, Cd = cart2sph(la), cart2sph(lb), cart2sph(lc), cart2sph(ld)
    t = block_cart.reshape(ncart(la), ncart(lb), ncart(lc), ncart(ld))
    t = np.einsum("abcd,ai->ibcd", t, Ca)
    t = np.einsum("ibcd,bj->ijcd", t, Cb)
    t = np.einsum("ijcd,ck->ijkd", t, Cc)
    t = np.einsum("ijkd,dl->ijkl", t, Cd)
    return t


def eri_full(layout: BasisLayout, omega=None) -> np.ndarray:
    """Full (nao,nao,nao,nao) spherical ERI tensor, chemists' notation (ij|kl).

    Dispatches to the native engine (xtddft_native) when built; the Python
    path below is the reference implementation and handles the
    range-separated (omega) kernel."""
    from xtddft_tpu.ints import native

    if native.available():
        return native.eri_full_native(layout, omega=omega or 0.0)
    shells = layout.shells
    nsh = len(shells)
    nao = layout.nao
    # precompute shell pairs for i>=j
    pairs = {}
    for i in range(nsh):
        for j in range(i + 1):
            pairs[(i, j)] = md.make_shell_pair(shells[i], shells[j])
    out = np.zeros((nao, nao, nao, nao))

    def put(t, i, j, k, l):
        si = slice(shells[i].ao_offset, shells[i].ao_offset + shells[i].nao)
        sj = slice(shells[j].ao_offset, shells[j].ao_offset + shells[j].nao)
        sk = slice(shells[k].ao_offset, shells[k].ao_offset + shells[k].nao)
        sl = slice(shells[l].ao_offset, shells[l].ao_offset + shells[l].nao)
        out[si, sj, sk, sl] = t

    plist = sorted(pairs)
    for a, (i, j) in enumerate(plist):
        for (k, l) in plist[: a + 1]:
            t = _quartet_cart(pairs[(i, j)], pairs[(k, l)], omega=omega)
            t = _sph4(t, shells[i].l, shells[j].l, shells[k].l, shells[l].l)
            put(t, i, j, k, l)
            put(t.transpose(1, 0, 2, 3), j, i, k, l)
            put(t.transpose(0, 1, 3, 2), i, j, l, k)
            put(t.transpose(1, 0, 3, 2), j, i, l, k)
            put(t.transpose(2, 3, 0, 1), k, l, i, j)
            put(t.transpose(3, 2, 0, 1), l, k, i, j)
            put(t.transpose(2, 3, 1, 0), k, l, j, i)
            put(t.transpose(3, 2, 1, 0), l, k, j, i)
    return out


def _aux_pair(sh: Shell) -> ShellPair:
    """Hermite representation of a single shell paired with unity (for
    3-center/2-center integrals)."""
    a = sh.exps
    cc = sh.coefs
    E = [
        md.e_coeffs_1d(sh.l, 0, a, np.zeros_like(a), 0.0)
        for _ in range(3)
    ]
    from xtddft_tpu.ints.shell import cart_components

    comps = cart_components(sh.l)
    hidx = herm_indices(sh.l)
    H = np.zeros((len(comps), len(hidx), a.shape[0]))
    for ci, (ix, iy, iz) in enumerate(comps):
        for h, (t, u, v) in enumerate(hidx):
            if t > ix or u > iy or v > iz:
                continue
            H[ci, h] = E[0][ix, 0, t] * E[1][iy, 0, u] * E[2][iz, 0, v]
    H = H * cc[None, None, :]
    P = np.broadcast_to(sh.center, (a.shape[0], 3)).copy()
    return ShellPair(la=sh.l, lb=0, H=H, p=a.copy(), P=P, cc=cc, A=sh.center, B=sh.center)


def eri_3c(layout: BasisLayout, aux: BasisLayout, omega=None) -> np.ndarray:
    """(P|mu nu) three-center integrals, shape (naux, nao, nao)."""
    from xtddft_tpu.ints import native

    if native.available():
        return native.eri_3c_native(layout, aux, omega=omega or 0.0)
    shells = layout.shells
    nsh = len(shells)
    out = np.zeros((aux.nao, layout.nao, layout.nao))
    aux_pairs = [_aux_pair(sh) for sh in aux.shells]
    for i in range(nsh):
        for j in range(i + 1):
            spb = md.make_shell_pair(shells[i], shells[j])
            for ksh, spk in zip(aux.shells, aux_pairs):
                t = _quartet_cart(spk, spb, omega=omega)
                # (P 1 | a b): reshape (ncP*1, nca*ncb)
                Cp = cart2sph(ksh.l)
                Ca = cart2sph(shells[i].l)
                Cb = cart2sph(shells[j].l)
                t = t.reshape(ncart(ksh.l), ncart(shells[i].l), ncart(shells[j].l))
                t = np.einsum("pab,px,ai,bj->xij", t, Cp, Ca, Cb, optimize=True)
                sp = slice(ksh.ao_offset, ksh.ao_offset + ksh.nao)
                si = slice(shells[i].ao_offset, shells[i].ao_offset + shells[i].nao)
                sj = slice(shells[j].ao_offset, shells[j].ao_offset + shells[j].nao)
                out[sp, si, sj] = t
                if i != j:
                    out[sp, sj, si] = np.transpose(t, (0, 2, 1))
    return out


def eri_2c(aux: BasisLayout, omega=None) -> np.ndarray:
    """(P|Q) two-center Coulomb metric, shape (naux, naux)."""
    from xtddft_tpu.ints import native

    if native.available():
        return native.eri_2c_native(aux, omega=omega or 0.0)
    out = np.zeros((aux.nao, aux.nao))
    aux_pairs = [_aux_pair(sh) for sh in aux.shells]
    for i, (shi, spi) in enumerate(zip(aux.shells, aux_pairs)):
        for j in range(i + 1):
            shj = aux.shells[j]
            t = _quartet_cart(spi, aux_pairs[j], omega=omega)
            Ci = cart2sph(shi.l)
            Cj = cart2sph(shj.l)
            t = t.reshape(ncart(shi.l), ncart(shj.l))
            t = Ci.T @ t @ Cj
            si = slice(shi.ao_offset, shi.ao_offset + shi.nao)
            sj = slice(shj.ao_offset, shj.ao_offset + shj.nao)
            out[si, sj] = t
            if i != j:
                out[sj, si] = t.T
    return out
