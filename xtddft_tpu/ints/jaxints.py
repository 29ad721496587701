"""Differentiable Gaussian integrals (JAX McMurchie-Davidson).

The host engine (`ints/mcmurchie.py`, C++ twin `xtddft_native/md_eri.cpp`)
computes integrals at fixed geometry.  This module re-expresses S, T, V
and the full ERI tensor as **pure JAX functions of the atomic
coordinates**, so nuclear derivatives of any energy expression come from
``jax.grad`` instead of hand-coded derivative-integral ladders — the
TPU-native replacement for the reference's libcint `int1e_ip*` /
`int2e_ip1ip2`-based gradient modules (`/root/reference/grad_jp/grad/
xtdhf.py:15-433`, SURVEY.md §2.6).

Scope: small/medium molecules (the gradient validation targets); the
shell structure (angular momenta, exponents, contractions) is static —
only the centers are traced.  Work is vectorized over shell pairs of the
same (la, lb, nprim_a, nprim_b) class, mirroring the host engine's
batching.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xtddft_tpu.ints.mcmurchie import herm_indices
from xtddft_tpu.ints.shell import BasisLayout, cart2sph, cart_components, ncart

__all__ = ["make_integral_fn"]


# -- Boys function (differentiable) -----------------------------------------

_DF_ODD = [1.0]  # (2m-1)!! for m = 0, 1, ...
for _m in range(1, 40):
    _DF_ODD.append(_DF_ODD[-1] * (2 * _m - 1))


def boys_jax(mmax: int, x: jnp.ndarray) -> jnp.ndarray:
    """F_m(x) for m = 0..mmax, shape (mmax+1,) + x.shape.

    Main branch: F_m(x) = Gamma(a) P(a, x) / (2 x^a), a = m + 1/2, via the
    differentiable ``jax.scipy.special.gammainc`` (same closed form as the
    host engine, `ints/mcmurchie.py: boys`).  Small-x branch (x <= 0.35):
    20-term positive series (x^a underflow guard).  Both branches are
    smooth, so the `where` switch is differentiable.
    """
    from jax.scipy.special import gammainc, gammaln

    x = jnp.asarray(x)
    a = mmax + 0.5
    xl = jnp.maximum(x, 0.35)
    f_big = jnp.exp(gammaln(a)) * gammainc(a, xl) / (2.0 * xl ** a)

    xs = jnp.minimum(x, 0.35)
    m = mmax
    term = jnp.full_like(xs, 1.0 / (2 * m + 1))
    acc = term
    for k in range(20):
        term = term * (2.0 * xs) / (2 * m + 2 * k + 3)
        acc = acc + term
    f_series = jnp.exp(-xs) * acc

    fm = jnp.where(x > 0.35, f_big, f_series)

    out = [None] * (mmax + 1)
    out[mmax] = fm
    if mmax > 0:
        ex = jnp.exp(-x)
        for mm in range(mmax, 0, -1):
            fm = (2.0 * x * fm + ex) / (2 * mm - 1)
            out[mm - 1] = fm
    return jnp.stack(out)


# -- Hermite expansion coefficients ------------------------------------------


def _e_coeffs(la: int, lb: int, a, b, AB):
    """E[i][j][t] per dimension; each entry has the broadcast shape of
    a/b/AB (pairs x primpairs).  Same recursion as the host engine
    (`ints/mcmurchie.py: e_coeffs_1d`) in traced jnp."""
    p = a + b
    mu = a * b / p
    XPA = -b / p * AB
    XPB = a / p * AB
    inv2p = 0.5 / p
    E = [[[None] * (la + lb + 1) for _ in range(lb + 1)] for _ in range(la + 1)]

    def get(i, j, t):
        if t < 0 or t > i + j:
            return 0.0
        v = E[i][j][t]
        return 0.0 if v is None else v

    E[0][0][0] = jnp.exp(-mu * AB * AB)
    for i in range(1, la + 1):
        for t in range(i + 1):
            val = XPA * get(i - 1, 0, t)
            if t > 0:
                val = val + inv2p * get(i - 1, 0, t - 1)
            if t + 1 <= i - 1:
                val = val + (t + 1) * get(i - 1, 0, t + 1)
            E[i][0][t] = val
    for j in range(1, lb + 1):
        for i in range(la + 1):
            for t in range(i + j + 1):
                val = XPB * get(i, j - 1, t)
                if t > 0:
                    val = val + inv2p * get(i, j - 1, t - 1)
                if t + 1 <= i + j - 1:
                    val = val + (t + 1) * get(i, j - 1, t + 1)
                E[i][j][t] = val
    return E


def _hermite_coulomb(L: int, alpha, PQ, omega: float = 0.0):
    """R_{tuv}(alpha, PQ) for all t+u+v <= L; returns dict[(t,u,v)] ->
    array of PQ[...,0].shape.  Standard downward-in-n recursion.

    omega > 0 attenuates the kernel to erf(omega r)/r (long-range RSH
    operator): F_m -> s^{m+1/2} F_m(s T) with s = w^2/(w^2 + alpha)
    (same closed form as the host engine's attenuated path)."""
    T = alpha * jnp.sum(PQ * PQ, axis=-1)
    if omega and omega > 0.0:
        s = omega * omega / (omega * omega + alpha)
        F = boys_jax(L, s * T)
        F = jnp.stack([s ** (n + 0.5) * F[n] for n in range(L + 1)])
    else:
        F = boys_jax(L, T)
    X, Y, Z = PQ[..., 0], PQ[..., 1], PQ[..., 2]
    # R[(t,u,v)][n]
    R = {(0, 0, 0): [((-2.0 * alpha) ** n) * F[n] for n in range(L + 1)]}
    for deg in range(1, L + 1):
        for t in range(deg, -1, -1):
            for u in range(deg - t, -1, -1):
                v = deg - t - u
                vals = []
                for n in range(L - deg + 1):
                    if t > 0:
                        r = X * R[(t - 1, u, v)][n + 1]
                        if t > 1:
                            r = r + (t - 1) * R[(t - 2, u, v)][n + 1]
                    elif u > 0:
                        r = Y * R[(t, u - 1, v)][n + 1]
                        if u > 1:
                            r = r + (u - 1) * R[(t, u - 2, v)][n + 1]
                    else:
                        r = Z * R[(t, u, v - 1)][n + 1]
                        if v > 1:
                            r = r + (v - 1) * R[(t, u, v - 2)][n + 1]
                    vals.append(r)
                R[(t, u, v)] = vals
    return {k: v[0] for k, v in R.items()}


# -- shell-pair classes -------------------------------------------------------


class _PairClass:
    """Static data for all ordered shell pairs with identical (la, lb).

    Pairs with fewer primitive products than the class maximum are padded
    with (exp=1, coef=0) entries — zero contraction weight makes every
    padded contribution exactly zero while keeping all shapes uniform (a
    traced-code requirement)."""

    def __init__(self, la, lb):
        self.la, self.lb = la, lb
        self.exps_a, self.exps_b, self.cc = [], [], []
        self.ia, self.ib = [], []
        self.ao_a, self.ao_b = [], []

    def add(self, sha, shb, ab2=0.0, prim_eps=0.0):
        ea = np.repeat(sha.exps, len(shb.exps))
        eb = np.tile(shb.exps, len(sha.exps))
        cc = np.repeat(sha.coefs, len(shb.coefs)) * np.tile(
            shb.coefs, len(sha.coefs)
        )
        if prim_eps > 0.0:
            # primitive-pair overlap screening at the reference geometry
            # (the host engine's bound, `xtddft_native/md_eri.cpp`):
            # |cc| (pi/p)^{3/2} exp(-ab/p |AB|^2) < eps contributes below
            # the f64 test gates; the screening PATTERN is frozen at the
            # build geometry, which is exact for gradients evaluated
            # there (this module's scope) and conservative nearby.
            p = ea + eb
            est = np.abs(cc) * (np.pi / p) ** 1.5 * np.exp(-ea * eb / p * ab2)
            keep = est >= prim_eps
            if not keep.any():
                keep[np.argmax(est)] = True  # keep shapes nonempty
            ea, eb, cc = ea[keep], eb[keep], cc[keep]
        self.exps_a.append(ea)
        self.exps_b.append(eb)
        self.cc.append(cc)
        self.ia.append(sha.atom_index)
        self.ib.append(shb.atom_index)
        self.ao_a.append(sha.ao_offset)
        self.ao_b.append(shb.ao_offset)

    def finalize(self):
        npp = max(len(e) for e in self.exps_a)

        def pad(arrs, fill):
            return np.asarray(
                [np.concatenate([a, np.full(npp - len(a), fill)]) for a in arrs]
            )

        self.exps_a = pad(self.exps_a, 1.0)  # (npair, npp)
        self.exps_b = pad(self.exps_b, 1.0)
        self.cc = pad(self.cc, 0.0)
        # pad the pair axis to a power of 2 (zero-coefficient rows on
        # atom 0): classes of equal (la, lb, npp, npair-bucket) then hit
        # the SAME jit executable in the block_jit ERI path
        np_bkt = 1
        while np_bkt < len(self.ia):
            np_bkt *= 2
        extra = np_bkt - len(self.ia)
        if extra:
            self.exps_a = np.concatenate(
                [self.exps_a, np.ones((extra, npp))])
            self.exps_b = np.concatenate(
                [self.exps_b, np.ones((extra, npp))])
            self.cc = np.concatenate([self.cc, np.zeros((extra, npp))])
            self.ia = self.ia + [0] * extra
            self.ib = self.ib + [0] * extra
            self.ao_a = self.ao_a + [0] * extra
            self.ao_b = self.ao_b + [0] * extra
        self.ia = np.asarray(self.ia)
        self.ib = np.asarray(self.ib)
        nsa, nsb = 2 * self.la + 1, 2 * self.lb + 1
        self.idx_a = np.asarray(self.ao_a)[:, None] + np.arange(nsa)[None, :]
        self.idx_b = np.asarray(self.ao_b)[:, None] + np.arange(nsb)[None, :]
        return self


def _npp_bucket(n: int) -> int:
    """Next power of 4 >= n: pairs are grouped by primitive-product
    count so a 1-primitive pair never pads to a 9x9-primitive class
    (cc-pVDZ 1s contractions would force npp=81 onto every s pair,
    inflating the ss x ss ERI grid ~80x; padding waste is bounded at
    4x per bucket)."""
    b = 1
    while b < n:
        b *= 4
    return b


def _pair_classes(layout: BasisLayout, prim_eps: float = 1e-14):
    coords = np.asarray(layout.mol.coords, dtype=np.float64)
    pre = {}
    for sha in layout.shells:
        for shb in layout.shells:
            ab2 = float(np.sum((coords[sha.atom_index]
                                - coords[shb.atom_index]) ** 2))
            ea = np.repeat(sha.exps, len(shb.exps))
            eb = np.tile(shb.exps, len(sha.exps))
            cc = np.abs(np.repeat(sha.coefs, len(shb.coefs))
                        * np.tile(shb.coefs, len(sha.coefs)))
            p = ea + eb
            est = cc * (np.pi / p) ** 1.5 * np.exp(-ea * eb / p * ab2)
            nkeep = max(1, int((est >= prim_eps).sum())) if prim_eps > 0 \
                else len(ea)
            pre[(sha.ao_offset, shb.ao_offset)] = (ab2, nkeep)
    classes: dict = {}
    for sha in layout.shells:
        for shb in layout.shells:
            ab2, nkeep = pre[(sha.ao_offset, shb.ao_offset)]
            key = (sha.l, shb.l, _npp_bucket(nkeep))
            classes.setdefault(key, _PairClass(key[0], key[1])).add(
                sha, shb, ab2=ab2, prim_eps=prim_eps)
    return [c.finalize() for c in classes.values()]


class _PairData:
    """Duck-typed stand-in for _PairClass whose array leaves are traced
    jit arguments (only la/lb stay static) — lets one jitted ERI-block
    executable serve every class pair with the same l-signature and
    shapes (see make_integral_fn block_jit)."""

    __slots__ = ("la", "lb", "exps_a", "exps_b", "cc", "ia", "ib")

    def __init__(self, la, lb, exps_a, exps_b, cc, ia, ib):
        self.la, self.lb = la, lb
        self.exps_a, self.exps_b, self.cc = exps_a, exps_b, cc
        self.ia, self.ib = ia, ib


def _pair_geometry(pc: _PairClass, coords):
    A = coords[pc.ia]  # (npair, 3)
    B = coords[pc.ib]
    a = jnp.asarray(pc.exps_a)
    b = jnp.asarray(pc.exps_b)
    p = a + b
    P = (a[..., None] * A[:, None, :] + b[..., None] * B[:, None, :]) / p[..., None]
    AB = A - B  # (npair, 3)
    return a, b, p, P, AB


def _pair_hermite(pc: _PairClass, a, b, AB, ldelta=0):
    """H[(ca,cb)][(t,u,v)] -> (npair, npp) Hermite coefficients including
    contraction weights; plus the per-dimension E tables."""
    la, lb = pc.la, pc.lb
    Ex = _e_coeffs(la + ldelta, lb + ldelta, a, b, AB[:, 0:1])
    Ey = _e_coeffs(la + ldelta, lb + ldelta, a, b, AB[:, 1:2])
    Ez = _e_coeffs(la + ldelta, lb + ldelta, a, b, AB[:, 2:3])
    return Ex, Ey, Ez


def _cart_to_sph_pair(pc, M):
    """M: (npair, ncart_a, ncart_b) -> (npair, nsph_a, nsph_b)."""
    ca = jnp.asarray(cart2sph(pc.la))
    cb = jnp.asarray(cart2sph(pc.lb))
    return jnp.einsum("ncd,cm,dk->nmk", M, ca, cb)


def _scatter2(full, pc, blk):
    ia = pc.idx_a[:, :, None]
    ib = pc.idx_b[:, None, :]
    return full.at[ia, ib].add(blk)


# -- one-electron integrals ---------------------------------------------------


def _overlap_kinetic(pc: _PairClass, coords):
    a, b, p, P, AB = _pair_geometry(pc, coords)
    Ex, Ey, Ez = _pair_hermite(pc, a, b, AB, ldelta=2)
    cc = jnp.asarray(pc.cc)
    pref = (jnp.pi / p) ** 1.5 * cc  # (npair, npp)

    def s1(E, i, j):
        return E[i][j][0] if j >= 0 else 0.0

    comps_a = cart_components(pc.la)
    comps_b = cart_components(pc.lb)
    S_rows, T_rows = [], []
    for (ix, iy, iz) in comps_a:
        S_row, T_row = [], []
        for (jx, jy, jz) in comps_b:
            sx, sy, sz = s1(Ex, ix, jx), s1(Ey, iy, jy), s1(Ez, iz, jz)
            S_row.append(jnp.sum(pref * sx * sy * sz, axis=-1))

            def d2(E, i, j):
                t = 4.0 * b * b * s1(E, i, j + 2) - 2.0 * b * (2 * j + 1) * s1(E, i, j)
                if j >= 2:
                    t = t + j * (j - 1) * s1(E, i, j - 2)
                return t

            tx = d2(Ex, ix, jx) * sy * sz
            ty = sx * d2(Ey, iy, jy) * sz
            tz = sx * sy * d2(Ez, iz, jz)
            T_row.append(-0.5 * jnp.sum(pref * (tx + ty + tz), axis=-1))
        S_rows.append(jnp.stack(S_row, axis=-1))
        T_rows.append(jnp.stack(T_row, axis=-1))
    S_blk = jnp.stack(S_rows, axis=-2)  # (npair, ncart_a, ncart_b)
    T_blk = jnp.stack(T_rows, axis=-2)
    return _cart_to_sph_pair(pc, S_blk), _cart_to_sph_pair(pc, T_blk)


def _pair_H(pc: _PairClass, a, b, AB):
    """Dense Hermite table H (npair, ncart_ab, nherm, npp) for L = la+lb,
    with contraction weights folded in."""
    Ex, Ey, Ez = _pair_hermite(pc, a, b, AB)
    comps_a = cart_components(pc.la)
    comps_b = cart_components(pc.lb)
    hidx = herm_indices(pc.la + pc.lb)
    cc = jnp.asarray(pc.cc)
    zero = jnp.zeros_like(cc)
    rows = []
    for (ix, iy, iz) in comps_a:
        for (jx, jy, jz) in comps_b:
            hrow = []
            for (t, u, v) in hidx:
                if t > ix + jx or u > iy + jy or v > iz + jz:
                    hrow.append(zero)
                else:
                    hrow.append(
                        Ex[ix][jx][t] * Ey[iy][jy][u] * Ez[iz][jz][v] * cc
                    )
            rows.append(jnp.stack(hrow, axis=1))  # (npair, nherm, npp)
    H = jnp.stack(rows, axis=1)  # (npair, ncart_ab, nherm, npp)
    return H, hidx


def _stack_R(Rdict, hidx):
    return jnp.stack([Rdict[tuv] for tuv in hidx], axis=-1)


def _nuclear(pc: _PairClass, coords, charges):
    a, b, p, P, AB = _pair_geometry(pc, coords)
    H, hidx = _pair_H(pc, a, b, AB)
    L = pc.la + pc.lb
    # R over all atoms at once: PQ (npair, npp, natm, 3)
    PQ = P[:, :, None, :] - coords[None, None, :, :]
    Rd = _stack_R(_hermite_coulomb(L, p[:, :, None], PQ), hidx)
    # (npair, npp, natm, nherm)
    pref = 2.0 * jnp.pi / p  # (npair, npp)
    z = jnp.asarray(charges)
    V_flat = -jnp.einsum("nAhp,np,npCh,C->nA", H, pref, Rd, z)
    nca, ncb = ncart(pc.la), ncart(pc.lb)
    V_blk = V_flat.reshape(-1, nca, ncb)
    return _cart_to_sph_pair(pc, V_blk)


def _pvp(pc: _PairClass, coords, charges):
    """Spin-free pVp block: W_mu_nu = sum_x <d_x mu| V_nuc |d_x nu> with
    V_nuc = -sum_C Z_C / r_C (the sfX2C small-small potential; host twin
    `soc/somf.nuclear_deriv2[0]`, reference analog `sfX2C_soDKH1.py:202
    get_wso` family).  Electron-coordinate derivative of a Cartesian
    Gaussian: d g_i/dx = i g_{i-1} - 2a g_{i+1}, so the bra x ket
    derivative pair maps onto E tables one index higher (ldelta=1) and a
    Hermite depth of L+2."""
    a, b, p, P, AB = _pair_geometry(pc, coords)
    Ex, Ey, Ez = _pair_hermite(pc, a, b, AB, ldelta=1)
    cc = jnp.asarray(pc.cc)
    la, lb = pc.la, pc.lb
    L = la + lb + 2
    hidx = herm_indices(L)
    comps_a = cart_components(la)
    comps_b = cart_components(lb)
    zero = jnp.zeros_like(cc * AB[:, 0:1])

    def g(Et, i, j, t):
        if i < 0 or j < 0 or t < 0 or t > i + j:
            return None
        return Et[i][j][t]

    def D(Et, i, j, t):
        """(d_x bra_i)(d_x ket_j) pair-derivative E coefficient."""
        out = zero
        v = g(Et, i - 1, j - 1, t)
        if v is not None and i and j:
            out = out + (i * j) * v
        v = g(Et, i - 1, j + 1, t)
        if v is not None and i:
            out = out - (2.0 * i) * b * v
        v = g(Et, i + 1, j - 1, t)
        if v is not None and j:
            out = out - (2.0 * j) * a * v
        v = g(Et, i + 1, j + 1, t)
        if v is not None:
            out = out + 4.0 * a * b * v
        return out

    def E0(Et, i, j, t):
        v = g(Et, i, j, t)
        return zero if v is None else v

    rows = []
    for (ix, iy, iz) in comps_a:
        for (jx, jy, jz) in comps_b:
            hrow = []
            for (t, u, v) in hidx:
                val = (
                    D(Ex, ix, jx, t) * E0(Ey, iy, jy, u) * E0(Ez, iz, jz, v)
                    + E0(Ex, ix, jx, t) * D(Ey, iy, jy, u) * E0(Ez, iz, jz, v)
                    + E0(Ex, ix, jx, t) * E0(Ey, iy, jy, u) * D(Ez, iz, jz, v)
                )
                hrow.append(val * cc)
            rows.append(jnp.stack(hrow, axis=1))  # (npair, nherm, npp)
    H = jnp.stack(rows, axis=1)  # (npair, ncart_ab, nherm, npp)

    PQ = P[:, :, None, :] - coords[None, None, :, :]
    Rd = _stack_R(_hermite_coulomb(L, p[:, :, None], PQ), hidx)
    pref = 2.0 * jnp.pi / p
    z = jnp.asarray(charges)
    W_flat = -jnp.einsum("nAhp,np,npCh,C->nA", H, pref, Rd, z)
    nca, ncb = ncart(la), ncart(lb)
    W_blk = W_flat.reshape(-1, nca, ncb)
    return _cart_to_sph_pair(pc, W_blk)


# -- two-electron integrals ---------------------------------------------------


def make_integral_fn(layout: BasisLayout, do_eri: bool = True,
                     omega_lr: float = 0.0, block_jit: bool = False):
    """Return ``ints(coords) -> dict(S, T, V[, eri][, eri_lr])``
    differentiable in coords (natm, 3, bohr).  Spherical AO basis, same
    conventions as the host engine (validated against it in
    tests/test_jaxints.py).  omega_lr > 0 additionally produces the
    erf(omega r)/r-attenuated ERI ('eri_lr') for range-separated
    hybrids.

    block_jit=True jits each (pair-class, pair-class) ERI block and each
    one-electron class block SEPARATELY and relies on bra<->ket symmetry
    ((ab|cd) = (cd|ab)) to halve the block count.  Compiling one
    monolithic graph over all class pairs is super-linear in XLA (a
    cc-pVDZ 4-atom molecule takes >30 min; each block alone is seconds),
    and jit is autodiff-transparent, so ``jax.grad`` through the eager
    block loop compiles one small forward+backward per block instead —
    the difference between hours and minutes for DZ-scale gradients
    (VERDICT r1 item 5).  With block_jit the returned function must NOT
    be wrapped in an outer jax.jit (that would inline everything back
    into one graph)."""
    classes = _pair_classes(layout)
    nao = layout.nao
    charges = np.asarray(layout.mol.charges, dtype=np.float64)

    if block_jit:
        _jit_sk = {}
        _jit_v = {}
        _jit_eri = {}

        def blk_sk(i, pc, coords):
            if i not in _jit_sk:
                _jit_sk[i] = jax.jit(lambda c, _pc=pc: _overlap_kinetic(_pc, c))
            return _jit_sk[i](coords)

        def blk_v(i, pc, coords):
            if i not in _jit_v:
                _jit_v[i] = jax.jit(
                    lambda c, _pc=pc: _nuclear(_pc, c, charges))
            return _jit_v[i](coords)

        # ERI blocks dominate compile time: jit ONE function per
        # (la1, lb1, la2, lb2, omega) signature that takes the pair data
        # as ARGUMENTS — jax.jit shape-specializes per (npair, npp)
        # bucket, so all class pairs sharing a signature + shape reuse
        # one compiled executable instead of compiling 100s of
        # closure-constant variants
        def blk_eri(key, pc1, pc2, om, coords):
            sig = (pc1.la, pc1.lb, pc2.la, pc2.lb, om)
            if sig not in _jit_eri:
                la1, lb1, la2, lb2, _om = sig

                def f(c, d1, d2):
                    p1 = _PairData(la1, lb1, *d1)
                    p2 = _PairData(la2, lb2, *d2)
                    return _eri_block(p1, p2, c, omega=_om)

                _jit_eri[sig] = jax.jit(f)
            d1 = (pc1.exps_a, pc1.exps_b, pc1.cc, pc1.ia, pc1.ib)
            d2 = (pc2.exps_a, pc2.exps_b, pc2.cc, pc2.ia, pc2.ib)
            return _jit_eri[sig](coords, d1, d2)
    else:
        def blk_sk(i, pc, coords):
            return _overlap_kinetic(pc, coords)

        def blk_v(i, pc, coords):
            return _nuclear(pc, coords, charges)

        def blk_eri(key, pc1, pc2, om, coords):
            return _eri_block(pc1, pc2, coords, omega=om)

    def ints(coords):
        coords = jnp.asarray(coords)
        S = jnp.zeros((nao, nao))
        T = jnp.zeros((nao, nao))
        V = jnp.zeros((nao, nao))
        for i, pc in enumerate(classes):
            S_blk, T_blk = blk_sk(i, pc, coords)
            V_blk = blk_v(i, pc, coords)
            S = _scatter2(S, pc, S_blk)
            T = _scatter2(T, pc, T_blk)
            V = _scatter2(V, pc, V_blk)
        out = {"S": S, "T": T, "V": V, "coords": coords}
        if do_eri:
            omegas = [(0.0, "eri")]
            if omega_lr and omega_lr > 0.0:
                omegas.append((omega_lr, "eri_lr"))
            for om, key in omegas:
                eri = jnp.zeros((nao, nao, nao, nao))
                for i1, pc1 in enumerate(classes):
                    for i2, pc2 in enumerate(classes):
                        if block_jit and i2 < i1:
                            continue  # (cd|ab) scattered from (ab|cd)
                        blk = blk_eri((i1, i2, key), pc1, pc2, om, coords)
                        ia = pc1.idx_a[:, :, None, None, None, None]
                        ib = pc1.idx_b[:, None, :, None, None, None]
                        ic = pc2.idx_a[None, None, None, :, :, None]
                        id_ = pc2.idx_b[None, None, None, :, None, :]
                        eri = eri.at[ia, ib, ic, id_].add(blk)
                        if block_jit and i2 > i1:
                            tblk = jnp.moveaxis(blk, (0, 1, 2), (3, 4, 5))
                            ja = pc2.idx_a[:, :, None, None, None, None]
                            jb = pc2.idx_b[:, None, :, None, None, None]
                            jc = pc1.idx_a[None, None, None, :, :, None]
                            jd = pc1.idx_b[None, None, None, :, None, :]
                            eri = eri.at[ja, jb, jc, jd].add(tblk)
                out[key] = eri
        return out

    return ints


def _eri_block(pc1: _PairClass, pc2: _PairClass, coords, omega: float = 0.0):
    """(n1, nsph_a, nsph_b, n2, nsph_c, nsph_d) ERI block over two ordered
    pair classes (chemist notation (ab|cd))."""
    from xtddft_tpu.ints.mcmurchie import herm_index_map

    a1, b1, p1, P1, AB1 = _pair_geometry(pc1, coords)
    a2, b2, p2, P2, AB2 = _pair_geometry(pc2, coords)
    H1, hidx1 = _pair_H(pc1, a1, b1, AB1)
    H2, hidx2 = _pair_H(pc2, a2, b2, AB2)
    L1, L2 = pc1.la + pc1.lb, pc2.la + pc2.lb
    p1e = p1[:, :, None, None]
    p2e = p2[None, None, :, :]
    alpha = p1e * p2e / (p1e + p2e)
    PQ = P1[:, :, None, None, :] - P2[None, None, :, :, :]
    hidx12 = herm_indices(L1 + L2)
    Rd = _stack_R(_hermite_coulomb(L1 + L2, alpha, PQ, omega=omega), hidx12)
    # (n1, p1, n2, p2, nherm12)
    pref = 2.0 * jnp.pi ** 2.5 / (p1e * p2e * jnp.sqrt(p1e + p2e))
    Rd = Rd * pref[..., None]

    # combined-index gather table M[h1, h2] -> h12, and ket parity
    hmap = herm_index_map(L1 + L2)
    M = np.empty((len(hidx1), len(hidx2)), dtype=np.int32)
    for i1, (t1, u1, v1) in enumerate(hidx1):
        for i2, (t2, u2, v2) in enumerate(hidx2):
            M[i1, i2] = hmap[(t1 + t2, u1 + u2, v1 + v2)]
    sgn = np.array([(-1.0) ** sum(tuv) for tuv in hidx2])
    H2s = H2 * jnp.asarray(sgn)[None, None, :, None]

    Rg = Rd[..., jnp.asarray(M)]  # (n1, p1, n2, p2, nh1, nh2)
    tmp = jnp.einsum("mBgq,npmqhg->npmBh", H2s, Rg)
    cart = jnp.einsum("nAhp,npmBh->nAmB", H1, tmp)
    nca, ncb = ncart(pc1.la), ncart(pc1.lb)
    ncc, ncd = ncart(pc2.la), ncart(pc2.lb)
    cart = cart.reshape(cart.shape[0], nca, ncb, cart.shape[2], ncc, ncd)
    ca = jnp.asarray(cart2sph(pc1.la))
    cb = jnp.asarray(cart2sph(pc1.lb))
    cc_ = jnp.asarray(cart2sph(pc2.la))
    cd = jnp.asarray(cart2sph(pc2.lb))
    return jnp.einsum(
        "nabmcd,ax,by,cz,dw->nxymzw", cart, ca, cb, cc_, cd
    )
