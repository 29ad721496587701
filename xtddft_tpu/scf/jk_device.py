"""Chip-resident mixed-precision DF veff engine for the SCF hot loop.

The reference rebuilds J/K AO-direct through libcint on every SCF cycle
(`pyscf mf.get_jk` under `/root/reference/xtddft/XTDA.py:520-543` — its
ground states come straight from PySCF).  On this host (one CPU core)
that costs hours at production sizes, and the TPU has no f64 datapath —
so the TPU-native design is:

- the fitted B tensor (ints built once by the native C++ engine, metric
  dressed on host) lives on the chip as an f32 hi/lo pair
  (`utils/dsmat.split_f64`),
- every veff build (J, occupied-transform K, GGA quadrature) runs on the
  MXU, at one of three precision modes:

    'bf16'    single-pass bf16 products       (~2e-3)  early DIIS descent
    'f32'     6-pass 'highest' f32 products   (~4e-6)  main convergence
    'refined' compensated double-single paths (~1e-7)  final cycles

- only O(nao^2) Fock matrices ever cross the (slow) device->host link;
  the O(naux nao^2) tensors never leave the chip,
- the XC functional's pointwise derivatives for the refined mode are
  evaluated on the host in f64 (exact same autodiff code as the in-core
  path, `xc/interface.py`), with the grid matmuls staying on the MXU.

Accuracy of the refined mode is gated in tests/test_device_scf.py against
the all-host f64 SCF.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xtddft_tpu.utils.dsmat import _two_sum, join_f64, split_f64, ts_matmul
from xtddft_tpu.xc import interface as xci

# f32-safe density floor: GGA derivative ladders overflow f32 below this
# (same constant as response/sigma_df.cast_df_data)
RHO_FLOOR = 3e-7


def _prec(mode: str) -> str:
    return {"bf16": "default", "f32": "highest"}[mode]


def _hbm_budget() -> int | None:
    """Usable accelerator HBM in bytes (None on CPU backends / unknown):
    the storage-policy input for DeviceVeff(b_storage='auto')."""
    import os

    env = os.environ.get("XTDDFT_HBM_GB")
    if env:
        return int(float(env) * 1e9 * 0.92)
    try:
        d = jax.devices()[0]
        if d.platform == "cpu":
            return None
        ms = d.memory_stats()
        limit = int(ms.get("bytes_limit", 0)) if ms else 0
        if limit:
            return int(limit * 0.92)
        # accelerator with no memory_stats (the tunneled axon backend):
        # assume a 16 GB v5e-class chip rather than disabling the
        # storage policy altogether (override with XTDDFT_HBM_GB)
        return int(16e9 * 0.92)
    except Exception:
        return None


# ------------------------------------------------------------------ fast path
@functools.partial(jax.jit, static_argnames=("prec", "hyb", "hyb_lr"))
def _jk_fast(Bhi, Ca, Cb, prec, hyb, hyb_lr=0.0, Blr=None):
    """J - hyb*K veff pieces from occupied coefficients, single precision.

    Returns (vj_a-like, i.e. J - hyb K_a, J - hyb K_b, ej, eka, ekb)."""
    with jax.default_matmul_precision(prec):
        Da = Ca @ Ca.T
        Db = Cb @ Cb.T
        D = Da + Db
        t = jnp.einsum("Pmn,mn->P", Bhi, D)
        J = jnp.einsum("Pmn,P->mn", Bhi, t)
        out = []
        eks = []
        for C, Dx in ((Ca, Da), (Cb, Db)):
            K = 0.0
            if hyb != 0.0:
                T = jnp.einsum("Pmn,ni->Pmi", Bhi, C)
                K = hyb * jnp.einsum("Pmi,Pni->mn", T, T)
            if hyb_lr != 0.0 and Blr is not None:
                T = jnp.einsum("Pmn,ni->Pmi", Blr, C)
                K = K + hyb_lr * jnp.einsum("Pmi,Pni->mn", T, T)
            out.append(J - K)
            eks.append(0.5 * jnp.einsum("mn,nm->", Dx, K)
                       if hyb != 0.0 or hyb_lr != 0.0 else 0.0)
        ej = 0.5 * jnp.einsum("mn,nm->", D, J)
        return out[0], out[1], ej, eks[0], eks[1]


@functools.partial(jax.jit, static_argnames=("prec", "spec_key"))
def _xc_fast(phi, w, Ca, Cb, prec, spec_key):
    """On-chip f32 GGA/MGGA quadrature: (exc, Va, Vb).  spec_key is the
    hashable XCSpec (static: selects the functional expression — and the
    tau channel for MGGA specs — at trace time)."""
    spec = spec_key
    needs_tau = bool(getattr(spec, "needs_tau", False))
    with jax.default_matmul_precision(prec):
        rho = []
        for C in (Ca, Cb):
            m = jnp.einsum("xgn,ni->xgi", phi, C)
            r = jnp.einsum("gi,gi->g", m[0], m[0])
            g = 2.0 * jnp.einsum("xgi,gi->xg", m[1:4], m[0])
            t = (0.5 * jnp.einsum("xgi,xgi->g", m[1:4], m[1:4])
                 if needs_tau else None)
            rho.append((r, g, t))
        (ra, ga, ta), (rb, gb, tb) = rho
        mask = (ra > RHO_FLOOR) | (rb > RHO_FLOOR)
        w_m = jnp.where(mask, w, 0.0)
        ra = jnp.where(mask, ra, 1.0)
        rb = jnp.where(mask, rb, 1.0)
        ga = jnp.where(mask[None, :], ga, 0.0)
        gb = jnp.where(mask[None, :], gb, 0.0)
        rho_t = (ra, rb, ga, gb)
        if needs_tau:
            rho_t = rho_t + (jnp.where(mask, ta, 1.0),
                             jnp.where(mask, tb, 1.0))
        dv = xci.eval_vxc(spec, w_m, rho_t)
        exc = xci.eval_exc(spec, w_m, rho_t)
        if needs_tau:
            wva, wvb, wga, wgb, wta, wtb = dv
            Va = xci._contract_vmat(phi, wva, wga, wta)
            Vb = xci._contract_vmat(phi, wvb, wgb, wtb)
        else:
            wva, wvb, wga, wgb = dv
            Va = xci._contract_vmat(phi, wva, wga)
            Vb = xci._contract_vmat(phi, wvb, wgb)
        return exc, Va, Vb


# ------------------------------------------------------- packed-symmetric path
# B stored as the lower triangle of its symmetric (m, n) pair axis,
# pair-MAJOR: (nao*(nao+1)/2, naux) — exact f32 at HALF the HBM, the
# storage that fits TTM-1Cz/dzp (862 AO, 17.3 GB full f32) on a 16 GB
# v5e.  Chunks of the aux axis are unpacked on the fly with a gather
# (`df_build.pack_indices`); J never unpacks at all (packed contraction
# with multiplicity weights).  Pair-major is the physical layout those
# gathers want: stored aux-major, XLA layout assignment relayout-copied
# the ENTIRE tensor at the jit boundary (8.16 GB `copy(Bp)` next to the
# 8.16 GB argument = the r5 862-AO phase-b compile OOM).


@functools.partial(jax.jit, static_argnames=("prec", "hyb", "aux_chunk"))
def _jk_fast_packed(Bp, f2p, fpk, dupl, Ca, Cb, prec, hyb, aux_chunk=None):
    """Packed-B analog of `_jk_fast` (no RSH leg: packed mode guards it).

    Bp is pair-major, (npair, naux).  aux_chunk sizes the per-chunk
    UNPACK buffer (nao, nao, chunk): at 862 AO a 512-row chunk is
    1.5 GB, and with the loop body holding a separate unpacked copy per
    spin plus XLA double-buffering the graph wanted 19.1 GB on a
    15.75 GB chip (r5 phase-b compile OOM) — so the default is
    size-aware (~256 MB unpack) and the two spins share ONE unpacked
    chunk."""
    naux = Bp.shape[1]
    nao = Ca.shape[0]
    if aux_chunk is None:
        aux_chunk = max(32, min(512, int(6.4e7 // max(1, nao * nao))))
    with jax.default_matmul_precision(prec):
        Da = Ca @ Ca.T
        Db = Cb @ Cb.T
        D = Da + Db
        # J in packed space: t_P = sum_{m>=n} dupl * B_P,mn D_mn is the
        # exact symmetric double sum; the back-contraction lands on the
        # packed J, unpacked by one gather
        Dp = jnp.take(D.reshape(-1), fpk) * dupl
        t = Dp @ Bp
        Jp = Bp @ t
        J = jnp.take(Jp, f2p).reshape(nao, nao)

        def kchunk2(Bc):
            # Bc (npair, ch) pair-major: the unpack gather reads rows of
            # the stored layout (each pair's aux values are contiguous)
            ch = Bc.shape[1]
            Bf = jnp.take(Bc, f2p, axis=0).reshape(nao, nao, ch)
            Ta = jnp.einsum("mnP,ni->Pmi", Bf, Ca)
            Tb = jnp.einsum("mnP,ni->Pmi", Bf, Cb)
            return (jnp.einsum("Pmi,Pni->mn", Ta, Ta),
                    jnp.einsum("Pmi,Pni->mn", Tb, Tb))

        z = jnp.zeros((nao, nao), jnp.float32)
        Ka = Kb = z
        if hyb != 0.0:
            def body(i, accs):
                ka, kb = accs
                Bc = jax.lax.dynamic_slice_in_dim(
                    Bp, i * aux_chunk, aux_chunk, 1)
                da, db = kchunk2(Bc)
                return ka + da, kb + db

            nc = naux // aux_chunk
            if nc:
                Ka, Kb = jax.lax.fori_loop(0, nc, body, (z, z))
            if naux - nc * aux_chunk:
                Bc = jax.lax.slice_in_dim(Bp, nc * aux_chunk, naux, axis=1)
                da, db = kchunk2(Bc)
                Ka = Ka + da
                Kb = Kb + db
        ej = 0.5 * jnp.einsum("mn,nm->", D, J)
        Ka = hyb * Ka
        Kb = hyb * Kb
        eka = 0.5 * jnp.einsum("mn,nm->", Da, Ka) if hyb != 0.0 else 0.0
        ekb = 0.5 * jnp.einsum("mn,nm->", Db, Kb) if hyb != 0.0 else 0.0
        return J - Ka, J - Kb, ej, eka, ekb


def _chunk_k(Bc_hi, Bc_lo, Chi, Clo, tile=512):
    """Compensated K partial from one (full, unpacked) aux chunk of B:
    T = Bc C then T T^T, both `ts_matmul` — shared by the dense and
    packed refined paths."""
    ch, nao, _ = Bc_hi.shape
    m = ch * nao
    Thi, Tlo = ts_matmul(Bc_hi.reshape(m, nao),
                         Bc_lo.reshape(m, nao) if Bc_lo is not None else None,
                         Chi, Clo, tile=tile)
    nocc = Chi.shape[1]
    T2hi = Thi.reshape(ch, nao, nocc).transpose(1, 0, 2).reshape(nao, -1)
    T2lo = Tlo.reshape(ch, nao, nocc).transpose(1, 0, 2).reshape(nao, -1)
    return ts_matmul(T2hi, T2lo, T2hi.T, T2lo.T, tile=tile)


@functools.partial(jax.jit, static_argnames=("aux_chunk", "tile"))
def _jk_refined_packed(Bp, f2p, fpk, dupl, Cahi, Calo, Cbhi, Cblo,
                       aux_chunk=256, tile=512):
    """Compensated J / occupied-K from packed-symmetric B (hi only —
    packed mode exists for sizes where even the f32 hi is tight, so the
    result carries B's f32 representation error ~6e-8, exactly like the
    dense keep_lo=False regime).  Bp is pair-major, (npair, naux): aux
    chunks are column slices, transposed per chunk (a bounded ~250 MB
    relayout) — the whole-tensor relayout this avoids was the r5 862-AO
    compile OOM (see `_jk_fast_packed`)."""
    npair, naux = Bp.shape
    nao = Cahi.shape[0]

    def dm(Chi, Clo):
        with jax.default_matmul_precision("highest"):
            d = Chi @ Chi.T
        with jax.default_matmul_precision("default"):
            corr = Chi @ Clo.T + Clo @ Chi.T
        return d, corr

    Dahi, Dalo = dm(Cahi, Calo)
    Dbhi, Dblo = dm(Cbhi, Cblo)
    Dhi = Dahi + Dbhi
    Dlo = Dalo + Dblo
    # dupl is a power-of-2 weight (1 or 2): the products are exact
    Dph = jnp.take(Dhi.reshape(-1), fpk)[:, None] * dupl[:, None]
    Dpl = jnp.take(Dlo.reshape(-1), fpk)[:, None] * dupl[:, None]
    two_sum = _two_sum

    def body_chunk(Bc, carry):
        (jh, jl, kah, kal, kbh, kbl) = carry
        ch = Bc.shape[0]
        # J: t_c = Bc Dp, then the chunk-local back-contraction Bc^T t_c
        th, tl = ts_matmul(Bc, None, Dph, Dpl, tile=tile)
        pjh, pjl = ts_matmul(Bc.T, None, th, tl, tile=64)
        jh, e = two_sum(jh, pjh[:, 0])
        jl = jl + e + pjl[:, 0]
        Bf = jnp.take(Bc, f2p, axis=1).reshape(ch, nao, nao)
        pkh, pkl = _chunk_k(Bf, None, Cahi, Calo, tile=tile)
        kah, e = two_sum(kah, pkh)
        kal = kal + e + pkl
        pkh, pkl = _chunk_k(Bf, None, Cbhi, Cblo, tile=tile)
        kbh, e = two_sum(kbh, pkh)
        kbl = kbl + e + pkl
        return (jh, jl, kah, kal, kbh, kbl)

    def body(i, carry):
        Bc = jax.lax.dynamic_slice_in_dim(Bp, i * aux_chunk, aux_chunk, 1)
        return body_chunk(Bc.T, carry)

    zj = jnp.zeros((npair,), jnp.float32)
    z = jnp.zeros((nao, nao), jnp.float32)
    carry = (zj, zj, z, z, z, z)
    nc = naux // aux_chunk
    if nc > 0:
        carry = jax.lax.fori_loop(0, nc, body, carry)
    if naux - nc * aux_chunk:
        Bc = jax.lax.slice_in_dim(Bp, nc * aux_chunk, naux, axis=1)
        carry = body_chunk(Bc.T, carry)
    (jh, jl, kah, kal, kbh, kbl) = carry
    Jh = jnp.take(jh, f2p).reshape(nao, nao)
    Jl = jnp.take(jl, f2p).reshape(nao, nao)
    return (Jh, Jl, kah, kal, kbh, kbl)


# --------------------------------------------------------------- refined path
@functools.partial(jax.jit, static_argnames=("aux_chunk", "tile"))
def _jk_refined(Bhi, Blo, Cahi, Calo, Cbhi, Cblo, aux_chunk=256, tile=512):
    """Compensated J and occupied-K: returns hi/lo pairs
    (Jhi, Jlo, Kahi, Kalo, Kbhi, Kblo).

    The aux axis is walked in chunks so the (naux, nao, nocc) half
    transform never materializes (HBM at production sizes holds B hi/lo
    already); within each chunk both matmuls use dsmat-style compensated
    accumulation, and the chunk partials accumulate with TwoSum."""
    naux, nao, _ = Bhi.shape

    def dm(Chi, Clo):
        with jax.default_matmul_precision("highest"):
            d = Chi @ Chi.T
        with jax.default_matmul_precision("default"):
            corr = Chi @ Clo.T + Clo @ Chi.T
        return d, corr

    Dahi, Dalo = dm(Cahi, Calo)
    Dbhi, Dblo = dm(Cbhi, Cblo)
    Dhi = Dahi + Dbhi
    Dlo = Dalo + Dblo

    nc = naux // aux_chunk
    rem = naux - nc * aux_chunk
    two_sum = _two_sum  # backend-dispatched (EFT on TPU, native f64 on CPU)

    def chunk_contrib(Bc_hi, Bc_lo, Chi, Clo):
        """K partial from one aux chunk: compensated T then T T^T."""
        m = Bc_hi.shape[0] * nao
        Thi, Tlo = ts_matmul(Bc_hi.reshape(m, nao),
                             Bc_lo.reshape(m, nao) if Bc_lo is not None
                             else None,
                             Chi, Clo, tile=tile)
        nocc = Chi.shape[1]
        ch = Bc_hi.shape[0]
        # (ch, nao, nocc) -> (nao, ch*nocc)
        T2hi = Thi.reshape(ch, nao, nocc).transpose(1, 0, 2).reshape(nao, -1)
        T2lo = Tlo.reshape(ch, nao, nocc).transpose(1, 0, 2).reshape(nao, -1)
        return ts_matmul(T2hi, T2lo, T2hi.T, T2lo.T, tile=tile)

    def j_contrib(Bc_hi, Bc_lo):
        """J partials from one aux chunk (compensated both contractions).

        Both J contractions concentrate same-sign terms (electrostatics),
        where in-tile f32 accumulation error grows like tile/sqrt(k) —
        the tiles here are deliberately small."""
        ch = Bc_hi.shape[0]
        b2h = Bc_hi.reshape(ch, nao * nao)
        b2l = Bc_lo.reshape(ch, nao * nao) if Bc_lo is not None else None
        thi, tlo = ts_matmul(b2h, b2l, Dhi.reshape(-1, 1), Dlo.reshape(-1, 1),
                             tile=512)
        jhi, jlo = ts_matmul(b2h.T, b2l.T if b2l is not None else None,
                             thi, tlo, tile=64)
        return jhi.reshape(nao, nao), jlo.reshape(nao, nao)

    def body(i, carry):
        (jh, jl, kah, kal, kbh, kbl) = carry
        off = i * aux_chunk
        Bc_hi = jax.lax.dynamic_slice_in_dim(Bhi, off, aux_chunk, 0)
        Bc_lo = (jax.lax.dynamic_slice_in_dim(Blo, off, aux_chunk, 0)
                 if Blo is not None else None)
        pjh, pjl = j_contrib(Bc_hi, Bc_lo)
        jh, e = two_sum(jh, pjh)
        jl = jl + e + pjl
        pkh, pkl = chunk_contrib(Bc_hi, Bc_lo, Cahi, Calo)
        kah, e = two_sum(kah, pkh)
        kal = kal + e + pkl
        pkh, pkl = chunk_contrib(Bc_hi, Bc_lo, Cbhi, Cblo)
        kbh, e = two_sum(kbh, pkh)
        kbl = kbl + e + pkl
        return (jh, jl, kah, kal, kbh, kbl)

    z = jnp.zeros((nao, nao), jnp.float32)
    carry = (z, z, z, z, z, z)
    if nc > 0:
        carry = jax.lax.fori_loop(0, nc, body, carry)
    if rem:
        (jh, jl, kah, kal, kbh, kbl) = carry
        Bc_hi = jax.lax.slice_in_dim(Bhi, nc * aux_chunk, naux, axis=0)
        Bc_lo = (jax.lax.slice_in_dim(Blo, nc * aux_chunk, naux, axis=0)
                 if Blo is not None else None)
        pjh, pjl = j_contrib(Bc_hi, Bc_lo)
        jh, e = two_sum(jh, pjh)
        jl = jl + e + pjl
        pkh, pkl = chunk_contrib(Bc_hi, Bc_lo, Cahi, Calo)
        kah, e = two_sum(kah, pkh)
        kal = kal + e + pkl
        pkh, pkl = chunk_contrib(Bc_hi, Bc_lo, Cbhi, Cblo)
        kbh, e = two_sum(kbh, pkh)
        kbl = kbl + e + pkl
        carry = (jh, jl, kah, kal, kbh, kbl)
    return carry


@functools.partial(jax.jit, static_argnames=("tile", "tau"))
def _rho_refined(phi, Chi, Clo, tile=128, tau=False):
    """Grid density from compensated MO values: (rho, grho[, tau]) f32,
    accurate to ~1e-7 relative (phi itself is f32-exact input data)."""
    ng = phi.shape[1]
    outs = []
    for x in range(4):
        mh, ml = ts_matmul(phi[x], None, Chi, Clo, tile=tile)
        outs.append((mh, ml))
    (m0h, m0l) = outs[0]
    m0 = m0h + m0l
    with jax.default_matmul_precision("highest"):
        rho = jnp.einsum("gi,gi->g", m0, m0h) + jnp.einsum("gi,gi->g", m0, m0l)
        grho = jnp.stack([
            2.0 * jnp.einsum("gi,gi->g", outs[k][0] + outs[k][1], m0)
            for k in (1, 2, 3)
        ])
        if not tau:
            return rho, grho
        # tau = 1/2 sum_x sum_i (d_x m_i)^2, split-product accumulation
        t = sum(
            jnp.einsum("gi,gi->g", outs[k][0] + outs[k][1], outs[k][0])
            + jnp.einsum("gi,gi->g", outs[k][0] + outs[k][1], outs[k][1])
            for k in (1, 2, 3))
    return rho, grho, 0.5 * t


from xtddft_tpu.utils.dsmat import ew_add as _ewadd
from xtddft_tpu.utils.dsmat import ew_mul as _ewmul


@functools.partial(jax.jit, static_argnames=("tile",))
def _vxc_refined(phi, wvh, wvl, wgh, wgl, tile=256, wth=None, wtl=None):
    """Compensated quadrature contraction V = phi^T diag(wv) phi + sym GGA
    term [+ MGGA tau term 1/2 grad(phi)^T diag(wt) grad(phi)], accumulated
    over the grid axis.  Weights arrive as f32 hi/lo pairs (host-f64
    functional derivatives); the weight*phi products are EFT-exact,
    leaving only the tiled compensated accumulation.
    Returns (Vhi, Vlo)."""
    W0h, W0l = _ewmul(wvh[:, None], wvl[:, None], phi[0])
    Wgh = jnp.zeros_like(phi[0])
    Wgl = jnp.zeros_like(phi[0])
    for x in range(3):
        ph, pl = _ewmul(wgh[x][:, None], wgl[x][:, None], phi[1 + x])
        Wgh, e = _ewadd(Wgh, ph)
        Wgl = Wgl + e + pl
    # A + B + B^T where A = phi0^T W0, B = phi0^T Wg
    ah, al = ts_matmul(phi[0].T, None, W0h, W0l, tile=tile)
    bh, bl = ts_matmul(phi[0].T, None, Wgh, Wgl, tile=tile)
    Vh, Vl = ah + bh + bh.T, al + bl + bl.T
    if wth is not None:
        for x in range(3):
            th, tl = _ewmul(0.5 * wth[:, None], 0.5 * wtl[:, None],
                            phi[1 + x])
            ch, cl = ts_matmul(phi[1 + x].T, None, th, tl, tile=tile)
            Vh, e = _ewadd(Vh, ch)
            Vl = Vl + e + cl
    return Vh, Vl


class DeviceVeff:
    """Builds (veff_a, veff_b, e2) on the chip from occupied MO coefficients.

    One instance per converged-geometry Env; the B tensor ships to the
    device once (h2d ~1 GB/s), Fock-sized results come back per cycle
    (the d2h link is ~5 MB/s — nothing larger than nao^2 ever crosses it).
    """

    def __init__(self, env, spec, aux_chunk: int = 256, verbose: int = 0,
                 keep_b_lo: bool | None = None, b_storage: str = "auto"):
        from xtddft_tpu.scf.df_build import build_b_device, pack_indices

        self.env = env
        self.spec = spec
        self.aux_chunk = aux_chunk
        # metric dressing happens ON the chip (the 1e16-flop matmul the
        # host cannot afford at production sizes): raw j3c streams over,
        # B lives only as the device hi/lo pair.  Above ~3 GB per half
        # the lo half is dropped (HBM budget; refined J/K then carries
        # B's f32 representation error ~6e-8 — still ~1e-7 Fock quality,
        # see build_b_device docstring).  When even the f32 hi (plus the
        # grid tensor) exceeds the device HBM budget, B stores
        # packed-symmetric (lower pair triangle, exact f32, half the
        # bytes — `pack_indices`): TTM-1Cz/dzp 862 AO on a 16 GB v5e.
        naux_b = env.aux_layout.nao
        b_half_bytes = naux_b * env.nao * env.nao * 4
        if keep_b_lo is None:
            keep_b_lo = b_half_bytes < 3e9
        if b_storage == "auto":
            budget = _hbm_budget()
            extra = 1.5e9  # transfer staging + J/K workspace headroom
            if spec is not None and spec.components:
                extra += 4.0 * env.grid.coords.shape[0] * env.nao * 4
            need = b_half_bytes * (2 if keep_b_lo else 1) + extra
            b_storage = ("packed" if budget is not None and need > budget
                         else "full")
        self.b_storage = b_storage
        # Grid tensor FIRST: phi is a single multi-GB contiguous buffer,
        # and allocating it on a fresh arena always succeeds — after the
        # transfer-heavy B dressing the tunneled backend's staging arena
        # is fragmented/draining and the same allocation tripped
        # RESOURCE_EXHAUSTED at TTM/dzp size (r3 phase-b crash) even with
        # HBM far from full.  B's streamed build then fills the remaining
        # space chunkwise, which tolerates fragmentation.
        self.phi = None
        if spec is not None and spec.components:
            from xtddft_tpu.grids import eval_ao
            from xtddft_tpu.scf.df_build import h2d_rows

            grid = env.grid
            ao = eval_ao(env.layout, grid.coords, deriv=1)
            # ONE streamed upload into the final (4, ngrid, nao) buffer
            # (h2d_rows flattens leading axes and row-chunks with OOM
            # backoff); a per-component-then-stack build would transiently
            # double phi's HBM footprint
            self.phi = h2d_rows(np.asarray(ao))
            del ao
            jax.block_until_ready(self.phi)
            self.w32 = jnp.asarray(np.asarray(grid.weights, dtype=np.float32))
            self.w64 = np.asarray(grid.weights, dtype=np.float64)
        if b_storage == "packed":
            if spec is not None and abs(getattr(spec, "omega", 0.0)) > 1e-12:
                raise NotImplementedError(
                    "packed-B device engine has no long-range (RSH) leg; "
                    "use b_storage='full' (needs the HBM) or the host "
                    "engine")
            # size-aware chunking: the packed J/K loops unpack a
            # (chunk, nao, nao) buffer per iteration — cap it at
            # ~256 MB so the compiled loop fits next to the resident
            # packed B at 862 AO (r5: chunk=256/512 graphs wanted
            # 19.1 GB on a 15.75 GB chip)
            self.aux_chunk = min(self.aux_chunk,
                                 max(32, int(6.4e7 // (env.nao * env.nao))))
            self.Bhi, self.Blo = build_b_device(
                env.df_metric_eig_host(0.0), env.df_j3c_host(0.0),
                packed=True)
            fpk, f2p, dupl = pack_indices(env.nao)
            self._fpk = jnp.asarray(fpk)
            self._f2p = jnp.asarray(f2p)
            self._dupl = jnp.asarray(dupl)
        else:
            self.Bhi, self.Blo = build_b_device(env.df_metric_eig_host(0.0),
                                                env.df_j3c_host(0.0),
                                                keep_lo=keep_b_lo)
        self.hyb = spec.hyb if spec is not None else 1.0
        self.alpha = spec.alpha if spec is not None else 1.0
        self.omega = spec.omega if spec is not None else 0.0
        self.hyb_lr = 0.0
        self.Blr = None
        if self.omega != 0.0 and abs(self.alpha - self.hyb) > 1e-12:
            self.hyb_lr = self.alpha - self.hyb
            # the long-range K rides the f32 tensor only; its weight is a
            # fraction of the full K and the refined pass keeps hi/lo for
            # the dominant term (HBM budget: see module docstring)
            self.Blr = build_b_device(env.df_metric_eig_host(self.omega),
                                      env.df_j3c_host(self.omega))[0]
        # NOTE: the raw host j3c stays cached on env (the response build
        # reuses it); production scripts call env.release_df_host_cache()
        # once every consumer has its device tensors.  (phi was uploaded
        # before the B build — see the fragmentation note above.)

    # -- public -----------------------------------------------------------
    def veff(self, Ca: np.ndarray, Cb: np.ndarray, mode: str = "f32"):
        """(veff_a, veff_b, e2) as host f64 arrays / float.

        Ca/Cb: occupied (incl. open) MO coefficient blocks, host f64.
        mode: 'bf16' | 'f32' | 'refined'.
        """
        if mode in ("bf16", "f32"):
            return self._veff_fast(Ca, Cb, _prec(mode))
        return self._veff_refined(Ca, Cb)

    # -- implementation ---------------------------------------------------
    def _veff_fast(self, Ca, Cb, prec):
        Ca32 = jnp.asarray(np.asarray(Ca, dtype=np.float32))
        Cb32 = jnp.asarray(np.asarray(Cb, dtype=np.float32))
        if self.b_storage == "packed":
            va, vb, ej, eka, ekb = _jk_fast_packed(
                self.Bhi, self._f2p, self._fpk, self._dupl, Ca32, Cb32,
                prec, self.hyb, aux_chunk=self.aux_chunk)
        else:
            va, vb, ej, eka, ekb = _jk_fast(
                self.Bhi, Ca32, Cb32, prec, self.hyb, self.hyb_lr, self.Blr)
        exc = 0.0
        if self.phi is not None:
            exc, Va, Vb = _xc_fast(self.phi, self.w32, Ca32, Cb32, prec,
                                   self.spec)
            va = va + Va
            vb = vb + Vb
            exc = float(exc)
        e2 = float(ej) - float(eka) - float(ekb) + exc
        return (np.asarray(va, dtype=np.float64),
                np.asarray(vb, dtype=np.float64), e2)

    def _veff_refined(self, Ca, Cb):
        cah, cal = split_f64(Ca)
        cbh, cbl = split_f64(Cb)
        cah, cal, cbh, cbl = map(jnp.asarray, (cah, cal, cbh, cbl))
        if self.b_storage == "packed":
            jh, jl, kah, kal, kbh, kbl = _jk_refined_packed(
                self.Bhi, self._f2p, self._fpk, self._dupl,
                cah, cal, cbh, cbl, aux_chunk=self.aux_chunk)
        else:
            jh, jl, kah, kal, kbh, kbl = _jk_refined(
                self.Bhi, self.Blo, cah, cal, cbh, cbl,
                aux_chunk=self.aux_chunk)
        J = join_f64(jh, jl)
        Ka = join_f64(kah, kal)
        Kb = join_f64(kbh, kbl)
        Da = Ca @ Ca.T
        Db = Cb @ Cb.T
        hyb = self.hyb
        va = J - hyb * Ka
        vb = J - hyb * Kb
        ek = 0.5 * hyb * (np.einsum("mn,nm->", Da, Ka)
                          + np.einsum("mn,nm->", Db, Kb))
        if self.hyb_lr != 0.0 and self.Blr is not None:
            # long-range K at plain f32 quality (its coefficient is a
            # fraction of the total K; see __init__)
            _, _, _, ekal, ekbl = _jk_fast(
                self.Blr, jnp.asarray(cah), jnp.asarray(cbh), "highest", 1.0)
            Tka = _k_only(self.Blr, cah)
            Tkb = _k_only(self.Blr, cbh)
            va = va - self.hyb_lr * np.asarray(Tka, dtype=np.float64)
            vb = vb - self.hyb_lr * np.asarray(Tkb, dtype=np.float64)
            ek = ek + 0.5 * self.hyb_lr * (
                np.einsum("mn,nm->", Da, np.asarray(Tka, np.float64))
                + np.einsum("mn,nm->", Db, np.asarray(Tkb, np.float64)))
        ej = 0.5 * np.einsum("mn,nm->", Da + Db, J)
        exc = 0.0
        if self.phi is not None:
            exc, Va, Vb = self._xc_refined(cah, cal, cbh, cbl)
            va = va + Va
            vb = vb + Vb
        return va, vb, float(ej - ek + exc)

    def _xc_refined(self, cah, cal, cbh, cbl):
        needs_tau = bool(getattr(self.spec, "needs_tau", False))
        rho_a = _rho_refined(self.phi, cah, cal, tau=needs_tau)
        rho_b = _rho_refined(self.phi, cbh, cbl, tau=needs_tau)
        ra, ga = rho_a[0], rho_a[1]
        rb, gb = rho_b[0], rho_b[1]
        # pointwise functional on host f64 (exact autodiff code shared
        # with the in-core path)
        cpu = jax.devices("cpu")[0]
        ra_h = np.asarray(ra, dtype=np.float64)
        rb_h = np.asarray(rb, dtype=np.float64)
        ga_h = np.asarray(ga, dtype=np.float64)
        gb_h = np.asarray(gb, dtype=np.float64)
        # the functional runs on host f64, so the f32-overflow floor is
        # unnecessary here: use the standard f64 mask (the fast path's
        # 3e-7 floor would drop low-density tail contributions at the
        # ~3e-5 level in the potential matrices)
        mask = (ra_h > xci.MASK_RHO) | (rb_h > xci.MASK_RHO)
        w = np.where(mask, self.w64, 0.0)
        rho = (np.where(mask, ra_h, 1.0), np.where(mask, rb_h, 1.0),
               np.where(mask[None, :], ga_h, 0.0),
               np.where(mask[None, :], gb_h, 0.0))
        if needs_tau:
            rho = rho + tuple(
                np.where(mask, np.asarray(t, dtype=np.float64), 1.0)
                for t in (rho_a[2], rho_b[2]))
        with jax.default_device(cpu):
            dv = [np.asarray(x, dtype=np.float64)
                  for x in xci.eval_vxc(
                      self.spec, jnp.asarray(w),
                      tuple(jnp.asarray(r) for r in rho))]
            exc = float(xci.eval_exc(self.spec, jnp.asarray(w),
                                     tuple(jnp.asarray(r) for r in rho)))

        def _v(wv, wg, wt=None):
            wvh, wvl = split_f64(wv)
            wgh, wgl = split_f64(wg)
            kw = {}
            if wt is not None:
                wth, wtl = split_f64(wt)
                kw = dict(wth=jnp.asarray(wth), wtl=jnp.asarray(wtl))
            return join_f64(*_vxc_refined(
                self.phi, jnp.asarray(wvh), jnp.asarray(wvl),
                jnp.asarray(wgh), jnp.asarray(wgl), **kw))

        if needs_tau:
            wva, wvb, wga, wgb, wta, wtb = dv
            return exc, _v(wva, wga, wta), _v(wvb, wgb, wtb)
        wva, wvb, wga, wgb = dv
        return exc, _v(wva, wga), _v(wvb, wgb)


@jax.jit
def _k_only(B, C):
    with jax.default_matmul_precision("highest"):
        T = jnp.einsum("Pmn,ni->Pmi", B, C)
        return jnp.einsum("Pmi,Pni->mn", T, T)
