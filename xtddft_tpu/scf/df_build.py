"""Streaming on-chip DF metric dressing: B = V^{-1/2} j3c on the MXU.

At production sizes the dressing matmul is the single largest dense
contraction of the whole state build — TTM/dzp (598 AO, 3990 jk-aux) is
1.1e16 flops, ~60 h on this one-core host but ~minutes on the MXU.  The
reference never faces this step (its ground states come from PySCF's
AO-direct SCF, `/root/reference/xtddft/XTDA.py:520` takes `mf` from
pyscf); a TPU-native DF engine makes it the bridge between the one-time
host integral build and the chip-resident SCF/response hot loops
(`scf/jk_device.py`, `response/sigma_df.py`).

Precision design: V^{-1/2} = U diag(1/sqrt(w)) U^T has entries up to
1/sqrt(w_min) ~ 1e5 of both signs, so applying it as ONE compensated
matmul amplifies in-tile f32 accumulation error by the cancellation
between those entries (measured: ~10x worse SCF gradient floor on
OH/6-31G).  Instead the dresser works in the metric eigenbasis:

    W  = U^T @ j3c      (orthogonal — no amplification)
    Ws = diag(1/sqrt(w)) W   (elementwise, EFT-exact)
    B  = U @ Ws          (orthogonal — no amplification)

keeping the result at plain compensated-matmul quality (~5e-8 relative,
tests/test_dsmat.py) regardless of metric conditioning.

Layout: j3c streams host->device in blocks as f32 hi/lo pairs (h2d ships
exactly the f64 information content, 8 B/element); each dressed block is
written into the pre-allocated device-resident B pair with donated
buffers (XLA updates in place — peak HBM is B itself plus one block).
"""

from __future__ import annotations

import functools
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from xtddft_tpu.utils.dsmat import (eft_matmul_small, ew_mul, split_f64,
                                    ts_matmul)


def _progress(tag: str, done: int, total: int, t0: float):
    """Opt-in liveness line for the multi-GB streaming loops.

    The r5 862-AO phase-b sat 2 h inside the packed dressing loop with
    zero output — on a tunneled chip whose h2d throughput varies by an
    order of magnitude, every streaming loop must be able to show it is
    alive.  Enabled by XTDDFT_PROGRESS=1 (the production tools set it);
    prints at most every 30 s."""
    import os
    import time

    if not os.environ.get("XTDDFT_PROGRESS"):
        return
    now = time.time()
    last = getattr(_progress, "_last", 0.0)
    if now - last < 30.0 and done < total:
        return
    _progress._last = now
    el = now - t0
    eta = el / max(done, 1) * (total - done)
    print(f"    {tag}: {done}/{total}  {el:.0f}s elapsed, ~{eta:.0f}s left",
          flush=True)


def retry_oom(fn, attempts: int = 10, wait: float = 15.0):
    """Run ``fn`` with backoff on the tunneled backend's transient
    RESOURCE_EXHAUSTED: the axon transfer staging arena drains
    asynchronously, so a multi-GB h2d right after a streaming loop can
    fail even though HBM itself has room.  gc + sleep lets the arena
    drain; anything else re-raises immediately."""
    for k in range(attempts):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or k == attempts - 1:
                raise
            import gc
            import time

            gc.collect()
            time.sleep(wait * (k + 1))


def _split_dev(x):
    hi, lo = split_f64(x)
    return (retry_oom(lambda: jnp.asarray(hi)),
            retry_oom(lambda: jnp.asarray(lo)))


def _free(*bufs):
    """Synchronously release device buffers of streamed chunks.

    On the tunneled backend, dropping the last Python reference frees the
    remote buffer asynchronously — a long streaming loop can accumulate
    gigabytes of logically-dead chunk buffers and trip RESOURCE_EXHAUSTED
    on the next allocation even though live data is far under HBM.
    Explicit .delete() makes the free eager."""
    for b in bufs:
        if b is not None and hasattr(b, "delete"):
            try:
                b.delete()
            except Exception:
                pass


def h2d_rows(x_np, dtype=jnp.float32, chunk_bytes: int = 128 << 20):
    """Host array -> device array, streamed over the leading axis in
    bounded chunks with OOM backoff.  For multi-100-MB uploads on the
    tunneled backend a single device_put can exhaust the staging arena;
    row-chunking bounds the in-flight transfer size."""
    x_np = np.asarray(x_np)
    shape = x_np.shape
    # chunk over a flattened leading axis so per-transfer size is bounded
    # regardless of how the leading dims factor (e.g. phi (4, ngrid, nmo))
    x_np = x_np.reshape(-1, shape[-1]) if x_np.ndim > 1 else x_np[:, None]
    nbytes_row = x_np.shape[1] * np.dtype(np.float32).itemsize
    rows = max(1, chunk_bytes // max(nbytes_row, 1))
    if rows >= x_np.shape[0]:
        return retry_oom(
            lambda: jnp.asarray(np.asarray(x_np, dtype=np.float32),
                                dtype=dtype)).reshape(shape)
    out = retry_oom(lambda: jax.block_until_ready(
        jnp.zeros(x_np.shape, dtype)))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _wr(buf, blk, off):
        return jax.lax.dynamic_update_slice_in_dim(
            buf, blk.astype(dtype), off, 0)

    for off in range(0, x_np.shape[0], rows):
        blk = np.asarray(x_np[off:off + rows], dtype=np.float32)
        b = retry_oom(lambda: jnp.asarray(blk))
        out = _wr(out, b, jnp.int32(off))
        jax.block_until_ready(out)
        _free(b)
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("nnull", "tile"))
def _dress(uh, ul, sh, sl, bh, bl, cs=None, nnull=0, tile=512):
    """One column block: U diag(s) U^T @ blk, all compensated.

    The first ``nnull`` eigenmodes (eigh sorts w ascending) go through
    the exact lane: their W rows suffer cancellation — near-null modes
    are near-orthogonal to the j3c column space, so MXU partial-sum
    rounding (~2^-24 * |products|) dwarfs the tiny row values, and
    diag(s) amplifies that error by up to 1/sqrt(w_min).  The EFT rank-1
    path computes them to ~2^-45 at VPU cost proportional to nnull.

    ``cs`` is the power-of-2 column equilibration the CALLER divided out
    of blk; it is multiplied back (exactly) right after stage 1, so the
    final orthogonal matmul runs at the natural scale — un-scaling after
    it would amplify its rounding by cs instead."""
    wh, wl = ts_matmul(uh.T, ul.T, bh, bl, tile=tile)
    if nnull:
        wnh, wnl = eft_matmul_small(uh[:, :nnull].T, ul[:, :nnull].T,
                                    bh, bl)
        wh = wh.at[:nnull].set(wnh)
        wl = wl.at[:nnull].set(wnl)
    if cs is not None:
        wh = wh * cs[None, :]
        wl = wl * cs[None, :]
    wh, wl = ew_mul(wh, wl, sh[:, None], sl[:, None])
    return ts_matmul(uh, ul, wh, wl, tile=tile)


def _nnull(w: np.ndarray, amp: float = 4.0) -> int:
    """Number of leading (smallest-w) metric modes routed to the exact
    lane: those whose 1/sqrt(w) amplification exceeds ``amp``.

    The MXU lane leaves ~2e-7-scale rounding per W row (equilibrated
    columns); the bar keeps its amplified contribution under ~1e-6 in B,
    measured in tests/test_device_scf.py's host-vs-device gates."""
    return int((1.0 / np.sqrt(w) > amp).sum())


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("nnull", "tile"))
def _dress_block(Bhi, Blo, uh, ul, sh, sl, bh, bl, cs, off, nnull=0,
                 tile=512):
    ph, pl = _dress(uh, ul, sh, sl, bh, bl, cs=cs, nnull=nnull, tile=tile)
    Bhi = jax.lax.dynamic_update_slice_in_dim(Bhi, ph, off, 1)
    Blo = jax.lax.dynamic_update_slice_in_dim(Blo, pl, off, 1)
    return Bhi, Blo


def _pow2_colscale(blk: np.ndarray) -> np.ndarray:
    """Per-column power-of-2 scale ~ the column max: dividing by it is
    EXACT in binary fp, and it drops the f32 accumulation floor of the
    dressing matmuls (2^-24 * max|product| per rounding) to the same
    RELATIVE level for every output column — steep-primitive j3c columns
    reach ~6 in magnitude while valence ones sit at ~1e-2."""
    m = np.abs(blk).max(axis=0)
    m = np.where(m > 0, m, 1.0)
    return np.exp2(np.ceil(np.log2(m)))


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("nnull", "tile"))
def _dress_block_hi(Bhi, uh, ul, sh, sl, bh, bl, cs, off, nnull=0,
                    tile=512):
    ph, _ = _dress(uh, ul, sh, sl, bh, bl, cs=cs, nnull=nnull, tile=tile)
    return jax.lax.dynamic_update_slice_in_dim(Bhi, ph, off, 1)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("nnull", "tile"))
def _dress_block_hi_t(Bpt, uh, ul, sh, sl, bh, bl, cs, off, nnull=0,
                      tile=512):
    """Pair-MAJOR variant of `_dress_block_hi`: the dressed (naux, width)
    column block is written TRANSPOSED into rows [off, off+width) of the
    (npair, naux) buffer.  Pair-major is the packed storage convention
    (see `_build_b_device_packed`): it is the physical layout the packed
    J/K unpack gathers want, so the consumer jits read the tensor in
    place instead of relayout-copying all of it (an 8.2 GB HLO `copy`
    at 862 AO — the r5 phase-b compile OOM)."""
    ph, _ = _dress(uh, ul, sh, sl, bh, bl, cs=cs, nnull=nnull, tile=tile)
    return jax.lax.dynamic_update_slice_in_dim(Bpt, ph.T, off, 0)


def pack_indices(nao: int):
    """Index arrays for packed-symmetric (lower-triangle) pair storage.

    Returns (flat_pack, full2pair, dupl):
      flat_pack: (npair,) int32 — flat full-matrix index m*nao+n of each
                 packed column (m >= n, m-major order → monotonically
                 increasing, which keeps the packed build's disk reads
                 contiguous);
      full2pair: (nao*nao,) int32 — packed index of each (m, n);
      dupl:      (npair,) f32 — 2.0 off-diagonal / 1.0 diagonal, the
                 multiplicity weight so packed contractions with a
                 symmetric matrix reproduce the full double sum.
    """
    m_i, n_i = np.tril_indices(nao)
    npair = m_i.size
    P = np.empty((nao, nao), dtype=np.int32)
    P[m_i, n_i] = np.arange(npair, dtype=np.int32)
    P[n_i, m_i] = np.arange(npair, dtype=np.int32)
    flat_pack = (m_i * nao + n_i).astype(np.int32)
    dupl = np.where(m_i == n_i, 1.0, 2.0).astype(np.float32)
    return flat_pack, P.reshape(-1), dupl


def build_b_device(metric_eig, j3c: np.ndarray,
                   col_chunk: int = 1 << 13, tile: int = 512,
                   keep_lo: bool = True, packed: bool = False):
    """(naux, nao, nao) device-resident B as an f32 (hi, lo) pair.

    metric_eig: (w, U) host-f64 truncated eigendecomposition of the fit
                metric (`Env.df_metric_eig_host`).
    j3c:        host-f64 (naux, nao, nao) raw 3-center integrals.
    keep_lo:    with False, only the hi half stays resident (the pair is
                still computed per block, so hi is the correctly-rounded
                f32 of the compensated dressing).  Halves the dominant
                HBM tensor; downstream compensated J/K then carries B's
                f32 REPRESENTATION error (~6e-8 relative) instead of
                ~2^-48 — at production sizes that is the right trade,
                because 2*naux*nao^2 floats do not fit a 16 GB chip
                (TTM/dzp: 11.4 GB) while the Fock target is ~1e-7.
    packed:     store only the lower triangle of the symmetric (m, n)
                pair axis, pair-MAJOR: (nao*(nao+1)/2, naux), exact f32,
                HALF the HBM again — the representation that puts
                TTM-1Cz/dzp (862 AO, 17.3 GB full f32) on a 16 GB v5e.
                Implies keep_lo=False; consumers unpack per aux chunk
                with `pack_indices` (`scf/jk_device.py` packed J/K
                paths).  Pair-major so those unpack gathers read the
                stored layout directly (see `_build_b_device_packed`).
    """
    w, U = metric_eig
    naux, nao = j3c.shape[0], j3c.shape[1]
    ncol = nao * nao
    j2 = j3c.reshape(naux, ncol)
    uh, ul = _split_dev(U)
    sh, sl = _split_dev(1.0 / np.sqrt(w))
    if packed:
        return _build_b_device_packed(j2, uh, ul, sh, sl, _nnull(w),
                                      col_chunk, tile), None
    Bhi = jnp.zeros((naux, ncol), jnp.float32)
    Blo = jnp.zeros((naux, ncol), jnp.float32) if keep_lo else None
    t0 = _time.time()
    for off in range(0, ncol, col_chunk):
        _progress("dress B", off, ncol, t0)
        blk = j2[:, off:off + col_chunk]
        cs = _pow2_colscale(blk)
        bh, bl = _split_dev(blk / cs[None, :])  # exact division
        args = (uh, ul, sh, sl, bh, bl,
                jnp.asarray(cs, dtype=jnp.float32), jnp.int32(off))
        if keep_lo:
            Bhi, Blo = _dress_block(Bhi, Blo, *args, nnull=_nnull(w),
                                    tile=tile)
        else:
            Bhi = _dress_block_hi(Bhi, *args, nnull=_nnull(w), tile=tile)
        # throttle: without this the Python loop enqueues every block's
        # h2d transfer at once and the remote backend's staging arena
        # exhausts (measured: RESOURCE_EXHAUSTED at ~20 GB of in-flight
        # transfers on the tunneled chip, with HBM itself fine)
        jax.block_until_ready(Bhi)
        _free(bh, bl)
    Bhi = Bhi.reshape(naux, nao, nao)
    return Bhi, (Blo.reshape(naux, nao, nao) if keep_lo else None)


def _build_b_device_packed(j2, uh, ul, sh, sl, nnull, col_chunk, tile):
    """Packed dressing loop: walks CONTIGUOUS full-column chunks (one
    sequential pass over the j3c mmap — same IO as the full build),
    gathers the lower-triangle columns inside each chunk on the host,
    pads the packed width to a power-of-2 bucket (bounds the number of
    compiled `_dress_block_hi_t` shapes), and writes blocks in ascending
    packed offset so each block's zero padding is overwritten by its
    successor.  Only the pair columns are dressed — the packed build
    also HALVES the dressing flops.

    Returns the tensor pair-MAJOR, (npair, naux): in default row-major
    layout that makes the per-aux-chunk pair gathers of the packed J/K
    consumers contiguous, which is exactly the layout XLA's layout
    assignment wants for them.  Stored aux-major, XLA inserted a
    whole-tensor relayout `copy` inside `_jk_fast_packed` — live Bp +
    copy = 2x8.16 GB at 862 AO, the r5 phase-b compile OOM."""
    naux = j2.shape[0]
    nao = int(round(np.sqrt(j2.shape[1])))
    flat_pack, _, _ = pack_indices(nao)
    npair = flat_pack.size
    Bp = jnp.zeros((npair, naux), jnp.float32)
    out_off = 0
    t0 = _time.time()
    for off in range(0, nao * nao, col_chunk):
        _progress("dress packed B", off, nao * nao, t0)
        hi = min(off + col_chunk, nao * nao)
        lo_i = np.searchsorted(flat_pack, off)
        hi_i = np.searchsorted(flat_pack, hi)
        if hi_i == lo_i:
            continue
        blk = np.asarray(j2[:, off:hi])[:, flat_pack[lo_i:hi_i] - off]
        width = hi_i - lo_i
        # pad to a power-of-2 bucket (>= 512): few compiled shapes.
        # Padding beyond npair would shift under dynamic_update_slice's
        # index clamping, so tail blocks that would overrun write at
        # exact width (at most a couple of extra compiles).
        bw = max(512, 1 << int(np.ceil(np.log2(width))))
        if out_off + bw > npair:
            bw = width
        if bw > width:
            blk = np.concatenate(
                [blk, np.zeros((naux, bw - width), blk.dtype)], axis=1)
        cs = _pow2_colscale(blk)
        bh, bl = _split_dev(blk / cs[None, :])
        Bp = _dress_block_hi_t(Bp, uh, ul, sh, sl, bh, bl,
                               jnp.asarray(cs, dtype=jnp.float32),
                               jnp.int32(out_off), nnull=nnull, tile=tile)
        jax.block_until_ready(Bp)  # bound in-flight h2d (see above)
        _free(bh, bl)
        out_off += width
    assert out_off == npair
    return Bp


def build_bmo_device(metric_eig, j3c: np.ndarray, C: np.ndarray,
                     aux_chunk: int = 256, col_chunk: int = 1 << 13,
                     tile: int = 512):
    """Full-MO dressed tensor B_pq = V^{-1/2} (j3c | C, C) as a
    chip-resident f32 (hi, lo) pair of shape (naux, nmo, nmo).

    The production response-state build: the reference prepares its
    GPU tensors by a host einsum ladder over in-core AO ERIs
    (`/root/reference/xtddft/XTDA_GPU.py` takes pyscf-built tensors);
    here neither the host dressing (naux^2 nao^2 — 1.1e16 flops at
    TTM/dzp, days on a 1-core host) nor a host MO transform ever runs:
    raw j3c streams over once, and both O(N^4) contractions happen on
    the MXU in compensated double-single arithmetic (~2^-45 relative,
    `utils/dsmat.py`), so the (hi+lo) sum IS the f64-quality tensor.

    Memory: the (naux, nmo^2) hi/lo pair is the only resident tensor
    (TTM/dzp 598 AO: 2 x 5.7 GB); the dressing runs in place over
    column blocks with donated buffers.  Use the pair for compensated
    refinement, keep only ``hi`` (drop the other half) for the f32
    production solve.

    Ordering note: dressing (aux-space orthogonal sandwich) commutes
    with the MO transform (AO-pair-space), so transforming first makes
    stage 2 cost naux^2 nmo^2 with no AO-basis intermediate at all.
    """
    w, U = metric_eig
    naux, nao = j3c.shape[0], j3c.shape[1]
    nmo = C.shape[1]
    ch = _split_dev(C)
    Thi = jnp.zeros((naux, nmo * nmo), jnp.float32)
    Tlo = jnp.zeros((naux, nmo * nmo), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=("tile",))
    def _acc(Th, Tl, bh, bl, off, tile=512):
        uh, ul = _transform_block(bh, bl, ch[0], ch[1], ch[0], ch[1],
                                  tile=tile)
        Th = jax.lax.dynamic_update_slice_in_dim(Th, uh, off, 0)
        Tl = jax.lax.dynamic_update_slice_in_dim(Tl, ul, off, 0)
        return Th, Tl

    off = 0
    t0 = _time.time()
    while off < naux:
        _progress("stream j3c->MO", off, naux, t0)
        q = min(aux_chunk, naux - off)
        bh, bl = _split_dev(j3c[off:off + q])
        Thi, Tlo = _acc(Thi, Tlo, bh, bl, jnp.int32(off), tile=tile)
        jax.block_until_ready(Thi)  # bound in-flight h2d (see build_b_device)
        _free(bh, bl)
        off += q

    # stage 2: metric dressing, in place over column blocks.  No column
    # equilibration here: the MO-space columns are already balanced
    # (each mixes all AO pairs), and an exact power-of-2 scale would
    # need a host round-trip per block.
    uh, ul = _split_dev(U)
    sh, sl = _split_dev(1.0 / np.sqrt(w))
    nnull = _nnull(w)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=("cc", "nnull", "tile"))
    def _dress_cols(Th, Tl, off, cc, nnull=0, tile=512):
        bh = jax.lax.dynamic_slice_in_dim(Th, off, cc, axis=1)
        bl = jax.lax.dynamic_slice_in_dim(Tl, off, cc, axis=1)
        ph, pl = _dress(uh, ul, sh, sl, bh, bl, nnull=nnull, tile=tile)
        Th = jax.lax.dynamic_update_slice_in_dim(Th, ph, off, axis=1)
        Tl = jax.lax.dynamic_update_slice_in_dim(Tl, pl, off, axis=1)
        return Th, Tl

    ncol = nmo * nmo
    off = 0
    t0 = _time.time()
    while off < ncol:
        cc = min(col_chunk, ncol - off)
        Thi, Tlo = _dress_cols(Thi, Tlo, jnp.int32(off), cc=cc,
                               nnull=nnull, tile=tile)
        jax.block_until_ready(Thi)
        off += cc
        _progress("dress MO cols", off, ncol, t0)
    return Thi.reshape(naux, nmo, nmo), Tlo.reshape(naux, nmo, nmo)


def build_bmo_device_packed(metric_eig, j3c: np.ndarray, C: np.ndarray,
                            aux_chunk: int = 128, col_chunk: int = 1 << 13,
                            tile: int = 512):
    """Packed-symmetric `build_bmo_device`: B^MO stored as the lower pair
    triangle (naux_pad, nmo*(nmo+1)/2) with the lo half in bf16.

    The storage that fits TTM-1Cz/dzp (862 AO: full f32 pair = 34.6 GB,
    packed hi + bf16 lo = 13 GB) on a 16 GB v5e:

      * hi: exact f32 of the compensated build — the production solve
        tensor (`DFData(packed=True)`, unpacked per aux chunk in the
        sigma);
      * lo: bf16 of the compensation term (|lo| <~ 6e-8 |hi|, so bf16's
        8 mantissa bits keep the joined f64 twin at ~2e-10 relative —
        plenty for the host Rayleigh–Ritz refinement it exists for).

    The aux axis is zero-row padded to a multiple of 256 (U padded with
    zero rows — dressed zero rows are exactly zero) so the sigma's
    chunked scan has power-of-2 divisors.
    """
    w, U = metric_eig
    naux, nao = j3c.shape[0], j3c.shape[1]
    nmo = C.shape[1]
    fpk, _, _ = pack_indices(nmo)
    fpk_d = jnp.asarray(fpk)
    npair = fpk.size
    naux_pad = -(-naux // 256) * 256
    ch = _split_dev(C)
    Thi = jnp.zeros((naux_pad, npair), jnp.float32)
    Tlo = jnp.zeros((naux_pad, npair), jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=("tile",))
    def _acc(Th, Tl, bh, bl, off, tile=512):
        uh, ul = _transform_block(bh, bl, ch[0], ch[1], ch[0], ch[1],
                                  tile=tile)
        uh = jnp.take(uh, fpk_d, axis=1)
        ul = jnp.take(ul, fpk_d, axis=1)
        Th = jax.lax.dynamic_update_slice_in_dim(Th, uh, off, 0)
        Tl = jax.lax.dynamic_update_slice_in_dim(
            Tl, ul.astype(jnp.bfloat16), off, 0)
        return Th, Tl

    off = 0
    t0 = _time.time()
    while off < naux:
        _progress("stream j3c->MO", off, naux, t0)
        q = min(aux_chunk, naux - off)
        bh, bl = _split_dev(j3c[off:off + q])
        Thi, Tlo = _acc(Thi, Tlo, bh, bl, jnp.int32(off), tile=tile)
        jax.block_until_ready(Thi)  # bound in-flight h2d (see build_b_device)
        _free(bh, bl)
        off += q

    U_pad = np.zeros((naux_pad, U.shape[1]), dtype=np.float64)
    U_pad[:naux] = U
    uh, ul = _split_dev(U_pad)
    sh, sl = _split_dev(1.0 / np.sqrt(w))
    nnull = _nnull(w)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=("cc", "nnull", "tile"))
    def _dress_cols(Th, Tl, off, cc, nnull=0, tile=512):
        bh = jax.lax.dynamic_slice_in_dim(Th, off, cc, axis=1)
        bl = jax.lax.dynamic_slice_in_dim(Tl, off, cc, axis=1).astype(
            jnp.float32)
        ph, pl = _dress(uh, ul, sh, sl, bh, bl, nnull=nnull, tile=tile)
        Th = jax.lax.dynamic_update_slice_in_dim(Th, ph, off, axis=1)
        Tl = jax.lax.dynamic_update_slice_in_dim(
            Tl, pl.astype(jnp.bfloat16), off, axis=1)
        return Th, Tl

    off = 0
    t0 = _time.time()
    while off < npair:
        cc = min(col_chunk, npair - off)
        Thi, Tlo = _dress_cols(Thi, Tlo, jnp.int32(off), cc=cc,
                               nnull=nnull, tile=tile)
        jax.block_until_ready(Thi)
        off += cc
        _progress("dress MO cols", off, npair, t0)
    return Thi, Tlo


def transform_mo_device(X: np.ndarray, C: np.ndarray, tile: int = 512,
                        chunk: int = 1 << 16):
    """Row-chunked compensated device matmul X @ C for host-f64 X of
    shape (..., nao): returns the (hi, lo) f32 device pair reshaped to
    X.shape[:-1] + (nmo,).  Used for the grid-AO -> grid-MO transform of
    the response quadrature at production sizes (host dgemm there is
    ~1e14 flops)."""
    lead = X.shape[:-1]
    nao = X.shape[-1]
    X2 = np.ascontiguousarray(X).reshape(-1, nao)
    ch = _split_dev(C)
    nrow = X2.shape[0]
    hs, ls = [], []
    for off in range(0, nrow, chunk):
        bh, bl = _split_dev(X2[off:off + chunk])
        uh, ul = ts_matmul(bh, bl, ch[0], ch[1], tile=tile)
        jax.block_until_ready(uh)
        _free(bh, bl)
        hs.append(uh)
        ls.append(ul)
    nmo = C.shape[1]
    hi = jnp.concatenate(hs, axis=0).reshape(*lead, nmo)
    lo = jnp.concatenate(ls, axis=0).reshape(*lead, nmo)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("tile",))
def _transform_block(bh, bl, Co_hi, Co_lo, Cv_hi, Cv_lo, tile=512):
    """One aux block of the MO half-transforms: j3c[Q,mn] -> (Q, no*nv).

    Dressing commutes with the MO transform, so the response path never
    materializes the AO-basis B at all: transform each raw j3c block to
    (occ, virt) first (output is naux*no*nv — tiny next to naux*nao^2),
    dress afterwards."""
    q, nao, _ = bh.shape
    no = Co_hi.shape[1]
    # (Q*nao, nao) @ (nao, no) -> (Q, nao, no)
    th, tl = ts_matmul(bh.reshape(-1, nao), bl.reshape(-1, nao),
                       Co_hi, Co_lo, tile=tile)
    th = th.reshape(q, nao, no).transpose(0, 2, 1).reshape(-1, nao)
    tl = tl.reshape(q, nao, no).transpose(0, 2, 1).reshape(-1, nao)
    # (Q*no, nao) @ (nao, nv) -> (Q, no, nv)
    uh, ul = ts_matmul(th, tl, Cv_hi, Cv_lo, tile=tile)
    nv = Cv_hi.shape[1]
    return uh.reshape(q, no * nv), ul.reshape(q, no * nv)


def build_bov_device(metric_eig, j3c: np.ndarray,
                     C_occ: np.ndarray, C_virt: np.ndarray,
                     aux_chunk: int = 256, tile: int = 512):
    """MO-transformed dressed tensor B_ov = V^{-1/2} (j3c | C_occ, C_virt)
    as a device (hi, lo) pair of shape (naux, no, nv).

    The raw j3c streams through the chip once in aux chunks; only the
    (naux, no*nv) transformed tensor stays resident, so response-scale
    problems never hold the AO-basis B."""
    w, U = metric_eig
    naux, nao = j3c.shape[0], j3c.shape[1]
    no, nv = C_occ.shape[1], C_virt.shape[1]
    co = _split_dev(C_occ)
    cv = _split_dev(C_virt)
    Thi = jnp.zeros((naux, no * nv), jnp.float32)
    Tlo = jnp.zeros((naux, no * nv), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _acc(Th, Tl, bh, bl, off):
        uh, ul = _transform_block(bh, bl, co[0], co[1], cv[0], cv[1],
                                  tile=tile)
        Th = jax.lax.dynamic_update_slice_in_dim(Th, uh, off, 0)
        Tl = jax.lax.dynamic_update_slice_in_dim(Tl, ul, off, 0)
        return Th, Tl

    # two compiled shapes at most: full chunks + one remainder
    off = 0
    t0 = _time.time()
    while off < naux:
        _progress("stream j3c->ov", off, naux, t0)
        q = min(aux_chunk, naux - off)
        bh, bl = _split_dev(j3c[off:off + q])
        Thi, Tlo = _acc(Thi, Tlo, bh, bl, jnp.int32(off))
        jax.block_until_ready(Thi)  # bound in-flight h2d (see build_b_device)
        _free(bh, bl)
        off += q
    uh, ul = _split_dev(U)
    sh, sl = _split_dev(1.0 / np.sqrt(w))
    Bh, Bl = _dress(uh, ul, sh, sl, Thi, Tlo, nnull=_nnull(w), tile=tile)
    return Bh.reshape(naux, no, nv), Bl.reshape(naux, no, nv)
