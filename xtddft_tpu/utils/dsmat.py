"""Compensated (double-single) matrix products for the TPU MXU.

The TPU has no f64 matmul datapath (f64 is software-emulated, orders of
magnitude slower), but the DF-SCF refinement cycles need Fock-quality
(~1e-7 absolute) contractions over long reduction axes where plain f32
accumulation drifts.  Measured on the production chip (512x262144x512,
random data):

    plain f32, precision='default'  : 2.4e-3  (single-pass bf16 products)
    plain f32, precision='highest'  : 4.0e-6  (6-pass bf16 = true-f32
                                               products, f32 accumulator)
    ts_matmul (this module)         : ~2e-7 at tile=2048, ~5e-8 at 512

Three standard error-free-transform ingredients, mapped to what the MXU
can actually do:

1. operands carried as unevaluated f32 pairs ``x = hi + lo``
   (``hi = f32(x)``, ``lo = f32(x - hi)``): representation error ~2^-48;
2. the main product ``hi @ hi`` at matmul precision 'highest' (true-f32
   products); the cross terms ``hi@lo + lo@hi`` are ~2^-24 smaller, so
   single-pass bf16 ('default') precision suffices for them — the whole
   compensated product costs ~1.4x one 'highest' matmul;
3. the reduction axis processed in tiles, the tile partials accumulated
   with the TwoSum error-free transform into an (s, e) f32 pair — the
   accumulation error stops growing with the reduction length.

This is the idiomatic TPU answer to the reference's reliance on host
LAPACK/numpy f64 throughout (`/root/reference/xtddft/XTDA.py` does all
linear algebra in numpy): keep the hot contraction on the MXU, recover
the digits with EFT arithmetic, never touch emulated f64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def split_f64(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host f64 -> (hi, lo) f32 pair with hi + lo == x to ~2^-48."""
    hi = np.asarray(x, dtype=np.float32)
    lo = (np.asarray(x, dtype=np.float64) - hi.astype(np.float64)).astype(
        np.float32
    )
    return hi, lo


def join_f64(hi, lo) -> np.ndarray:
    """(hi, lo) device pair -> host f64 array."""
    return np.asarray(hi, dtype=np.float64) + np.asarray(lo, dtype=np.float64)


def _ob(x):
    """Optimization barrier against HLO-level algebraic rewrites of the
    error-free-transform algebra (e.g. (s+p)-s -> p)."""
    return jax.lax.optimization_barrier(x)


def _native_f64() -> bool:
    """True when the active backend should bypass EFT and use real f64.

    XLA:CPU recomputes multi-use products inside elementwise fusions and
    LLVM contracts each use independently into FMA (measured: jitted
    ``a*b + c`` matches fma-rounding exactly while eager matches
    separate-rounding), which silently breaks Dekker/TwoSum invariants —
    optimization_barrier does not survive to codegen, so no HLO-level
    defense exists.  The CPU backend has a native f64 datapath anyway, so
    the honest implementation of "f64-quality product" there IS f64; the
    EFT path is the contract only for the TPU, whose emitter preserves
    the algebra as written (chip-measured accuracies in the module
    docstring).  Evaluated at trace time: one backend per process."""
    return jax.default_backend() == "cpu"


def _split_dev(x):
    """Device f64 -> (hi, lo) f32 pair (traced)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _join_dev(hi, lo):
    """Device (hi, lo) -> f64 (traced). lo may be None."""
    x = hi.astype(jnp.float64)
    return x if lo is None else x + lo.astype(jnp.float64)


def _two_sum(s, p):
    """Knuth TwoSum: s + p = t + e exactly (all f32)."""
    if _native_f64():
        return _split_dev(_join_dev(s, None) + _join_dev(p, None))
    t = _ob(s + p)
    z = _ob(t - s)
    e = (s - (t - z)) + (p - z)
    return t, e


def ew_add(s, p):
    """Elementwise TwoSum (public alias)."""
    return _two_sum(s, p)


def ew_mul(ah, al, b, bl=None):
    """Elementwise EFT product: (ah+al)*(b+bl) -> (hi, lo) with the f32
    product rounding recovered via Veltkamp TwoProduct (no fma on TPU)."""
    if _native_f64():
        return _split_dev(_join_dev(ah, al) * _join_dev(b, bl))
    p = _ob(ah * b)
    a0, a1 = _vsplit(ah)
    b0, b1 = _vsplit(b)
    err = ((a0 * b0 - p) + a0 * b1 + a1 * b0) + a1 * b1
    lo = err + al * b
    if bl is not None:
        lo = lo + ah * bl
    return p, lo


def _vsplit(x):
    """Veltkamp split of f32 into (h0, h1), x = h0 + h1 exactly with ~12
    significant bits each: products h0*h0 are then EXACT in f32 — used by
    the elementwise EFT products in scf/jk_device.

    (A matmul variant built on this split was tried and measured: it does
    NOT help ts_matmul, because the error floor there is the *in-tile f32
    accumulation* of the MXU reduction, not product rounding — exact
    12-bit products still round at every f32 add, and exact accumulation
    would need mantissa headroom (k<=2^(24-2*12) terms) no useful tile
    satisfies.  Accumulation error is controlled by ``tile`` instead.)"""
    c = _ob(x * 4097.0)  # 2^12 + 1
    h0 = _ob(c - (c - x))
    return h0, x - h0


@functools.partial(jax.jit, static_argnames=("tile",))
def ts_matmul(a_hi, a_lo, b_hi, b_lo, tile: int = 512):
    """(m,k) @ (k,n) with compensated accumulation -> (c_hi, c_lo) f32 pair.

    a_lo / b_lo may be None for operands already exact in f32 (pass
    explicitly; no implicit zeros are allocated).  The reduction axis is
    walked in ``tile``-sized slices with a fori_loop (no transposed or
    padded copy of the operands is ever materialized — at production
    sizes the B tensor is several GB).  In-tile accumulation error grows
    ~sqrt(tile)*2^-24 of the tile partial: shrink ``tile`` for same-sign
    (electrostatic) reductions.
    """
    if _native_f64():
        with jax.default_matmul_precision("highest"):
            return _split_dev(_join_dev(a_hi, a_lo) @ _join_dev(b_hi, b_lo))
    m, k = a_hi.shape
    n = b_hi.shape[1]
    nt = k // tile

    def partial_product(a, al, b, bl):
        with jax.default_matmul_precision("highest"):
            p = a @ b
            corr = 0.0
        with jax.default_matmul_precision("default"):
            if bl is not None:
                corr = corr + a @ bl
            if al is not None:
                corr = corr + al @ b
        return p, corr

    def body(i, carry):
        s, e = carry
        off = i * tile
        a = jax.lax.dynamic_slice_in_dim(a_hi, off, tile, 1)
        al = (jax.lax.dynamic_slice_in_dim(a_lo, off, tile, 1)
              if a_lo is not None else None)
        b = jax.lax.dynamic_slice_in_dim(b_hi, off, tile, 0)
        bl = (jax.lax.dynamic_slice_in_dim(b_lo, off, tile, 0)
              if b_lo is not None else None)
        p, corr = partial_product(a, al, b, bl)
        s, e2 = _two_sum(s, p)
        return (s, e + (e2 + corr))

    s = jnp.zeros((m, n), jnp.float32)
    e = jnp.zeros((m, n), jnp.float32)
    if nt > 0:
        s, e = jax.lax.fori_loop(0, nt, body, (s, e))
    rem = k - nt * tile
    if rem:
        a = jax.lax.slice_in_dim(a_hi, nt * tile, k, axis=1)
        al = (jax.lax.slice_in_dim(a_lo, nt * tile, k, axis=1)
              if a_lo is not None else None)
        b = jax.lax.slice_in_dim(b_hi, nt * tile, k, axis=0)
        bl = (jax.lax.slice_in_dim(b_lo, nt * tile, k, axis=0)
              if b_lo is not None else None)
        p, corr = partial_product(a, al, b, bl)
        s, e2 = _two_sum(s, p)
        e = e + (e2 + corr)
    # final renormalization: the TwoSum chain leaves (s, e) with |e| up
    # to ~2^-24 * max|partial sum|, which under cancellation can DWARF
    # the result itself — a consumer keeping only `hi` (packed-B /
    # keep_lo=False storage, `scf/df_build.py`) would then drop real
    # signal (r4: 3e-2 absolute B error -> 62 Ha Coulomb error at
    # TTM/dzp).  One more TwoSum is exact (hi+lo unchanged) and makes
    # `hi` the correctly-rounded f32 of the compensated sum.
    return _two_sum(s, e)


@jax.jit
def eft_matmul_small(a_hi, a_lo, b_hi, b_lo):
    """(m,k) @ (k,n) with FULLY error-free-transformed accumulation: every
    product Veltkamp-exact, every add TwoSum-compensated — error ~2^-45
    relative to the element scale, independent of cancellation.

    Cost is k rank-1 VPU passes (no MXU), so m must be small: this is the
    'exact lane' for cancellation-sensitive rows (the near-null metric
    modes of the DF dressing, `scf/df_build.py`), where an MXU matmul's
    f32 partial-sum rounding (~2^-24 * max|partial|) gets amplified by
    1/sqrt(w) past usefulness.  a_lo/b_lo may be None."""
    if _native_f64():
        with jax.default_matmul_precision("highest"):
            return _split_dev(_join_dev(a_hi, a_lo) @ _join_dev(b_hi, b_lo))
    m, k = a_hi.shape
    n = b_hi.shape[1]
    zl = jnp.zeros((), jnp.float32)

    def body(i, carry):
        s, e = carry
        ah = jax.lax.dynamic_slice_in_dim(a_hi, i, 1, 1)  # (m, 1)
        al = (jax.lax.dynamic_slice_in_dim(a_lo, i, 1, 1)
              if a_lo is not None else zl)
        bh = jax.lax.dynamic_slice_in_dim(b_hi, i, 1, 0)  # (1, n)
        bl = (jax.lax.dynamic_slice_in_dim(b_lo, i, 1, 0)
              if b_lo is not None else None)
        ph, pl = ew_mul(ah, al, bh, bl)
        s, e2 = _two_sum(s, ph)
        return s, e + (e2 + pl)

    s = jnp.zeros((m, n), jnp.float32)
    e = jnp.zeros((m, n), jnp.float32)
    s, e = jax.lax.fori_loop(0, k, body, (s, e))
    return _two_sum(s, e)  # renormalize: hi = correctly-rounded f32 sum


@functools.partial(jax.jit, static_argnames=("tile",))
def ts_syrk(a_hi, a_lo, tile: int = 512):
    """A @ A.T with compensated accumulation -> (c_hi, c_lo).

    The DF exchange step K = T T^T; XLA will not exploit the symmetry,
    but the hi/lo structure of T (typically itself the output of a
    ts_matmul) is reused directly.
    """
    at_hi = a_hi.T
    at_lo = a_lo.T if a_lo is not None else None
    return ts_matmul(a_hi, a_lo, at_hi, at_lo, tile=tile)
