"""Compensated double-single matmul: accuracy + interface (CPU backend).

On the CPU backend dsmat dispatches to native f64 (XLA:CPU's fusion
emitter contracts multi-use products into FMA, provably breaking EFT
algebra under jit — see dsmat._native_f64), so these tests gate the
hi/lo splitting contract and call interfaces; the EFT/MXU pass structure
is exercised on-chip by the bench and the production SCF.
"""

import numpy as np

from xtddft_tpu.utils.dsmat import join_f64, split_f64, ts_matmul, ts_syrk


def test_split_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 17)) * 10.0**rng.integers(-6, 6, size=(40, 17))
    hi, lo = split_f64(x)
    assert np.abs(hi.astype(np.float64) + lo - x).max() <= np.abs(x).max() * 2**-46


def test_ts_matmul_beats_plain_f32():
    # same-sign products: the condition-number-1 regime where plain f32
    # accumulation drifts linearly with the reduction length
    rng = np.random.default_rng(1)
    m, k, n = 48, 20000, 32  # k deliberately not a tile multiple
    A = np.abs(rng.normal(size=(m, k))) / np.sqrt(k)
    B = np.abs(rng.normal(size=(k, n))) / np.sqrt(k)
    C = A @ B
    ahi, alo = split_f64(A)
    bhi, blo = split_f64(B)
    plain = (ahi @ bhi).astype(np.float64)
    comp = join_f64(*ts_matmul(ahi, alo, bhi, blo, tile=256))
    scale = np.abs(C).max()
    assert np.abs(comp - C).max() / scale < 2e-7
    assert np.abs(comp - C).max() < 0.5 * max(np.abs(plain - C).max(), 1e-30)


def test_ts_matmul_none_lo():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(32, 1024)).astype(np.float32)
    B = rng.normal(size=(1024, 16)).astype(np.float32)
    ref = A.astype(np.float64) @ B.astype(np.float64)
    out = join_f64(*ts_matmul(A, None, B, None, tile=256))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-6


def test_ts_syrk_symmetric():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(48, 3000)) / 50.0
    hi, lo = split_f64(A)
    out = join_f64(*ts_syrk(hi, lo, tile=512))
    ref = A @ A.T
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-7
    assert np.abs(out - out.T).max() < 1e-12
