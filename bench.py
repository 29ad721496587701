"""Benchmark: XSF-TDA batched sigma builds per second per chip.

The Davidson hot loop (SURVEY.md §3.2) is the production cost center; this
measures jitted batched sigma-build throughput on the flagship XSF-TDA
operator (SF response: exchange K + ALDA0 grid kernel + spin-adapted dA)
at a representative single-chip in-core size.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: measured builds/sec divided by the north-star requirement of
20 roots in <60 s (~0.33 sigma builds/sec, BASELINE.md) — >1 means each
sigma build is faster than the budget requires.
"""

import json
import time

import numpy as np


def main():
    import jax

    from xtddft_tpu.utils.synthetic import make_synthetic_reference
    from xtddft_tpu.response.sigma_xsf import xsf_sigma_operator

    nao = 128
    batch = 16
    # f32 device path: f64 is software-emulated on this TPU (pathological
    # compile); the accuracy roadmap is compensated-f32 Pallas kernels.
    ref = make_synthetic_reference(
        nao=nao, nc=40, no=2, ngrid=65536, seed=0, symmetrize=False,
        dtype=np.float32,
    )
    op = xsf_sigma_operator(ref, SA=3, fglobal=0.65, remove=True)
    rng = np.random.default_rng(0)
    Z = rng.normal(size=(batch, op.dim))

    # compile + warm up
    out = op.matvec(Z)
    jax.block_until_ready(out)

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = op.matvec(Z)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    builds_per_sec = n_iter * batch / dt
    target = 20.0 / 60.0  # 20 sigma builds within 60 s (north star budget)
    print(
        json.dumps(
            {
                "metric": "xsf_sigma_builds_per_sec_per_chip",
                "value": round(builds_per_sec, 3),
                "unit": f"sigma/s (nao={nao}, batch={batch}, f32, in-core)",
                "vs_baseline": round(builds_per_sec / target, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
