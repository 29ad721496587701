"""Micro-validation of the dressing stages on real dzp data.

Stage-by-stage: W = U^T blk (EFT lane rows vs MXU lane rows vs host
f64), then the full `_dress` of a handful of real j3c pair columns vs
the host-f64 dressing.  Localizes the 62-Ha J error to a specific stage
of `scf/df_build.py`.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
CACHE = ROOT / "cache"
TAG = "ttm_dzp"


def main():
    import jax.numpy as jnp

    from xtddft_tpu import config as _cfg
    from xtddft_tpu.scf.df_build import (_dress, _nnull, _pow2_colscale,
                                         _split_dev, pack_indices)
    from xtddft_tpu.utils.dsmat import eft_matmul_small, ts_matmul

    _cfg.initialize()

    j3c = np.load(CACHE / f"{TAG}_j3c.npy", mmap_mode="r")
    w = np.load(CACHE / f"{TAG}_metric_w.npy")
    U = np.load(CACHE / f"{TAG}_metric_U.npy")
    naux, nao = j3c.shape[0], j3c.shape[1]
    nnull = _nnull(w)
    print(f"naux={naux} nao={nao} nkept={w.size} nnull={nnull}", flush=True)

    # a handful of real pair columns, including a known-bad one
    j2 = j3c.reshape(naux, -1)
    flat = [319751, 304420, 173637, 104166, 12345, 200000]
    blk = np.stack([np.asarray(j2[:, c]) for c in flat], axis=1)  # (naux, 6)
    cs = _pow2_colscale(blk)
    blk_s = blk / cs[None, :]

    # host-f64 reference of each stage
    W_exact = U.T @ blk_s
    s = 1.0 / np.sqrt(w)
    B_exact = (U @ (W_exact * cs[None, :] * s[:, None]))

    bh, bl = _split_dev(blk_s)
    uh, ul = _split_dev(U)
    sh, sl = _split_dev(s)

    # stage 1a: EFT lane rows
    wnh, wnl = eft_matmul_small(uh[:, :nnull].T, ul[:, :nnull].T, bh, bl)
    Wn = np.asarray(wnh, np.float64) + np.asarray(wnl, np.float64)
    err_n = Wn - W_exact[:nnull]
    print("EFT lane rows: max|err| =", np.abs(err_n).max(),
          " scale:", np.abs(W_exact[:nnull]).max(),
          " worst amplified:", np.abs(err_n * s[:nnull, None]).max(),
          flush=True)

    # stage 1b: MXU lane rows
    wh, wl = ts_matmul(uh.T, ul.T, bh, bl, tile=512)
    Wm = np.asarray(wh, np.float64) + np.asarray(wl, np.float64)
    err_m = Wm - W_exact
    amp_m = np.abs(err_m * s[:, None])
    print("MXU lane rows: max|err| =", np.abs(err_m).max(),
          " worst amplified (all rows):", amp_m.max(),
          " worst amplified (rows >= nnull):", amp_m[nnull:].max(),
          flush=True)

    # full _dress vs exact
    ph, pl = _dress(uh, ul, sh, sl, bh, bl,
                    cs=jnp.asarray(cs, dtype=jnp.float32), nnull=nnull)
    Bd = np.asarray(ph, np.float64) + np.asarray(pl, np.float64)
    err_B = Bd - B_exact
    for k, c in enumerate(flat):
        print(f"col flat={c}: |exact|={np.linalg.norm(B_exact[:, k]):.3e} "
              f"|err|={np.linalg.norm(err_B[:, k]):.3e}", flush=True)


if __name__ == "__main__":
    main()
