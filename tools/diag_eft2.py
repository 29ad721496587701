"""Reproduce ONE packed-build block exactly and compare a known-bad
column against host f64, varying block width — bisects whether the
packed build's wide (8192-column) blocks are what degrades `_dress`.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
CACHE = ROOT / "cache"
TAG = "ttm_dzp"
BAD = 319751  # flat index of a column with |err|=3e-2 in the packed build


def main():
    import jax.numpy as jnp

    from xtddft_tpu import config as _cfg
    from xtddft_tpu.scf.df_build import (_dress, _nnull, _pow2_colscale,
                                         _split_dev, pack_indices)

    _cfg.initialize()

    j3c = np.load(CACHE / f"{TAG}_j3c.npy", mmap_mode="r")
    w = np.load(CACHE / f"{TAG}_metric_w.npy")
    U = np.load(CACHE / f"{TAG}_metric_U.npy")
    naux, nao = j3c.shape[0], j3c.shape[1]
    nnull = _nnull(w)
    col_chunk = 1 << 13
    flat_pack, _, _ = pack_indices(nao)
    j2 = j3c.reshape(naux, -1)

    off = (BAD // col_chunk) * col_chunk
    hi = min(off + col_chunk, nao * nao)
    lo_i = np.searchsorted(flat_pack, off)
    hi_i = np.searchsorted(flat_pack, hi)
    sel = flat_pack[lo_i:hi_i] - off
    blk_full = np.asarray(j2[:, off:hi])[:, sel]
    kpos = int(np.searchsorted(flat_pack[lo_i:hi_i], BAD))
    assert flat_pack[lo_i + kpos] == BAD
    print(f"block [{lo_i},{hi_i}) width={hi_i-lo_i} kpos={kpos}", flush=True)

    s = 1.0 / np.sqrt(w)
    uh, ul = _split_dev(U)
    sh, sl = _split_dev(s)

    raw = blk_full[:, kpos]
    exact = U @ ((U.T @ raw) / np.sqrt(w))

    for width in (1, 64, 1024, blk_full.shape[1]):
        sub = blk_full[:, max(0, kpos - width + 1): kpos + 1]
        kk = sub.shape[1] - 1
        cs = _pow2_colscale(sub)
        bh, bl = _split_dev(sub / cs[None, :])
        t0 = time.time()
        ph, pl = _dress(uh, ul, sh, sl, bh, bl,
                        cs=jnp.asarray(cs, dtype=jnp.float32), nnull=nnull)
        col = (np.asarray(ph[:, kk], np.float64)
               + np.asarray(pl[:, kk], np.float64))
        col_hi = np.asarray(ph[:, kk], np.float64)
        print(f"width={sub.shape[1]:5d}: |err(hi+lo)|="
              f"{np.linalg.norm(col - exact):.3e}  |err(hi)|="
              f"{np.linalg.norm(col_hi - exact):.3e}  "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
