"""Column-wise validation of the on-chip packed B dressing at dzp size.

The dressing B = U diag(1/sqrt(w)) U^T j3c mixes ONLY the aux axis, so
any single pair-column of the exact B is one (naux, naux) matvec on the
host — cheap.  Samples pair columns, pulls the same columns from the
device-built packed B, and reports the error pattern (which columns,
which aux modes), which localizes the 62-Ha J error seen by
diag_dzp_device.py.

Run on the TPU backend:  python tools/diag_dzp_bcols.py
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


def main():
    import jax
    import jax.numpy as jnp

    from xtddft_tpu.scf.df_build import build_b_device, pack_indices
    from xtddft_tpu import config as _cfg

    _cfg.initialize()

    j3c = np.load(CACHE / f"{TAG}_j3c.npy", mmap_mode="r")
    w = np.load(CACHE / f"{TAG}_metric_w.npy")
    U = np.load(CACHE / f"{TAG}_metric_U.npy")
    naux, nao = j3c.shape[0], j3c.shape[1]
    print(f"naux={naux} nao={nao} nkept={w.size}", flush=True)

    t0 = time.time()
    Bp, _ = build_b_device((w, U), j3c, packed=True)
    print(f"packed build: {time.time()-t0:.0f}s", flush=True)

    flat_pack, _, _ = pack_indices(nao)
    npair = flat_pack.size
    rng = np.random.default_rng(3)
    # sample across the packed range INCLUDING block boundaries
    idx = np.unique(np.concatenate([
        rng.integers(0, npair, 160),
        np.arange(0, npair, npair // 40),
    ]))
    cols_dev = np.asarray(jnp.take(Bp, jnp.asarray(idx), axis=1),
                          dtype=np.float64)

    # exact host columns: gather the same raw j3c columns, dress on host
    j2 = j3c.reshape(naux, -1)
    raw = np.empty((naux, idx.size))
    fp = flat_pack[idx]
    for k, c in enumerate(fp):
        raw[:, k] = j2[:, c]
    t1 = (U.T @ raw) / np.sqrt(w)[:, None]
    exact = U @ t1

    err = cols_dev - exact
    cn = np.linalg.norm(exact, axis=0)
    en = np.linalg.norm(err, axis=0)
    rel = en / np.maximum(cn, 1e-300)
    print(f"col norms: exact [{cn.min():.3e}, {cn.max():.3e}]", flush=True)
    print(f"abs err:   [{en.min():.3e}, {en.max():.3e}]  "
          f"rel err: [{rel.min():.3e}, {rel.max():.3e}]", flush=True)
    worst = np.argsort(rel)[::-1][:8]
    for k in worst:
        print(f"  packed col {idx[k]} (flat {fp[k]}, m={fp[k]//nao}, "
              f"n={fp[k]%nao}): |exact|={cn[k]:.3e} |err|={en[k]:.3e} "
              f"rel={rel[k]:.3e}", flush=True)
    # aux-mode localization of the worst column
    kw = worst[0]
    em = U.T @ err[:, kw]
    order = np.argsort(np.abs(em))[::-1][:6]
    print("worst col: largest error modes (mode_idx, w, err_proj):",
          [(int(o), float(w[o]), float(em[o])) for o in order], flush=True)


if __name__ == "__main__":
    main()
