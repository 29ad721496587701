"""Record the dp x tp SPMD scaling sweep as a committed artifact.

VERDICT r2 item 8: the factorization sweep of the production-dim X-TDA
DF sigma operator (dim=146359, the bench headline MO-space shape) over
an 8-device mesh existed only as transient dryrun prose.  This tool runs
every 2D factorization of the mesh on the virtual CPU device grid and
persists the table — per-factorization sigma parity vs the single-device
build, and per-device bytes of the dominant sharded tensors — to
``tests/data/spmd_sweep.json`` so the scaling headroom claim is a
recorded number.

Multi-chip analog of the parallelism surface the reference lacks
entirely (SURVEY.md §2.5: the reference is single-GPU CuPy,
`/root/reference/xtddft/XTDA_GPU.py`; no distributed backend).

Run:  python tools/record_spmd_sweep.py [n_devices]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ.setdefault("XTDDFT_COMPILE_CACHE", "0")
os.environ["XTDDFT_PLATFORM"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N}"
    ).strip()

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import xtddft_tpu  # noqa: F401  (jax config)
    from xtddft_tpu.parallel.mesh import shard_df_data, trial_sharding
    from xtddft_tpu.response.sigma_df import synthetic_df_data, xtda_sigma_df

    devs = jax.devices()[:N]
    assert len(devs) == N, f"need {N} devices, found {len(devs)}"

    nmo, nc, no, naux, ngrid = 1000, 79, 1, 256, 2048
    ndata = synthetic_df_data(nmo=nmo, nc=nc, no=no, naux=naux, ngrid=ngrid,
                              xc="bhandhlyp")
    op1 = xtda_sigma_df(ndata)
    rng = np.random.default_rng(7)
    z = rng.normal(size=(N, op1.dim)).astype(np.float32)
    t0 = time.time()
    y_ref = np.asarray(op1.matvec(jnp.asarray(z)))
    t_single = time.time() - t0
    print(f"single-device reference matvec: dim={op1.dim} "
          f"({t_single:.0f}s incl. compile)", flush=True)

    rows = []
    dp = 1
    while dp <= N:
        tp = N // dp
        if dp * tp == N:
            t0 = time.time()
            m2 = Mesh(np.array(devs).reshape(dp, tp), ("dp", "tp"))
            sop = xtda_sigma_df(shard_df_data(ndata, m2), spmd=True)
            zs = jax.device_put(jnp.asarray(z), trial_sharding(m2))
            ys = np.asarray(sop.matvec(zs))
            rel = float(np.abs(ys - y_ref).max() / np.abs(y_ref).max())
            assert rel < 1e-4, f"dp{dp}xtp{tp} sigma drift {rel:.2e}"
            per_dev = {}
            for name in ("B", "phi"):
                arr = sop.consts.get(name)
                if arr is None or not hasattr(arr, "addressable_shards"):
                    continue
                per_dev[name] = sum(
                    s.data.nbytes for s in arr.addressable_shards
                    if s.device == devs[0])
            rows.append({
                "dp": dp, "tp": tp, "rel_err_vs_single_device": rel,
                "per_device_bytes": per_dev,
                "wall_s_incl_compile": round(time.time() - t0, 1),
            })
            print(f"dp{dp}xtp{tp}: rel={rel:.2e} "
                  f"B/dev={per_dev.get('B', 0)/1e6:.0f}MB "
                  f"({rows[-1]['wall_s_incl_compile']}s)", flush=True)
        dp *= 2

    out = {
        "operator": "xtda_sigma_df (bhandhlyp: J + fxc + 0.5*K + dA)",
        "nmo": nmo, "nc": nc, "no": no, "naux": naux, "ngrid": ngrid,
        "dim": int(op1.dim),
        "n_devices": N,
        "mesh_backend": jax.devices()[0].platform,
        "note": ("virtual CPU mesh (driver test config): parity + "
                 "per-device footprint are exact; wall times are NOT "
                 "throughput claims (all devices share one core). aux "
                 "(B) and grid (phi) axes shard linearly over tp; trial "
                 "batch over dp."),
        "batch": N,
        "sweep": rows,
    }
    p = ROOT / "tests" / "data" / "spmd_sweep.json"
    p.write_text(json.dumps(out, indent=1))
    print("wrote", p, flush=True)


if __name__ == "__main__":
    main()
