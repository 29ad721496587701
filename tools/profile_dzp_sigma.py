"""Per-phase profile of the dzp production sigma on the chip.

VERDICT r4 weak #3: the production solve runs at ~13 TFLOP/s vs the
55 TFLOP/s synthetic ceiling and nothing records where the time goes.
This tool times the production matvec (nz=20, the Davidson block size)
in ablations on the real cached state:

  full        J/K + fxc + dA + Fock     (precision='highest' AND default)
  no-fxc      spec/phi stripped         -> fxc cost by difference
  no-dA       fock_hf stripped          -> dA cost by difference
  aux-budget  the K-chunk residency/loop-overhead trade
              (XTDDFT_AUX_BUDGET sweep)

and writes tests/data/profile_{tag}.json with wall times and derived
TFLOP/s per phase, so the "Pallas not yet needed" position is backed by
data at production size (GAPS.md).

Run:  python tools/profile_dzp_sigma.py [geometry] [basis]
"""

from __future__ import annotations

import dataclasses
import json
import os
import pathlib
import sys
import time

os.environ.setdefault("XTDDFT_PROGRESS", "1")  # streaming-loop liveness
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ROOT = pathlib.Path(__file__).resolve().parents[1]
CACHE = ROOT / "cache"
DATA = ROOT / "tests" / "data"

GEOM = sys.argv[1] if len(sys.argv) > 1 else "ttm_vacuum"
BASIS = sys.argv[2] if len(sys.argv) > 2 else "dzp"
TAG = GEOM.replace("_vacuum", "") + "_" + BASIS.replace("-", "")
NZ = 20


def _device_warmup(timeout: float = 240.0):
    import os
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(timeout):
            print("device session init wedged; exiting for retry",
                  flush=True)
            os._exit(7)

    threading.Thread(target=_watch, daemon=True).start()

    import numpy as np
    import jax.numpy as jnp

    x = jnp.asarray(np.ones((256, 256), dtype=np.float32))
    (x @ x).block_until_ready()
    done.set()
    print("device warmup ok", flush=True)


def _time_op(op, z, nrep=5):
    import numpy as np

    out = op.matvec(z)  # compile + first run
    np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = op.matvec(z)
    np.asarray(out[:1, :1])  # sync
    return (time.perf_counter() - t0) / nrep


def main():
    import numpy as np

    _device_warmup()

    from bench import matvec_flops
    from xtddft_tpu.response.production import build_production_state
    from xtddft_tpu.response.reference_state import make_reference
    from xtddft_tpu.response.sigma_df import xtda_sigma_df
    from xtddft_tpu.scf.checkpoint import load_mf

    mf = load_mf(str(DATA / f"{TAG}_ckpt.npz"))
    fhf = np.load(CACHE / f"{TAG}_fockhf.npy")
    ref = make_reference(mf, fock_hf_mo=(fhf[0], fhf[1]))
    data32, _ = build_production_state(ref, cache=CACHE, tag=TAG,
                                       want_f64=False)
    naux = int(data32.B.shape[0])
    ngrid = int(np.asarray(data32.grid_w).size)
    rng = np.random.default_rng(0)
    dim = (ref.nc + ref.no) * ref.nv + ref.nc * (ref.no + ref.nv)
    z = rng.normal(size=(NZ, dim)).astype(np.float32)

    flops_full = matvec_flops(ref.nc, ref.no, ref.nv, naux, ngrid, NZ)
    flops_jk = matvec_flops(ref.nc, ref.no, ref.nv, naux, 0, NZ)

    res = {"tag": TAG, "nz": NZ, "naux": naux, "ngrid": ngrid,
           "dim": dim, "timings_s": {}, "tflops": {}}

    def rec(name, op, flops=None):
        t = _time_op(op, z)
        res["timings_s"][name] = t
        if flops:
            res["tflops"][name] = flops / t / 1e12
        print(f"{name:28s} {t*1000:8.1f} ms"
              + (f"  {flops/t/1e12:6.1f} TFLOP/s" if flops else ""),
              flush=True)
        return t

    # full production op at both precisions
    t_full_hi = rec("full_highest",
                    xtda_sigma_df(data32, precision="highest"), flops_full)
    t_full_def = rec("full_default", xtda_sigma_df(data32), flops_full)

    # ablations (precision='highest', the production mode)
    data_nofxc = dataclasses.replace(data32, spec=None, phi=None)
    t_nofxc = rec("jk_dA_only_highest",
                  xtda_sigma_df(data_nofxc, precision="highest"), flops_jk)
    data_noda = dataclasses.replace(data32, fock_hf_mo=None)
    t_noda = rec("full_no_dA_highest",
                 xtda_sigma_df(data_noda, precision="highest"), flops_full)

    res["derived"] = {
        "fxc_s": t_full_hi - t_nofxc,
        "dA_s": t_full_hi - t_noda,
        "jk_s": t_nofxc,
        "highest_over_default": t_full_hi / t_full_def,
    }
    print("derived:", {k: round(v, 4) for k, v in res["derived"].items()},
          flush=True)

    # aux-budget sweep on the J/K part (the chunked exchange loop)
    import os

    res["aux_budget_sweep"] = {}
    for budget in (7.5e7, 1.5e8, 3e8, 6e8, 1.2e9):
        os.environ["XTDDFT_AUX_BUDGET"] = str(budget)
        try:
            op = xtda_sigma_df(data_nofxc, precision="highest")
            t = _time_op(op, z)
            res["aux_budget_sweep"][f"{budget:.0e}"] = t
            print(f"aux budget {budget:.0e}: {t*1000:8.1f} ms "
                  f"({flops_jk/t/1e12:.1f} TFLOP/s)", flush=True)
        except Exception as exc:  # OOM at large chunks: record and move on
            res["aux_budget_sweep"][f"{budget:.0e}"] = f"error: {exc}"[:100]
            print(f"aux budget {budget:.0e}: {exc}"[:120], flush=True)
    os.environ.pop("XTDDFT_AUX_BUDGET", None)

    p = DATA / f"profile_{TAG}.json"
    p.write_text(json.dumps(res, indent=1))
    print("wrote", p, flush=True)


if __name__ == "__main__":
    main()
