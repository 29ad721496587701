"""20-root DF X-TDA on TTM/dzp (598 AO) — the production north-star run.

Consumes the device DF-SCF checkpoint from `tools/make_ttm_dzp_state.py`
and the cached host integrals, then:

1. builds the MO-space DF response tensors (f64 on host; B_ov via the
   on-chip streaming transform when a chip is present),
2. runs the 20-root fully-jitted Davidson on the chip (f32),
3. refines by ONE host-f64 Rayleigh-Ritz batch in the converged
   subspace (the accuracy statement for the reduced-precision chip
   solve; ~20 min of host dgemm at this size — done once HERE, so the
   driver's cold bench can gate against the stored numbers),
4. writes tests/data/golden_ttm_dzp.json with energies (chip + refined),
   oscillator strengths, wall/cycle counts.

Matches the reference's production hot loop `xtddft/XTDA.py:520-543`
(AO-direct CuPy J/K per Davidson cycle) — here the state and solve are
TPU-resident end to end.

Run:  python tools/run_ttm_dzp_xtda.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ROOT = pathlib.Path(__file__).resolve().parents[1]
CACHE = ROOT / "cache"
DATA = ROOT / "tests" / "data"
NROOTS = 20


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from xtddft_tpu import units
    from xtddft_tpu.props import oscillator
    from xtddft_tpu.response.reference_state import make_reference
    from xtddft_tpu.response.sigma_df import (build_df_data, cast_df_data,
                                              xtda_sigma_df)
    from xtddft_tpu.scf.checkpoint import load_mf
    from xtddft_tpu.solver.davidson_jit import davidson_fulljit

    mf = load_mf(str(DATA / "ttm_dzp_ckpt.npz"))
    env = mf.env
    env.set_df_j3c(np.load(CACHE / "ttm_dzp_j3c.npy", mmap_mode="r"))
    w = np.load(CACHE / "ttm_dzp_metric_w.npy")
    U = np.load(CACHE / "ttm_dzp_metric_U.npy")
    env._df_meig_cache = {0.0: (w, U)}

    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        ref = make_reference(mf)
        data64 = build_df_data(ref)
        op64 = xtda_sigma_df(data64)
    print(f"host f64 DF data: {time.time()-t0:.0f}s", flush=True)

    op = xtda_sigma_df(cast_df_data(data64, np.float32))
    kw = dict(nroots=NROOTS, init_guess=op.init_guess(NROOTS), tol=None,
              max_space_factor=8, pick_positive=True, return_info=True)
    t0 = time.time()
    davidson_fulljit(op.matvec_raw, op.consts, op.hdiag, **kw)  # compile
    print(f"compile+first solve: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    e32, v32, conv, info = davidson_fulljit(
        op.matvec_raw, op.consts, op.hdiag, **kw)
    wall = time.time() - t0
    print(f"chip solve: {wall:.2f}s cycles={info['cycles']} "
          f"nconv={int(conv.sum())}/{NROOTS}", flush=True)
    print("e32 (eV):", np.round(e32 * units.HA2EV, 4), flush=True)

    # host-f64 Rayleigh-Ritz refinement (one blocked f64 matvec)
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

    vb = op64.to_blocked(v64)
    osc = oscillator.spin_conserving_osc(ref, e64, vb)

    out = {
        "molecule": "ttm_vacuum",
        "basis": "dzp",
        "aux_mode": "jk",
        "xc": "b3lyp",
        "nao": int(env.nao),
        "naux": int(env.aux_layout.nao),
        "dim": int(op.dim),
        "path": ("device DF-SCF ckpt -> f32 chip fulljit Davidson -> "
                 "host-f64 Rayleigh-Ritz refinement"),
        "e_chip_ev": (e32 * units.HA2EV).tolist(),
        "e_refined_ev": (e64 * units.HA2EV).tolist(),
        "osc": np.asarray(osc).tolist(),
        "chip_wall_s": wall,
        "cycles": int(info["cycles"]),
        "nconv": int(conv.sum()),
        "max_chip_dev_ev": float(dev),
        "e_scf": float(mf.e_tot),
    }
    (DATA / "golden_ttm_dzp.json").write_text(json.dumps(out, indent=1))
    print("wrote", DATA / "golden_ttm_dzp.json", flush=True)


if __name__ == "__main__":
    main()
