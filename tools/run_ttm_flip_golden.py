"""CPU-f64 flip-method goldens on TTM/STO-3G (182 AO, beyond toy scale).

VERDICT r4 weak #5: the SF/XSF identity tests and FH goldens stop at
<=58-AO scale.  This tool solves the flip-down (XSF driver, SA=0 for
the doublet TTM — the USF-TDA flavor, with the Sf=Si OO contaminant
projected out) and flip-up (SF-TDA) spectra through the exact f64 path
on the committed TTM/STO-3G DF-SCF checkpoint, the way
`run_ttm_golden.py` did for X-TDA.  The stored golden gates the
DF/packed production flip path (tests/test_production.py) and the
chip flip runs (`run_xsf_production.py`).

Run:  XTDDFT_PLATFORM=cpu python tools/run_ttm_flip_golden.py [nroots]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("XTDDFT_PLATFORM", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

DATA = pathlib.Path(__file__).resolve().parents[1] / "tests" / "data"
NROOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def main():
    import numpy as np

    from xtddft_tpu import units
    from xtddft_tpu.methods.drivers import SFTDA, XSFTDA
    from xtddft_tpu.scf.checkpoint import load_mf

    mf = load_mf(str(DATA / "ttm_ckpt.npz"), df=True)
    print(f"ckpt: E = {mf.e_tot:.8f} nao={mf.env.nao}", flush=True)

    # flip-down through the public driver (df backend on CPU = f64
    # DF sigma + fulljit solve, the production operator at full
    # precision); SA=0: the spin-adapted factors are singular for a
    # doublet (1/(2S-1)), exactly as the driver enforces
    t0 = time.time()
    xsf = XSFTDA(mf, nstates=NROOTS, SA=0, method=0, backend="df").kernel()
    t_xsf = time.time() - t0
    e_xsf = np.asarray(xsf.e) * units.HA2EV
    print(f"XSF(SA=0) eV: {np.round(e_xsf, 4)}  ({t_xsf:.0f}s, "
          f"converged={xsf.converged})", flush=True)

    t0 = time.time()
    sfu = SFTDA(mf, nstates=NROOTS, extype="up", method=0,
                backend="df").kernel()
    t_sfu = time.time() - t0
    e_sfu = np.asarray(sfu.e) * units.HA2EV
    print(f"SF-up eV: {np.round(e_sfu, 4)}  ({t_sfu:.0f}s, "
          f"converged={sfu.converged})", flush=True)

    out = {
        "molecule": "ttm_vacuum",
        "basis": "sto-3g",
        "xc": "b3lyp",
        "nao": int(mf.env.nao),
        "e_scf": float(mf.e_tot),
        "path": "CPU f64 DF sigma through the public drivers (fulljit)",
        "xsf_sa": 0,
        "xsf_e_ev": e_xsf.tolist(),
        "xsf_ds2": None if xsf.ds2 is None else np.asarray(xsf.ds2).tolist(),
        "sfup_e_ev": e_sfu.tolist(),
        "t_xsf_s": round(t_xsf, 1),
        "t_sfup_s": round(t_sfu, 1),
    }
    p = DATA / "golden_ttm_flip.json"
    p.write_text(json.dumps(out, indent=1))
    print("wrote", p, flush=True)


if __name__ == "__main__":
    main()
