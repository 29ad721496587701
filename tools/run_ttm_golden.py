"""Produce the TTM production-scale golden (CPU, f64, in-core — exact path).

TTM (tris(2,4,6-trichlorophenyl)methyl radical, 34 atoms, 182 AOs at
STO-3G) is the class of open-shell chromophore the reference's X-TDA
targets in production (`/root/reference/xtddft/utils/atom.py` TTM
entries, `xtddft/XTDA.py:520-543` hot loop).  This script converges
ROKS/B3LYP with the exact in-core ERI path in f64 and solves 10 X-TDA
roots through the matrix-free in-core sigma — no density fitting, no
reduced precision — and stores the result as the golden that the DF/TPU
production path is gated against (tests/test_production.py).

Run:  XTDDFT_PLATFORM=cpu python tools/run_ttm_golden.py
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.chem import geometries as G
    from xtddft_tpu.methods.drivers import XTDA
    from xtddft_tpu.scf import ROKS

    t_all = time.time()
    mol = Molecule.from_atoms(G.ttm_vacuum, basis="sto-3g", spin=1)
    scf = ROKS(mol, xc="b3lyp", grid_level=1, df=False)
    t0 = time.time()
    mf = scf.kernel()
    t_scf = time.time() - t0
    print(f"SCF: E = {mf.e_tot:.10f}  converged={mf.converged}  ({t_scf:.0f}s)",
          flush=True)
    assert mf.converged

    t0 = time.time()
    td = XTDA(mf, nstates=10, backend="incore")
    res = td.kernel()
    t_td = time.time() - t0
    print("XTDA e(eV):", np.array2string(res.e_eV, precision=6), flush=True)
    print("osc:", np.array2string(res.osc, precision=6), flush=True)
    print(f"XTDA wall: {t_td:.0f}s  converged={res.converged}", flush=True)

    out = {
        "molecule": "ttm_vacuum",
        "basis": "sto-3g",
        "xc": "b3lyp",
        "spin": 1,
        "grid_level": 1,
        "path": "incore-f64-cpu (exact ERIs, matrix-free sigma + Davidson)",
        "e_scf": float(mf.e_tot),
        "scf_converged": bool(mf.converged),
        "xtda_e_ev": [float(x) for x in res.e_eV],
        "xtda_osc": [float(x) for x in res.osc],
        "xtda_converged": bool(res.converged),
        "nao": int(mf.env.nao),
        "t_scf_s": round(t_scf, 1),
        "t_xtda_s": round(t_td, 1),
    }
    data_dir = pathlib.Path(__file__).resolve().parents[1] / "tests" / "data"
    data_dir.mkdir(exist_ok=True)
    path = data_dir / "golden_ttm.json"
    path.write_text(json.dumps(out, indent=1))

    from xtddft_tpu.scf.checkpoint import save_mf

    save_mf(mf, str(data_dir / "ttm_incore_ckpt.npz"))
    print("wrote", path, f"(total {time.time()-t_all:.0f}s)")


if __name__ == "__main__":
    main()
