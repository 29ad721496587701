"""Converge TTM through the DF-SCF (the production path) and checkpoint it.

Complements tools/run_ttm_golden.py (exact in-core f64 golden): this is
the ground state a production user actually runs at scale — ROKS/B3LYP
with J/K from the fitted B tensor — stored via `scf/checkpoint.py` for
the DF-vs-golden gate (tests/test_production.py) and the real-molecule
bench section (bench.py).

Run:  XTDDFT_PLATFORM=cpu python tools/make_ttm_ckpt.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.chem import geometries as G
    from xtddft_tpu.scf import ROKS
    from xtddft_tpu.scf.checkpoint import save_mf

    data_dir = pathlib.Path(__file__).resolve().parents[1] / "tests" / "data"
    mol = Molecule.from_atoms(G.ttm_vacuum, basis="sto-3g", spin=1)
    t0 = time.time()
    mf = ROKS(mol, xc="b3lyp", grid_level=1, df=True).kernel()
    print(f"DF-SCF: E = {mf.e_tot:.10f} converged={mf.converged} "
          f"({time.time()-t0:.0f}s)", flush=True)
    assert mf.converged

    golden = data_dir / "golden_ttm.json"
    if golden.exists():
        e_ref = json.loads(golden.read_text())["e_scf"]
        print(f"vs in-core golden: dE = {(mf.e_tot - e_ref)*1000:.3f} mHa "
              "(DF fit error)")

    data_dir.mkdir(exist_ok=True)
    save_mf(mf, str(data_dir / "ttm_ckpt.npz"))
    print("wrote", data_dir / "ttm_ckpt.npz")


if __name__ == "__main__":
    main()
