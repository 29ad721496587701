"""As-atom SOC-SI integration run (the reference's heavy-element target).

Mirrors `/root/reference/x2c_hamiltonian/test_SOCSI.py:130-147`: an As
atom (4S_3/2 ground state, S=3/2), sfx2c scalar-relativistic ROKS
reference, 20 states per spin manifold, full SOMF Vso, state
interaction.  The reference uses cc-pVDZ from PySCF's library; offline
we use the self-generated ANO-DZ basis (`tools/make_ano_basis.py`,
natural-orbital contractions of the even-tempered primitives) — the physics
checks (4S ground state barely split, 2D/2P SOC splittings of the right
scale) are basis-robust.

Stores a JSON golden consumed by tests/test_soc_si.py.

Run:  XTDDFT_PLATFORM=cpu python tools/run_as_socsi.py [--hf] [--nstates N]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    from xtddft_tpu import units
    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.scf.driver import SCF
    from xtddft_tpu.soc.pipeline import run_soc_si

    hf = "--hf" in sys.argv
    nstates = 20
    if "--nstates" in sys.argv:
        nstates = int(sys.argv[sys.argv.index("--nstates") + 1])

    t0 = time.time()
    mol = Molecule.from_atoms("As 0 0 0", basis="ano-dz", spin=3)
    kind = "rohf" if hf else "roks"
    xc = None if hf else "bhandhlyp"
    mf = SCF(mol, kind, xc=xc, grid_level=2, x2c=True).kernel()
    t_scf = time.time() - t0
    print(f"SCF({kind}/sfx2c): E = {mf.e_tot:.8f}  converged={mf.converged} "
          f"nao={mf.env.nao}  ({t_scf:.0f}s)", flush=True)
    assert mf.converged

    t0 = time.time()
    si = run_soc_si(mf, nstates=nstates, sf_method=2)
    t_si = time.time() - t0
    e_cm = (si.result.eso - si.result.eso[0]) * units.HA2EV * units.EV2CM_1
    print(si.summary(printnum=30), flush=True)
    print(f"SOC-SI wall: {t_si:.0f}s", flush=True)

    out = {
        "molecule": "As",
        "basis": "ano-dz",
        "reference": f"sfx2c-{kind}" + ("" if hf else "/bhandhlyp"),
        "nstates": nstates,
        "e_scf": float(mf.e_tot),
        "nao": int(mf.env.nao),
        "eso_cm": [float(x) for x in e_cm[:40]],
        "t_scf_s": round(t_scf, 1),
        "t_si_s": round(t_si, 1),
    }
    path = (pathlib.Path(__file__).resolve().parents[1] / "tests" / "data"
            / "golden_as_socsi.json")
    path.parent.mkdir(exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
