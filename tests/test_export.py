"""Telemetry / export / checkpoint tests."""

import numpy as np

from xtddft_tpu.methods.drivers import TDA
from xtddft_tpu.props.export import (
    excitation_table, uv_spectrum, save_spectrum_csv, save_results, load_results,
)
from xtddft_tpu.utils.telemetry import Timer


def test_export_roundtrip(h2_rhf, tmp_path):
    res = TDA(h2_rhf, nstates=2).kernel()
    table = excitation_table(res, "H2 TDA")
    assert "H2 TDA" in table and "osc_str" in table
    x, y = uv_spectrum(res, e_max_ev=40.0)
    assert y.max() > 0
    csv = tmp_path / "spec.csv"
    save_spectrum_csv(res, str(csv))
    assert csv.exists() and csv.read_text().startswith("energy_eV")
    npz = tmp_path / "res.npz"
    save_results(res, str(npz))
    back = load_results(str(npz))
    assert np.allclose(back.e, res.e)
    assert np.allclose(back.osc, res.osc)


def test_timer():
    import time

    t = Timer()
    with t("a"):
        time.sleep(0.01)
    with t("a"):
        pass
    rep = t.report()
    assert "a" in rep and t.counts["a"] == 2 and t.totals["a"] >= 0.01


def test_scf_checkpoint_roundtrip(tmp_path):
    """save_mf/load_mf reproduce the MeanField and its response physics."""
    import numpy as np
    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.methods.drivers import XTDA
    from xtddft_tpu.scf import ROHF
    from xtddft_tpu.scf.checkpoint import load_mf, save_mf

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98", basis="sto-3g", spin=1)
    mf = ROHF(mol).kernel()
    p = str(tmp_path / "mf.npz")
    save_mf(mf, p)
    mf2 = load_mf(p)
    assert mf2.e_tot == mf.e_tot and mf2.converged
    e1 = XTDA(mf, nstates=3).kernel().e
    e2 = XTDA(mf2, nstates=3).kernel().e
    assert np.abs(e1 - e2).max() < 1e-12
