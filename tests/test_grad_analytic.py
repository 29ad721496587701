"""Analytic (Lagrangian/autodiff) gradients vs finite differences.

The reference validates its hand-derived Z-vector gradients against FD
(`/root/reference/grad_jp/grad/xtdhf.py:576-686`,
`usfcis-rohf-test.py:487-541`); same harness here, against
`grad/lagrangian.py`.  HF references only (the module's documented
scope).
"""

import os

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.grad import fd_excited_gradient, fd_gradient
from xtddft_tpu.grad.lagrangian import ExcitedGradients, scf_gradient
from xtddft_tpu.methods.drivers import TDA, UTDA, XTDA
from xtddft_tpu.scf import RHF, ROHF, UHF


@pytest.fixture(scope="module")
def h2o_rhf():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.96; H 0.93 0 -0.25",
                              basis="sto-3g")
    return RHF(mol).kernel()


@pytest.fixture(scope="module")
def oh_rohf():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98", basis="sto-3g", spin=1)
    return ROHF(mol).kernel()


@pytest.fixture(scope="module")
def oh_uhf():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98", basis="sto-3g", spin=1)
    return UHF(mol).kernel()


def test_scf_gradient_rhf_vs_fd(h2o_rhf):
    ga = scf_gradient(h2o_rhf)
    gf = fd_gradient(h2o_rhf, h=1e-3)
    assert np.abs(ga - gf).max() < 5e-6
    assert np.abs(ga.sum(axis=0)).max() < 1e-9


def test_scf_gradient_rohf_vs_fd(oh_rohf):
    ga = scf_gradient(oh_rohf)
    gf = fd_gradient(oh_rohf, h=1e-3)
    assert np.abs(ga - gf).max() < 5e-6


def test_cis_states_match_driver(h2o_rhf):
    eg = ExcitedGradients(h2o_rhf, method="cis")
    e, _ = eg.states(3)
    res = TDA(h2o_rhf, nstates=3).kernel()
    assert np.abs(np.asarray(e) - np.asarray(res.e[:3])).max() < 1e-8


def test_cis_gradient_vs_fd(h2o_rhf):
    eg = ExcitedGradients(h2o_rhf, method="cis")
    ga, _ = eg.kernel(state=0)
    gf = fd_excited_gradient(h2o_rhf, lambda mf: TDA(mf, nstates=1),
                             state=0, h=1e-3, atoms=[1])
    assert np.abs(ga[1] - gf[1]).max() < 2e-5
    assert np.abs(ga.sum(axis=0)).max() < 1e-8


def test_ucis_states_match_driver(oh_uhf):
    eg = ExcitedGradients(oh_uhf, method="ucis")
    e, _ = eg.states(3)
    res = UTDA(oh_uhf, nstates=3).kernel()
    assert np.abs(np.asarray(e) - np.asarray(res.e[:3])).max() < 1e-8


def test_ucis_gradient_vs_fd(oh_uhf):
    eg = ExcitedGradients(oh_uhf, method="ucis")
    ga, _ = eg.kernel(state=0)
    gf = fd_excited_gradient(oh_uhf, lambda mf: UTDA(mf, nstates=1),
                             state=0, h=1e-3, atoms=[1])
    assert np.abs(ga[1] - gf[1]).max() < 2e-5


def test_xcis_states_match_xtda(oh_rohf):
    eg = ExcitedGradients(oh_rohf, method="xcis")
    e, _ = eg.states(3)
    res = XTDA(oh_rohf, nstates=3).kernel()
    assert np.abs(np.asarray(e) - np.asarray(res.e[:3])).max() < 1e-7


def test_xcis_gradient_vs_fd(oh_rohf):
    eg = ExcitedGradients(oh_rohf, method="xcis")
    ga, _ = eg.kernel(state=0)
    gf = fd_excited_gradient(oh_rohf, lambda mf: XTDA(mf, nstates=1),
                             state=0, h=1e-3, atoms=[1])
    assert np.abs(ga[1] - gf[1]).max() < 2e-5
    assert np.abs(ga.sum(axis=0)).max() < 1e-8





def test_dft_ground_gradient_vs_fd():
    """KS ground-state gradient through the differentiable grid (Becke
    weight + moving-point Pulay terms included) vs FD."""
    from xtddft_tpu.scf import RKS

    mol = Molecule.from_atoms("H 0 0 0; H 0 0 0.8", basis="sto-3g")
    mfk = RKS(mol, xc="svwn", grid_level=1).kernel()
    ga = scf_gradient(mfk)
    gf = fd_gradient(mfk, h=1e-3)
    assert np.abs(ga - gf).max() < 5e-6


def test_dft_tda_states_match_driver():
    """DFT TDA quadratic form == driver eigenvalues (machine precision)."""
    from xtddft_tpu.methods.drivers import TDA
    from xtddft_tpu.scf import RKS

    mol = Molecule.from_atoms("H 0 0 0; H 0 0 0.8", basis="sto-3g")
    mfk = RKS(mol, xc="svwn", grid_level=1).kernel()
    e, _ = ExcitedGradients(mfk, method="cis").states(1)
    r = TDA(mfk, nstates=1).kernel()
    assert np.abs(np.asarray(e) - np.asarray(r.e[:1])).max() < 1e-10
    e3, _ = ExcitedGradients(mfk, method="cis-triplet").states(1)
    r3 = TDA(mfk, nstates=1, singlet=False).kernel()
    assert np.abs(np.asarray(e3) - np.asarray(r3.e[:1])).max() < 1e-10


def test_dft_tda_gradient_vs_fd():
    """Analytic DFT TDA excited-state gradient (fxc by nested jvp,
    grid Pulay terms by autodiff) vs FD — the capability the reference
    left WIP (`grad_hb/tdroks_sfu.py`)."""
    from xtddft_tpu.methods.drivers import TDA
    from xtddft_tpu.scf import RKS

    mol = Molecule.from_atoms("H 0 0 0; H 0 0 0.8", basis="sto-3g")
    mfk = RKS(mol, xc="svwn", grid_level=1).kernel()
    eg = ExcitedGradients(mfk, method="cis")
    ga, _ = eg.kernel(state=0)
    gf = fd_excited_gradient(mfk, lambda m: TDA(m, nstates=1), state=0,
                             h=1e-3, atoms=[1])
    assert np.abs(ga[1] - gf[1]).max() < 2e-5


def test_dft_xtda_states_match_driver():
    """X-TDA quadratic form on ROKS/B3LYP (vxc Fock + fxc term + the
    HF-flavored dA) == the XTDA driver."""
    from xtddft_tpu.methods.drivers import XTDA
    from xtddft_tpu.scf import ROKS

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98", basis="sto-3g", spin=1)
    mfk = ROKS(mol, xc="b3lyp", grid_level=1).kernel()
    e, _ = ExcitedGradients(mfk, method="xcis").states(3)
    r = XTDA(mfk, nstates=3).kernel()
    assert np.abs(np.asarray(e) - np.asarray(r.e[:3])).max() < 1e-8


def test_sfcis_up_states_match_driver(oh_rohf):
    from xtddft_tpu.methods.drivers import SFTDA

    eg = ExcitedGradients(oh_rohf, method="sfcis-up")
    e, _ = eg.states(3)
    r = SFTDA(oh_rohf, nstates=3, extype="up", method=2).kernel()
    assert np.abs(np.asarray(e) - np.asarray(r.e[:3])).max() < 1e-8


def test_sfcis_up_gradient_vs_fd(oh_rohf):
    """Spin-flip-up CIS gradient (the reference's SF-TDA gradient target,
    `grad_hb/tdroks_sfu.py:184`) vs central differences."""
    from xtddft_tpu.methods.drivers import SFTDA

    eg = ExcitedGradients(oh_rohf, method="sfcis-up")
    ga, _ = eg.kernel(state=0)
    gf = fd_excited_gradient(
        oh_rohf, lambda m: SFTDA(m, nstates=1, extype="up", method=2),
        state=0, h=1e-3, atoms=[1])
    assert np.abs(ga[1] - gf[1]).max() < 2e-5


def test_rsh_cam_b3lyp_states_and_gradient():
    """Range-separated hybrid in the differentiable stack: the
    erf-attenuated ERI of jaxints reproduces the driver's CAM-B3LYP TDA
    to machine precision, and the ground-state gradient matches FD."""
    from xtddft_tpu.methods.drivers import TDA
    from xtddft_tpu.scf import RKS

    mol = Molecule.from_atoms("H 0 0 0; H 0 0 0.8", basis="sto-3g")
    mfk = RKS(mol, xc="cam-b3lyp", grid_level=1).kernel()
    e, _ = ExcitedGradients(mfk, method="cis").states(1)
    r = TDA(mfk, nstates=1).kernel()
    assert np.abs(np.asarray(e) - np.asarray(r.e[:1])).max() < 1e-10
    ga = scf_gradient(mfk)
    gf = fd_gradient(mfk, h=1e-3)
    assert np.abs(ga - gf).max() < 5e-6


def test_dft_sf_up_gradient_vs_fd():
    """DFT SF-TDA-up (ALDA0) analytic excited-state gradient — the
    capability the reference's grad_hb left WIP
    (`grad_hb/tdroks_sfu.py:184`).  The SF xc term enters the quadratic
    form via the differentiable ALDA0 kernel (`grad/xcgrid.py:
    make_sf_alda0_fn`)."""
    from xtddft_tpu.methods.drivers import SFTDA
    from xtddft_tpu.scf import ROKS

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98", basis="sto-3g", spin=1)
    mfk = ROKS(mol, xc="bhandhlyp", grid_level=1).kernel()
    eg = ExcitedGradients(mfk, method="sfcis-up")
    e, _ = eg.states(2)
    r = SFTDA(mfk, nstates=2, extype="up", method=0).kernel()
    assert np.abs(np.asarray(e) - np.asarray(r.e[:2])).max() < 1e-8
    ga, _ = eg.kernel(state=0)
    gf = fd_excited_gradient(
        mfk, lambda m: SFTDA(m, nstates=1, extype="up", method=0),
        state=0, h=1e-3, atoms=[1])
    assert np.abs(ga[1] - gf[1]).max() < 2e-5


def test_sf_mcol_states_and_gradient():
    """Multicollinear-kernel spin-flip gradient (VERDICT r1 item 6 /
    GAPS): states from the differentiable mcol quadratic form match the
    SFTDA(method=1) driver, and the analytic gradient matches FD —
    closing the reference's WIP `grad_hb/tduks_sfu.py:59` capability."""
    from xtddft_tpu.methods.drivers import SFTDA
    from xtddft_tpu.scf import ROKS

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98", basis="sto-3g", spin=1)
    mfk = ROKS(mol, xc="bhandhlyp", grid_level=1).kernel()
    eg = ExcitedGradients(mfk, method="sfcis-up", sf_method=1)
    e, _ = eg.states(2)
    r = SFTDA(mfk, nstates=2, extype="up", method=1).kernel()
    assert np.abs(np.asarray(e) - np.asarray(r.e[:2])).max() < 1e-8
    ga, _ = eg.kernel(state=0)
    gf = fd_excited_gradient(
        mfk, lambda m: SFTDA(m, nstates=1, extype="up", method=1),
        state=0, h=1e-3, atoms=[1])
    assert np.abs(ga[1] - gf[1]).max() < 2e-5


def test_mgga_ground_and_tda_gradient_vs_fd():
    """MGGA (TPSS) gradients through the tau channel of the
    differentiable XC quadrature: ground state and TDA excited state vs
    FD, plus quadratic-form/driver parity at the driver's amplitudes
    (the non-trivial check: MGGA states() routes to the driver, so the
    form must reproduce the driver's eigenvalue from its eigenvector —
    this is what the gradient's stationarity relies on).  The reference
    has no MGGA gradient at all, and its response-side MGGA branch is
    broken (`xtddft/XTDA.py:242`).

    Molecule choice: LiH, NOT H2 — any one-occupied-orbital system has
    tau == tauW identically, which places TPSS exactly on its z=1 /
    alpha=0 kink manifold where second derivatives are one-sided and
    AD (hessian vs jvp-of-jvp) and FD legitimately disagree at the
    1e-3 Ha level.  With >=2 occupied shells the functional is smooth
    at the reference density and all routes agree to ~1e-10."""
    import jax.numpy as jnp

    from xtddft_tpu.methods.drivers import TDA
    from xtddft_tpu.scf import RKS

    mol = Molecule.from_atoms("Li 0 0 0; H 0 0 1.6", basis="sto-3g")
    mfk = RKS(mol, xc="tpss", grid_level=1).kernel()
    ga = scf_gradient(mfk)
    gf = fd_gradient(mfk, h=1e-3)
    assert np.abs(ga - gf).max() < 5e-6

    eg = ExcitedGradients(mfk, method="cis")
    e, v = eg.states(1)
    r = TDA(mfk, nstates=1).kernel()
    assert np.abs(np.asarray(e) - np.asarray(r.e[:1])).max() < 1e-10
    om = float(eg._omega_i(eg._ints0(), jnp.zeros(eg.nk),
                           jnp.asarray(v[:, 0])))
    assert abs(om - float(e[0])) < 1e-8

    gx, _ = eg.kernel(state=0)
    gxf = fd_excited_gradient(mfk, lambda m: TDA(m, nstates=1), state=0,
                              h=1e-3, atoms=[1])
    assert np.abs(gx[1] - gxf[1]).max() < 2e-5


def test_ch2o_ccpvdz_fd_golden_consistency():
    """The stored CH2O+/cc-pVDZ X-CIS gradient golden
    (tests/data/golden_ch2o_grad.json — the reference's own validator
    scale, `grad_jp/grad/xtdhf.py:576-686`): analytic vs 24-point FD
    over ALL atoms agrees to 2.5e-6 Ha/bohr with 1e-14 translational
    invariance.  This test re-checks the stored record; the full
    analytic pipeline re-run is gated below."""
    import json
    import pathlib

    p = pathlib.Path(__file__).parent / "data" / "golden_ch2o_grad.json"
    d = json.loads(p.read_text())
    ga = np.asarray(d["grad_analytic"])
    gf = np.asarray(d["grad_fd_h2e-3bohr"])
    assert np.abs(ga - gf).max() < 1e-5
    assert np.abs(ga.sum(axis=0)).max() < 1e-9


@pytest.mark.skipif(
    not __import__("os").environ.get("XTDDFT_RUN_SLOW"),
    reason="slow: DZ-scale analytic gradient (set XTDDFT_RUN_SLOW=1)")
def test_ch2o_ccpvdz_xcis_gradient_vs_stored_fd():
    """Recompute the CH2O+/cc-pVDZ X-CIS state-0 analytic gradient
    through the block-jit differentiable integrals and gate it against
    the STORED finite-difference golden at 1e-5 Ha/bohr (VERDICT r1
    item 5).  ~15-95 min on the 1-core host depending on the persistent
    compile cache."""
    import json
    import pathlib

    from xtddft_tpu.scf import ROHF

    d = json.loads((pathlib.Path(__file__).parent / "data"
                    / "golden_ch2o_grad.json").read_text())
    mol = Molecule.from_atoms(d["geometry"], basis="cc-pvdz", charge=1,
                              spin=1)
    mf = ROHF(mol).kernel()
    assert mf.converged
    eg = ExcitedGradients(mf, method="xcis")
    ga, w = eg.kernel(state=0)
    gf = np.asarray(d["grad_fd_h2e-3bohr"])
    assert abs(w * 27.211386245988 - d["e0_eV"]) < 1e-4
    assert np.abs(ga - gf).max() < 1e-5


@pytest.mark.skipif(not os.environ.get("XTDDFT_RUN_SLOW"),
                    reason="~35 min: FD displacements each re-converge a "
                           "TPSSh ROKS + mcol-SF solve (XTDDFT_RUN_SLOW=1)")
def test_sf_mcol_mgga_gradient_vs_fd():
    """Spin-flip gradient with a hybrid-MGGA functional: the tau channel
    flows through the multicollinear transverse kernel AND its
    coordinate derivative (grad/xcgrid.py make_sf_mcol_fn).  Closes the
    last guarded SF-kernel gap (GAPS.md); no reference analog exists.
    Validated green (with the eigenvalue-parity and 2e-5 FD gates) in
    the r2 build run; slow-gated because the six FD points dominate the
    default suite's budget."""
    from xtddft_tpu.methods.drivers import SFTDA
    from xtddft_tpu.scf import ROKS

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98", basis="sto-3g", spin=1)
    mfk = ROKS(mol, xc="tpssh", grid_level=1).kernel()
    # ALDA0 (sf_method=0) must refuse MGGA up front
    import pytest

    with pytest.raises(NotImplementedError):
        ExcitedGradients(mfk, method="sfcis-up", sf_method=0)
    eg = ExcitedGradients(mfk, method="sfcis-up", sf_method=1)
    e, _ = eg.states(2)
    r = SFTDA(mfk, nstates=2, extype="up", method=1).kernel()
    assert np.abs(np.asarray(e) - np.asarray(r.e[:2])).max() < 1e-7
    ga, _ = eg.kernel(state=0)
    gf = fd_excited_gradient(
        mfk, lambda m: SFTDA(m, nstates=1, extype="up", method=1),
        state=0, h=1e-3, atoms=[1])
    assert np.abs(ga[1] - gf[1]).max() < 2e-5
