"""Full TDHF/RPA (A,B) pencil: solver identities + driver physics.

Validation is internal-consistency based (the reference ships no TDHF
response of its own — its grad layer consumes pyscf tdscf amplitudes):
the symmetrized Casida solve must match a direct non-Hermitian
diagonalization of [[A,B],[-B,-A]], collapse to TDA at B=0, obey the
Thouless bound (RPA <= TDA root by root), and closed-shell UTDHF must
reproduce the union of singlet+triplet RTDHF spectra.
"""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.scf import RKS, RHF, UKS


@pytest.fixture(scope="module")
def h2o_rks():
    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g",
    )
    return RKS(mol, xc="b3lyp", grid_level=1).kernel()


def _rpa_direct(A, B, nroots):
    """Reference: eig of the full non-Hermitian RPA matrix."""
    dim = A.shape[0]
    M = np.block([[A, B], [-B, -A]])
    w = np.linalg.eigvals(M)
    w = np.sort(w[np.abs(w.imag) < 1e-10].real)
    return w[w > 1e-12][:nroots]


def test_casida_matches_direct_eig(h2o_rks):
    from xtddft_tpu.response import make_reference
    from xtddft_tpu.response.tdhf import rtdhf_dense, solve_casida

    ref = make_reference(h2o_rks)
    A, B = rtdhf_dense(ref, singlet=True)
    e, xpy, xmy = solve_casida(A, B, 6)
    e_direct = _rpa_direct(A, B, 6)
    assert np.abs(e - e_direct).max() < 1e-10
    # pencil residual: A(X+Y) + B(X+Y) ... check the defining equations
    # (A+B)(X+Y) = w (X-Y), (A-B)(X-Y) = w (X+Y)
    r1 = (A + B) @ xpy - xmy * e[None, :]
    r2 = (A - B) @ xmy - xpy * e[None, :]
    assert np.abs(r1).max() < 1e-9 and np.abs(r2).max() < 1e-9
    # normalization <X+Y|X-Y> = 1
    assert np.abs(np.einsum("is,is->s", xpy, xmy) - 1.0).max() < 1e-10


def test_casida_tda_limit(h2o_rks):
    from xtddft_tpu.response import make_reference
    from xtddft_tpu.response.dense import tda_singlet_dense
    from xtddft_tpu.response.tdhf import solve_casida

    ref = make_reference(h2o_rks)
    A = tda_singlet_dense(ref)
    e, xpy, xmy = solve_casida(A, np.zeros_like(A), 5)
    e_tda = np.linalg.eigvalsh(A)[:5]
    assert np.abs(e - e_tda).max() < 1e-11
    assert np.abs(xpy - xmy).max() < 1e-8  # Y = 0


def test_thouless_bound_and_driver(h2o_rks):
    from xtddft_tpu.methods.drivers import TDA, TDHF

    rt = TDA(h2o_rks, nstates=5).kernel()
    rr = TDHF(h2o_rks, nstates=5).kernel()
    # RPA lowers every root relative to TDA (Thouless)
    assert np.all(rr.e <= rt.e + 1e-12)
    assert np.all(rr.e > 0) and np.all(np.isfinite(rr.osc))
    assert np.all(rr.osc >= -1e-12)
    assert rr.v_xmy is not None


def test_utdhf_closed_shell_equals_r_spectra(h2o_rks):
    """UTDHF on a closed-shell UKS reference = union of singlet+triplet
    RTDHF spectra (each R state doubly represented in U space)."""
    from xtddft_tpu.methods.drivers import TDHF, UTDHF

    mol = h2o_rks.mol
    mfu = UKS(mol, xc="b3lyp", grid_level=1).kernel()
    ru = UTDHF(mfu, nstates=8).kernel()
    es = TDHF(h2o_rks, nstates=6, singlet=True).kernel().e
    et = TDHF(h2o_rks, nstates=6, singlet=False).kernel().e
    union = np.sort(np.concatenate([es, et]))[:8]
    assert np.abs(ru.e - union).max() < 5e-6


def test_tdhf_df_backend_closed_shell(h2o_rks):
    """`TDHF(mf, backend='df')` (paired DF (A,B) matvecs + SSF Davidson,
    `solver/rpa.py`) == dense Casida to DF fit error, for both spin
    channels — incl. the spin-parity splitting of the U-space pencil."""
    from xtddft_tpu import units
    from xtddft_tpu.methods.drivers import TDHF

    for singlet in (True, False):
        rd = TDHF(h2o_rks, nstates=3, singlet=singlet).kernel()
        rf = TDHF(h2o_rks, nstates=3, singlet=singlet,
                  backend="df").kernel()
        assert rf.converged
        assert rf.solver.startswith("rpa-fulljit")
        assert np.abs(rd.e - rf.e).max() * units.HA2EV < 5e-3
        if singlet:
            assert np.abs(np.abs(rd.osc) - np.abs(rf.osc)).max() < 1e-3


def test_utdhf_df_backend_unrestricted():
    """UTDHF DF backend on a genuinely unrestricted UKS radical — the
    beta-MO DF tensors (`DFData.B_b`/`phi_b`) enter the beta blocks."""
    from xtddft_tpu import units
    from xtddft_tpu.methods.drivers import UTDHF

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", basis="6-31g", spin=1)
    mfu = UKS(mol, xc="b3lyp", grid_level=1).kernel()
    rd = UTDHF(mfu, nstates=4).kernel()
    rf = UTDHF(mfu, nstates=4, backend="df").kernel()
    assert rf.converged
    assert np.abs(rd.e - rf.e).max() * units.HA2EV < 5e-3
    assert np.abs(rd.ds2 - rf.ds2).max() < 5e-2


def test_xtdhf_df_backend(fh_roks_df):
    """Spin-adapted X-TDHF DF backend (A with dA, bare-coupling B) ==
    dense X-space pencil."""
    from xtddft_tpu import units
    from xtddft_tpu.methods.drivers import XTDHF

    rd = XTDHF(fh_roks_df, nstates=4).kernel()
    rf = XTDHF(fh_roks_df, nstates=4, backend="df").kernel()
    assert rf.converged
    assert np.abs(rd.e - rf.e).max() * units.HA2EV < 5e-3


def test_rpa_instability_reported():
    """A deliberately stretched H2 triplet channel: A-B not PD must raise,
    not return complex/garbage roots."""
    from xtddft_tpu.methods.drivers import TDHF
    from xtddft_tpu.response.tdhf import RPAInstabilityError

    mol = Molecule.from_atoms("H 0 0 0; H 0 0 3.5", basis="sto-3g",
                              unit="bohr")
    mf = RHF(mol).kernel()
    with pytest.raises(RPAInstabilityError):
        TDHF(mf, nstates=2, singlet=False).kernel()


@pytest.mark.parametrize("basis,r", [("sto-3g", 3.5), ("6-31g", 4.5)])
def test_rpa_instability_reported_df_backend(basis, r):
    """Unstable references through the DF fulljit path on the CPU
    backend: the on-device pencil CLAMPS A-B's spectrum rather than
    raising, so the driver's host stability re-check (Koopmans-seeded
    probe space) must restore the documented raise (ADVICE r3, medium).
    The sto-3g case (dim=1) also exercises the tiny-pencil
    (dim <= 2*nroots) max_space floor."""
    from xtddft_tpu.methods.drivers import TDHF
    from xtddft_tpu.response.tdhf import RPAInstabilityError

    mol = Molecule.from_atoms(f"H 0 0 0; H 0 0 {r}", basis=basis,
                              unit="bohr")
    mf = RHF(mol, df=True).kernel()
    with pytest.raises(RPAInstabilityError):
        TDHF(mf, nstates=2, singlet=False, backend="df").kernel()
