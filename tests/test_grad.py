"""Finite-difference gradient tests: translational invariance, stencil
consistency, and physical sign at stretched/compressed bonds."""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.grad import fd_gradient, fd_excited_gradient
from xtddft_tpu.methods.drivers import TDA
from xtddft_tpu.scf import RHF


@pytest.fixture(scope="module")
def h2_stretched():
    # H2 at 0.85 A: beyond equilibrium (~0.74) -> attractive gradient
    mol = Molecule.from_atoms("H 0 0 0; H 0 0 0.85", basis="sto-3g")
    return RHF(mol).kernel()


def test_fd_gradient_physical(h2_stretched):
    g = fd_gradient(h2_stretched, h=2e-3)
    # translational invariance: forces sum to ~0
    assert np.abs(g.sum(axis=0)).max() < 1e-6
    # stretched bond: energy decreases as atoms approach -> dE/dz(atom2) > 0
    assert g[1, 2] > 1e-3
    assert g[0, 2] == pytest.approx(-g[1, 2], abs=1e-6)
    # x/y components vanish by symmetry
    assert np.abs(g[:, :2]).max() < 1e-8


def test_fd_stencils_agree(h2_stretched):
    gc = fd_gradient(h2_stretched, h=2e-3, atoms=[1])
    gf = fd_gradient(h2_stretched, h=2e-3, stencil="forward2", atoms=[1])
    assert np.abs(gc[1] - gf[1]).max() < 5e-5


def test_fd_excited_gradient(h2_stretched):
    g = fd_excited_gradient(
        h2_stretched, lambda mf: TDA(mf, nstates=1), state=0, h=2e-3
    )
    assert np.abs(g.sum(axis=0)).max() < 1e-6
    # the excited-state surface has its own (different) slope
    g0 = fd_gradient(h2_stretched, h=2e-3)
    assert abs(g[1, 2] - g0[1, 2]) > 1e-3


def test_analytic_hf_gradient_vs_fd():
    from xtddft_tpu.grad.analytic import hf_gradient
    from xtddft_tpu.scf import ROHF

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.95", basis="sto-3g", spin=1)
    mf = ROHF(mol).kernel()
    ga = hf_gradient(mf)
    gf = fd_gradient(mf, h=1e-3)
    assert np.abs(ga - gf).max() < 5e-6
    assert np.abs(ga.sum(axis=0)).max() < 1e-8  # translational invariance


def test_analytic_rejects_dft(h2_stretched):
    from xtddft_tpu.grad.analytic import hf_gradient
    from xtddft_tpu.scf import RKS

    mol = h2_stretched.mol
    mfk = RKS(mol, xc="svwn", grid_level=1).kernel()
    with pytest.raises(NotImplementedError):
        hf_gradient(mfk)
