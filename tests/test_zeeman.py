"""Zeeman-integral tests (mirrors `x2c_hamiltonian/test_zeeman.py:62-67`:
h10 antisymmetry / h11 symmetry norms, plus nonrelativistic limits)."""

import numpy as np
import pytest

from xtddft_tpu import units
from xtddft_tpu.chem import Molecule
from xtddft_tpu.ints.one_electron import angular_momentum, overlap
from xtddft_tpu.scf import RHF
from xtddft_tpu.soc.zeeman import get_zeeman
from xtddft_tpu.soc.x2c import uncontract


@pytest.fixture(scope="module")
def c_mf():
    mol = Molecule.from_atoms("C 0 0 0", basis="sto-3g")
    return RHF(mol).kernel()


def test_h10_antisym_h11_sym(c_mf):
    h10, h11 = get_zeeman(c_mf)
    for m in range(3):
        assert np.linalg.norm(h10[m] + h10[m].T) < 1e-10
    for i in range(3):
        for j in range(3):
            assert np.linalg.norm(h11[i, j] - h11[i, j].T) < 1e-10
    assert np.linalg.norm(h10) > 1e-6
    assert np.linalg.norm(h11) > 1e-3


def test_nonrelativistic_limits(c_mf):
    """c -> infinity: h10 -> -L/2 (contracted), h11 -> S/2 * delta."""
    h10, h11 = get_zeeman(c_mf, c=1e6)
    lay = c_mf.env.layout
    gauge = c_mf.env.mol.charge_center()
    L = angular_momentum(lay, gauge_origin=gauge)
    S = overlap(lay)
    for m in range(3):
        assert np.abs(h10[m] - (-0.5 * L[m])).max() < 1e-8
    for i in range(3):
        for j in range(3):
            tgt = 0.5 * S if i == j else 0.0
            assert np.abs(h11[i, j] - tgt).max() < 1e-8


def test_relativistic_correction_small_but_nonzero(c_mf):
    h10, h11 = get_zeeman(c_mf)
    h10_nr, h11_nr = get_zeeman(c_mf, c=1e6)
    d10 = np.abs(h10 - h10_nr).max()
    d11 = np.abs(h11 - h11_nr).max()
    assert 0 < d10 < 1e-2
    assert 0 < d11 < 1e-2
