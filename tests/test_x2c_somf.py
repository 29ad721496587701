"""sfX2C + SOMF Vso tests (mirrors `x2c_hamiltonian/test.py`: BP-vs-X2C
norm agreement for a light atom, plus invariants)."""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.ints import build_layout, overlap, kinetic, nuclear_attraction
from xtddft_tpu.scf import ROHF
from xtddft_tpu.soc import build_vso, sfx2c1e, uncontract
from xtddft_tpu.soc.somf import nuclear_deriv2
from xtddft_tpu import units


@pytest.fixture(scope="module")
def o_mf():
    mol = Molecule.from_atoms("O 0 0 0", basis="sto-3g", spin=2)
    return ROHF(mol).kernel()


def test_uncontract_roundtrip(o_mf):
    lay = o_mf.env.layout
    unc, contr = uncontract(lay)
    S_c = overlap(lay)
    S_u = overlap(unc)
    assert np.abs(contr.T @ S_u @ contr - S_c).max() < 1e-10
    # uncontracted overlap must be nonsingular (duplicate exponents merged)
    w = np.linalg.eigvalsh(S_u)
    assert w.min() > 1e-10


def test_sfx2c_h1e_close_to_nr_for_light_atom(o_mf):
    """For O the scalar-relativistic correction is small: h1e ~ t+v."""
    lay = o_mf.env.layout
    unc, contr = uncontract(lay)
    t = kinetic(unc)
    v = nuclear_attraction(unc)
    s = overlap(unc)
    w_sf, _ = nuclear_deriv2(unc)
    x, rp, h1e = sfx2c1e(t, v, w_sf, s, units.C_AU)
    hnr = t + v
    # relative deviation of the deepest matrix element is O(alpha^2 Z^2)
    rel = np.abs(h1e - hnr).max() / np.abs(hnr).max()
    assert rel < 5e-2
    assert rel > 1e-7  # but not identically zero
    # nonrelativistic limit: huge c -> h1e == t+v
    _, _, h1e_nr = sfx2c1e(t, v, w_sf, s, 1e8)
    assert np.abs(h1e_nr - hnr).max() < 1e-6


def test_vso_antisymmetric_and_bp_close(o_mf):
    r_x2c = build_vso(o_mf, iop="x2c", use_1c=False)
    r_bp = build_vso(o_mf, iop="bp", use_1c=False)
    for ic in range(3):
        assert np.abs(r_x2c.vso[ic] + r_x2c.vso[ic].T).max() < 1e-10
        assert np.abs(r_bp.vso[ic] + r_bp.vso[ic].T).max() < 1e-10
    n1 = np.linalg.norm(r_x2c.vso)
    n2 = np.linalg.norm(r_bp.vso)
    assert n1 > 0
    # light atom: X2C and BP agree to ~1% (reference checks the same for I,
    # `x2c_hamiltonian/test.py:26-28`)
    assert abs(n1 - n2) / n2 < 0.02


def test_vso_one_center_close_for_atom(o_mf):
    """For a single atom the 1c approximation is exact."""
    full = build_vso(o_mf, use_1c=False)
    onec = build_vso(o_mf, use_1c=True)
    assert np.abs(full.vso - onec.vso).max() < 1e-12


def test_fso2e_shrinks_vso(o_mf):
    """The 2e SOMF term screens the 1e SO term (opposite sign)."""
    with_2e = build_vso(o_mf, include_mf2e=True)
    without = build_vso(o_mf, include_mf2e=False)
    assert np.linalg.norm(with_2e.vso) < np.linalg.norm(without.vso)
