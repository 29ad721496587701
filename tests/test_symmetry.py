"""Point-group detection + irrep labels (`chem/symmetry.py`) — the
reference's `X_TDA.calculate_irrep` capability
(`/root/reference/xtddft/XTDA.py:1467`).
"""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.chem.symmetry import (
    analyze,
    ao_representation,
    mo_irreps,
    product_label,
)
from xtddft_tpu.ints import build_layout
from xtddft_tpu.ints.one_electron import overlap
from xtddft_tpu.scf import RHF


def _rot(theta=0.63, phi=0.21):
    c, s = np.cos(theta), np.sin(theta)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    c, s = np.cos(phi), np.sin(phi)
    Rx = np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])
    return Rz @ Rx


def test_detect_c2v_water_any_orientation():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0.76 0.59; H 0 -0.76 0.59",
                              basis="sto-3g")
    assert analyze(mol).group == "C2v"
    rot = Molecule.from_atoms(
        [(s, tuple(c)) for s, c in
         zip(mol.symbols, (mol.coords @ _rot().T + 0.7))],
        basis="sto-3g", unit="bohr")
    assert analyze(rot).group == "C2v"


def test_detect_d2h_n2_and_ethylene_c1():
    n2 = Molecule.from_atoms("N 0 0 0; N 0 0 1.1", basis="sto-3g")
    assert analyze(n2).group == "D2h"
    noisy = Molecule.from_atoms(
        "N 0 0 0; N 0.2 0.1 1.1; H 0.9 0.3 -0.4", basis="sto-3g")
    assert analyze(noisy).group in ("C1", "Cs")


def test_detect_cs_and_ci():
    # planar, no C2: Cs
    m = Molecule.from_atoms("O 0 0 0; H 0 0 0.96; F 0 1.2 -0.4",
                            basis="sto-3g", spin=1)
    assert analyze(m).group == "Cs"


def test_ao_representation_is_orthogonal_symmetry():
    """U must satisfy U^T S U = S (the op is an isometry of the AO
    metric) — exact to integral precision for a true symmetry op."""
    mol = Molecule.from_atoms("O 0 0 0; H 0 0.76 0.59; H 0 -0.76 0.59",
                              basis="6-31g")
    info = analyze(mol)
    lay = build_layout(mol)
    S = np.asarray(overlap(lay))
    for k, (name, _, _, _) in enumerate(info.ops):
        U = ao_representation(lay, info, k)
        assert np.abs(U.T @ S @ U - S).max() < 1e-10, name


def test_water_mo_labels():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0.76 0.59; H 0 -0.76 0.59",
                              basis="sto-3g")
    mf = RHF(mol).kernel()
    info = analyze(mol)
    lay = build_layout(mol)
    labels, chars = mo_irreps(lay, np.asarray(mf.env.S),
                              np.asarray(mf.mo_coeff), info)
    # classic water valence ordering: 3 a1, 1 b-type (in-plane), HOMO is
    # the out-of-plane lone pair (the other b-type)
    assert "?" not in labels
    occ = labels[:5]
    assert occ.count("A1") == 3
    assert {occ[2], occ[4]} <= {"B1", "B2"} or {occ[3], occ[4]} <= {"B1", "B2"}
    # product logic: b1 x b2 = a2, a1 x X = X
    i1 = labels.index("B1") if "B1" in labels else None
    if i1 is not None and "B2" in labels:
        i2 = labels.index("B2")
        assert product_label(info, chars[i1], chars[i2]) == "A2"
        a1 = labels.index("A1")
        assert product_label(info, chars[a1], chars[i2]) == "B2"


def test_n2_mo_labels_gerade_ungerade():
    mol = Molecule.from_atoms("N 0 0 0; N 0 0 1.1", basis="sto-3g")
    mf = RHF(mol).kernel()
    info = analyze(mol)
    labels, _ = mo_irreps(build_layout(mol), np.asarray(mf.env.S),
                          np.asarray(mf.mo_coeff), info,
                          mo_energy=mf.mo_energy)
    # sigma-g core/valence and the doubly degenerate pi_u HOMO block
    assert labels[0] in ("Ag",) and labels[1] in ("B1u",)
    pi_u = [l for l in labels[:7] if l in ("B2u", "B3u")]
    assert len(pi_u) == 2  # the pi_u pair below the HOMO sigma_g


def test_xtda_state_irreps_ch2o_cation():
    """End-to-end: XTDA(symmetry=True) labels states of the CH2O+ radical
    cation (C2v) -- the reference's calculate_irrep capability."""
    from xtddft_tpu.methods.drivers import XTDA
    from xtddft_tpu.scf import ROHF

    mol = Molecule.from_atoms(
        "C 0 0 -0.53; O 0 0 0.68; H 0 0.94 -1.11; H 0 -0.94 -1.11",
        basis="sto-3g", charge=1, spin=1)
    mf = ROHF(mol).kernel()
    res = XTDA(mf, nstates=4, symmetry=True, backend="dense").kernel()
    assert res.irreps is not None and len(res.irreps) == 4
    labeled = [l for l in res.irreps if l != "?"]
    assert len(labeled) >= 3  # most low states are symmetry-clean
    assert set(labeled) <= {"A1", "A2", "B1", "B2"}


def test_xsftda_state_irreps():
    """Spin-flip layout labeling: XSFTDA(symmetry=True) on the CH2
    triplet (C2v)."""
    from xtddft_tpu.methods.drivers import XSFTDA
    from xtddft_tpu.scf import ROHF

    mol = Molecule.from_atoms(
        "C 0 0 0; H 0 0.99 -0.3; H 0 -0.99 -0.3", basis="sto-3g", spin=2)
    mf = ROHF(mol).kernel()
    res = XSFTDA(mf, nstates=3, symmetry=True, backend="dense").kernel()
    assert res.irreps is not None and len(res.irreps) == 3
    assert set(res.irreps) <= {"A1", "A2", "B1", "B2", "?"}
    assert any(l != "?" for l in res.irreps)
