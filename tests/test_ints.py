"""Integral engine tests: analytic anchors + internal consistency."""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.grids import build_grid, eval_ao
from xtddft_tpu.ints import (
    build_layout,
    overlap,
    kinetic,
    nuclear_attraction,
    dipole,
    ip_overlap,
    eri_full,
    eri_2c,
    eri_3c,
)


@pytest.fixture(scope="module")
def h2():
    mol = Molecule.from_atoms("H 0 0 0; H 0 0 1.4", basis="sto-3g", unit="bohr")
    return mol, build_layout(mol)


def test_szabo_ostlund_values(h2):
    """Textbook H2/STO-3G integrals (Szabo & Ostlund tables 3.5/3.6)."""
    _, L = h2
    S = overlap(L)
    T = kinetic(L)
    eri = eri_full(L)
    assert abs(S[0, 1] - 0.6593) < 2e-4
    assert abs(T[0, 0] - 0.7600) < 2e-4
    assert abs(eri[0, 0, 0, 0] - 0.7746) < 2e-4
    assert abs(eri[0, 0, 1, 1] - 0.5697) < 2e-4
    assert abs(eri[0, 1, 0, 1] - 0.2970) < 2e-4
    assert abs(eri[0, 0, 0, 1] - 0.4441) < 2e-4


def test_normalization_all_l():
    """Diagonal overlaps are exactly 1 for s/p/d shells (cc-pVDZ has d)."""
    mol = Molecule.from_atoms("O 0 0 0", basis="cc-pvdz")
    L = build_layout(mol)
    S = overlap(L)
    assert np.allclose(np.diag(S), 1.0, atol=1e-12)


def test_eri_symmetry():
    mol = Molecule.from_atoms("O 0 0 0.2; H 0 0.1 -0.7", basis="sto-3g", spin=1)
    L = build_layout(mol)
    eri = eri_full(L)
    assert np.allclose(eri, eri.transpose(1, 0, 2, 3), atol=1e-12)
    assert np.allclose(eri, eri.transpose(0, 1, 3, 2), atol=1e-12)
    assert np.allclose(eri, eri.transpose(2, 3, 0, 1), atol=1e-12)
    # PSD as a pair-space matrix
    n = L.nao
    w = np.linalg.eigvalsh(eri.reshape(n * n, n * n))
    assert w.min() > -1e-10


def test_quadrature_consistency():
    """Analytic S, dipole and ip_ovlp match numerical grid quadrature."""
    mol = Molecule.from_atoms("N 0 0 0; H 0 0.9 0.2", basis="sto-3g", spin=1)
    L = build_layout(mol)
    g = build_grid(mol, level=2)
    ao = eval_ao(L, g.coords, deriv=1)
    S_num = np.einsum("g,gi,gj->ij", g.weights, ao[0], ao[0])
    assert np.abs(S_num - overlap(L)).max() < 2e-5
    ip_num = np.einsum("g,xgi,gj->xij", g.weights, ao[1:4], ao[0])
    assert np.abs(ip_num - ip_overlap(L)).max() < 2e-5
    r_num = np.einsum("g,gi,gd,gj->dij", g.weights, ao[0], g.coords, ao[0])
    assert np.abs(r_num - dipole(L)).max() < 2e-5


def test_df_vs_exact_jk():
    """3c/2c integrals give a density-fitted J close to the exact J."""
    from xtddft_tpu.ints.autoaux import autoaux_layout

    mol = Molecule.from_atoms("O 0 0 0.2; H 0 0.5 -0.5", basis="sto-3g", spin=1)
    L = build_layout(mol)
    aux = autoaux_layout(mol)
    eri = eri_full(L)
    j3 = eri_3c(L, aux)
    j2 = eri_2c(aux)
    rng = np.random.default_rng(0)
    D = rng.normal(size=(L.nao, L.nao))
    D = D + D.T
    J_exact = np.einsum("pqrs,sr->pq", eri, D)
    b = np.einsum("Ppq,qp->P", j3, D)
    c = np.linalg.solve(j2, b)
    J_df = np.einsum("Ppq,P->pq", j3, c)
    assert np.abs(J_df - J_exact).max() < 5e-3
    # K similarly approximated
    K_exact = np.einsum("prsq,rs->pq", eri, D)
    V = np.linalg.cholesky(np.linalg.inv(j2))
    B = np.einsum("Ppq,PQ->Qpq", j3, V)
    K_df = np.einsum("Qpr,rs,Qsq->pq", B, D, B)
    assert np.abs(K_df - K_exact).max() < 2e-2


def test_native_engine_matches_python():
    """Native C++ ERI engine (if built) is bit-compatible with the Python
    McMurchie-Davidson reference path."""
    from xtddft_tpu.ints import native
    from xtddft_tpu.ints.two_electron import _quartet_cart  # noqa: F401

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    import os

    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.ints import build_layout
    from xtddft_tpu.ints.autoaux import autoaux_layout

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", basis="cc-pvdz", spin=1)
    lay = build_layout(mol)
    e_c = native.eri_full_native(lay)
    os.environ["XTDDFT_NO_NATIVE"] = "1"
    try:
        from xtddft_tpu.ints.two_electron import eri_full, eri_3c

        e_py = eri_full(lay)
        assert np.abs(e_py - e_c).max() < 1e-13
        aux = autoaux_layout(mol)
        j3_py = eri_3c(lay, aux)
    finally:
        del os.environ["XTDDFT_NO_NATIVE"]
    j3_c = native.eri_3c_native(lay, aux)
    assert np.abs(j3_py - j3_c).max() < 1e-12


def test_native_engine_omega_and_2c():
    """Native omega-attenuated (erf) and 2-center paths match Python."""
    from xtddft_tpu.ints import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    import os

    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.ints import build_layout
    from xtddft_tpu.ints.autoaux import autoaux_layout

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", basis="6-31g", spin=1)
    lay = build_layout(mol)
    aux = autoaux_layout(mol)
    os.environ["XTDDFT_NO_NATIVE"] = "1"
    try:
        from xtddft_tpu.ints.two_electron import eri_2c, eri_3c, eri_full

        e4 = eri_full(lay, omega=0.33)
        e3 = eri_3c(lay, aux, omega=0.33)
        e2 = eri_2c(aux, omega=0.33)
        e2p = eri_2c(aux)
    finally:
        del os.environ["XTDDFT_NO_NATIVE"]
    assert np.abs(e4 - native.eri_full_native(lay, omega=0.33)).max() < 1e-13
    assert np.abs(e3 - native.eri_3c_native(lay, aux, omega=0.33)).max() < 1e-12
    assert np.abs(e2 - native.eri_2c_native(aux, omega=0.33)).max() < 1e-12
    assert np.abs(e2p - native.eri_2c_native(aux)).max() < 1e-12


def test_native_screening_exact():
    """Primitive-pair + Schwarz screening in the native engine changes
    nothing above the screening thresholds: screened vs unscreened full
    and 3-center ERIs agree to ~1e-14 on a heavily-contracted (ANO-style)
    multi-center case — the regime the screening targets
    (`xtddft_native/md_eri.cpp: build_pair/pair_schwarz`)."""
    from xtddft_tpu.ints import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.ints import build_layout
    from xtddft_tpu.ints.autoaux import autoaux_layout

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", basis="ano-dz", spin=1)
    lay = build_layout(mol)
    ref4 = native.eri_full_native(lay, prim_eps=0.0, schwarz_eps=0.0)
    scr4 = native.eri_full_native(lay)  # default thresholds
    assert np.abs(ref4 - scr4).max() < 1e-13
    aux = autoaux_layout(mol, beta=3.0)
    ref3 = native.eri_3c_native(lay, aux, prim_eps=0.0, schwarz_eps=0.0)
    scr3 = native.eri_3c_native(lay, aux)
    assert np.abs(ref3 - scr3).max() < 1e-13


def test_dzp_basis_registered():
    """The generated DZ+P production basis (tools/make_dzp_basis.py) is
    registered and produces the documented AO counts (TTM -> 598 AO)."""
    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.ints import build_layout

    mol = Molecule.from_atoms("C 0 0 0; H 0 0 1.09", basis="dzp")
    lay = build_layout(mol)
    assert lay.nao == 19 + 5  # C: 4s3p2d -> 19, H: 2s1p -> 5
    S = overlap(lay)
    assert np.allclose(np.diag(S), 1.0, atol=1e-12)
