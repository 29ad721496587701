"""sfX2C ground state (`SCF(x2c=True)`) and the external-potential hook.

The reference's SOC pipeline runs on `scf.sfx2c(dft.ROKS(mol))`
(`/root/reference/x2c_hamiltonian/test_SOCSI.py:141`) and adds a
`v_solvent` AO potential when present
(`/root/reference/xtddft/sTDA/os_sTDA.py:446-447`).
"""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.scf.driver import SCF


@pytest.fixture(scope="module")
def o_triplet():
    return Molecule.from_atoms("O 0 0 0", basis="sto-3g", spin=2)


def test_sfx2c_scf_converges_and_lowers_energy(o_triplet):
    nr = SCF(o_triplet, "rohf").kernel()
    x2c = SCF(o_triplet, "rohf", x2c=True).kernel()
    assert nr.converged and x2c.converged
    shift = x2c.e_tot - nr.e_tot
    # scalar-relativistic lowering for O: tens of mHa, not Ha
    assert -0.1 < shift < -0.01


def test_sfx2c_hcore_symmetric(o_triplet):
    env = SCF(o_triplet, "rohf", x2c=True).env
    h = np.asarray(env.hcore)
    assert np.abs(h - h.T).max() < 1e-10


def test_sfx2c_heavier_element_converges():
    # etb generated basis + x2c: the heavy-element pathway (As pipeline)
    mol = Molecule.from_atoms("Cl 0 0 0", basis="sto-3g", spin=1)
    x2c = SCF(mol, "rohf", x2c=True).kernel()
    nr = SCF(mol, "rohf").kernel()
    assert x2c.converged
    assert x2c.e_tot < nr.e_tot - 0.5  # ~1.4 Ha scalar shift for Z=17


def test_v_ext_constant_shift(o_triplet):
    """v_ext = eps*S shifts every orbital energy by eps and the total
    energy by exactly eps * nelectron, leaving the density invariant."""
    from xtddft_tpu.ints import build_layout
    from xtddft_tpu.ints.one_electron import overlap

    eps = 0.01
    S = np.asarray(overlap(build_layout(o_triplet)))
    mf0 = SCF(o_triplet, "rohf").kernel()
    mf1 = SCF(o_triplet, "rohf", v_ext=eps * S).kernel()
    nelec = o_triplet.nalpha + o_triplet.nbeta
    assert mf1.e_tot - mf0.e_tot == pytest.approx(eps * nelec, abs=1e-8)


def test_etb_basis_near_hf_limit():
    """Generated even-tempered basis approaches the numerical ROHF limit
    (O 3P: -74.8129 Ha) to ~10 mHa -- the heavy-element data pathway
    (`chem/basis/even_tempered.py`)."""
    mol = Molecule.from_atoms("O 0 0 0", basis="etb", spin=2)
    mf = SCF(mol, "rohf").kernel()
    assert mf.converged
    assert abs(mf.e_tot - (-74.8129)) < 0.012


def test_anodz_molecular_quality():
    """Generated ANO-DZ contractions (tools/make_ano_basis.py) reach
    published-DZ quality: H2O RHF within 20 mHa of the cc-pVDZ table."""
    from xtddft_tpu.scf import RHF

    geom = "O 0 0 0; H 0 0 0.96; H 0.93 0 -0.25"
    e_ano = RHF(Molecule.from_atoms(geom, basis="ano-dz")).kernel().e_tot
    e_ccd = RHF(Molecule.from_atoms(geom, basis="cc-pvdz")).kernel().e_tot
    assert abs(e_ano - e_ccd) < 0.020
    # heavy element from the same generator: HCl near the HF limit
    e_hcl = RHF(Molecule.from_atoms("Cl 0 0 0; H 0 0 1.27",
                                    basis="ano-dz")).kernel().e_tot
    assert abs(e_hcl - (-460.09)) < 0.06


def test_v_ext_gradient_vs_fd():
    """r3 (VERDICT item 9, v_ext half): analytic ground + excited
    gradients of an SCF run with a static external AO potential — the
    constant-matrix hcore term enters the Lagrangian and matches FD (the
    displaced SCFs carry the same v_ext)."""
    import numpy as np

    from xtddft_tpu.grad import fd_excited_gradient, fd_gradient
    from xtddft_tpu.grad.lagrangian import ExcitedGradients, scf_gradient
    from xtddft_tpu.methods.drivers import XTDA

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98", basis="sto-3g",
                              spin=1)
    # a nontrivial (non-scalar-shift) static potential: quadrupole-like
    # diagonal AO weighting, symmetric, fixed across displacements
    rng = np.random.default_rng(5)
    n = SCF(mol, "rohf").env.nao
    M = 0.01 * rng.normal(size=(n, n))
    v = 0.5 * (M + M.T)
    mf = SCF(mol, "rohf", v_ext=v).kernel()
    assert mf.converged
    ga = scf_gradient(mf)
    gf = fd_gradient(mf, h=1e-3)
    assert np.abs(ga - gf).max() < 5e-6
    # excited state: X-CIS (HF reference) via the same Lagrangian
    eg = ExcitedGradients(mf, method="xcis")
    g_ex, _ = eg.kernel(state=0)
    g_fd = fd_excited_gradient(
        mf, lambda m: XTDA(m, nstates=2), state=0, h=1e-3, atoms=[1])
    assert np.abs(np.asarray(g_ex)[1] - g_fd[1]).max() < 2e-5
