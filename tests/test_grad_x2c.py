"""sfX2C analytic gradients (r3, VERDICT item 9).

The reference's sfx2c pipeline stops at single-point SOC states
(`/root/reference/x2c_hamiltonian/test_SOCSI.py` — its grad_jp/grad_hb
trees never touch x2c); here `grad/x2c_diff.py` makes the picture-changed
h1e(R) differentiable (uncontracted S/T/V/pVp from the jax integral
layer + smooth projector decoupling) so the Lagrangian machinery gives
analytic sfx2c ground AND excited gradients, FD-validated like every
other method in this suite.
"""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.scf.driver import SCF


@pytest.fixture(scope="module")
def hcl_x2c():
    mol = Molecule.from_atoms("Cl 0 0 0; H 0 0 1.29", basis="sto-3g")
    mf = SCF(mol, "rhf", x2c=True).kernel()
    assert mf.converged
    return mf


def test_x2c_hcore_diff_matches_host(hcl_x2c):
    """The differentiable decoupling == the host eigenvector-based
    `soc/x2c.sfx2c1e` at the reference geometry (f64 round-off)."""
    import jax.numpy as jnp

    from xtddft_tpu import units
    from xtddft_tpu.grad.x2c_diff import make_x2c_hcore_fn

    env = hcl_x2c.env
    h_host = np.asarray(env.hcore)
    fn = make_x2c_hcore_fn(env.layout, units.C_AU)
    h_diff = np.asarray(fn(jnp.asarray(
        np.asarray(hcl_x2c.mol.coords, dtype=np.float64))))
    assert np.abs(h_diff - h_host).max() < 1e-9 * max(
        1.0, np.abs(h_host).max())


def test_x2c_pvp_matches_host():
    """The jax pVp block == the host `soc/somf.nuclear_deriv2` spin-free
    W on a contracted multi-shell layout."""
    import jax.numpy as jnp

    from xtddft_tpu.ints import jaxints as J
    from xtddft_tpu.scf.env import Env
    from xtddft_tpu.soc.somf import nuclear_deriv2

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98", basis="6-31g", spin=1)
    layout = Env(mol, grid_level=1).layout
    w_host, _ = nuclear_deriv2(layout)
    coords = jnp.asarray(np.asarray(mol.coords, dtype=np.float64))
    charges = np.asarray(mol.charges, dtype=np.float64)
    W = jnp.zeros((layout.nao, layout.nao))
    for pc in J._pair_classes(layout):
        W = J._scatter2(W, pc, J._pvp(pc, coords, charges))
    assert np.abs(np.asarray(W) - w_host).max() < 1e-10 * np.abs(
        w_host).max()


def test_x2c_scf_gradient_vs_fd(hcl_x2c):
    """Analytic sfx2c ground-state gradient == FD (the displaced SCFs
    re-decouple at every geometry)."""
    from xtddft_tpu.grad import fd_gradient
    from xtddft_tpu.grad.lagrangian import scf_gradient

    ga = scf_gradient(hcl_x2c)
    gf = fd_gradient(hcl_x2c, h=1e-3, atoms=[1])
    assert np.abs(ga[1] - gf[1]).max() < 5e-6
    assert np.abs(ga.sum(axis=0)).max() < 1e-7  # translational invariance


def test_x2c_excited_gradient_vs_fd():
    """Analytic sfx2c X-CIS excited gradient == FD — the heavy-element
    open-shell pathway (As-pipeline class of references)."""
    from xtddft_tpu.grad import fd_excited_gradient
    from xtddft_tpu.grad.lagrangian import ExcitedGradients
    from xtddft_tpu.methods.drivers import XTDA

    mol = Molecule.from_atoms("Cl 0 0 0; H 0 0 1.29", basis="sto-3g",
                              spin=2)
    mf = SCF(mol, "rohf", x2c=True).kernel()
    assert mf.converged
    eg = ExcitedGradients(mf, method="xcis")
    g_ex, _ = eg.kernel(state=0)
    g_fd = fd_excited_gradient(
        mf, lambda m: XTDA(m, nstates=2), state=0, h=1e-3, atoms=[1])
    assert np.abs(np.asarray(g_ex)[1] - g_fd[1]).max() < 2e-5
