"""SCF internal stability analysis (`scf/stability.py`) — the
reference's stability-retry guard (`test_SOCSI.py:20-27`).

Canonical physics case: stretched H2.  UHF seeded from the RHF orbitals
converges to the spin-symmetric saddle point; the internal Hessian has a
negative eigenvalue, and following it lands on the lower broken-symmetry
UHF solution.
"""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.scf import RHF, RKS
from xtddft_tpu.scf.driver import SCF
from xtddft_tpu.scf.stability import internal_stability, stable_scf


@pytest.fixture(scope="module")
def h2_stretched():
    return Molecule.from_atoms("H 0 0 0; H 0 0 2.2", basis="sto-3g")


def test_stable_solution_reports_stable(h2_stretched):
    mol = Molecule.from_atoms("H 0 0 0; H 0 0 0.74", basis="sto-3g")
    mf = RHF(mol).kernel()
    stable, w_min, mo = internal_stability(mf)
    assert stable and w_min > 0
    assert mo is mf.mo_coeff


def test_uhf_saddle_detected_and_escaped(h2_stretched):
    mf_r = RHF(h2_stretched).kernel()
    scf_u = SCF(h2_stretched, "uhf")
    seed = np.stack([np.asarray(mf_r.mo_coeff)] * 2)
    mf_sym = scf_u.kernel(init=seed)
    # the spin-symmetric UHF solution at 2.2 A is a saddle
    stable, w_min, mo = internal_stability(mf_sym)
    assert not stable and w_min < -1e-3
    # the retry loop lands on the broken-symmetry minimum, lower in energy
    mf_bs = stable_scf(scf_u, init=seed)
    assert mf_bs.e_tot < mf_sym.e_tot - 1e-4
    assert internal_stability(mf_bs)[0]


def test_dft_stability_works(h2_stretched):
    """KS stability via the differentiable XC quadrature: a converged
    compact RKS solution is internally stable."""
    mol = Molecule.from_atoms("H 0 0 0; H 0 0 0.74", basis="sto-3g")
    mfk = RKS(mol, xc="svwn", grid_level=1).kernel()
    stable, w_min, _ = internal_stability(mfk)
    assert stable and w_min > 0


def test_internal_stability_size_guard():
    """Above ~140 AO the dense nao^4 backend refuses instead of OOMing
    (ADVICE r1); `auto` routes to the matrix-free DF backend there."""
    import pytest

    from xtddft_tpu.scf.stability import internal_stability

    class _FakeEnv:
        nao = 200
        x2c = False

    class _FakeMF:
        env = _FakeEnv()

    with pytest.raises(NotImplementedError):
        internal_stability(_FakeMF(), backend="dense")


def test_df_stability_matches_dense(h2_stretched):
    """The matrix-free DF backend (Davidson over jvp Hessian actions)
    reproduces the dense jax.hessian lowest eigenvalue to the DF fit
    error, flags the same saddle, and the retry loop escapes through it."""
    mf_r = RHF(h2_stretched).kernel()
    seed = np.stack([np.asarray(mf_r.mo_coeff)] * 2)
    scf_u = SCF(h2_stretched, "uhf", df=True)
    mf_sym = scf_u.kernel(init=seed)
    stable_d, w_d, _ = internal_stability(mf_sym, backend="dense")
    stable_f, w_f, mo = internal_stability(mf_sym, backend="df")
    assert (not stable_d) and (not stable_f)
    assert abs(w_d - w_f) < 5e-3
    mf_bs = stable_scf(scf_u, init=seed, backend="df")
    assert mf_bs.e_tot < mf_sym.e_tot - 1e-4
    assert internal_stability(mf_bs, backend="df")[0]


def test_df_stability_dft_and_rsh():
    """DF stability on KS references: the full fxc enters through the
    differentiable quadrature, RSH long-range exchange through the
    erf-attenuated B tensor.  A compact converged solution is stable."""
    from xtddft_tpu.scf import RKS

    mol = Molecule.from_atoms("H 0 0 0; H 0 0 0.74", basis="sto-3g")
    for xc in ("svwn", "cam-b3lyp"):
        mfk = RKS(mol, xc=xc, grid_level=1, df=True).kernel()
        stable, w_min, _ = internal_stability(mfk, backend="df")
        assert stable and w_min > 0
