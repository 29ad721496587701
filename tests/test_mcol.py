"""Multicollinear SF kernel tests.

Exact property used as the primary gate: for pure-LDA functionals the
multicollinear transverse kernel reduces analytically to vxc_s/m, i.e. the
ALDA0 kernel (Pu et al. PRR 5, 013036; see `xc/mcol.py` docstring for the
derivation), so mcol and ALDA0 SF-TDA must agree to quadrature accuracy."""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.scf import ROKS
from xtddft_tpu.response import make_reference
from xtddft_tpu.response import dense
from xtddft_tpu.xc.interface import sf_kernel_alda0, cache_rho
from xtddft_tpu.xc.mcol import sf_kernel_mcol
import jax.numpy as jnp


@pytest.fixture(scope="module")
def fh_lda():
    mol = Molecule.from_atoms("F 0 0 0; H 0 0 1.0", basis="6-31g", spin=2)
    return ROKS(mol, xc="svwn", grid_level=1).kernel()


def _rho0(ref):
    ao = ref.env.ao
    da = jnp.asarray(ref.orbo_a @ ref.orbo_a.T)
    db = jnp.asarray(ref.orbo_b @ ref.orbo_b.T)
    ra, ga = cache_rho(ao, da)
    rb, gb = cache_rho(ao, db)
    return (ra, rb, ga, gb)


def test_mcol_equals_alda0_for_lda(fh_lda):
    """LDA: f_mc = vxc_s/m identically (gradient rows must vanish)."""
    ref = make_reference(fh_lda)
    rho0 = _rho0(ref)
    w = ref.env.grid_weights
    f_alda = np.asarray(sf_kernel_alda0(ref.spec, w, rho0))
    H = np.asarray(sf_kernel_mcol(ref.spec, w, rho0, nt=40))
    assert np.abs(H[:, 1:, :]).max() < 1e-12  # no gradient coupling for LDA
    ra, rb = np.asarray(rho0[0]), np.asarray(rho0[1])
    pol = np.abs(ra - rb) / (ra + rb + 1e-300)
    sel = (ra + rb > 1e-5) & (pol < 0.9)
    rel = np.abs(H[sel, 0, 0] - f_alda[sel]) / (np.abs(f_alda[sel]) + 1e-14)
    # pointwise: limited by ALDA0's +1e-9 regularizer, not quadrature
    assert rel.max() < 1e-3


def test_mcol_sf_matrix_lda_matches_alda0(fh_lda):
    ref = make_reference(fh_lda)
    A0 = dense.sf_down_dense(ref, method=0)
    A1 = dense.sf_down_dense(ref, method=1)
    e0 = np.linalg.eigvalsh(A0)
    e1 = np.linalg.eigvalsh(A1)
    assert np.abs(e0 - e1).max() < 1e-5


def test_mcol_gga_runs_and_differs(fh_roks):
    """BHandHLYP (GGA): mcol differs from ALDA0 (the reference's stored FH
    goldens differ by ~0.4 eV for the same system)."""
    ref = make_reference(fh_roks)
    e0 = np.linalg.eigvalsh(dense.sf_down_dense(ref, method=0))
    e1 = np.linalg.eigvalsh(dense.sf_down_dense(ref, method=1))
    d = np.abs(e0 - e1).max() * 27.2114
    assert 0.01 < d < 2.0
    assert np.all(np.isfinite(e1))


def test_mcol_finite_at_closed_shell():
    """Unlike ALDA0's (va-vb)/(ra-rb), the mcol kernel has no 0/0 at
    closed-shell points."""
    mol = Molecule.from_atoms("He 0 0 0", basis="sto-3g")
    from xtddft_tpu.scf import RKS

    mf = RKS(mol, xc="b3lyp", grid_level=1).kernel()
    ref = make_reference(mf)
    rho0 = _rho0(ref)
    H = np.asarray(sf_kernel_mcol(ref.spec, ref.env.grid_weights, rho0, nt=10))
    assert np.all(np.isfinite(H))
    assert np.abs(H).max() > 1e-8


def test_mcol_sigma_matches_dense(fh_roks):
    """Matrix-free SF sigma with the mcol kernel == dense build (GGA)."""
    from xtddft_tpu.response.sigma import sf_sigma_operator

    ref = make_reference(fh_roks)
    A = dense.sf_down_dense(ref, method=1)
    op = sf_sigma_operator(ref, "down", method=1)
    eye = np.eye(op.dim)
    A_sig = np.asarray(op.matvec(eye)).T
    P = op.to_blocked(np.eye(op.dim))
    A_sig = P @ A_sig @ P.T
    assert np.abs(A_sig - A).max() < 1e-8
