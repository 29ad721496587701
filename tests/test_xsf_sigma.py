"""XSF-TDA matrix-free sigma vs dense assembly (the debug_hx test)."""

import numpy as np
import pytest

from xtddft_tpu.response import make_reference
from xtddft_tpu.response import dense
from xtddft_tpu.response.sigma_xsf import xsf_sigma_operator
from xtddft_tpu.solver.davidson import davidson


@pytest.fixture(scope="module")
def ref(fh_roks):
    return make_reference(fh_roks)


@pytest.mark.parametrize("SA", [0, 1, 2, 3])
def test_xsf_sigma_matches_dense(ref, SA):
    A, _ = dense.xsf_dense(ref, SA=SA, fglobal=0.65, remove=False)
    op = xsf_sigma_operator(ref, SA=SA, fglobal=0.65, remove=False)
    A_sig = np.asarray(op.matvec(np.eye(op.dim))).T
    assert np.abs(A_sig - A).max() < 1e-8


def test_xsf_sigma_removed_matches_dense(ref):
    A, _ = dense.xsf_dense(ref, SA=3, fglobal=0.65, remove=True)
    op = xsf_sigma_operator(ref, SA=3, fglobal=0.65, remove=True)
    assert op.dim == A.shape[0]
    A_sig = np.asarray(op.matvec(np.eye(op.dim))).T
    assert np.abs(A_sig - A).max() < 1e-8


def test_xsf_davidson_matches_dense(ref):
    A, _ = dense.xsf_dense(ref, SA=3, fglobal=0.65, remove=True)
    w_ref = np.linalg.eigvalsh(A)[:4]
    op = xsf_sigma_operator(ref, SA=3, fglobal=0.65, remove=True)
    e, v, conv = davidson(op.matvec, op.hdiag, nroots=4,
                          init_guess=op.init_guess(4), tol=1e-9)
    assert np.allclose(e, w_ref, atol=1e-7)
