"""Operator-level tests: dense A vs matrix-free sigma, Davidson vs eigh.

This is the reference's own debug_hx validation idea
(`xtddft/XSF_TDA.py:1292-1417`) made into a real test suite.
"""

import numpy as np
import pytest

from xtddft_tpu.response import make_reference
from xtddft_tpu.response import dense
from xtddft_tpu.response.sigma import (
    xtda_sigma_operator,
    utda_sigma_operator,
    sf_sigma_operator,
)
from xtddft_tpu.solver.davidson import davidson


@pytest.fixture(scope="module")
def ref(fh_roks):
    return make_reference(fh_roks)


def _dense_from_sigma(op):
    eye = np.eye(op.dim)
    return np.asarray(op.matvec(eye)).T  # columns = A e_i


def test_xtda_sigma_matches_dense(ref):
    A = dense.xtda_dense(ref)
    op = xtda_sigma_operator(ref)
    A_sig_nat = _dense_from_sigma(op)
    # convert natural (interleaved) layout to blocked on both indices
    P = op.to_blocked(np.eye(op.dim))  # (dim_blocked, dim) permutation
    A_sig = P @ A_sig_nat @ P.T
    assert np.abs(A_sig - A).max() < 1e-8


def test_utda_sigma_matches_dense(ref):
    A = dense.utda_dense(ref)
    op = utda_sigma_operator(ref)
    P = op.to_blocked(np.eye(op.dim))
    A_sig = P @ _dense_from_sigma(op) @ P.T
    assert np.abs(A_sig - A).max() < 1e-8


def test_sf_down_sigma_matches_dense(ref):
    A = dense.sf_down_dense(ref)
    op = sf_sigma_operator(ref, "down")
    P = op.to_blocked(np.eye(op.dim))
    A_sig = P @ _dense_from_sigma(op) @ P.T
    assert np.abs(A_sig - A).max() < 1e-8


def test_sf_up_sigma_matches_dense(ref):
    A = dense.sf_up_dense(ref)
    op = sf_sigma_operator(ref, "up")
    A_sig = _dense_from_sigma(op)
    assert np.abs(A_sig - A).max() < 1e-8


def test_dense_matrices_symmetric(ref):
    for A in (
        dense.xtda_dense(ref),
        dense.sf_down_dense(ref),
        dense.xsf_dense(ref)[0],
    ):
        assert np.abs(A - A.T).max() < 1e-8


def test_davidson_matches_eigh(ref):
    op = sf_sigma_operator(ref, "down")
    A = dense.sf_down_dense(ref)
    P = op.to_blocked(np.eye(op.dim))
    w_ref = np.linalg.eigvalsh(A)[:4]
    # tol=1e-6: the honest residual floor of this operator is ~1e-7
    # (subspace saturates at lindep); conv now means residual < tol only
    e, v, conv = davidson(op.matvec, op.hdiag, nroots=4,
                          init_guess=op.init_guess(4), tol=1e-6)
    assert np.allclose(e, w_ref, atol=1e-7)
    assert conv.all()


def test_davidson_xtda_positive_roots(ref):
    op = xtda_sigma_operator(ref)
    A = dense.xtda_dense(ref)
    w = np.linalg.eigvalsh(A)
    w_pos = w[w > 1e-3][:4]
    e, v, conv = davidson(
        op.matvec, op.hdiag, nroots=4, init_guess=op.init_guess(4),
        pick_positive=True, tol=1e-9,
    )
    assert np.allclose(e, w_pos, atol=1e-7)


def test_driver_davidson_paths(fh_roks):
    """SFTDA/XSFTDA drivers: Davidson path == dense path."""
    from xtddft_tpu.methods.drivers import SFTDA, XSFTDA

    rd = XSFTDA(fh_roks, nstates=4).kernel()
    rv = XSFTDA(fh_roks, nstates=4, use_davidson=True).kernel()
    assert rv.converged
    assert np.abs(rd.e - rv.e).max() < 1e-6

    sd = SFTDA(fh_roks, nstates=3, extype="up").kernel()
    sv = SFTDA(fh_roks, nstates=3, extype="up", use_davidson=True).kernel()
    assert sv.converged
    assert np.abs(sd.e - sv.e).max() < 1e-6


def test_xsf_frozen_core(fh_roks):
    """Frozen-core XSF-TDA (`xtddft/XSF_TDA.py:1483 frozen_A`): dropping
    the innermost core from the CV/CO blocks matches an independent
    row/col deletion of the dense matrix, and valence states shift only
    weakly."""
    import numpy as np

    from xtddft_tpu.methods.drivers import XSFTDA
    from xtddft_tpu.response import dense, make_reference

    ref = make_reference(fh_roks)
    nc, no, nv = ref.nc, ref.no, ref.nv
    A, _ = dense.xsf_dense(ref, SA=3, foo=1.0, fglobal=0.85, method=0,
                           remove=False)
    # independent mask: excitation index -> (block, i); drop core i=0
    labels = (
        [("cv", i) for i in range(nc) for _ in range(nv)]
        + [("co", i) for i in range(nc) for _ in range(no)]
        + [("ov", None)] * (no * nv) + [("oo", None)] * (no * no)
    )
    keep = [k for k, (blk, i) in enumerate(labels)
            if blk in ("ov", "oo") or i >= 1]
    e_ref = np.linalg.eigh(A[np.ix_(keep, keep)])[0][:4]

    r = XSFTDA(fh_roks, nstates=4, backend="dense").kernel(
        remove=False, frozen=True, fglobal=0.85)
    assert np.abs(np.asarray(r.e) - e_ref).max() < 1e-12
    r0 = XSFTDA(fh_roks, nstates=4, backend="dense").kernel(
        remove=False, fglobal=0.85)
    # core excitations sit far above the valence SF states: the valence
    # spectrum is nearly unchanged
    assert np.abs(np.asarray(r.e) - np.asarray(r0.e)).max() < 0.05
