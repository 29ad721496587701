"""Davidson convergence semantics: `conv` means residual < tol, period.

The reference keeps iterating on roots whose eigenvalue has plateaued but
whose residual is still large (`xtddft/utils/Davidson.py:200-281` pick /
restart loop); a solver that flags such roots "converged" reports success
on answers that may be wrong.  These tests drive each solver with an
operator whose residuals floor well above tol (a fixed non-symmetric
rank-1 contamination, emulating a low-precision sigma build) and assert
no root is reported converged — while the stall detector still terminates
the loop instead of burning max_cycle.
"""

import numpy as np
import pytest

from xtddft_tpu.solver.davidson import davidson
from xtddft_tpu.solver.davidson_jit import davidson_device, davidson_fulljit

DIM = 120
FLOOR = 1e-3   # residual floor injected by the contamination
TOL = 1e-8     # far below the floor: no root can truly converge


def _noisy_operator():
    rng = np.random.default_rng(3)
    d = np.linspace(0.1, 5.0, DIM)
    Q = np.linalg.qr(rng.normal(size=(DIM, DIM)))[0]
    A = Q @ np.diag(d) @ Q.T
    u = rng.normal(size=DIM)
    u /= np.linalg.norm(u)
    w = rng.normal(size=DIM)
    w /= np.linalg.norm(w)

    def matvec(zs):
        zs = np.asarray(zs)
        return zs @ A.T + FLOOR * np.outer(zs @ u, w)

    return matvec, np.diag(A).copy()


def test_host_davidson_no_false_convergence():
    matvec, hdiag = _noisy_operator()
    e, v, conv = davidson(matvec, hdiag, nroots=4, tol=TOL, max_cycle=200)
    assert not conv.any(), f"stagnated roots reported converged: {conv}"


def test_device_davidson_no_false_convergence():
    matvec, hdiag = _noisy_operator()
    import jax.numpy as jnp

    def mv(zs):
        return jnp.asarray(matvec(np.asarray(zs)))

    e, v, conv = davidson_device(mv, hdiag, nroots=4, tol=TOL, max_cycle=200)
    assert not conv.any(), f"stagnated roots reported converged: {conv}"


def test_fulljit_davidson_no_false_convergence():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    d = np.linspace(0.1, 5.0, DIM)
    Q = np.linalg.qr(rng.normal(size=(DIM, DIM)))[0]
    A = (Q @ np.diag(d) @ Q.T).astype(np.float32)
    u = rng.normal(size=DIM).astype(np.float32)
    u /= np.linalg.norm(u)
    w = rng.normal(size=DIM).astype(np.float32)
    w /= np.linalg.norm(w)
    consts = {"A": jnp.asarray(A), "u": jnp.asarray(u), "w": jnp.asarray(w)}

    def matvec_raw(C, zs):
        return zs @ C["A"].T + FLOOR * jnp.outer(zs @ C["u"], C["w"])

    e, v, conv = davidson_fulljit(
        matvec_raw, consts, np.diag(A).copy(), nroots=4, tol=1e-6,
        max_cycle=100,
    )
    assert not conv.any(), f"stagnated roots reported converged: {conv}"


def test_clean_operator_still_converges():
    """Sanity: removing the contamination, everything converges."""
    rng = np.random.default_rng(5)
    d = np.linspace(0.1, 5.0, DIM)
    Q = np.linalg.qr(rng.normal(size=(DIM, DIM)))[0]
    A = Q @ np.diag(d) @ Q.T

    def matvec(zs):
        return np.asarray(zs) @ A.T

    e, v, conv = davidson(matvec, np.diag(A).copy(), nroots=4, tol=1e-6)
    assert conv.all()
    np.testing.assert_allclose(e, np.sort(d)[:4], atol=1e-8)
