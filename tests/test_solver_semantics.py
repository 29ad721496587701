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


def _synthetic_pencil(dim=90, seed=7):
    """Random stable RPA pencil: A PD with diag-dominant structure, B a
    small symmetric coupling (A-B stays PD)."""
    rng = np.random.default_rng(seed)
    d = np.linspace(0.5, 6.0, dim)
    Qa = np.linalg.qr(rng.normal(size=(dim, dim)))[0]
    A = Qa @ np.diag(d) @ Qa.T
    Bs = rng.normal(size=(dim, dim)) * 0.02
    B = 0.5 * (Bs + Bs.T)
    # dense reference solve via the Casida symmetrization
    from xtddft_tpu.response.tdhf import solve_casida

    w_ref, _, _ = solve_casida(A, B, 6)
    return A, B, w_ref


def test_rpa_fulljit_matches_host_pencil():
    """The fully-jitted SSF paired Davidson == host rpa_davidson == dense
    Casida on a synthetic stable pencil (f64 CPU backend)."""
    import jax.numpy as jnp

    from xtddft_tpu.solver.rpa import rpa_davidson, rpa_fulljit

    A, B, w_ref = _synthetic_pencil()
    hdiag = np.diag(A).copy()
    consts = {"A": jnp.asarray(A), "B": jnp.asarray(B)}

    def matvec_ab_raw(C, zs):
        return jnp.stack([zs @ C["A"].T, zs @ C["B"].T])

    def matvec_ab(zs):
        return matvec_ab_raw(consts, jnp.asarray(zs))

    w_h, xpy_h, xmy_h, conv_h = rpa_davidson(
        matvec_ab, hdiag, nroots=4, tol=1e-8)
    assert conv_h.all()
    w_j, xpy_j, xmy_j, conv_j = rpa_fulljit(
        matvec_ab_raw, consts, hdiag, nroots=4, tol=1e-8)
    assert conv_j.all()
    np.testing.assert_allclose(w_j, w_ref[:4], atol=1e-7)
    np.testing.assert_allclose(w_j, w_h[:4], atol=1e-7)
    # defining equations + <X+Y|X-Y>=1 normalization
    rp = (A + B) @ xpy_j - xmy_j * w_j[None, :]
    rm = (A - B) @ xmy_j - xpy_j * w_j[None, :]
    assert max(np.abs(rp).max(), np.abs(rm).max()) < 1e-6
    np.testing.assert_allclose(
        np.einsum("is,is->s", xpy_j, xmy_j), 1.0, atol=1e-6)


def test_rpa_fulljit_no_false_convergence():
    """Same stagnation contract as the TDA solvers: a residual floor above
    tol must leave every root reported UNconverged."""
    import jax.numpy as jnp

    from xtddft_tpu.solver.rpa import rpa_fulljit

    A, B, _ = _synthetic_pencil(seed=3)
    rng = np.random.default_rng(3)
    u = rng.normal(size=A.shape[0])
    u /= np.linalg.norm(u)
    w = rng.normal(size=A.shape[0])
    w /= np.linalg.norm(w)
    consts = {
        "A": jnp.asarray(A), "B": jnp.asarray(B),
        "u": jnp.asarray(u), "w": jnp.asarray(w),
    }

    def matvec_ab_raw(C, zs):
        az = zs @ C["A"].T + FLOOR * jnp.outer(zs @ C["u"], C["w"])
        return jnp.stack([az, zs @ C["B"].T])

    _, _, _, conv = rpa_fulljit(
        matvec_ab_raw, consts, np.diag(A).copy(), nroots=4, tol=1e-9,
        max_cycle=100)
    assert not conv.any(), f"stagnated roots reported converged: {conv}"
