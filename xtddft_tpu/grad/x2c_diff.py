"""Differentiable sfX2C one-electron Hamiltonian (for analytic gradients).

The host decoupling (`soc/x2c.py: sfx2c1e`) extracts X from the positive-
energy eigenvectors of the 2n x 2n generalized problem — autodiff through
``eigh`` NaNs on the degenerate eigenvalues every atom with p shells has
(the JVP carries 1/(lambda_i - lambda_j) factors).  The gradient-layer
rebuild therefore reformulates the decoupling in terms of SMOOTH spectral
matrix functions only:

    X~  from the positive-spectrum projector P+ = (I + sign(H'))/2 of the
        metric-reduced Hamiltonian H' = m^{-1/2} h m^{-1/2}
        (X~ = P21 P11^{-1}; the spectral gap at 0 is ~2c^2, so sign() is
        smooth along any nuclear displacement),
    R+  from inverse square roots of SPD matrices,

each implemented as U f(D) U^T with a custom JVP using the Daleckii-Krein
divided-difference kernel — (f(a)-f(b))/(a-b) evaluated as f'((a+b)/2) on
near-degenerate pairs — which is finite for degenerate spectra where the
raw eigh JVP is not.  The result matches `soc/x2c.py: sfx2c1e` to f64
round-off at the reference geometry (tests/test_grad_x2c.py) and is
differentiable in the nuclear coordinates through the jax integral layer
(`ints/jaxints.py`, incl. the pVp block `_pvp`).

Reference analog: the sfx2c SCF states of
`/root/reference/x2c_hamiltonian/test_SOCSI.py:141` — the reference has
no working sfx2c gradients (its grad_jp/grad_hb trees never touch x2c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_matfunc", "sfx2c1e_diff", "make_x2c_hcore_fn"]


def make_matfunc(f, df, name: str = "matfunc"):
    """Smooth symmetric-matrix function A -> U f(D) U^T.

    f/df: elementwise spectral function and its derivative (jnp ufuncs).
    The custom JVP uses the Daleckii-Krein kernel
        K_ij = (f(w_i) - f(w_j)) / (w_i - w_j)   (|dw| > eps)
              = df((w_i + w_j)/2)                 (near-degenerate)
    so degenerate eigenvalues — where jax's raw eigh JVP returns NaN —
    differentiate cleanly (the limit IS df)."""

    @jax.custom_jvp
    def matfunc(A):
        w, U = jnp.linalg.eigh(A)
        return (U * f(w)[None, :]) @ U.T

    @matfunc.defjvp
    def _jvp(primals, tangents):
        (A,) = primals
        (dA,) = tangents
        w, U = jnp.linalg.eigh(A)
        fw = f(w)
        out = (U * fw[None, :]) @ U.T
        dw = w[:, None] - w[None, :]
        scale = jnp.maximum(jnp.max(jnp.abs(w)), 1.0)
        near = jnp.abs(dw) < 1e-9 * scale
        K = jnp.where(
            near,
            df(0.5 * (w[:, None] + w[None, :])),
            (fw[:, None] - fw[None, :]) / jnp.where(near, 1.0, dw),
        )
        dAu = U.T @ (0.5 * (dA + dA.T)) @ U
        dout = U @ (K * dAu) @ U.T
        return out, dout

    matfunc.__name__ = name
    return matfunc


_invsqrt = make_matfunc(
    lambda w: 1.0 / jnp.sqrt(jnp.maximum(w, 1e-14)),
    lambda w: -0.5 * jnp.maximum(w, 1e-14) ** (-1.5),
    "invsqrt",
)
_sqrtm = make_matfunc(
    lambda w: jnp.sqrt(jnp.maximum(w, 0.0)),
    lambda w: 0.5 / jnp.sqrt(jnp.maximum(w, 1e-14)),
    "sqrtm",
)
_sign = make_matfunc(jnp.sign, lambda w: jnp.zeros_like(w), "matsign")


def sfx2c1e_diff(t, v, w, s, c):
    """One-step sfX2C picture-changed h1e, smooth in (t, v, w, s).

    Same math as `soc/x2c.py: sfx2c1e` (JCP 137, 154114 Eqs. 38-48) with
    the eigenvector extraction replaced by projector algebra (module
    docstring).  Returns the n x n h1e in the (uncontracted) basis the
    integrals are given in."""
    n = s.shape[0]
    m22 = t * (0.5 / c**2)
    h22 = w * (0.25 / c**2) - t
    s_ih = _invsqrt(s)
    t_ih = _invsqrt(m22)
    # metric-reduced 4c-like Hamiltonian
    Hp = jnp.block([
        [s_ih @ v @ s_ih, s_ih @ t @ t_ih],
        [t_ih @ t @ s_ih, t_ih @ h22 @ t_ih],
    ])
    Hp = 0.5 * (Hp + Hp.T)
    # electronic/positronic split: positronic solutions sit near -2c^2,
    # electronic ones are bounded below by core energies (>> -c^2 for any
    # chemical Z), so shifting by +c^2 puts the spectral gap at 0 where
    # the matrix sign function separates the branches (shifting changes
    # eigenvalues, not vectors).  A plain sign(Hp) would misclassify
    # every core level below 0.
    P = 0.5 * (jnp.eye(2 * n) + _sign(Hp + (c * c) * jnp.eye(2 * n)))
    P11 = P[:n, :n]
    P21 = P[n:, :n]
    # X~ = Ys Yl^{-1} for any positive-subspace basis Y = P[:, :n]
    Xt = jnp.linalg.solve(P11.T, P21.T).T
    s_h = _sqrtm(s)
    X = t_ih @ Xt @ s_h  # back to the non-orthogonal basis
    stilde = s + X.T @ (m22 @ X)
    rp = s_ih @ _invsqrt(s_ih @ stilde @ s_ih) @ s_h
    l1e = v + t @ X + X.T @ t + X.T @ (h22 @ X)
    h1e = rp.T @ l1e @ rp
    return 0.5 * (h1e + h1e.T)


def make_x2c_hcore_fn(layout, c: float, block_jit: bool = False):
    """Differentiable ``hcore(coords) -> (nao, nao)`` for an sfx2c
    reference: uncontracted-basis S/T/V/pVp from the jax integral layer,
    smooth decoupling, contraction back to the computational basis.
    Matches `scf/env.Env._sfx2c_hcore` at the reference geometry."""
    from xtddft_tpu.ints import jaxints as J
    from xtddft_tpu.soc.x2c import uncontract

    unc, contr = uncontract(layout)
    classes = J._pair_classes(unc)
    charges = np.asarray(unc.mol.charges, dtype=np.float64)
    contr_j = jnp.asarray(contr)
    nao_u = unc.nao

    if block_jit:
        _jit = {}

        def blk(i, kind, fn, coords):
            key = (i, kind)
            if key not in _jit:
                _jit[key] = jax.jit(fn)
            return _jit[key](coords)
    else:
        def blk(i, kind, fn, coords):
            return fn(coords)

    def hcore(coords):
        coords = jnp.asarray(coords)
        S = jnp.zeros((nao_u, nao_u))
        T = jnp.zeros((nao_u, nao_u))
        V = jnp.zeros((nao_u, nao_u))
        W = jnp.zeros((nao_u, nao_u))
        for i, pc in enumerate(classes):
            S_blk, T_blk = blk(
                i, "sk", lambda cc, _pc=pc: J._overlap_kinetic(_pc, cc),
                coords)
            V_blk = blk(
                i, "v", lambda cc, _pc=pc: J._nuclear(_pc, cc, charges),
                coords)
            W_blk = blk(
                i, "w", lambda cc, _pc=pc: J._pvp(_pc, cc, charges),
                coords)
            S = J._scatter2(S, pc, S_blk)
            T = J._scatter2(T, pc, T_blk)
            V = J._scatter2(V, pc, V_blk)
            W = J._scatter2(W, pc, W_blk)
        h1e = sfx2c1e_diff(T, V, W, S, c)
        return contr_j.T @ h1e @ contr_j

    return hcore
