"""Paired-subspace Davidson for the RPA pencil over matrix-free
(A z, B z) actions — the production full-TDHF solver.

Solves [[A,B],[B,A]] (X,Y) = w (X,-Y) without ever forming A or B:
the paired working equations for real orbitals and a stable reference
(A-B positive definite) are

    (A+B)(X+Y) = w (X-Y),      (A-B)(X-Y) = w (X+Y),

so in an orthonormal trial space V the small problem is the projected
pencil with Hp = V^T(A+B)V, Hm = V^T(A-B)V (both symmetric PD):
solve Hm^{1/2} Hp Hm^{1/2} y = w^2 y densely (subspace-sized), then
X+Y = V Hm^{1/2} y / sqrt(w), X-Y = V Hm^{-1/2} y sqrt(w), which carry
the <X+Y|X-Y> = 1 normalization by construction (same convention as
`response/tdhf.solve_casida`; the dual residuals/expansion follow
Stratmann-Scuseria-Frisch, J. Chem. Phys. 109, 8218 (1998) — the
standard production RPA iteration).

Both residuals r+ = (A+B)(X+Y) - w(X-Y) and r- = (A-B)(X-Y) - w(X+Y)
are preconditioned and added to the subspace each cycle, so A- and
B-side errors converge together.

The reference has no iterative TDHF at all (its TDHF layer consumes
in-core pyscf ``tdscf.TDHF`` states at gradient-validation scale,
`xtddft/grad_jp/grad/rtdhf.py:13`); this solver takes the (A,B) pencil
to the same DF production sizes as the TDA fulljit path, with the
matvec pair fused on-device (`sigma_df.xtda_sigma_df(with_b=True)`).
"""

from __future__ import annotations

import numpy as np

from xtddft_tpu.response.tdhf import RPAInstabilityError

__all__ = ["rpa_davidson", "rpa_rayleigh_ritz"]


def _subspace_solve(Hp: np.ndarray, Hm: np.ndarray, nroots: int,
                    pos_threshold: float = 0.0):
    """Dense solve of the projected RPA pencil; returns (w, c+, c-).

    pos_threshold > 0 skips marginal/zero-frequency modes (w below the
    threshold — e.g. rotations among degenerate partially-occupied
    orbitals), the pencil analog of the TDA Davidson's pick_positive."""
    wm, Um = np.linalg.eigh(0.5 * (Hm + Hm.T))
    if wm.min() < -1e-9 * max(1.0, abs(wm.max())):
        raise RPAInstabilityError(
            f"projected A-B has lowest eigenvalue {wm.min():.3e} < 0: "
            "reference is externally unstable (run stability analysis)"
        )
    keep = wm > max(1e-12, float(wm.max()) * 1e-14)
    Uk = Um[:, keep]
    sk = np.sqrt(wm[keep])
    P = Uk * sk[None, :]            # Hm^{1/2} on its range
    Pm = Uk / sk[None, :]           # Hm^{-1/2}
    M = P.T @ Hp @ P
    w2, Z = np.linalg.eigh(0.5 * (M + M.T))
    w2 = np.maximum(w2, 0.0)
    w = np.sqrt(w2)
    if pos_threshold > 0.0:
        sel = w > pos_threshold
        w, Z = w[sel], Z[:, sel]
    n = min(nroots, w.shape[0])
    w, Z = w[:n], Z[:, :n]
    sw = np.sqrt(np.where(w > 0, w, 1.0))
    cp = P @ Z / sw[None, :]
    cm = Pm @ Z * sw[None, :]
    return w, cp, cm


def rpa_rayleigh_ritz(matvec_ab, V: np.ndarray, nroots: int,
                      pos_threshold: float = 0.0):
    """One-shot projected RPA solve in the given orthonormal basis
    ``V`` (dim, m): returns (w, X+Y, X-Y) full-space vectors.  Used for
    host-f64 refinement of a reduced-precision chip solve (the pencil
    analog of the `_df_solve` Rayleigh-Ritz step)."""
    out = np.asarray(matvec_ab(V.T))
    AV, BV = out[0].T, out[1].T
    Hp = V.T @ (AV + BV)
    Hm = V.T @ (AV - BV)
    w, cp, cm = _subspace_solve(Hp, Hm, nroots, pos_threshold=pos_threshold)
    return w, V @ cp, V @ cm


def rpa_davidson(
    matvec_ab,
    hdiag: np.ndarray,
    nroots: int = 5,
    init_guess: np.ndarray | None = None,
    tol: float = 1e-6,
    max_cycle: int = 100,
    max_space_factor: int = 12,
    lindep: float = 1e-13,
    pad_batches: bool = True,
    pick_positive: bool = False,
    pos_threshold: float = 1e-6,
    verbose: bool = False,
):
    """Returns (w (nroots,), xpy (dim, nroots), xmy (dim, nroots),
    conv (nroots,) bool).

    matvec_ab: (n, dim) -> (2, n, dim) stacked [A z, B z] (the
    `with_b=True` DF sigma).  hdiag: orbital-energy-difference diagonal
    (of A; also the standard RPA preconditioner).  pad_batches keeps
    every device call at one fixed trial-batch shape so the jitted pair
    sigma compiles once."""
    hdiag = np.asarray(hdiag)
    dim = hdiag.shape[0]
    nroots = min(nroots, dim)
    if init_guess is None:
        idx = np.argsort(hdiag)[:nroots]
        init_guess = np.zeros((nroots, dim))
        init_guess[np.arange(nroots), idx] = 1.0
    V = np.asarray(init_guess, dtype=np.float64).T  # (dim, m)
    V, _ = np.linalg.qr(V)
    max_space = max(2 * nroots * max_space_factor, V.shape[1] + 2)
    # fixed device batch: expansions add <= 2*nroots vectors per cycle
    # (and the collapse restart seeds 2*nroots), so one compile covers
    # every call
    batch = max(V.shape[1], 2 * nroots)

    def _apply(X):
        """(dim, k) -> (AX, BX) with fixed-batch padding."""
        k = X.shape[1]
        if pad_batches and k < batch:
            X = np.concatenate(
                [X, np.zeros((dim, batch - k), dtype=X.dtype)], axis=1)
        out = np.asarray(matvec_ab(X.T))
        return out[0].T[:, :k], out[1].T[:, :k]

    AV = np.zeros((dim, 0))
    BV = np.zeros((dim, 0))
    w = np.zeros(nroots)
    conv = np.zeros(nroots, dtype=bool)
    xpy = xmy = np.zeros((dim, nroots))
    for cycle in range(max_cycle):
        nnew = V.shape[1] - AV.shape[1]
        if nnew > 0:
            A_new, B_new = _apply(V[:, -nnew:])
            AV = np.concatenate([AV, A_new], axis=1)
            BV = np.concatenate([BV, B_new], axis=1)
        Hp = V.T @ (AV + BV)
        Hm = V.T @ (AV - BV)
        try:
            w, cp, cm = _subspace_solve(
                Hp, Hm, nroots,
                pos_threshold=pos_threshold if pick_positive else 0.0)
        except np.linalg.LinAlgError:
            break
        xpy = V @ cp
        xmy = V @ cm
        rp = (AV + BV) @ cp - xmy * w[None, :]
        rm = (AV - BV) @ cm - xpy * w[None, :]
        rn = np.maximum(np.linalg.norm(rp, axis=0),
                        np.linalg.norm(rm, axis=0))
        conv = rn < tol
        if verbose:
            print(f"rpa cycle {cycle}: ns={V.shape[1]} "
                  f"max|r|={rn.max():.2e} nconv={conv.sum()}/{nroots}")
        # with pick_positive the early subspace may hold fewer than
        # nroots above-threshold roots — keep expanding in that case
        if conv.all() and w.shape[0] >= nroots:
            break
        # collapse when the subspace is full: restart from the current
        # Ritz pair space (both components, so the pencil survives)
        if V.shape[1] + 2 * (~conv).sum() > max_space:
            V, _ = np.linalg.qr(np.concatenate([xpy, xmy], axis=1))
            AV = np.zeros((dim, 0))
            BV = np.zeros((dim, 0))
            continue
        # dual preconditioned expansion (SSF): one vector per residual
        new = []
        denom = hdiag[:, None] - w[None, :]
        denom = np.where(np.abs(denom) < 1e-8,
                         np.sign(denom + 1e-300) * 1e-8, denom)
        for r in (rp, rm):
            t = r[:, ~conv] / denom[:, ~conv]
            new.append(t)
        if conv.all() and w.shape[0] < nroots:
            # all found roots converged but pick_positive filtered the
            # subspace below nroots: seed fresh Koopmans directions
            extra = np.zeros((dim, nroots - w.shape[0] + 1))
            order = np.argsort(hdiag)
            extra[order[: extra.shape[1]], np.arange(extra.shape[1])] = 1.0
            new.append(extra)
        T = np.concatenate(new, axis=1)
        # orthogonalize against V (twice, classical GS) and internally
        for _ in range(2):
            T = T - V @ (V.T @ T)
        q, rdiag = np.linalg.qr(T)
        keepcols = np.abs(np.diag(rdiag)) > lindep * max(
            1.0, np.abs(np.diag(rdiag)).max())
        q = q[:, keepcols]
        if q.shape[1] == 0:
            break
        V = np.concatenate([V, q], axis=1)
    return w, xpy, xmy, conv
