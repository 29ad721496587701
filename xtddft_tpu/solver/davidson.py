"""Block Davidson eigensolver with batched sigma builds.

Subspace algebra runs on host (numpy — the subspace is tiny); the sigma
builds `matvec(Z)` take a *stack* of trial vectors and are expected to be
jit-compiled device functions, so each Davidson iteration is one device
round trip.  This mirrors the reference's architecture (vendored
`xtddft/utils/Davidson.py`: CPU subspace + device aop) while fixing its
defects (3-vs-4-tuple return arity, CuPy-only `.get()` calls).

Features matching the reference semantics:
- batched trial vectors, QR re-orthogonalization, linear-dependence drop
- `pick` hook (XTDA keeps only positive roots, `xtddft/XTDA.py:769-772`;
  SF methods keep negative roots)
- subspace restart at max_space
- diagonal preconditioning with level-shift guard
"""

from __future__ import annotations

import numpy as np


def davidson(
    matvec,
    hdiag: np.ndarray,
    nroots: int = 5,
    init_guess: np.ndarray | None = None,
    tol: float = 1e-7,
    max_cycle: int = 200,
    max_space_factor: int = 12,
    lindep: float = 1e-14,
    pick_positive: bool = False,
    pos_threshold: float = 1e-3,
    verbose: bool = False,
    pad_batches: bool = True,
):
    """Returns (e (nroots,), v (dim, nroots), converged (nroots,) bool).

    pad_batches: pad every matvec call to a fixed trial-batch size so the
    jitted sigma build compiles exactly once (varying batch shapes force
    an XLA recompile per Davidson iteration — tens of seconds each on TPU).
    """
    hdiag = np.asarray(hdiag)
    dim = hdiag.shape[0]
    nroots = min(nroots, dim)
    if init_guess is None:
        idx = np.argsort(hdiag)[:nroots]
        init_guess = np.zeros((nroots, dim))
        init_guess[np.arange(nroots), idx] = 1.0
    X = np.asarray(init_guess)
    max_space = min(dim, max(max_space_factor * nroots, nroots + 10))

    if pad_batches:
        bucket = max(nroots, X.shape[0])
        _mv = matvec

        def matvec(xs):
            n = xs.shape[0]
            if n >= bucket:
                return _mv(xs)
            pad = np.zeros((bucket - n, dim), dtype=xs.dtype)
            return np.asarray(_mv(np.vstack([xs, pad])))[:n]

    V = np.zeros((0, dim))  # orthonormal basis (rows)
    AV = np.zeros((0, dim))
    conv = np.zeros(nroots, dtype=bool)
    e = np.zeros(nroots)
    e_last = None
    stall_count = 0
    rmax_last = np.inf

    def orthonormalize(xs, basis):
        out = []
        for x in xs:
            if basis.shape[0] > 0:
                x = x - basis.T @ (basis @ x)
            for y in out:
                x = x - y * (y @ x)
            n = np.linalg.norm(x)
            if n**2 > lindep:
                out.append(x / n)
        return np.array(out).reshape(-1, dim)

    Xnew = X
    for cycle in range(max_cycle):
        Vadd = orthonormalize(Xnew, V)
        if Vadd.shape[0] == 0:
            break
        AVadd = np.asarray(matvec(Vadd))
        V = np.vstack([V, Vadd])
        AV = np.vstack([AV, AVadd])
        H = V @ AV.T
        H = 0.5 * (H + H.T)
        w, s = np.linalg.eigh(H)
        if pick_positive:
            keep = np.where(w > pos_threshold)[0]
            w, s = w[keep], s[:, keep]
        nr = min(nroots, w.shape[0])
        e = w[:nr]
        s = s[:, :nr]
        xs = s.T @ V  # Ritz vectors (nr, dim)
        ax = s.T @ AV
        resid = ax - e[:, None] * xs
        rnorm = np.linalg.norm(resid, axis=1)
        de = np.abs(e - e_last[: e.shape[0]]) if e_last is not None and e_last.shape[0] >= e.shape[0] else np.full_like(e, np.inf)
        # `conv` means residual convergence ONLY.  A root whose eigenvalue
        # has stagnated but whose residual is large is reported as
        # UNconverged — the reference's pick/restart semantics keep
        # iterating on such roots (`xtddft/utils/Davidson.py:200-281`), and
        # "converged" must never mean "plateaued away from the true root".
        # Stall detection watches the max unconverged RESIDUAL: when it
        # stops decreasing for several cycles (e.g. a precision floor) the
        # loop ends early with those roots honestly unconverged.
        conv = rnorm < tol
        rmax = rnorm[~conv].max() if not conv.all() else 0.0
        stall_count = stall_count + 1 if rmax >= 0.98 * rmax_last else 0
        rmax_last = min(rmax_last, rmax) if rmax > 0 else rmax_last
        if verbose:
            print(f"dvd cycle {cycle}: e={e} |r|={rnorm}")
        e_last = e.copy()
        if np.all(conv) or stall_count >= 4:
            break
        # preconditioned correction vectors for unconverged roots
        new = []
        for k in range(e.shape[0]):
            if conv[k]:
                continue
            denom = hdiag - e[k]
            denom = np.where(np.abs(denom) < 1e-8, 1e-8, denom)
            new.append(resid[k] / denom)
        Xnew = np.array(new)
        # restart if subspace too big
        if V.shape[0] + len(new) > max_space:
            V = np.zeros((0, dim))
            AV = np.zeros((0, dim))
            Xnew = np.vstack([xs, Xnew])
    return e[:nroots], xs[:nroots].T, conv[:nroots]
