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

__all__ = ["rpa_davidson", "rpa_rayleigh_ritz", "rpa_fulljit"]


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


# ---------------------------------------------------------------------------
# Fully-jitted paired-subspace Davidson: the entire SSF iteration as ONE
# lax.while_loop dispatch (the pencil analog of
# `solver/davidson_jit.davidson_fulljit`).  `rpa_davidson` above keeps
# V/AV/BV in host numpy and pays a device round trip per cycle — through a
# remote-TPU tunnel that is seconds of latency per call, which dominates the
# production TDHF wall clock.  Here V, AV, BV, the residual pair and both
# preconditioned expansions live on device with FIXED shapes; only the
# final (w, X+Y, X-Y, conv) cross to host.
#
# The projected pencil (Hp, Hm) is solved on device through the same
# canonical-orthogonalization + penalty-shift masking as the TDA fulljit
# ritz step: invalid subspace rows are exact zeros, S's null directions are
# dropped, and dropped/invalid dimensions ride to the top of the spectrum
# on a shift a few orders above |Hp| so they never pollute the lowest
# roots.  Hm's eigenvalues are clamped positive (the chip path cannot
# raise; external instability is re-checked by the host-f64
# `rpa_rayleigh_ritz` refinement that production callers run afterwards).
# ---------------------------------------------------------------------------

_RPA_SOLVER_CACHE: dict = {}


def _get_rpa_fulljit_solver(matvec_ab_raw, dim, nb, max_space, tol,
                            max_cycle, pos_threshold):
    """One jitted solver per configuration, cached so repeat solves reuse
    the compiled while_loop (same rationale/eviction as
    `davidson_jit._get_fulljit_solver`)."""
    key = (matvec_ab_raw, dim, nb, max_space, tol, max_cycle, pos_threshold)
    solver = _RPA_SOLVER_CACHE.get(key)
    if solver is None:
        solver = _build_rpa_fulljit_solver(
            matvec_ab_raw, dim, nb, max_space, tol, max_cycle, pos_threshold)
        while len(_RPA_SOLVER_CACHE) > 32:
            _RPA_SOLVER_CACHE.pop(next(iter(_RPA_SOLVER_CACHE)))
        _RPA_SOLVER_CACHE[key] = solver
    return solver


def _build_rpa_fulljit_solver(matvec_ab_raw, dim, nb, max_space, tol,
                              max_cycle, pos_threshold):
    import jax
    import jax.numpy as jnp

    nbx = 2 * nb  # expansion block: one preconditioned vector per residual
                  # (r+ and r-) per root, exactly the SSF dual expansion

    @jax.jit
    def _solve(consts, X0, hdiag_d, fill):
        dtype = X0.dtype

        def expand(V, AV, BV, ns, X):
            # subspace algebra at full f32 matmul precision (TPU default
            # bf16 floors orthogonality at ~1e-3; see davidson_jit)
            with jax.default_matmul_precision("highest"):
                X = X - (X @ V.T) @ V
                X = X - (X @ V.T) @ V
                eps = 1e-10 * jnp.max(jnp.sum(X * X, axis=1)) + 1e-30
                eye_b = jnp.eye(nbx, dtype=dtype)

                def chol(Y):
                    L = jnp.linalg.cholesky(Y @ Y.T + eps * eye_b)
                    return jax.scipy.linalg.solve_triangular(
                        L, Y, lower=True)

                Xo = chol(chol(X))
            pair = matvec_ab_raw(consts, Xo)  # (2, nbx, dim)
            V = jax.lax.dynamic_update_slice(V, Xo, (ns, 0))
            AV = jax.lax.dynamic_update_slice(AV, pair[0], (ns, 0))
            BV = jax.lax.dynamic_update_slice(BV, pair[1], (ns, 0))
            return V, AV, BV, ns + nbx

        def ritz(V, AV, BV):
            # f64 pencil algebra for f64 operators (CPU backend), f32
            # otherwise (f64 eigh is emulated on TPU) — same dtype rule
            # and rationale as davidson_jit's ritz
            sub = jnp.float64 if dtype == jnp.float64 else jnp.float32
            with jax.default_matmul_precision("highest"):
                PV = (AV + BV)
                MV = (AV - BV)
                S = (V @ V.T).astype(sub)
                Hp = (V @ PV.T).astype(sub)
                Hm = (V @ MV.T).astype(sub)
                S = 0.5 * (S + S.T)
                Hp = 0.5 * (Hp + Hp.T)
                Hm = 0.5 * (Hm + Hm.T)
                ws, Us = jnp.linalg.eigh(S)
                valid = ws > 1e-5
                Xc = Us * jnp.where(
                    valid,
                    1.0 / jnp.sqrt(jnp.where(valid, ws, 1.0)), 0.0)[None, :]
                scale = 1.0 + jnp.max(jnp.abs(Hp)) + jnp.max(jnp.abs(Hm))
                shift = 10.0 * scale
                inval = jnp.diag(jnp.where(valid, 0.0, shift))
                Hpc = Xc.T @ Hp @ Xc + inval
                Hmc = Xc.T @ Hm @ Xc + inval
                # Hm^{+/-1/2} on its (clamped-positive) eigenbasis
                wm, Um = jnp.linalg.eigh(0.5 * (Hmc + Hmc.T))
                wm = jnp.maximum(wm, 1e-10 * jnp.maximum(jnp.max(wm), 1.0))
                sm = jnp.sqrt(wm)
                P = Um * sm[None, :]
                Pm = Um / sm[None, :]
                M = P.T @ Hpc @ P
                w2, Z = jnp.linalg.eigh(0.5 * (M + M.T))
                w = jnp.sqrt(jnp.maximum(w2, 0.0))
                # drop sub-threshold roots (zero-frequency rotations) the
                # same way pick_positive does in the TDA fulljit: shift
                # them past the physical spectrum and re-sort
                w_eff = jnp.where(w > pos_threshold, w, shift)
                order = jnp.argsort(w_eff)
                w = w_eff[order][:nb]
                Z = Z[:, order][:, :nb]
                sw = jnp.sqrt(jnp.maximum(w, 1e-30))
                cp = (Xc @ (P @ Z)) / sw[None, :]
                cm = (Xc @ (Pm @ Z)) * sw[None, :]
                cp = cp.astype(dtype)
                cm = cm.astype(dtype)
                e = w.astype(dtype)
                xpy = cp.T @ V
                xmy = cm.T @ V
                rp = cp.T @ PV - e[:, None] * xmy
                rm = cm.T @ MV - e[:, None] * xpy
            rn2 = jnp.maximum(jnp.sum(rp * rp, axis=1),
                              jnp.sum(rm * rm, axis=1))
            return e, xpy, xmy, rp, rm, rn2

        def precond(r, e):
            denom = hdiag_d[None, :] - e[:, None]
            denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
            return r / denom

        def body(state):
            (V, AV, BV, ns, X, _, _, _, _, _, cycle, stall,
             rmax_prev) = state

            def do_restart(args):
                V, AV, BV, ns = args
                _, xpy0, xmy0, _, _, _ = ritz(V, AV, BV)
                Vn = jnp.zeros_like(V)
                AVn = jnp.zeros_like(AV)
                BVn = jnp.zeros_like(BV)
                # restart basis = both Ritz components (the pencil needs
                # span(X+Y) AND span(X-Y)); one extra matvec re-fills
                # AV/BV exactly (restarts are rare)
                Xr = jnp.concatenate([xpy0, xmy0], axis=0)
                return expand(Vn, AVn, BVn, 0, Xr)

            V, AV, BV, ns = jax.lax.cond(
                ns + nbx > max_space, do_restart, lambda a: a,
                (V, AV, BV, ns))
            V, AV, BV, ns = expand(V, AV, BV, ns, X)
            e, xpy, xmy, rp, rm, rn2 = ritz(V, AV, BV)
            rnorm = jnp.sqrt(jnp.maximum(rn2, 0.0))
            conv = rnorm < tol
            rmax = jnp.max(jnp.where(conv, 0.0, rnorm)).astype(jnp.float32)
            stall = jnp.where(
                jnp.all(conv) | (rmax < 0.98 * rmax_prev), 0, stall + 1)
            rmax_prev = jnp.minimum(
                rmax_prev, jnp.where(rmax > 0, rmax, rmax_prev))
            mask = (~conv).astype(dtype)[:, None]
            Xn = jnp.concatenate(
                [precond(rp, e) * mask + (1.0 - mask) * fill[:nb],
                 precond(rm, e) * mask + (1.0 - mask) * fill[nb:]],
                axis=0)
            return (V, AV, BV, ns, Xn, e, xpy, xmy, conv, rn2, cycle + 1,
                    stall, rmax_prev)

        def cond(state):
            conv = state[8]
            cycle = state[10]
            stall = state[11]
            return (cycle < max_cycle) & ~jnp.all(conv) & (stall < 4)

        V0 = jnp.zeros((max_space, dim), dtype=dtype)
        AV0 = jnp.zeros((max_space, dim), dtype=dtype)
        BV0 = jnp.zeros((max_space, dim), dtype=dtype)
        state0 = (
            V0, AV0, BV0, 0, X0,
            jnp.zeros((nb,), dtype=dtype),
            jnp.zeros((nb, dim), dtype=dtype),
            jnp.zeros((nb, dim), dtype=dtype),
            jnp.zeros((nb,), dtype=bool),
            jnp.zeros((nb,), dtype=dtype),
            0, 0,
            jnp.asarray(jnp.inf, dtype=jnp.float32),
        )
        out = jax.lax.while_loop(cond, body, state0)
        (_, _, _, _, _, e, xpy, xmy, conv, _, cycle, _, _) = out
        return e, xpy, xmy, conv, cycle

    return _solve


def rpa_fulljit(
    matvec_ab_raw,
    consts,
    hdiag,
    nroots: int = 5,
    init_guess=None,
    tol: float | None = None,
    max_cycle: int = 60,
    max_space_factor: int = 12,
    pos_threshold: float = 1e-6,
    return_info: bool = False,
):
    """Fully-jitted SSF paired Davidson — one device dispatch per solve.

    matvec_ab_raw(consts, zs (n, dim)) -> (2, n, dim) stacked [A z, B z]
    (the `with_b=True` DF sigma's ``matvec_raw``).  Expansion blocks are
    fixed at 2*nroots rows (one preconditioned vector per residual side
    per root).  tol=None picks the dtype-aware default of the TDA fulljit
    (f32 residuals floor near 1e-4).

    Returns (w (nroots,), xpy (dim, nroots), xmy (dim, nroots),
    conv (nroots,)) numpy; with return_info appends {"cycles": int}.
    Production callers refine with the host-f64 `rpa_rayleigh_ritz`
    afterwards, which also re-checks A-B positive definiteness (the
    on-device pencil clamps rather than raises).
    """
    import jax.numpy as jnp

    hdiag_np = np.asarray(hdiag)
    dim = hdiag_np.shape[0]
    nroots = min(nroots, dim)
    if init_guess is None:
        idx = np.argsort(hdiag_np)[:nroots]
        init_guess = np.zeros((nroots, dim), dtype=np.float32)
        init_guess[np.arange(nroots), idx] = 1.0
    init_guess = np.asarray(init_guess)[:nroots]
    nb = init_guess.shape[0]
    nbx = 2 * nb
    rng = np.random.default_rng(11)
    # seed the full first block: nb guess rows + nb random directions
    X0_np = np.vstack(
        [init_guess, rng.normal(size=(nbx - nb, dim)).astype(
            init_guess.dtype)])
    cap = max(nbx, nbx * max_space_factor)
    if cap >= dim:
        # small problems: make the WHOLE space reachable (rounding the
        # buffer up to a block multiple; surplus rows stay invalid and the
        # canonical orthogonalization drops them) — flooring below dim
        # would force restart churn that stalls short of tight tolerances.
        # Floor at TWO blocks: the restart seeds one full block (the Ritz
        # pair), so a single-block buffer would make every post-restart
        # expand overwrite the restart basis (dynamic_update_slice clamps
        # the start index) and stall on dim <= nbx pencils
        max_space = max(2 * nbx, nbx * (-(-dim // nbx)))
    else:
        max_space = nbx * (cap // nbx)

    X0 = jnp.asarray(X0_np)
    probe = matvec_ab_raw(consts, X0)  # dtype probe + matvec warm-up
    if tol is None:
        tol = 1e-6 if probe.dtype == jnp.float64 else 3e-4
    _solve = _get_rpa_fulljit_solver(
        matvec_ab_raw, dim, nb, max_space, float(tol), int(max_cycle),
        float(pos_threshold))
    X0 = X0.astype(probe.dtype)
    hdiag_d = jnp.asarray(hdiag_np, dtype=probe.dtype)
    fill = jnp.asarray(rng.normal(size=(nbx, dim)), dtype=probe.dtype)
    e, xpy, xmy, conv, cycle = _solve(consts, X0, hdiag_d, fill)
    e = np.asarray(e)[:nroots]
    xpy = np.asarray(xpy)[:nroots].T
    xmy = np.asarray(xmy)[:nroots].T
    conv = np.asarray(conv)[:nroots]
    if return_info:
        return e, xpy, xmy, conv, {"cycles": int(cycle)}
    return e, xpy, xmy, conv
