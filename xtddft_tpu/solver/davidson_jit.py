"""Device-resident block Davidson (the TPU production eigensolver).

The host-subspace Davidson (`solver/davidson.py`, mirroring the
reference's vendored `xtddft/utils/Davidson.py`) moves every trial batch
and sigma result host<->device each iteration — through a remote-TPU
tunnel that costs seconds per call.  Here the subspace basis V, the sigma
results AV, the residuals and the preconditioned expansions all live on
device; per iteration only the tiny projected matrix H and the residual
norms cross to host (the Rayleigh-Ritz eigensolve of H is microscopic and
stays on host in f64).

Every device buffer has a FIXED shape (V/AV preallocated at max_space,
expansion blocks padded to the root count): on a remote-compile TPU
backend each distinct shape costs a full XLA compile round trip, so all
kernels compile exactly once.  Orthonormalization is CholeskyQR2 (pure
matmuls; jnp.linalg.qr of a tall matrix is pathologically slow on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _expand(V, AV, X, ns):
    """Orthonormalize X (nb, dim) against the valid rows of V and write the
    result into rows [ns, ns+nb).  Invalid rows of V are zero, so the
    projection against the full buffer is exact.  Runs at full f32 matmul
    precision (TPU default bf16 floors orthogonality at ~1e-3)."""
    with jax.default_matmul_precision("highest"):
        X = X - (X @ V.T) @ V
        X = X - (X @ V.T) @ V
        eps = 1e-10 * jnp.max(jnp.sum(X * X, axis=1)) + 1e-30
        eye = jnp.eye(X.shape[0], dtype=X.dtype)

        def chol_pass(Y):
            G = Y @ Y.T + eps * eye
            L = jnp.linalg.cholesky(G)
            return jax.scipy.linalg.solve_triangular(L, Y, lower=True)

        Xo = chol_pass(chol_pass(X))
    V = jax.lax.dynamic_update_slice(V, Xo, (ns, 0))
    return V, Xo


@jax.jit
def _update_av(AV, AX, ns):
    return jax.lax.dynamic_update_slice(AV, AX, (ns, 0))


@jax.jit
def _project(V, AV):
    """(H, S) subspace projections; invalid rows/cols are zero.  S is
    needed because f32 orthogonality degrades over many cycles — solving
    the generalized problem on host keeps the Ritz values variational."""
    with jax.default_matmul_precision("highest"):
        return V @ AV.T, V @ V.T


@jax.jit
def _ritz_precond(V, AV, s, e, hdiag, mask, fill):
    """One fused device call per cycle: Ritz vectors, residual norms, and
    the preconditioned expansion block (masked to unconverged roots, with
    random refill rows to keep the block full-rank).  s is (max_space, nr)
    with zeros on invalid rows."""
    with jax.default_matmul_precision("highest"):
        xs = s.T @ V
        ax = s.T @ AV
    r = ax - e[:, None] * xs
    rnorm2 = jnp.sum(r * r, axis=1)
    denom = hdiag[None, :] - e[:, None]
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    X = (r / denom) * mask[:, None] + (1.0 - mask)[:, None] * fill
    return xs, X, rnorm2


def davidson_device(
    matvec,
    hdiag,
    nroots: int = 5,
    init_guess=None,
    tol: float | None = 1e-5,
    max_cycle: int = 100,
    max_space_factor: int = 6,
    pick_positive: bool = False,
    pos_threshold: float = 1e-3,
    verbose: bool = False,
):
    """Returns (e (nroots,), v (dim, nroots) np.ndarray, conv (nroots,) bool).

    matvec: jitted (nb, dim) -> (nb, dim) device function; hdiag: (dim,).
    """
    hdiag_np = np.asarray(hdiag)
    dim = hdiag_np.shape[0]
    nroots = min(nroots, dim)
    if init_guess is None:
        idx = np.argsort(hdiag_np)[:nroots]
        init_guess = np.zeros((nroots, dim), dtype=np.float32)
        init_guess[np.arange(nroots), idx] = 1.0
    init_guess = np.asarray(init_guess)
    nb = max(nroots, init_guess.shape[0])
    rng = np.random.default_rng(1234)
    if init_guess.shape[0] < nb:
        init_guess = np.vstack(
            [
                init_guess,
                rng.normal(size=(nb - init_guess.shape[0], dim)).astype(
                    init_guess.dtype
                ),
            ]
        )
    max_space = min(dim, max(nb * max_space_factor, nb + 10))
    max_space = max(nb, nb * (max_space // nb))  # multiple of the block size

    # one probe call fixes the working dtype to the operator's output dtype
    # (f32 on TPU) and doubles as the compile warm-up
    probe = matvec(jnp.asarray(init_guess))
    dtype = probe.dtype
    if tol is None:  # dtype-aware default: f32 residuals floor near 1e-4
        tol = 1e-6 if dtype == jnp.float64 else 3e-4
    X = jnp.asarray(init_guess, dtype=dtype)
    hdiag_d = jnp.asarray(hdiag_np, dtype=dtype)
    # one fixed random refill block, reused when pick_positive drops roots
    # (re-orthogonalization extracts fresh directions from it every cycle)
    fill_d = jnp.asarray(rng.normal(size=(nb, dim)), dtype=dtype)
    V = jnp.zeros((max_space, dim), dtype=dtype)
    AV = jnp.zeros((max_space, dim), dtype=dtype)
    ns = 0
    e = np.zeros(nroots)
    e_last = None
    conv = np.zeros(nroots, dtype=bool)
    stall_count = 0
    rmax_last = np.inf
    xs = None

    for cycle in range(max_cycle):
        if ns + nb > max_space:
            # restart: current Ritz vectors become the fresh basis
            V = jnp.zeros((max_space, dim), dtype=dtype)
            AV = jnp.zeros((max_space, dim), dtype=dtype)
            V, Xo = _expand(V, AV, xs_pad, 0)
            AV = _update_av(AV, matvec(Xo), 0)
            ns = nb
        V, Xo = _expand(V, AV, X, ns)
        AV = _update_av(AV, matvec(Xo), ns)
        ns += nb
        H_d, S_d = _project(V, AV)
        H = np.asarray(H_d, dtype=np.float64)[:ns, :ns]
        S_ov = np.asarray(S_d, dtype=np.float64)[:ns, :ns]
        H = 0.5 * (H + H.T)
        S_ov = 0.5 * (S_ov + S_ov.T)
        # canonical orthogonalization: drop near-dependent directions
        ws, Us = np.linalg.eigh(S_ov)
        keep_s = ws > 1e-5
        Xc = Us[:, keep_s] / np.sqrt(ws[keep_s])[None, :]
        w, sc = np.linalg.eigh(Xc.T @ H @ Xc)
        s = Xc @ sc
        if pick_positive:
            keep = np.where(w > pos_threshold)[0]
            w, s = w[keep], s[:, keep]
        nr = min(nroots, w.shape[0])
        e = w[:nr]
        # pad the Ritz rotation to fixed shapes (nb roots, max_space rows)
        s_pad = np.zeros((max_space, nb), dtype=dtype)
        s_pad[:ns, :nr] = s[:, :nr]
        e_pad = np.zeros(nb, dtype=dtype)
        e_pad[:nr] = e
        mask = np.zeros(nb, dtype=dtype)
        mask[:nr] = 1.0
        xs, X, rnorm2 = _ritz_precond(
            V, AV, jnp.asarray(s_pad), jnp.asarray(e_pad), hdiag_d,
            jnp.asarray(mask), fill_d,
        )
        rnorm = np.sqrt(np.maximum(np.asarray(rnorm2[:nr]), 0.0))
        de = (
            np.abs(e - e_last[: e.shape[0]])
            if e_last is not None and e_last.shape[0] >= e.shape[0]
            else np.full_like(e, np.inf)
        )
        # conv == residual convergence only (see solver/davidson.py); a
        # residual-progress stall for 4 cycles ends the loop but those
        # roots report unconverged.
        conv = rnorm < tol
        rmax = rnorm[~conv].max() if not conv.all() else 0.0
        stall_count = stall_count + 1 if rmax >= 0.98 * rmax_last else 0
        rmax_last = min(rmax_last, rmax) if rmax > 0 else rmax_last
        e_last = e.copy()
        xs_pad = xs  # (nb, dim), rows beyond nr are zero-rotations
        if verbose:
            print(
                f"dvd-jit cycle {cycle}: ns={ns} e[:3]={e[:3]} "
                f"|r|max={rnorm.max():.2e}"
            )
        if np.all(conv) or stall_count >= 4:
            break

    v = np.asarray(xs[:nroots]).T if xs is not None else np.zeros((dim, nroots))
    return e[:nroots], v, conv[:nroots]


def _solver_cache_key(matvec_raw, dim, nb, max_space, tol, max_cycle,
                      pick_positive, pos_threshold):
    return (matvec_raw, dim, nb, max_space, tol, max_cycle, pick_positive,
            pos_threshold)


_SOLVER_CACHE: dict = {}


def _get_fulljit_solver(matvec_raw, dim, nb, max_space, tol, max_cycle,
                        pick_positive, pos_threshold):
    """Build (once per configuration) the single-dispatch jitted solve.

    The jit wrapper MUST be reused across davidson_fulljit calls: a fresh
    wrapper per call re-traces and (on a cold XLA cache) recompiles the
    entire fused solve INSIDE the caller's timed/production region — the
    whole point of the fully-jitted solver is that the compile is paid
    once at warm-up."""
    key = _solver_cache_key(matvec_raw, dim, nb, max_space, tol, max_cycle,
                            pick_positive, pos_threshold)
    solver = _SOLVER_CACHE.get(key)
    if solver is None:
        solver = _build_fulljit_solver(
            matvec_raw, dim, nb, max_space, tol, max_cycle, pick_positive,
            pos_threshold,
        )
        while len(_SOLVER_CACHE) > 32:
            # evict oldest (insertion-ordered dict), never the whole cache:
            # clearing would also drop entries about to be reused and
            # reintroduce recompiles in long sessions (ADVICE r1)
            _SOLVER_CACHE.pop(next(iter(_SOLVER_CACHE)))
        _SOLVER_CACHE[key] = solver
    return solver


def _build_fulljit_solver(matvec_raw, dim, nb, max_space, tol, max_cycle,
                          pick_positive, pos_threshold):
    @jax.jit
    def _solve(consts, X0, hdiag_d, fill):
        dtype = X0.dtype

        def expand(V, AV, ns, X):
            # TPU matmuls default to bf16 precision (~1e-3): the subspace
            # algebra must run at full f32 ('highest') or orthogonality and
            # residual norms floor three orders of magnitude too high
            with jax.default_matmul_precision("highest"):
                X = X - (X @ V.T) @ V
                X = X - (X @ V.T) @ V
                eps = 1e-10 * jnp.max(jnp.sum(X * X, axis=1)) + 1e-30
                eye_b = jnp.eye(nb, dtype=dtype)

                def chol(Y):
                    L = jnp.linalg.cholesky(Y @ Y.T + eps * eye_b)
                    return jax.scipy.linalg.solve_triangular(L, Y, lower=True)

                Xo = chol(chol(X))
            V = jax.lax.dynamic_update_slice(V, Xo, (ns, 0))
            AV = jax.lax.dynamic_update_slice(AV, matvec_raw(consts, Xo), (ns, 0))
            return V, AV, ns + nb

        def ritz(V, AV):
          # subspace algebra dtype: f32 for f32/bf16 operators (f64 eigh is
          # emulated on TPU), but FULL f64 for f64 operators (CPU backend)
          # — an f32 pencil leaves Ritz-rotation error ~1e-6, exactly at
          # the f64 residual tolerance, so convergence would stall
          sub = jnp.float64 if dtype == jnp.float64 else jnp.float32
          with jax.default_matmul_precision("highest"):
            H = (V @ AV.T).astype(sub)
            S = (V @ V.T).astype(sub)
            H = 0.5 * (H + H.T)
            S = 0.5 * (S + S.T)
            ws, Us = jnp.linalg.eigh(S)
            valid = ws > 1e-5
            Xc = Us * jnp.where(valid, 1.0 / jnp.sqrt(jnp.where(valid, ws, 1.0)), 0.0)[None, :]
            # penalty shift for dropped directions: must stay within a few
            # orders of the physical spectrum — an absolute 1e8 shift makes
            # f32 eigh lose ~|A|*eps = O(10) on every eigenvalue
            shift = 10.0 * (1.0 + jnp.max(jnp.abs(H)))
            Ht = Xc.T @ H @ Xc + jnp.diag(jnp.where(valid, 0.0, shift))
            w, sc = jnp.linalg.eigh(Ht)
            if pick_positive:
                w_eff = jnp.where(w > pos_threshold, w, shift)
                order = jnp.argsort(w_eff)
                w = w_eff[order]
                sc = sc[:, order]
            s = (Xc @ sc[:, :nb]).astype(dtype)
            e = w[:nb].astype(dtype)
            xs = s.T @ V
            ax = s.T @ AV
            r = ax - e[:, None] * xs
            rnorm2 = jnp.sum(r * r, axis=1)
            return e, xs, ax, r, rnorm2

        def precond(r, e):
            denom = hdiag_d[None, :] - e[:, None]
            denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
            return r / denom

        def body(state):
            V, AV, ns, X, e_prev, _, _, _, cycle, stall, rmax_prev = state
            # restart when full: current Ritz pair becomes the fresh basis
            def do_restart(args):
                V, AV, ns = args
                e0, xs0, ax0, _, _ = ritz(V, AV)
                Vn = jnp.zeros_like(V)
                AVn = jnp.zeros_like(AV)
                # xs0 rows are orthonormal up to f32 error; good enough as
                # a restart basis (the pencil solve absorbs the rest)
                Vn = jax.lax.dynamic_update_slice(Vn, xs0, (0, 0))
                AVn = jax.lax.dynamic_update_slice(AVn, ax0, (0, 0))
                return Vn, AVn, nb

            V, AV, ns = jax.lax.cond(
                ns + nb > max_space, do_restart, lambda a: a, (V, AV, ns)
            )
            V, AV, ns = expand(V, AV, ns, X)
            e, xs, ax, r, rnorm2 = ritz(V, AV)
            # conv = residual test only; a 4-cycle residual-progress stall
            # terminates the loop with those roots UNconverged (see
            # solver/davidson.py for the semantics rationale)
            rnorm = jnp.sqrt(jnp.maximum(rnorm2, 0.0))
            conv = rnorm < tol
            # stall tracking in f32 regardless of operator dtype (the carry
            # slot is fixed f32; progress ratios don't need f64)
            rmax = jnp.max(jnp.where(conv, 0.0, rnorm)).astype(jnp.float32)
            stall = jnp.where(
                jnp.all(conv) | (rmax < 0.98 * rmax_prev), 0, stall + 1
            )
            rmax_prev = jnp.minimum(rmax_prev, jnp.where(rmax > 0, rmax, rmax_prev))
            Xn = precond(r, e)
            return (V, AV, ns, Xn, e, xs, conv, rnorm2, cycle + 1, stall,
                    rmax_prev)

        def cond(state):
            conv = state[6]
            cycle = state[8]
            stall = state[9]
            return (cycle < max_cycle) & ~jnp.all(conv) & (stall < 4)

        V0 = jnp.zeros((max_space, dim), dtype=dtype)
        AV0 = jnp.zeros((max_space, dim), dtype=dtype)
        state0 = (
            V0, AV0, 0, X0,
            jnp.full((nb,), jnp.inf, dtype=dtype),
            jnp.zeros((nb, dim), dtype=dtype),
            jnp.zeros((nb,), dtype=bool),
            jnp.zeros((nb,), dtype=dtype),
            0,
            0,
            jnp.asarray(jnp.inf, dtype=jnp.float32),
        )
        V, AV, ns, X, e, xs, conv, rnorm2, cycle, _, _ = jax.lax.while_loop(
            cond, body, state0
        )
        return e, xs, conv, cycle

    return _solve


def davidson_fulljit(
    matvec_raw,
    consts,
    hdiag,
    nroots: int = 5,
    init_guess=None,
    tol: float | None = 3e-4,
    max_cycle: int = 60,
    max_space_factor: int = 12,
    pick_positive: bool = False,
    pos_threshold: float = 1e-3,
    return_info: bool = False,
):
    """Fully-jitted block Davidson: the ENTIRE solve is one device dispatch
    (lax.while_loop), so remote-tunnel latency is paid once instead of
    several times per cycle.  The subspace eigenproblem is solved on device
    as a generalized pencil via canonical orthogonalization with masked
    (shifted) invalid directions.

    matvec_raw(consts, z): pure sigma build with all tensors as arguments.
    tol=None picks a dtype-aware default (f32 residuals floor near 1e-4;
    same rule as davidson_device).
    Returns (e (nroots,), v (dim, nroots), conv (nroots,)) as numpy; with
    return_info, appends a dict with the cycle count.
    """
    hdiag_np = np.asarray(hdiag)
    dim = hdiag_np.shape[0]
    nroots = min(nroots, dim)
    if init_guess is None:
        idx = np.argsort(hdiag_np)[:nroots]
        init_guess = np.zeros((nroots, dim), dtype=np.float32)
        init_guess[np.arange(nroots), idx] = 1.0
    init_guess = np.asarray(init_guess)
    nb = init_guess.shape[0]
    rng = np.random.default_rng(7)
    cap = max(nb, nb * max_space_factor)
    if cap >= dim:
        # small problems: whole space reachable; floor at two expansion
        # blocks so post-restart expands never overwrite the restart
        # basis when dim <= nb (see solver/rpa.py note)
        max_space = max(2 * nb, nb * (-(-dim // nb)))
    else:
        max_space = nb * (cap // nb)

    # probe dtype with one matvec (also the compile warm-up for matvec)
    X0 = jnp.asarray(init_guess)
    probe = matvec_raw(consts, X0)
    if tol is None:
        tol = 1e-6 if probe.dtype == jnp.float64 else 3e-4
    _solve = _get_fulljit_solver(
        matvec_raw, dim, nb, max_space, float(tol), int(max_cycle),
        bool(pick_positive), float(pos_threshold),
    )
    X0 = X0.astype(probe.dtype)
    hdiag_d = jnp.asarray(hdiag_np, dtype=probe.dtype)
    fill = jnp.asarray(rng.normal(size=(nb, dim)), dtype=probe.dtype)
    e, xs, conv, cycle = _solve(consts, X0, hdiag_d, fill)
    e = np.asarray(e)[:nroots]
    v = np.asarray(xs)[:nroots].T
    conv = np.asarray(conv)[:nroots]
    if return_info:
        return e, v, conv, {"cycles": int(cycle)}
    return e, v, conv
