"""SCF internal stability analysis + stable-SCF retry loop.

The reference guards its SOC pipeline with PySCF's stability loop
(`/root/reference/x2c_hamiltonian/test_SOCSI.py:20-27`): after SCF,
check the internal stability of the solution; if a negative orbital-
Hessian eigenvalue exists, rotate along that direction and re-converge,
up to a retry cap.

Here the electronic orbital Hessian comes from the same autodiff
machinery as the gradients (`grad/lagrangian.py`): H = d2 E_elec /
dkappa2 over the nonredundant rotation pairs (occ-vir per spin for UHF;
closed-open/closed-vir/open-vir for ROHF; occ-vir for RHF) — no
hand-derived A+B response matrices.  KS references get the full fxc
contribution automatically through the differentiable XC quadrature
(`grad/xcgrid.py`).

Two backends:

  dense — ``jax.hessian`` over the in-core nao^4 ERI (adequate below
          ~140 AO; the original path).
  df    — matrix-free at production scale: the SCF electronic energy is
          re-expressed on the Env's density-fitted B tensors
          (E_J = 1/2 sum_P (B_P . D)^2, E_K^s = 1/2 sum_P |C_s^T B_P
          C_s|_F^2), Hessian ACTIONS come from ``jax.jvp`` of its
          gradient, and the lowest eigenpair from the block Davidson —
          peak memory O(naux nao^2), per-action cost O(naux nao^2 nocc)
          (one DF K build).  Because everything is evaluated at the
          reference geometry, fixed-matrix hcore contributions (sfx2c
          picture change, v_ext) are exact here — unlike the nuclear
          gradients, which rebuild hcore as T(R)+V(R).
"""

from __future__ import annotations

import numpy as np

__all__ = ["internal_stability", "stable_scf", "df_hessian_operator"]


def df_hessian_operator(mf):
    """Matrix-free internal-orbital-Hessian operator on the Env's DF
    tensors.

    Returns ``(hvp, hdiag, rotate)`` where ``hvp(xs)`` applies
    H = d2 E_elec / dkappa2 to a stacked batch of kappa vectors by
    ``jax.jvp`` of the energy gradient (one DF J/K build per action,
    no nao^4 object anywhere), ``hdiag`` is the orbital-energy-difference
    preconditioner, and ``rotate(kvec)`` maps a kappa vector to displaced
    MO coefficients in the mean-field's own layout.

    The energy functional is the DF re-expression of `grad/lagrangian.py
    _e_elec` at the *fixed* reference geometry: hcore is taken verbatim
    from the Env (so sfx2c / v_ext references are exact here), Coulomb
    and exchange come from the metric-dressed B tensor, XC from the
    differentiable quadrature (`grad/xcgrid.py`, incl. the MGGA tau
    channel), and RSH long-range exchange from the erf-attenuated B."""
    import jax
    import jax.numpy as jnp

    from xtddft_tpu.grad.lagrangian import _rot_pairs, _rotate

    env = mf.env
    kind = mf.kind
    na, nb = mf.mol.nalpha, mf.mol.nbeta
    if kind in ("uhf", "uks"):
        C0 = [jnp.asarray(mf.mo_coeff[0]), jnp.asarray(mf.mo_coeff[1])]
        eps = [np.asarray(mf.mo_energy[0]), np.asarray(mf.mo_energy[1])]
    else:
        C0 = [jnp.asarray(mf.mo_coeff)]
        eps = [np.asarray(mf.mo_energy)]
    nmo = C0[0].shape[1]
    pairs = _rot_pairs(kind, nmo, na, nb)

    spec = mf.xc
    hyb, hyb_lr, omega = 1.0, 0.0, 0.0
    if spec is not None:
        hyb = spec.hyb
        if abs(spec.omega) > 1e-12:
            omega = spec.omega
            hyb_lr = spec.alpha - spec.hyb
    B = env.df_B(0.0)
    B_lr = env.df_B(omega) if hyb_lr != 0.0 else None
    hcore = jnp.asarray(env.hcore)
    if getattr(mf, "v_ext", None) is not None:
        hcore = hcore + jnp.asarray(mf.v_ext)
    exc = None
    if spec is not None and spec.components:
        from xtddft_tpu.grad.xcgrid import make_exc_fn

        exc = make_exc_fn(mf.mol, env.layout, spec, level=env.grid_level)
    coords0 = jnp.asarray(np.asarray(mf.mol.coords, dtype=np.float64))

    def orbs(kvec):
        if kind in ("uhf", "uks"):
            n0 = len(pairs[0][0])
            return (_rotate(C0[0], kvec[:n0], pairs[0], nmo),
                    _rotate(C0[1], kvec[n0:], pairs[1], nmo))
        C = _rotate(C0[0], kvec, pairs[0], nmo)
        return C, C

    def _ek(Bx, Co):
        # 1/2 sum_P |Co^T B_P Co|_F^2 = 1/2 tr(B_P D B_P D)
        Y = jnp.einsum("pi,xpj->xij", Co, jnp.einsum("xpq,qj->xpj", Bx, Co))
        return jnp.einsum("xij,xij->", Y, Y)

    def e_elec(kvec):
        Ca, Cb = orbs(kvec)
        Coa, Cob = Ca[:, :na], Cb[:, :nb]
        da = Coa @ Coa.T
        db = Cob @ Cob.T
        e = jnp.einsum("pq,qp->", hcore, da + db)
        g = jnp.einsum("xpq,pq->x", B, da + db)
        e = e + 0.5 * (g @ g)
        if hyb != 0.0:
            e = e - 0.5 * hyb * (_ek(B, Coa) + _ek(B, Cob))
        if hyb_lr != 0.0:
            e = e - 0.5 * hyb_lr * (_ek(B_lr, Coa) + _ek(B_lr, Cob))
        if exc is not None:
            e = e + exc(coords0, da, db)
        return e

    grad_e = jax.grad(e_elec)

    @jax.jit
    def hvp(xs):
        def one(v):
            return jax.jvp(grad_e, (jnp.zeros(v.shape[0]),), (v,))[1]

        return jax.vmap(one)(jnp.asarray(xs))

    hd = []
    for ch, (pi, pj) in enumerate(pairs):
        e_ch = eps[min(ch, len(eps) - 1)]
        hd.append(2.0 * (e_ch[pj] - e_ch[pi]))
    hdiag = np.concatenate(hd)

    def rotate(kvec):
        kvec = jnp.asarray(kvec)
        if kind in ("uhf", "uks"):
            n0 = len(pairs[0][0])
            Ca = _rotate(C0[0], kvec[:n0], pairs[0], nmo)
            Cb = _rotate(C0[1], kvec[n0:], pairs[1], nmo)
            return np.stack([np.asarray(Ca), np.asarray(Cb)])
        return np.asarray(_rotate(C0[0], kvec, pairs[0], nmo))

    return hvp, hdiag, rotate


def _internal_stability_df(mf, tol: float):
    """Lowest internal-Hessian eigenpair by block Davidson over DF
    Hessian actions (the at-scale backend; see module docstring)."""
    from xtddft_tpu.solver.davidson import davidson

    hvp, hdiag, rotate = df_hessian_operator(mf)
    nroots = min(3, hdiag.shape[0])
    w, V, conv = davidson(
        lambda xs: np.asarray(hvp(xs)), hdiag, nroots=nroots, tol=1e-5,
        max_space_factor=30)
    w_min = float(w[0])
    stable = w_min > -tol
    if stable:
        return True, w_min, mf.mo_coeff
    v0 = V[:, 0]
    kvec = (np.pi / 8.0) * v0 / np.abs(v0).max()
    return False, w_min, rotate(kvec)


def internal_stability(mf, tol: float = 1e-6, backend: str = "auto"):
    """(stable, w_min, mo_rotated): diagonalize the real internal orbital
    Hessian of a converged HF solution.

    If unstable (w_min < -tol), ``mo_rotated`` holds orbitals displaced
    along the downhill eigenvector (step pi/8 in rotation angle),
    suitable as an initial guess for a re-converge; otherwise it is the
    input orbitals.

    backend: 'dense' (jax.hessian over in-core ERIs, small molecules),
    'df' (matrix-free Davidson over DF Hessian actions, any size), or
    'auto' (dense below 140 AO, df above)."""
    import jax
    import jax.numpy as jnp

    from xtddft_tpu.grad.lagrangian import ExcitedGradients, _rotate

    if backend == "auto":
        # fixed-matrix hcore modifications (sfx2c picture change, v_ext)
        # are exact in the DF functional but break the gradient-layer
        # T(R)+V(R) rebuild the dense path is built on (ADVICE r1)
        special_h = (getattr(mf.env, "x2c", False)
                     or getattr(mf, "v_ext", None) is not None)
        backend = "df" if (mf.env.nao > 140 or special_h) else "dense"
    if backend == "df":
        return _internal_stability_df(mf, tol)
    if mf.env.nao > 140:
        # the dense kappa-space jax.hessian below materializes the full
        # nao^4 f64 ERI plus an O(nk^2) Hessian — at DF/production sizes
        # (TTM 182 AO = 8.8 GB ERI) this OOMs rather than answers
        # (ADVICE r1).
        raise NotImplementedError(
            f"internal_stability(backend='dense') uses in-core ERIs; "
            f"nao={mf.env.nao} > 140 would materialize an O(nao^4) "
            "tensor. Use backend='df' (matrix-free DF Hessian actions).")
    eg = ExcitedGradients.__new__(ExcitedGradients)
    eg.mf = mf
    eg.method = "cis"  # irrelevant: only the SCF energy machinery is used
    ExcitedGradients.__post_init__(eg)

    ints0 = eg._ints0()
    k0 = jnp.zeros(eg.nk)
    H = np.asarray(jax.jit(jax.hessian(lambda k: eg._e_elec(ints0, k)))(k0))
    H = 0.5 * (H + H.T)
    w, V = np.linalg.eigh(H)
    w_min = float(w[0])
    stable = w_min > -tol
    if stable:
        return True, w_min, mf.mo_coeff

    step = np.pi / 8.0
    kvec = jnp.asarray(step * V[:, 0] / np.abs(V[:, 0]).max())
    if eg.kind in ("uhf", "uks"):
        n0 = len(eg.pairs[0][0])
        Ca = _rotate(eg.C0[0], kvec[:n0], eg.pairs[0], eg.nmo)
        Cb = _rotate(eg.C0[1], kvec[n0:], eg.pairs[1], eg.nmo)
        mo = np.stack([np.asarray(Ca), np.asarray(Cb)])
    else:
        mo = np.asarray(_rotate(eg.C0[0], kvec, eg.pairs[0], eg.nmo))
    return False, w_min, mo


def stable_scf(scf, occ=None, init=None, max_tries: int = 3,
               tol: float = 1e-6, verbose: bool = False,
               backend: str = "auto"):
    """Converge an SCF and retry from rotated orbitals until internally
    stable (the reference's `test_SOCSI.py:20-27` loop).  Returns the
    final MeanField; raises if still unstable after ``max_tries``."""
    mf = scf.kernel(occ=occ, init=init)
    for it in range(max_tries):
        stable, w_min, mo = internal_stability(mf, tol=tol, backend=backend)
        if verbose:
            print(f"stability[{it}]: w_min={w_min:.3e} stable={stable}")
        if stable and mf.converged:
            return mf
        mf = scf.kernel(occ=occ, init=mo)
    stable, w_min, _ = internal_stability(mf, tol=tol, backend=backend)
    if not (stable and mf.converged):
        raise RuntimeError(
            f"SCF not stable after {max_tries} retries (w_min={w_min:.3e})")
    return mf
