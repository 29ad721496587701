"""SCF internal stability analysis + stable-SCF retry loop.

The reference guards its SOC pipeline with PySCF's stability loop
(`/root/reference/x2c_hamiltonian/test_SOCSI.py:20-27`): after SCF,
check the internal stability of the solution; if a negative orbital-
Hessian eigenvalue exists, rotate along that direction and re-converge,
up to a retry cap.

Here the electronic orbital Hessian comes from the same autodiff
machinery as the gradients (`grad/lagrangian.py`): H = d2 E_elec /
dkappa2 over the nonredundant rotation pairs (occ-vir per spin for UHF;
closed-open/closed-vir/open-vir for ROHF; occ-vir for RHF), built by
``jax.hessian`` (dense, adequate for the molecule sizes the stability
loop targets) — no hand-derived A+B response matrices.  KS references
get the full fxc contribution automatically through the differentiable
XC quadrature (`grad/xcgrid.py`); RSH functionals are the one guarded
gap (see GAPS.md).
"""

from __future__ import annotations

import numpy as np

__all__ = ["internal_stability", "stable_scf"]


def internal_stability(mf, tol: float = 1e-6):
    """(stable, w_min, mo_rotated): diagonalize the real internal orbital
    Hessian of a converged HF solution.

    If unstable (w_min < -tol), ``mo_rotated`` holds orbitals displaced
    along the downhill eigenvector (step pi/8 in rotation angle),
    suitable as an initial guess for a re-converge; otherwise it is the
    input orbitals."""
    import jax
    import jax.numpy as jnp

    from xtddft_tpu.grad.lagrangian import ExcitedGradients, _rotate

    if mf.env.nao > 140:
        # the dense kappa-space jax.hessian below materializes the full
        # nao^4 f64 ERI plus an O(nk^2) Hessian — at DF/production sizes
        # (TTM 182 AO = 8.8 GB ERI) this OOMs rather than answers
        # (ADVICE r1).  Matrix-free stability at scale goes through the
        # response drivers (XTDA on the converged mf), not this path.
        raise NotImplementedError(
            f"internal_stability uses dense in-core ERIs; nao={mf.env.nao} "
            "> 140 would materialize an O(nao^4) tensor. Use the response "
            "stability analysis (sigma-operator Davidson) instead.")
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
               tol: float = 1e-6, verbose: bool = False):
    """Converge an SCF and retry from rotated orbitals until internally
    stable (the reference's `test_SOCSI.py:20-27` loop).  Returns the
    final MeanField; raises if still unstable after ``max_tries``."""
    mf = scf.kernel(occ=occ, init=init)
    for it in range(max_tries):
        stable, w_min, mo = internal_stability(mf, tol=tol)
        if verbose:
            print(f"stability[{it}]: w_min={w_min:.3e} stable={stable}")
        if stable and mf.converged:
            return mf
        mf = scf.kernel(occ=occ, init=mo)
    stable, w_min, _ = internal_stability(mf, tol=tol)
    if not (stable and mf.converged):
        raise RuntimeError(
            f"SCF not stable after {max_tries} retries (w_min={w_min:.3e})")
    return mf
