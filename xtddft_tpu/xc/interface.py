"""Grid XC evaluation: energies, potentials, and kernel responses via autodiff.

The reference calls libxc through PySCF (``eval_xc_eff(deriv=1/2)``,
``cache_xc_kernel`` + ``nr_uks_fxc``, `xtddft/XTDA.py:504-514`) and hand-wires
the derivative contractions per xc family.  Here every functional is a JAX
energy density e(rho_a, rho_b, grad_rho_a, grad_rho_b); then

- vxc      = grad(e)                      (SCF potential)
- fxc·rho1 = jvp(grad(e))                 (TDDFT kernel response)

which is exact for LDA and GGA uniformly, including all gamma cross terms.

Density convention: ``rho = (ra, rb, ga, gb)`` with ra/rb shape (ng,) and
ga/gb shape (3, ng).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from xtddft_tpu.xc import functionals as fl
from xtddft_tpu.xc.registry import XCSpec

MASK_RHO = 1e-11


def exc_density_fn(spec: XCSpec):
    """Return e(ra, rb, ga, gb[, ta, tb]) -> (ng,) energy density.

    MGGA specs take the two extra spin kinetic-energy-density arguments;
    any plain LDA/GGA components mixed into an MGGA composite simply
    ignore them."""
    comps = [(w, name, fl.FUNCTIONALS[name]) for w, name in spec.components]

    def e(ra, rb, ga, gb, *taus):
        gaa = jnp.einsum("xg,xg->g", ga, ga)
        gab = jnp.einsum("xg,xg->g", ga, gb)
        gbb = jnp.einsum("xg,xg->g", gb, gb)
        out = jnp.zeros_like(ra)
        for w, name, f in comps:
            if name in fl.MGGA_NAMES:
                out = out + w * f(ra, rb, gaa, gab, gbb, *taus)
            else:
                out = out + w * f(ra, rb, gaa, gab, gbb)
        return out

    return e


def cache_rho(ao, dm, hermi: bool = True, tau: bool = False):
    """Density and gradient on the grid from AO values.

    ao: (4, ng, nao) [value, ddx, ddy, ddz]; dm: (nao, nao).
    Returns (rho (ng,), grho (3, ng)); with ``tau``, appends the
    kinetic-energy density 1/2 sum_x (grad phi) dm (grad phi).
    """
    rho = jnp.einsum("gi,ij,gj->g", ao[0], dm, ao[0])
    g1 = jnp.einsum("xgi,ij,gj->xg", ao[1:4], dm, ao[0])
    if hermi:
        grho = 2.0 * g1
    else:
        grho = g1 + jnp.einsum("gi,ij,xgj->xg", ao[0], dm, ao[1:4])
    if not tau:
        return rho, grho
    t = 0.5 * jnp.einsum("xgi,ij,xgj->g", ao[1:4], dm, ao[1:4])
    return rho, grho, t


def _sanitize(weights, rho):
    """Zero the quadrature weight AND replace the density by a benign value
    on negligible-density points.  Masking only the weights is not enough:
    autodiff of (0 * inf) produces NaN, so the functional must never see
    pathological inputs.  Accepts 4-tuples (LDA/GGA) and 6-tuples
    (..., ta, tb) for MGGA."""
    ra, rb, ga, gb, *taus = rho
    mask = (ra > MASK_RHO) | (rb > MASK_RHO)
    w = jnp.where(mask, weights, 0.0)
    ra_s = jnp.where(mask, ra, 1.0)
    rb_s = jnp.where(mask, rb, 1.0)
    ga_s = jnp.where(mask[None, :], ga, 0.0)
    gb_s = jnp.where(mask[None, :], gb, 0.0)
    out = (ra_s, rb_s, ga_s, gb_s)
    if taus:
        # benign tau on masked points: with g=0 any tau>0 gives z=0
        out = out + tuple(jnp.where(mask, t, 1.0) for t in taus)
    return w, out, mask


def eval_exc(spec: XCSpec, weights, rho):
    w, rho_s, _ = _sanitize(weights, rho)
    e = exc_density_fn(spec)(*rho_s)
    return jnp.sum(w * e)


def eval_vxc(spec: XCSpec, weights, rho):
    """Weighted potential derivatives (w * vrho_a, w * vrho_b, w * wvec_a,
    w * wvec_b[, w * vtau_a, w * vtau_b]) where wvec = dE/d(grad rho) =
    2 vgaa*ga + vgab*gb.  The tau derivatives appear for MGGA specs
    (6-entry rho)."""
    w, rho_s, _ = _sanitize(weights, rho)
    efn = exc_density_fn(spec)

    def total(*args):
        return jnp.sum(w * efn(*args))

    return jax.grad(total, argnums=tuple(range(len(rho_s))))(*rho_s)


def _contract_vmat(ao, wv, wvec, wtau=None):
    """V_mu_nu = sum_g [wv phi phi + wvec . (grad(phi) phi + phi grad(phi))
    + wtau/2 grad(phi).grad(phi)] (the tau term for MGGA)."""
    A = jnp.einsum("g,gi,gj->ij", wv, ao[0], ao[0])
    B = jnp.einsum("xg,xgi,gj->ij", wvec, ao[1:4], ao[0])
    out = A + B + B.T
    if wtau is not None:
        out = out + 0.5 * jnp.einsum("g,xgi,xgj->ij", wtau, ao[1:4], ao[1:4])
    return out


def vxc_matrices(spec: XCSpec, ao, weights, rho):
    """(Exc, Va, Vb) for the SCF Fock build."""
    dv = eval_vxc(spec, weights, rho)
    exc = eval_exc(spec, weights, rho)
    if len(dv) == 6:
        wva, wvb, wga, wgb, wta, wtb = dv
        Va = _contract_vmat(ao, wva, wga, wta)
        Vb = _contract_vmat(ao, wvb, wgb, wtb)
    else:
        wva, wvb, wga, wgb = dv
        Va = _contract_vmat(ao, wva, wga)
        Vb = _contract_vmat(ao, wvb, wgb)
    return exc, Va, Vb


def fxc_response(spec: XCSpec, weights, rho0):
    """Return closure(drho) -> perturbed weighted potentials via JVP.

    drho is a (dra, drb, dga, dgb) tuple (transition densities); output has
    the same structure as eval_vxc and is contracted with `_contract_vmat`.
    """
    w, rho_s, mask = _sanitize(weights, rho0)
    efn = exc_density_fn(spec)

    def vfun(args):
        def total(r4):
            return jnp.sum(w * efn(*r4))

        return jax.grad(total)(args)

    def respond(drho):
        dra, drb, dga, dgb, *dtaus = drho
        dra = jnp.where(mask, dra, 0.0)
        drb = jnp.where(mask, drb, 0.0)
        dga = jnp.where(mask[None, :], dga, 0.0)
        dgb = jnp.where(mask[None, :], dgb, 0.0)
        dr = (dra, drb, dga, dgb) + tuple(
            jnp.where(mask, dt, 0.0) for dt in dtaus
        )
        _, dv = jax.jvp(vfun, (rho_s,), (dr,))
        return dv

    return respond


def fxc_v1mat(spec: XCSpec, ao, weights, rho0, dm1s, hermi: bool = True):
    """Perturbed XC matrices for a batch of density matrices.

    dm1s: (nset, 2, nao, nao) alpha/beta perturbation DMs.
    Returns (nset, 2, nao, nao).
    """
    respond = fxc_response(spec, weights, rho0)
    mgga = len(rho0) == 6

    def one(dm1):
        da = cache_rho(ao, dm1[0], hermi=hermi, tau=mgga)
        db = cache_rho(ao, dm1[1], hermi=hermi, tau=mgga)
        if mgga:
            dv = respond((da[0], db[0], da[1], db[1], da[2], db[2]))
            dwva, dwvb, dwga, dwgb, dwta, dwtb = dv
            return jnp.stack([
                _contract_vmat(ao, dwva, dwga, dwta),
                _contract_vmat(ao, dwvb, dwgb, dwtb),
            ])
        dwva, dwvb, dwga, dwgb = respond((da[0], db[0], da[1], db[1]))
        return jnp.stack(
            [_contract_vmat(ao, dwva, dwga), _contract_vmat(ao, dwvb, dwgb)]
        )

    return jax.vmap(one)(dm1s)


def make_fxc_jvp(spec: XCSpec):
    """Pure-function fxc response for use INSIDE jitted code: all grid data
    is passed as arguments (closure-captured device arrays would be embedded
    as XLA constants, which compiles pathologically slowly on TPU).

    respond(w, rho_s, drho) -> (dwva, dwvb, dwga, dwgb); caller is
    responsible for sanitizing rho0 and masking drho (see `_sanitize`)."""
    efn = exc_density_fn(spec)

    def respond(w, rho_s, drho):
        def vfun(args):
            def total(r4):
                return jnp.sum(w * efn(*r4))

            return jax.grad(total)(args)

        _, dv = jax.jvp(vfun, (rho_s,), (drho,))
        return dv

    return respond


# ---------------------------------------------------------------- SF kernel

def sf_kernel_alda0(spec: XCSpec, weights, rho0):
    """ALDA0 spin-flip kernel, weight-included:

        fxc_sf(g) = w * (vxc_a - vxc_b) / (rho_a - rho_b + 1e-9)

    with vxc evaluated in the LDA limit (gradients zeroed for GGA), exactly
    as the reference (`xtddft/SF_TDA.py:39-88`).
    """
    if spec.needs_tau:
        raise NotImplementedError(
            "spin-flip kernels are not defined for MGGA functionals here")
    ra, rb, ga, gb = rho0[:4]
    w, (ra_s, rb_s, _, _), _ = _sanitize(weights, rho0)
    efn = exc_density_fn(spec)
    zg = jnp.zeros_like(ga)

    def total(ra_, rb_):
        return jnp.sum(w * efn(ra_, rb_, zg, zg))

    va, vb = jax.grad(total, argnums=(0, 1))(ra_s, rb_s)
    return (va - vb) / (ra - rb + 1e-9)


def sf_v1mat(ao, fxc_sf_w, dm1s):
    """SF response matrices: v1 = sum_g fxc_sf_w * rho1 * phi phi.

    dm1s: (nset, nao, nao) alpha->beta transition DMs; returns (nset, nao, nao).
    """

    def one(dm1):
        rho1 = jnp.einsum("gi,ij,gj->g", ao[0], dm1, ao[0])
        return jnp.einsum("g,gi,gj->ij", fxc_sf_w * rho1, ao[0], ao[0])

    return jax.vmap(one)(dm1s)
