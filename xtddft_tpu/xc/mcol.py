"""Multicollinear spin-flip XC kernel (the reference's method=1 / 'mcol').

The reference samples the collinear functional over spin directions with
the external mcfun library (`xtddft/SF_TDA.py:916-1049`).  Here the kernel
is derived in closed form from the multicollinear construction
(Pu et al., Phys. Rev. Research 5, 013036):

    e_mc(n, m_vec) = < e + sigma . de/dsigma >_Omega   at sigma = t * sigma0

and the transverse second derivative collapses (integration by parts in
the direction cosine t) to

    f^sf_ab(r) = 1/2 * int_{-1}^{1} dt  d^2 e_col / dsigma_a dsigma_b
                 evaluated at (n, grad n; s = t*m, grad s = t*grad m)

with sigma = (s, grad s) the collinear spin variables.  Two exact
properties follow and are used as tests:
- for LDA functionals this is identically vxc_s/m, i.e. the ALDA0 kernel
  (`xtddft/SF_TDA.py:84` without the GGA terms);
- it is finite at closed-shell points (no 0/0, unlike ALDA0).

The per-point Hessian in the 4 spin variables (s, grad s) comes from JAX
autodiff of the same energy density used everywhere else (`xc/interface`),
vmapped over (grid x t-samples) — TPU-native, no host library.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xtddft_tpu.xc import functionals as fl
from xtddft_tpu.xc.interface import MASK_RHO
from xtddft_tpu.xc.registry import XCSpec


def _e_point_fn(spec: XCSpec):
    comps = [(w, fl.FUNCTIONALS[name]) for w, name in spec.components]
    mgga = spec.needs_tau

    def e_point(sv, n, gn, tn=None):
        """Energy density at one grid point; sv = [s, gs_x, gs_y, gs_z]
        (+ [ts] for MGGA specs, with tn the total kinetic-energy
        density — the tau channel enters the multicollinear sampling
        exactly like (s, grad s): tau_s = t * tau_s0 along the
        direction cosine)."""
        s = sv[0]
        gs = sv[1:4]
        ra = 0.5 * (n + s)
        rb = 0.5 * (n - s)
        ga = 0.5 * (gn + gs)
        gb = 0.5 * (gn - gs)
        gaa = ga @ ga
        gab = ga @ gb
        gbb = gb @ gb
        if mgga:
            ta = 0.5 * (tn + sv[4])
            tb = 0.5 * (tn - sv[4])
            extra = (ta, tb)
        else:
            extra = ()
        out = 0.0
        for w, f in comps:
            out = out + w * f(ra, rb, gaa, gab, gbb, *extra)
        return out

    return e_point


def sf_kernel_mcol(spec: XCSpec, weights, rho0, nt: int = 20):
    """Weight-included multicollinear SF kernel matrix over the
    (value, grad_x, grad_y, grad_z[, tau]) components of the transition
    density: (ng, 4, 4) for LDA/GGA specs, (ng, 5, 5) for MGGA specs
    (rho0 then carries (ra, rb, ga, gb, ta, tb)); the tau row/column is
    the kinetic-energy-density response the reference's SF layer cannot
    reach at all (its MGGA branches are broken, `xtddft/XTDA.py:242`,
    and mcfun is only wired for LDA/GGA there)."""
    mgga = spec.needs_tau
    if mgga:
        ra, rb, ga, gb, ta, tb = rho0
    else:
        ra, rb, ga, gb = rho0
    n = ra + rb
    m = ra - rb
    gn = ga + gb
    gm = ga - gb
    mask = (ra > MASK_RHO) | (rb > MASK_RHO)
    w = jnp.where(mask, weights, 0.0)
    n_s = jnp.where(mask, n, 1.0)
    m_s = jnp.where(mask, m, 0.0)
    gn_s = jnp.where(mask[None, :], gn, 0.0)
    gm_s = jnp.where(mask[None, :], gm, 0.0)
    if mgga:
        # benign masked tau: positive, consistent with g=0 (z=0 in TPSS)
        tn_s = jnp.where(mask, ta + tb, 1.0)
        tm_s = jnp.where(mask, ta - tb, 0.0)

    e_point = _e_point_fn(spec)
    hess = jax.hessian(e_point, argnums=0)

    # Integrate (1/2) int_{-1}^{1} H(t) dt = int_0^1 H(t) dt (even integrand)
    # with the substitution t = 1 - (1-u)^3: at full spin polarization the
    # integrand diverges like (1-t)^{-2/3} (LDA-exchange f_ss at rho_b -> 0)
    # and the cubic substitution maps it to a BOUNDED integrand
    # ((1-u)^{-2} * 3(1-u)^2 = 3), so Gauss-Legendre in u converges fast.
    u, wu = np.polynomial.legendre.leggauss(nt)
    u = 0.5 * (u + 1.0)
    wu = 0.5 * wu
    x = jnp.asarray(1.0 - (1.0 - u) ** 3)
    wt = jnp.asarray(wu * 3.0 * (1.0 - u) ** 2)

    parts = [m_s[None, :], gm_s]
    if mgga:
        parts.append(tm_s[None, :])
    sv0 = jnp.concatenate(parts, axis=0).T  # (ng, 4[5])
    gn_T = gn_s.T  # (ng, 3)

    if mgga:
        def per_t(t):
            def per_point(sv, n_, gn_, tn_):
                return hess(t * sv, n_, gn_, tn_)

            return jax.vmap(per_point)(sv0, n_s, gn_T, tn_s)  # (ng, 5, 5)
    else:
        def per_t(t):
            def per_point(sv, n_, gn_):
                return hess(t * sv, n_, gn_)

            return jax.vmap(per_point)(sv0, n_s, gn_T)  # (ng, 4, 4)

    H = jnp.tensordot(wt, jax.vmap(per_t)(x), axes=(0, 0))
    # SF-TDA kernel = f_xx + f_yy = 2 * transverse second derivative (the
    # reference's "*2.0 because kernel xx,yy parts", `SF_TDA.py:1004`);
    # this is what makes the LDA limit equal (vxc_a-vxc_b)/(rho_a-rho_b).
    return 2.0 * H * w[:, None, None]


def sf_mcol_tensor(fxcH_w, ao, orb_o, orb_v):
    """(ia|f_mc|jb) coupling tensor for the dense SF builders.

    fxcH_w: (ng, 4, 4) (LDA/GGA) or (ng, 5, 5) (MGGA: last component is
    the tau response tau_ia = 1/2 grad phi_i . grad phi_a) weight-included
    kernel; ao: (4, ng, nao)."""
    po = jnp.einsum("gp,pi->gi", ao[0], jnp.asarray(orb_o))
    pv = jnp.einsum("gp,pa->ga", ao[0], jnp.asarray(orb_v))
    dpo = jnp.einsum("xgp,pi->xgi", ao[1:4], jnp.asarray(orb_o))
    dpv = jnp.einsum("xgp,pa->xga", ao[1:4], jnp.asarray(orb_v))
    r0 = jnp.einsum("gi,ga->gia", po, pv)[None]
    r1 = jnp.einsum("xgi,ga->xgia", dpo, pv) + jnp.einsum(
        "gi,xga->xgia", po, dpv
    )
    parts = [r0, r1]
    if fxcH_w.shape[-1] == 5:
        parts.append(0.5 * jnp.einsum("xgi,xga->gia", dpo, dpv)[None])
    R = jnp.concatenate(parts, axis=0)  # (4[5], g, i, a)
    return jnp.einsum("cgia,gcd,dgjb->iajb", R, fxcH_w, R, optimize=True)


def sf_v1mat_mcol(ao, fxcH_w, dm1s):
    """Matrix-free SF response with the multicollinear kernel.

    dm1s: (nset, nao, nao) alpha->beta transition DMs (non-hermitian);
    returns (nset, nao, nao)."""

    mgga = fxcH_w.shape[-1] == 5

    def one(dm1):
        r0 = jnp.einsum("gi,ij,gj->g", ao[0], dm1, ao[0])
        r1 = jnp.einsum("xgi,ij,gj->xg", ao[1:4], dm1, ao[0]) + jnp.einsum(
            "gi,ij,xgj->xg", ao[0], dm1, ao[1:4]
        )
        parts = [r0[None], r1]
        if mgga:
            parts.append(0.5 * jnp.einsum(
                "xgi,ij,xgj->g", ao[1:4], dm1, ao[1:4])[None])
        rho1 = jnp.concatenate(parts, axis=0)  # (4[5], g)
        wv = jnp.einsum("gab,bg->ag", fxcH_w, rho1)
        v = jnp.einsum("g,gi,gj->ij", wv[0], ao[0], ao[0])
        vg = jnp.einsum("xg,xgi,gj->ij", wv[1:4], ao[1:4], ao[0])
        out = v + vg + vg.T
        if mgga:
            out = out + 0.5 * jnp.einsum(
                "g,xgi,xgj->ij", wv[4], ao[1:4], ao[1:4])
        return out
    # note: the gradient part is symmetrized ((grad mu) nu + mu (grad nu)),
    # matching `nr_uks_fxc_sf_tda_mc` (`SF_TDA.py:1000-1027`)

    return jax.vmap(one)(dm1s)
