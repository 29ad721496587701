"""Dense fxc (ia|f|jb) tensors via pointwise autodiff Hessians.

The reference hand-wires per-xc-family derivative contractions in every
dense A build (`xtddft/XTDA.py:178-273`).  Here the weighted Hessian of the
energy density w.r.t. (rho_a, grad rho_a, rho_b, grad rho_b) — an (ng,8,8)
array from `jax.vmap(jax.hessian(...))` — is contracted against
occupied-virtual pair features, which is exact for LDA and GGA uniformly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xtddft_tpu.xc.interface import MASK_RHO, exc_density_fn
from xtddft_tpu.xc.registry import XCSpec


def weighted_hessian(spec: XCSpec, weights, rho0) -> jnp.ndarray:
    """(ng, 8, 8) w * d^2 e / dx^2 with x = (ra, gax, gay, gaz, rb, gbx, gby, gbz)."""
    ra, rb, ga, gb = rho0
    mask = (ra > MASK_RHO) | (rb > MASK_RHO)
    w = jnp.where(mask, weights, 0.0)
    ra_s = jnp.where(mask, ra, 1.0)
    rb_s = jnp.where(mask, rb, 1.0)
    # benign nonzero gradient on dummy points: second derivatives of
    # sqrt(gamma)-containing expressions stay finite
    ga_s = jnp.where(mask[None, :], ga, 1e-3)
    gb_s = jnp.where(mask[None, :], gb, 1e-3)
    efn = exc_density_fn(spec)

    def e_point(x):
        return efn(
            x[0:1], x[4:5], x[1:4].reshape(3, 1), x[5:8].reshape(3, 1)
        )[0]

    X = jnp.stack(
        [ra_s, ga_s[0], ga_s[1], ga_s[2], rb_s, gb_s[0], gb_s[1], gb_s[2]], axis=1
    )
    H = jax.vmap(jax.hessian(e_point))(X)
    return H * w[:, None, None]


def pair_features(ao, orbo, orbv) -> jnp.ndarray:
    """(ng, no*nv, 4) features of rho_ia: [phi_i phi_a, grad(phi_i phi_a)]."""
    phi_o = jnp.einsum("gp,pi->gi", ao[0], orbo)
    phi_v = jnp.einsum("gp,pa->ga", ao[0], orbv)
    dphi_o = jnp.einsum("xgp,pi->xgi", ao[1:4], orbo)
    dphi_v = jnp.einsum("xgp,pa->xga", ao[1:4], orbv)
    val = jnp.einsum("gi,ga->gia", phi_o, phi_v)
    grad = jnp.einsum("xgi,ga->xgia", dphi_o, phi_v) + jnp.einsum(
        "gi,xga->xgia", phi_o, dphi_v
    )
    ng = val.shape[0]
    feats = jnp.concatenate([val[None], grad], axis=0)  # (4, ng, no, nv)
    return jnp.transpose(feats, (1, 2, 3, 0)).reshape(ng, -1, 4)


def fxc_blocks(
    spec: XCSpec,
    ao,
    weights,
    rho0,
    orbs_a: tuple,
    orbs_b: tuple,
    chunk: int = 4096,
):
    """(f_aa, f_ab, f_bb) dense (ia|f|jb) tensors as flat (nov_a, nov_a) /
    (nov_a, nov_b) / (nov_b, nov_b) matrices."""
    H = weighted_hessian(spec, weights, rho0)
    Fa = pair_features(ao, *orbs_a)
    Fb = pair_features(ao, *orbs_b)
    ng = H.shape[0]
    nova = Fa.shape[1]
    novb = Fb.shape[1]
    faa = jnp.zeros((nova, nova))
    fab = jnp.zeros((nova, novb))
    fbb = jnp.zeros((novb, novb))
    for start in range(0, ng, chunk):
        sl = slice(start, min(start + chunk, ng))
        Hc = H[sl]
        Fac = Fa[sl]
        Fbc = Fb[sl]
        Haa = Hc[:, 0:4, 0:4]
        Hab = Hc[:, 0:4, 4:8]
        Hbb = Hc[:, 4:8, 4:8]
        faa = faa + jnp.einsum("gpx,gxy,gqy->pq", Fac, Haa, Fac, optimize=True)
        fab = fab + jnp.einsum("gpx,gxy,gqy->pq", Fac, Hab, Fbc, optimize=True)
        fbb = fbb + jnp.einsum("gpx,gxy,gqy->pq", Fbc, Hbb, Fbc, optimize=True)
    return np.asarray(faa), np.asarray(fab), np.asarray(fbb)
