"""Dense fxc (ia|f|jb) tensors via pointwise autodiff Hessians.

The reference hand-wires per-xc-family derivative contractions in every
dense A build (`xtddft/XTDA.py:178-273`; its MGGA branch at `XTDA.py:242`
is broken upstream).  Here the weighted Hessian of the energy density
w.r.t. the pointwise variables — (ra, grad ra, rb, grad rb) for LDA/GGA,
plus (ta, tb) for MGGA — is contracted against occupied-virtual pair
features, which is exact for every family uniformly (the tau channel is
just one more feature column).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xtddft_tpu.xc.interface import MASK_RHO, exc_density_fn
from xtddft_tpu.xc.registry import XCSpec


def weighted_hessian(spec: XCSpec, weights, rho0) -> jnp.ndarray:
    """w * d^2 e / dx^2 per grid point.

    LDA/GGA: x = (ra, gax, gay, gaz, rb, gbx, gby, gbz) -> (ng, 8, 8).
    MGGA:    x = (ra, gax, gay, gaz, ta, rb, ..., tb)   -> (ng, 10, 10).
    """
    ra, rb, ga, gb, *taus = rho0
    mask = (ra > MASK_RHO) | (rb > MASK_RHO)
    w = jnp.where(mask, weights, 0.0)
    ra_s = jnp.where(mask, ra, 1.0)
    rb_s = jnp.where(mask, rb, 1.0)
    # benign nonzero gradient on dummy points: second derivatives of
    # sqrt(gamma)-containing expressions stay finite
    ga_s = jnp.where(mask[None, :], ga, 1e-3)
    gb_s = jnp.where(mask[None, :], gb, 1e-3)
    efn = exc_density_fn(spec)

    if taus:
        ta_s = jnp.where(mask, taus[0], 1.0)
        tb_s = jnp.where(mask, taus[1], 1.0)

        def e_point(x):
            return efn(
                x[0:1], x[5:6], x[1:4].reshape(3, 1), x[6:9].reshape(3, 1),
                x[4:5], x[9:10],
            )[0]

        X = jnp.stack(
            [ra_s, ga_s[0], ga_s[1], ga_s[2], ta_s,
             rb_s, gb_s[0], gb_s[1], gb_s[2], tb_s], axis=1,
        )
    else:
        def e_point(x):
            return efn(
                x[0:1], x[4:5], x[1:4].reshape(3, 1), x[5:8].reshape(3, 1)
            )[0]

        X = jnp.stack(
            [ra_s, ga_s[0], ga_s[1], ga_s[2],
             rb_s, gb_s[0], gb_s[1], gb_s[2]], axis=1,
        )
    H = jax.vmap(jax.hessian(e_point))(X)
    return H * w[:, None, None]


def pair_features(ao, orbo, orbv, tau: bool = False) -> jnp.ndarray:
    """(ng, no*nv, 4|5) features of rho_ia:
    [phi_i phi_a, grad(phi_i phi_a)[, tau_ia = 1/2 grad phi_i . grad phi_a]]."""
    phi_o = jnp.einsum("gp,pi->gi", ao[0], orbo)
    phi_v = jnp.einsum("gp,pa->ga", ao[0], orbv)
    dphi_o = jnp.einsum("xgp,pi->xgi", ao[1:4], orbo)
    dphi_v = jnp.einsum("xgp,pa->xga", ao[1:4], orbv)
    val = jnp.einsum("gi,ga->gia", phi_o, phi_v)
    grad = jnp.einsum("xgi,ga->xgia", dphi_o, phi_v) + jnp.einsum(
        "gi,xga->xgia", phi_o, dphi_v
    )
    feats = [val[None], grad]
    if tau:
        t = 0.5 * jnp.einsum("xgi,xga->gia", dphi_o, dphi_v)
        feats.append(t[None])
    feats = jnp.concatenate(feats, axis=0)  # (4|5, ng, no, nv)
    ng = val.shape[0]
    return jnp.transpose(feats, (1, 2, 3, 0)).reshape(ng, -1, feats.shape[0])


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
    mgga = len(rho0) == 6
    nf = 5 if mgga else 4
    H = weighted_hessian(spec, weights, rho0)
    Fa = pair_features(ao, *orbs_a, tau=mgga)
    Fb = pair_features(ao, *orbs_b, tau=mgga)
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
        Haa = Hc[:, 0:nf, 0:nf]
        Hab = Hc[:, 0:nf, nf:2 * nf]
        Hbb = Hc[:, nf:2 * nf, nf:2 * nf]
        faa = faa + jnp.einsum("gpx,gxy,gqy->pq", Fac, Haa, Fac, optimize=True)
        fab = fab + jnp.einsum("gpx,gxy,gqy->pq", Fac, Hab, Fbc, optimize=True)
        fbb = fbb + jnp.einsum("gpx,gxy,gqy->pq", Fbc, Hbb, Fbc, optimize=True)
    return np.asarray(faa), np.asarray(fab), np.asarray(fbb)
