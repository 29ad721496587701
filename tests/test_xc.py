"""XC library: autodiff derivatives vs finite differences."""

import jax.numpy as jnp
import numpy as np
import pytest

from xtddft_tpu.xc import resolve
from xtddft_tpu.xc import interface as xci
from xtddft_tpu.xc.functionals import FUNCTIONALS


def _rand_rho(n=50, seed=1, polarized=True):
    rng = np.random.default_rng(seed)
    ra = jnp.asarray(rng.uniform(0.05, 2.0, n))
    rb = jnp.asarray(rng.uniform(0.05, 2.0, n)) if polarized else ra
    ga = jnp.asarray(rng.normal(0, 0.5, (3, n)))
    gb = jnp.asarray(rng.normal(0, 0.5, (3, n))) if polarized else ga
    return (ra, rb, ga, gb)


@pytest.mark.parametrize("xc", ["svwn", "svwn3", "blyp", "pbe", "b3lyp", "bhandhlyp", "pbe0"])
def test_vxc_finite_difference(xc):
    spec = resolve(xc)
    rho = _rand_rho()
    w = jnp.ones_like(rho[0])
    wva, wvb, wga, wgb = xci.eval_vxc(spec, w, rho)
    eps = 1e-6
    ra = rho[0]
    e_plus = xci.eval_exc(spec, w, (ra + eps, *rho[1:]))
    e_minus = xci.eval_exc(spec, w, (ra - eps, *rho[1:]))
    fd = (e_plus - e_minus) / (2 * eps)
    assert abs(float(jnp.sum(wva)) - float(fd)) < 1e-5 * max(1.0, abs(float(fd)))


@pytest.mark.parametrize("xc", ["svwn", "blyp", "b3lyp"])
def test_fxc_jvp_vs_fd(xc):
    spec = resolve(xc)
    rho = _rand_rho()
    w = jnp.ones_like(rho[0])
    rng = np.random.default_rng(7)
    dra = jnp.asarray(rng.normal(0, 0.01, rho[0].shape))
    drb = jnp.asarray(rng.normal(0, 0.01, rho[0].shape))
    dga = jnp.asarray(rng.normal(0, 0.01, rho[2].shape))
    dgb = jnp.asarray(rng.normal(0, 0.01, rho[3].shape))
    respond = xci.fxc_response(spec, w, rho)
    dv = respond((dra, drb, dga, dgb))
    t = 1e-4
    vp = xci.eval_vxc(spec, w, (rho[0] + t * dra, rho[1] + t * drb,
                                rho[2] + t * dga, rho[3] + t * dgb))
    vm = xci.eval_vxc(spec, w, (rho[0] - t * dra, rho[1] - t * drb,
                                rho[2] - t * dga, rho[3] - t * dgb))
    for a, p, m in zip(dv, vp, vm):
        fd = (p - m) / (2 * t)
        assert float(jnp.max(jnp.abs(a - fd))) < 1e-5


def test_lda_limit_consistency():
    """Closed-shell slater exchange equals the textbook formula."""
    rho = jnp.asarray([0.5, 1.0, 2.0])
    z = jnp.zeros((3, 3))
    e = FUNCTIONALS["slater"](rho / 2, rho / 2, None, None, None)
    cx = (3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0)
    ref = -cx * rho ** (4.0 / 3.0)
    assert np.allclose(np.asarray(e), np.asarray(ref), rtol=1e-12)
