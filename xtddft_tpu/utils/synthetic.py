"""Synthetic Reference construction for benchmarks and compile checks.

Builds a `Reference` with well-formed shapes/symmetries but random data:
the sigma-operator compute path (J/K einsums, grid fxc quadrature, dA
couplings) is identical to production, with zero integral/SCF setup cost.
Used by `bench.py` and `__graft_entry__.py`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from xtddft_tpu.response.reference_state import Reference
from xtddft_tpu.xc import registry as xc_registry


@dataclasses.dataclass
class _FakeEnv:
    """Duck-typed stand-in for scf.env.Env holding synthetic tensors."""

    eri: object
    ao: object
    grid_weights: object
    S: object
    dip: object = None
    ipovlp: object = None
    rxp: object = None

    def eri_omega(self, omega):
        return self.eri

    def get_j(self, dm):
        import jax.numpy as jnp

        return jnp.einsum("pqrs,sr->pq", self.eri, dm)

    def get_k(self, dm, omega=None):
        import jax.numpy as jnp

        return jnp.einsum("prsq,rs->pq", self.eri, dm)


def make_synthetic_reference(
    nao: int = 64,
    nc: int = 12,
    no: int = 2,
    ngrid: int = 16384,
    xc: str = "bhandhlyp",
    seed: int = 0,
    dtype=np.float64,
    symmetrize: bool = True,
):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    nv = nao - nc - no

    # large tensors generated device-side (host is 1 core; avoid numpy)
    @jax.jit
    def _gen(key):
        k1, k2, k3 = jax.random.split(key, 3)
        eri = 0.01 * jax.random.normal(k1, (nao, nao, nao, nao), dtype=dtype)
        if symmetrize:  # full 8-fold symmetry (small cases / dryrun)
            eri = eri + jnp.transpose(eri, (1, 0, 2, 3))
            eri = eri + jnp.transpose(eri, (0, 1, 3, 2))
            eri = eri + jnp.transpose(eri, (2, 3, 0, 1))
        ao = 0.3 * jax.random.normal(k2, (4, ngrid, nao), dtype=dtype)
        w = jnp.abs(0.01 + 0.01 * jax.random.normal(k3, (ngrid,), dtype=dtype))
        return eri, ao, w

    eri, ao, w = _gen(jax.random.PRNGKey(seed))
    # orthonormal MOs (S = I); small host tensors
    q, _ = np.linalg.qr(rng.normal(size=(nao, nao)))
    mo = q
    e_mo = np.sort(rng.normal(0, 1, nao)) + np.linspace(-2, 2, nao)
    f_mo = np.diag(e_mo) + 1e-3 * rng.normal(size=(nao, nao))
    f_mo = 0.5 * (f_mo + f_mo.T)
    fb_mo = f_mo + 1e-2 * rng.normal()
    fhf = f_mo + 1e-2 * rng.normal(size=(nao, nao))
    fhf = 0.5 * (fhf + fhf.T)
    env = _FakeEnv(eri=eri, ao=ao, grid_weights=w, S=jnp.eye(nao, dtype=dtype))
    spec = xc_registry.resolve(xc)
    return Reference(
        mf=None,
        env=env,
        spec=spec,
        restricted_open=True,
        mo_a=mo,
        mo_b=mo,
        nc=nc,
        no=no,
        nv=nv,
        fock_a_mo=f_mo,
        fock_b_mo=fb_mo,
        fock_a_hf_mo=fhf,
        fock_b_hf_mo=fhf + 0.05 * np.eye(nao),
    )
