"""Device mesh + sharding placement for the response stack.

Parallel axes (SURVEY.md §2.5 TPU mapping):
- ``dp``: trial-vector batch (data parallel over Davidson trials)
- ``tp``: tensor axis — AO index of the ERI tensor and the grid-point axis
  of the fxc quadrature (partial sums reduced by XLA-inserted collectives,
  replacing the reference's fork-pool / block_loop streaming)

Arrays are placed with `jax.device_put` + `NamedSharding`; the jitted sigma
operators then run SPMD with XLA inserting all-gathers/psums over ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes=("dp", "tp")) -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    devs = devs[:n]
    # balanced 2D factorization
    dp = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            dp = cand
            break
    shape = (dp, n // dp)
    return Mesh(np.array(devs).reshape(shape), axes)


def shard_reference(ref, mesh: Mesh):
    """Return a copy of `ref` whose device tensors are sharded over `mesh`:
    ERI over its first AO axis, grid arrays over the grid axis."""
    import dataclasses

    env = ref.env
    sh_eri = NamedSharding(mesh, P("tp", None, None, None))
    sh_ao = NamedSharding(mesh, P(None, "tp", None))
    sh_w = NamedSharding(mesh, P("tp"))
    new_env_fields = {}
    eri = jax.device_put(env.eri, sh_eri)
    ao = jax.device_put(env.ao, sh_ao)
    w = jax.device_put(env.grid_weights, sh_w)

    if hasattr(env, "mol"):  # real Env: wrap with overridden cached tensors
        class _ShardedEnv:
            def __init__(self, base):
                self._base = base
                self.eri = eri
                self.ao = ao
                self.grid_weights = w

            def __getattr__(self, name):
                return getattr(self._base, name)

            def eri_omega(self, omega):
                return jax.device_put(self._base.eri_omega(omega), sh_eri)

        new_env = _ShardedEnv(env)
    else:  # synthetic env (dataclass)
        new_env = dataclasses.replace(env, eri=eri, ao=ao, grid_weights=w)
    return dataclasses.replace(ref, env=new_env)


def trial_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))


def shard_df_data(data, mesh: Mesh):
    """Shard a DFData over the mesh for the SPMD sigma path: the fitted B
    tensor over its auxiliary axis and the grid tensors over the grid axis
    (both are contraction axes -> GSPMD inserts psum over ICI); Fock
    matrices stay replicated."""
    import dataclasses

    sh_aux = NamedSharding(mesh, P("tp", None, None))
    sh_grid_lead = NamedSharding(mesh, P("tp"))
    sh_phi = NamedSharding(mesh, P(None, "tp", None))
    sh_g3 = NamedSharding(mesh, P(None, "tp"))
    kw = {"B": jax.device_put(data.B, sh_aux)}
    if data.phi is not None:
        kw["phi"] = jax.device_put(data.phi, sh_phi)
        kw["grid_w"] = jax.device_put(data.grid_w, sh_grid_lead)
        ra, rb, ga, gb = data.rho0
        kw["rho0"] = (
            jax.device_put(ra, sh_grid_lead),
            jax.device_put(rb, sh_grid_lead),
            jax.device_put(ga, sh_g3),
            jax.device_put(gb, sh_g3),
        )
    return dataclasses.replace(data, **kw)
