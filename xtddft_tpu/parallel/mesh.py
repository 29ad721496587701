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


def trial_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))


def shard_df_data(data, mesh: Mesh):
    """Shard a DFData over the mesh for the SPMD sigma path: the fitted B
    tensor over its auxiliary axis and the grid tensors over the grid axis
    (both are contraction axes -> GSPMD inserts psum over ICI); Fock
    matrices stay replicated.

    Real-molecule data has arbitrary naux/ngrid: both axes are padded to
    a multiple of the tp size.  Padding is *exact*: zero B rows add
    nothing to the J/K sums, and padded grid points carry weight 0 (with
    density 1 so the fxc kernels stay finite — the zero weight removes
    their contribution)."""
    import dataclasses

    import jax.numpy as jnp

    tp = mesh.shape["tp"]

    def _pad(a, axis, fill=0.0):
        a = jnp.asarray(a)
        n = a.shape[axis]
        rem = (-n) % tp
        if rem == 0:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, rem)
        return jnp.pad(a, widths, constant_values=fill)

    sh_aux = NamedSharding(mesh, P("tp", None, None))
    sh_grid_lead = NamedSharding(mesh, P("tp"))
    sh_phi = NamedSharding(mesh, P(None, "tp", None))
    sh_g3 = NamedSharding(mesh, P(None, "tp"))
    kw = {"B": jax.device_put(_pad(data.B, 0), sh_aux)}
    if data.B_lr is not None:
        kw["B_lr"] = jax.device_put(_pad(data.B_lr, 0), sh_aux)
    if data.B_b is not None:
        kw["B_b"] = jax.device_put(_pad(data.B_b, 0), sh_aux)
    if data.B_lr_b is not None:
        kw["B_lr_b"] = jax.device_put(_pad(data.B_lr_b, 0), sh_aux)
    if data.phi_b is not None:
        kw["phi_b"] = jax.device_put(_pad(data.phi_b, 1), sh_phi)
    if data.phi is not None:
        kw["phi"] = jax.device_put(_pad(data.phi, 1), sh_phi)
        kw["grid_w"] = jax.device_put(_pad(data.grid_w, 0), sh_grid_lead)
        ra, rb, ga, gb = data.rho0
        kw["rho0"] = (
            jax.device_put(_pad(ra, 0, 1.0), sh_grid_lead),
            jax.device_put(_pad(rb, 0, 1.0), sh_grid_lead),
            jax.device_put(_pad(ga, 1), sh_g3),
            jax.device_put(_pad(gb, 1), sh_g3),
        )
    return dataclasses.replace(data, **kw)
