"""Integral/grid environment shared by SCF and response layers.

One `Env` per (molecule, basis, grid level): holds device-resident
integral tensors.  This replaces the implicit libcint/DFT-grid state
inside a PySCF ``mf`` object.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax.numpy as jnp
import numpy as np

from xtddft_tpu.chem.molecule import Molecule
from xtddft_tpu.grids import build_grid, eval_ao
from xtddft_tpu.ints import (
    build_layout,
    overlap,
    kinetic,
    nuclear_attraction,
    dipole,
    ip_overlap,
    angular_momentum,
    eri_full,
)


@dataclasses.dataclass
class Env:
    mol: Molecule
    grid_level: int = 3

    def __post_init__(self):
        self.layout = build_layout(self.mol)
        self.nao = self.layout.nao

    @cached_property
    def S(self):
        return jnp.asarray(overlap(self.layout))

    @cached_property
    def T(self):
        return jnp.asarray(kinetic(self.layout))

    @cached_property
    def V(self):
        return jnp.asarray(nuclear_attraction(self.layout))

    @cached_property
    def hcore(self):
        return self.T + self.V

    @cached_property
    def eri(self):
        return jnp.asarray(eri_full(self.layout))

    def eri_omega(self, omega: float):
        if not hasattr(self, "_eri_omega"):
            self._eri_omega = {}
        if omega not in self._eri_omega:
            self._eri_omega[omega] = jnp.asarray(eri_full(self.layout, omega=omega))
        return self._eri_omega[omega]

    @cached_property
    def grid(self):
        return build_grid(self.mol, level=self.grid_level)

    @cached_property
    def grid_weights(self):
        return jnp.asarray(self.grid.weights)

    @cached_property
    def ao(self):
        """(4, ngrid, nao) AO values + gradients on the grid."""
        return jnp.asarray(eval_ao(self.layout, self.grid.coords, deriv=1))

    @cached_property
    def dip(self):
        return jnp.asarray(dipole(self.layout))

    def dip_about(self, origin):
        return jnp.asarray(dipole(self.layout, origin=origin))

    @cached_property
    def ipovlp(self):
        return jnp.asarray(ip_overlap(self.layout))

    @cached_property
    def rxp(self):
        return jnp.asarray(angular_momentum(self.layout))

    # -- J/K builds (in-core path; DF path in scf/df.py) -------------------
    def get_j(self, dm):
        return jnp.einsum("pqrs,sr->pq", self.eri, dm)

    def get_k(self, dm, omega: float | None = None):
        # pyscf convention: K_pq = sum_{rs} (pr|sq) dm_rs
        eri = self.eri if not omega else self.eri_omega(omega)
        return jnp.einsum("prsq,rs->pq", eri, dm)
