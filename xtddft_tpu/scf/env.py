"""Integral/grid environment shared by SCF and response layers.

One `Env` per (molecule, basis, grid level): holds device-resident
integral tensors.  This replaces the implicit libcint/DFT-grid state
inside a PySCF ``mf`` object.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax
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
    """df=True switches every J/K build to density fitting: the nao^4
    in-core ERI tensor is never formed; instead a metric-dressed
    B[P, mu, nu] (naux, nao, nao) is built once (native C++ 3c/2c
    integrals + eigendecomposed Coulomb metric) and J/K become a handful
    of matmuls.  This is the real-molecule production path — the
    reference's equivalent is AO-direct libcint J/K per SCF cycle
    (`mf.get_jk`), which has no TPU translation at Nbf >~ 200."""

    mol: Molecule
    grid_level: int = 3
    df: bool = False
    aux_beta: float = 2.2
    aux_mode: str = "full"  # "jk" = lean production J/K-fit recipe
    x2c: bool = False

    def __post_init__(self):
        self.layout = build_layout(self.mol)
        self.nao = self.layout.nao
        self._df_B_cache: dict[float, jnp.ndarray] = {}

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
        if self.x2c:
            return jnp.asarray(self._sfx2c_hcore())
        return self.T + self.V

    def _sfx2c_hcore(self) -> np.ndarray:
        """Picture-changed spin-free X2C one-electron Hamiltonian in the
        contracted AO basis: decouple in the fully uncontracted basis
        (`soc/x2c.py: sfx2c1e`, the reference's `scf.sfx2c(...)` ground
        state, `/root/reference/x2c_hamiltonian/test_SOCSI.py:141`,
        `xtddft/XSF_TDA.py:317-321`), then project back through the
        contraction coefficients.  Replaces T + V wholesale; every
        consumer (SCF Fock, the spin-adapted dA ROHF Fock in
        `response/reference_state.py`) picks it up automatically."""
        from xtddft_tpu import units
        from xtddft_tpu.soc import x2c as x2c_mod
        from xtddft_tpu.soc.somf import nuclear_deriv2

        unc, contr = x2c_mod.uncontract(self.layout)
        t = kinetic(unc)
        v = nuclear_attraction(unc)
        s = overlap(unc)
        w_sf, _ = nuclear_deriv2(unc)
        _, _, h1e = x2c_mod.sfx2c1e(t, v, w_sf, s, units.C_AU)
        return contr.T @ h1e @ contr

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

    # -- density fitting ----------------------------------------------------
    @cached_property
    def aux_layout(self):
        from xtddft_tpu.ints.autoaux import autoaux_layout

        return autoaux_layout(self.mol, beta=self.aux_beta, mode=self.aux_mode)

    def df_j3c_host(self, omega: float = 0.0) -> np.ndarray:
        """Raw host-f64 (naux, nao, nao) 3-center integrals (not dressed).

        At production sizes this is the big one-time host cost (TTM/dzp:
        ~15 min, 11 GB); the dressing matmul itself belongs on the chip
        (`scf/df_build.py`).  An externally built array can be injected
        via :meth:`set_df_j3c` (disk-cached state builds)."""
        omega = float(omega or 0.0)
        if not hasattr(self, "_df_j3c_cache"):
            self._df_j3c_cache: dict[float, np.ndarray] = {}
        if omega not in self._df_j3c_cache:
            from xtddft_tpu.ints.two_electron import eri_3c

            self._df_j3c_cache[omega] = eri_3c(
                self.layout, self.aux_layout, omega=omega or None)
        return self._df_j3c_cache[omega]

    def set_df_j3c(self, j3c: np.ndarray, omega: float = 0.0) -> None:
        if not hasattr(self, "_df_j3c_cache"):
            self._df_j3c_cache = {}
        self._df_j3c_cache[float(omega or 0.0)] = j3c

    def df_metric_eig_host(self, omega: float = 0.0):
        """(w, U) host-f64 eigendecomposition of the fit metric, truncated
        at w > 1e-10.  The on-chip dresser (`scf/df_build.py`) consumes
        the factors separately: two orthogonal matmuls around an exact
        elementwise 1/sqrt(w) keep mixed-precision error free of the
        metric's conditioning (a single isqrt matmul amplifies rounding
        by the cancellation between its +/-1e5-scale entries)."""
        omega = float(omega or 0.0)
        if not hasattr(self, "_df_meig_cache"):
            self._df_meig_cache: dict[float, tuple] = {}
        if omega not in self._df_meig_cache:
            from xtddft_tpu.ints.two_electron import eri_2c

            j2c = eri_2c(self.aux_layout, omega=omega or None)
            w, U = np.linalg.eigh(j2c)
            keep = w > 1e-10
            self._df_meig_cache[omega] = (w[keep], U[:, keep])
        return self._df_meig_cache[omega]

    def df_isqrt_host(self, omega: float = 0.0) -> np.ndarray:
        """Host-f64 (naux, naux) inverse square root of the fit metric."""
        omega = float(omega or 0.0)
        if not hasattr(self, "_df_isqrt_cache"):
            self._df_isqrt_cache: dict[float, np.ndarray] = {}
        if omega not in self._df_isqrt_cache:
            w, U = self.df_metric_eig_host(omega)
            self._df_isqrt_cache[omega] = (
                U / np.sqrt(w)[None, :]) @ U.T
        return self._df_isqrt_cache[omega]

    def release_df_host_cache(self) -> None:
        """Drop the raw j3c / dressed-B host caches (production builds hold
        11+ GB here once the device tensors exist)."""
        for name in ("_df_j3c_cache", "_df_B_host_cache"):
            if hasattr(self, name):
                getattr(self, name).clear()

    def df_B_host(self, omega: float = 0.0) -> np.ndarray:
        """Host-f64 metric-dressed (naux, nao, nao) fitted tensor so that
        (mu nu|g|lam sig) ~= sum_P B[P,mn] B[P,ls] for g = 1/r12 (omega=0)
        or erf(omega r12)/r12 (the RSH long-range kernel, fitted in its own
        erf metric — the standard V-metric fit applied to the attenuated
        kernel).  Kept as numpy: the production path splits this into an
        f32 hi/lo pair for the chip (`scf/jk_device.py`) and must never
        ship the f64 tensor to a device where f64 is emulated."""
        omega = float(omega or 0.0)
        if not hasattr(self, "_df_B_host_cache"):
            self._df_B_host_cache: dict[float, np.ndarray] = {}
        if omega not in self._df_B_host_cache:
            j3c = self.df_j3c_host(omega)
            isqrt = self.df_isqrt_host(omega)
            nx, nao = j3c.shape[0], j3c.shape[1]
            B = (isqrt @ j3c.reshape(nx, -1)).reshape(nx, nao, nao)
            self._df_B_host_cache[omega] = B
        return self._df_B_host_cache[omega]

    def df_B(self, omega: float = 0.0) -> jnp.ndarray:
        """Device-resident view of :meth:`df_B_host` (default-device dtype
        semantics; f64 under the x64 test config)."""
        omega = float(omega or 0.0)
        if omega not in self._df_B_cache:
            self._df_B_cache[omega] = jnp.asarray(self.df_B_host(omega))
        return self._df_B_cache[omega]

    # -- J/K builds (in-core or DF, selected by self.df) --------------------
    def get_j(self, dm):
        if self.df:
            return _df_j(self.df_B(), jnp.asarray(dm))
        return jnp.einsum("pqrs,sr->pq", self.eri, dm)

    def get_k(self, dm, omega: float | None = None):
        # pyscf convention: K_pq = sum_{rs} (pr|sq) dm_rs
        if self.df:
            return _df_k(self.df_B(omega or 0.0), jnp.asarray(dm))
        eri = self.eri if not omega else self.eri_omega(omega)
        return jnp.einsum("prsq,rs->pq", eri, dm)


@jax.jit
def _df_j(B, dm):
    t = jnp.einsum("Pls,sl->P", B, dm)
    return jnp.einsum("Pmn,P->mn", B, t)


@jax.jit
def _df_k(B, dm):
    # K_pq = sum_rs (pr|sq) dm_rs = sum_P (B[P] @ dm @ B[P])_pq
    T = jnp.einsum("Pmr,rs->Pms", B, dm)
    return jnp.einsum("Pms,Psn->mn", T, B)
