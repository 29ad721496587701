"""Finite-difference nuclear gradients.

Mirrors the reference's FD validators: central differences and the
one-sided second-order stencil (-3E0 + 4E(+h) - E(+2h))/(2h)
(`grad_hb/tdroks_sfu.py:37-57`).  Works with any scf kind and any
excited-state driver; geometries are displaced in bohr.
"""

from __future__ import annotations

import numpy as np

from xtddft_tpu.chem.molecule import Molecule
from xtddft_tpu.scf.driver import SCF


def _displaced(mol: Molecule, ia: int, x: int, h: float) -> Molecule:
    coords = mol.coords.copy()
    coords[ia, x] += h
    return mol.with_(coords=coords)


def _scf_energy(mol: Molecule, kind: str, xc, grid_level: int, occ=None,
                init=None, v_ext=None, x2c=False) -> tuple[float, object]:
    scf = SCF(mol, kind, xc=xc, grid_level=grid_level, v_ext=v_ext, x2c=x2c)
    mf = scf.kernel(occ=occ, init=init)
    if not mf.converged:
        raise RuntimeError(f"SCF not converged at displaced geometry {mol.coords}")
    return mf.e_tot, mf


def fd_gradient(mf, h: float = 1e-3, stencil: str = "central",
                atoms=None) -> np.ndarray:
    """(natm, 3) ground-state nuclear gradient by finite differences.

    mf: a converged MeanField (defines kind/xc/grid); each displacement
    re-converges the SCF from the reference orbitals."""
    mol = mf.mol
    kind = mf.kind
    xc_name = mf.xc.name if mf.xc is not None else None
    grid_level = mf.env.grid_level
    v_ext = getattr(mf, "v_ext", None)
    x2c = bool(getattr(mf.env, "x2c", False))
    atoms = range(mol.natm) if atoms is None else atoms
    g = np.zeros((mol.natm, 3))
    for ia in atoms:
        for x in range(3):
            if stencil == "central":
                ep, _ = _scf_energy(_displaced(mol, ia, x, h), kind, xc_name,
                                    grid_level, init=mf.mo_coeff,
                                    v_ext=v_ext, x2c=x2c)
                em, _ = _scf_energy(_displaced(mol, ia, x, -h), kind, xc_name,
                                    grid_level, init=mf.mo_coeff,
                                    v_ext=v_ext, x2c=x2c)
                g[ia, x] = (ep - em) / (2 * h)
            elif stencil == "forward2":
                # (-3E0 + 4E(+h) - E(+2h)) / (2h), `grad_hb/tdroks_sfu.py:48`
                e0 = mf.e_tot
                e1, _ = _scf_energy(_displaced(mol, ia, x, h), kind, xc_name,
                                    grid_level, init=mf.mo_coeff,
                                    v_ext=v_ext, x2c=x2c)
                e2, _ = _scf_energy(_displaced(mol, ia, x, 2 * h), kind,
                                    xc_name, grid_level, init=mf.mo_coeff,
                                    v_ext=v_ext, x2c=x2c)
                g[ia, x] = (-3 * e0 + 4 * e1 - e2) / (2 * h)
            else:
                raise ValueError(f"unknown stencil {stencil!r}")
    return g


def fd_excited_gradient(mf, driver_factory, state: int = 0, h: float = 1e-3,
                        atoms=None) -> np.ndarray:
    """(natm, 3) excited-state gradient: d(E_SCF + omega_state)/dR by central
    differences.

    driver_factory: callable(mf) -> method driver with .kernel() returning
    an ExcitationResult (e.g. ``lambda mf: XTDA(mf, nstates=3)``).
    Root-following is by state index — adequate away from crossings (the
    reference's FD validators do the same)."""
    mol = mf.mol
    kind = mf.kind
    xc_name = mf.xc.name if mf.xc is not None else None
    grid_level = mf.env.grid_level
    v_ext = getattr(mf, "v_ext", None)
    x2c = bool(getattr(mf.env, "x2c", False))
    atoms = range(mol.natm) if atoms is None else atoms

    def total_energy(m: Molecule) -> float:
        e_scf, mf_d = _scf_energy(m, kind, xc_name, grid_level,
                                  init=mf.mo_coeff, v_ext=v_ext, x2c=x2c)
        res = driver_factory(mf_d).kernel()
        return e_scf + float(res.e[state])

    g = np.zeros((mol.natm, 3))
    for ia in atoms:
        for x in range(3):
            ep = total_energy(_displaced(mol, ia, x, h))
            em = total_energy(_displaced(mol, ia, x, -h))
            g[ia, x] = (ep - em) / (2 * h)
    return g
