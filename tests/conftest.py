"""Test configuration: force the CPU backend with a virtual 8-device mesh
(the driver validates multi-chip sharding the same way)."""

import os

os.environ["XTDDFT_PLATFORM"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.scf import ROKS, RHF


@pytest.fixture(scope="session")
def fh_roks():
    """FH triplet ROKS/BHandHLYP, small grid — shared across operator tests."""
    mol = Molecule.from_atoms("F 0 0 0; H 0 0 1.0", basis="6-31g", spin=2)
    mf = ROKS(mol, xc="bhandhlyp", grid_level=1)
    return mf.kernel()


@pytest.fixture(scope="session")
def fh_roks_df():
    """Same FH triplet, converged through the density-fitted SCF."""
    mol = Molecule.from_atoms("F 0 0 0; H 0 0 1.0", basis="6-31g", spin=2)
    return ROKS(mol, xc="bhandhlyp", grid_level=1, df=True).kernel()


@pytest.fixture(scope="session")
def h2_rhf():
    mol = Molecule.from_atoms("H 0 0 0; H 0 0 1.4", basis="sto-3g", unit="bohr")
    return RHF(mol).kernel()
