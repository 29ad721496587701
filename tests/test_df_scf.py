"""Density-fitted SCF and RSH-on-DF tests (round-2 production unlocks).

The reference runs all real molecules through AO-direct libcint J/K; the
TPU-native production path is DF everywhere (SCF and response share one
fitted B tensor, `scf/env.py df_B`).  Gates: DF-vs-in-core SCF energy to
the fit error, and CAM-B3LYP DF response == in-core dense response to
~1 meV (VERDICT item 7)."""

import numpy as np
import pytest

from xtddft_tpu import units
from xtddft_tpu.chem import Molecule
from xtddft_tpu.response import dense, make_reference
from xtddft_tpu.response.sigma_df import build_df_data, xtda_sigma_df
from xtddft_tpu.scf import ROKS, RKS
from xtddft_tpu.solver.davidson import davidson


@pytest.fixture(scope="module")
def oh_mol():
    return Molecule.from_atoms("O 0 0 0; H 0 0 0.97", basis="6-31g", spin=1)


def test_df_scf_matches_incore(oh_mol):
    e_ic = ROKS(oh_mol, xc="b3lyp", grid_level=1, df=False).kernel()
    e_df = ROKS(oh_mol, xc="b3lyp", grid_level=1, df=True).kernel()
    assert e_ic.converged and e_df.converged
    assert abs(e_ic.e_tot - e_df.e_tot) < 1e-4  # DF fit error


def test_df_scf_closed_shell():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.96; H 0.93 0 -0.24",
                              basis="6-31g")
    e_ic = RKS(mol, xc="pbe0", grid_level=1, df=False).kernel()
    e_df = RKS(mol, xc="pbe0", grid_level=1, df=True).kernel()
    assert e_ic.converged and e_df.converged
    assert abs(e_ic.e_tot - e_df.e_tot) < 1e-4


def test_camb3lyp_df_response_matches_dense(oh_mol):
    """RSH on the DF path (second erf-attenuated B tensor): X-TDA DF
    eigenvalues == in-core dense to ~1 meV (`xtddft/XTDA.py:94-99`)."""
    mf = ROKS(oh_mol, xc="cam-b3lyp", grid_level=1, df=False).kernel()
    assert mf.converged
    ref = make_reference(mf)
    assert ref.omega != 0.0
    A = dense.xtda_dense(ref)
    e_ref = np.linalg.eigh(A)[0]
    e_ref_pos = e_ref[e_ref > 1e-3]

    data = build_df_data(ref)
    assert data.B_lr is not None and data.hyb_lr == pytest.approx(0.46)
    op = xtda_sigma_df(data)
    e_df, _, conv = davidson(
        op.matvec, op.hdiag, nroots=8, init_guess=op.init_guess(8),
        pick_positive=True, tol=1e-6,
    )
    n = min(4, len(e_df))
    assert np.abs(e_df[:n] - e_ref_pos[:n]).max() * units.HA2EV < 2e-3


def test_camb3lyp_energy_sane(oh_mol):
    """CAM-B3LYP with the ITYH SR-B88 component lands within chemical
    sanity of B3LYP (the old 0.35*B88-only transcription was ~3 Ha off)."""
    e_cam = ROKS(oh_mol, xc="cam-b3lyp", grid_level=1, df=False).kernel()
    e_b3 = ROKS(oh_mol, xc="b3lyp", grid_level=1, df=False).kernel()
    assert abs(e_cam.e_tot - e_b3.e_tot) < 0.2
