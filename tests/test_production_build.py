"""Production state build (response/production.py): the streaming
chip-side dressing/transform must reproduce the host-f64 reference
tensors (`build_df_data`) to the compensated-arithmetic floor, on a
molecule small enough for both paths to run on CPU."""

import numpy as np
import pytest

from xtddft_tpu.response.reference_state import make_reference
from xtddft_tpu.response.sigma_df import build_df_data, xtda_sigma_df


@pytest.fixture(scope="module")
def fh_ref(fh_roks_df):
    return make_reference(fh_roks_df)


def test_bmo_and_grid_tensors_match_host(fh_ref):
    """B^MO (hi+lo joined), phi^MO, rho0 from the device builders ==
    the host-dressed `build_df_data` tensors."""
    from xtddft_tpu.response.production import build_production_state

    data32, data64 = build_production_state(fh_ref)
    ref64 = build_df_data(fh_ref)

    B_host = np.asarray(ref64.B)
    assert np.abs(np.asarray(data64.B) - B_host).max() < 5e-7 * max(
        1.0, np.abs(B_host).max())
    # the device f32 B is the correctly-rounded hi half of the same build
    assert np.abs(np.asarray(data32.B) - B_host).max() < 2e-6 * max(
        1.0, np.abs(B_host).max())
    phi_host = np.asarray(ref64.phi)
    assert np.abs(np.asarray(data64.phi) - phi_host).max() < 1e-6
    for a, b in zip(data64.rho0, ref64.rho0):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8


def test_production_operator_action_matches(fh_ref):
    """X-TDA sigma over the production-built f64 data == over the
    host-built data (eigenvalue-level agreement)."""
    from xtddft_tpu.response.production import build_production_state

    _, data64 = build_production_state(fh_ref)
    op_p = xtda_sigma_df(data64)
    op_h = xtda_sigma_df(build_df_data(fh_ref))
    z = np.random.default_rng(0).normal(size=(3, op_p.dim))
    out_p = np.asarray(op_p.matvec(z))
    out_h = np.asarray(op_h.matvec(z))
    assert np.abs(out_p - out_h).max() < 1e-6


def test_make_reference_device_jk_matches_host(fh_roks_df):
    """make_reference(jk='device') (chip compensated J/K) == the host
    dA Fock pair to the compensated floor."""
    r_host = make_reference(fh_roks_df, jk="host")
    r_dev = make_reference(fh_roks_df, jk="device")
    assert np.abs(r_dev.fock_a_hf_mo - r_host.fock_a_hf_mo).max() < 1e-6
    assert np.abs(r_dev.fock_b_hf_mo - r_host.fock_b_hf_mo).max() < 1e-6


def test_production_cache_roundtrip(fh_ref, tmp_path):
    """Disk-cached dressed tensors reload bit-identically (the bench
    cold path skips the build)."""
    from xtddft_tpu.response.production import build_production_state

    d32a, d64a = build_production_state(fh_ref, cache=tmp_path, tag="t")
    assert (tmp_path / "t_bmo_hi.npy").exists()
    d32b, d64b = build_production_state(fh_ref, cache=tmp_path, tag="t")
    assert np.array_equal(np.asarray(d32a.B), np.asarray(d32b.B))
    assert np.array_equal(d64a.B, d64b.B)


def test_production_build_uks_rsh_mgga_legs():
    """r3 (VERDICT item 6): the production builder covers UKS references
    (beta twin tensors), RSH (erf-attenuated B_lr leg), and MGGA (tau in
    the grid state) — operator action == host `build_df_data`."""
    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.response.production import build_production_state
    from xtddft_tpu.scf import UKS, ROKS

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", basis="sto-3g",
                              spin=1)
    rng = np.random.default_rng(1)
    for xc in ("cam-b3lyp", "tpssh"):
        mfu = UKS(mol, xc=xc, grid_level=1, df=True).kernel()
        ref = make_reference(mfu)
        data32, data64 = build_production_state(ref)
        if xc == "cam-b3lyp":
            assert data64.B_lr is not None and data64.hyb_lr != 0.0
        else:
            assert len(data64.rho0) == 6  # tau channel present
        assert data64.B_b is not None and data64.phi_b is not None
        op_p = xtda_sigma_df(data64)
        op_h = xtda_sigma_df(build_df_data(ref))
        z = rng.normal(size=(2, op_p.dim))
        assert np.abs(np.asarray(op_p.matvec(z))
                      - np.asarray(op_h.matvec(z))).max() < 1e-6
