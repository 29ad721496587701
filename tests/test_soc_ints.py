"""Derivative-integral checks for the SOC layer.

Validations the reference performs as debug prints (`sfX2C_soDKH1.py:
237-238, 829-849`): pnucp symmetry, wso antisymmetry, kint pair
antisymmetry — plus finite-difference cross-checks of the derivative
machinery against the base integrals (d/dA = -d/dr for a Gaussian)."""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.ints import build_layout, overlap, eri_full, ip_overlap
from xtddft_tpu.ints import mcmurchie as md
from xtddft_tpu.ints import soc_ints


@pytest.fixture(scope="module")
def oh_layout():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", basis="sto-3g", spin=1)
    return build_layout(mol)


def _pair_overlap(sp):
    """Overlap from a Hermite pair: only the (0,0,0) Hermite survives."""
    w = (np.pi / sp.p) ** 1.5
    return np.sum(sp.H[:, 0, :] * w[None, :], axis=1)


def test_deriv_pair_matches_ip_overlap(oh_layout):
    lay = oh_layout
    ref = ip_overlap(lay)  # (3, nao, nao) <d mu | nu>
    from xtddft_tpu.ints.shell import cart2sph

    for d in range(3):
        out = np.zeros((lay.nao, lay.nao))
        for sha in lay.shells:
            for shb in lay.shells:
                sp = md.make_shell_pair_deriv(sha, shb, d_bra=d)
                blk = _pair_overlap(sp)
                Ca, Cb = cart2sph(sha.l), cart2sph(shb.l)
                blk = Ca.T @ blk.reshape(Ca.shape[0], Cb.shape[0]) @ Cb
                out[
                    sha.ao_offset : sha.ao_offset + sha.nao,
                    shb.ao_offset : shb.ao_offset + shb.nao,
                ] = blk
        assert np.abs(out - ref[d]).max() < 1e-10


def test_pnucp_symmetric_wso_antisymmetric(oh_layout):
    w = soc_ints.pnucp(oh_layout)
    assert np.abs(w - w.T).max() < 1e-9
    ws = soc_ints.wso(oh_layout)
    for l in range(3):
        assert np.abs(ws[l] + ws[l].T).max() < 1e-9
    # s-only basis would give zero; O p shells make it nonzero
    assert np.abs(ws).max() > 1e-4


def test_kint_antisymmetries():
    mol = Molecule.from_atoms("O 0 0 0", basis="sto-3g", spin=2)
    lay = build_layout(mol)
    k = soc_ints.kint(lay)
    for l in range(3):
        # bra pair: (d_i mu nu| = -(d_i nu mu| + total-derivative term that
        # cancels in the eps contraction => K[mu nu ka la] = -K[ka la mu nu]
        assert np.abs(k[l] + k[l].transpose(2, 3, 0, 1)).max() < 1e-9
    assert np.abs(k).max() > 1e-6


def test_deriv_eri_fd():
    """(d_x mu nu | ka la) against center-displacement finite differences."""
    mol = Molecule.from_atoms("He 0 0 0; H 0.7 0.1 0.4", basis="sto-3g", spin=1)
    lay = build_layout(mol)
    sha, shb = lay.shells[0], lay.shells[1]
    bra_d = md.make_shell_pair_deriv(sha, shb, d_bra=0)
    ket = md.make_shell_pair(shb, shb)  # He only in the bra pair
    from xtddft_tpu.ints.two_electron import _quartet_cart

    val = _quartet_cart(bra_d, ket)[0, 0]

    h = 1e-5
    eps = np.zeros(3)
    eps[0] = h
    vals = []
    for s in (+1, -1):
        mol2 = Molecule.from_atoms(
            [("He", s * h * np.array([0.5291772083, 0, 0])), ("H", (0.7, 0.1, 0.4))],
            basis="sto-3g",
            spin=1,
        )
        lay2 = build_layout(mol2)
        vals.append(eri_full(lay2)[0, 1, 1, 1])
    fd = (vals[0] - vals[1]) / (2 * h)  # d/dA_x
    assert val == pytest.approx(-fd, abs=1e-6)


def test_fso2e_direct_matches_full():
    """Memory-adaptive streaming fso2e (`somf.fso2e_direct`, the
    reference's 'direct' impl `sfX2C_soDKH1.py:65-141`) is bit-identical
    to contracting the materialized K tensor."""
    import numpy as np

    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.scf import ROKS
    from xtddft_tpu.soc.somf import build_vso, resolve_mf2e_impl

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", basis="sto-3g", spin=1)
    mf = ROKS(mol, xc="hf").kernel()
    vf = build_vso(mf, iop="bp", use_1c=False, mf2e_impl="full")
    vd = build_vso(mf, iop="bp", use_1c=False, mf2e_impl="direct")
    assert np.abs(vf.fso2e - vd.fso2e).max() < 1e-12
    vf = build_vso(mf, iop="x2c", use_1c=True, mf2e_impl="full")
    vd = build_vso(mf, iop="x2c", use_1c=True, mf2e_impl="direct")
    assert np.abs(vf.vso - vd.vso).max() < 1e-12
    assert resolve_mf2e_impl(10) == "full"
    assert resolve_mf2e_impl(10_000) == "direct"  # 3*nao^4 ~ 2.4e17 B
    assert resolve_mf2e_impl(10_000, "full") == "full"
