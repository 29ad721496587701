"""Spin-polarization diagnostic (`props/diagnostics.py`) — structural and
invariance checks on a triplet reference (the reference's
``XSF_TDA.get_sp``, `/root/reference/xtddft/XSF_TDA.py:215-258`).
"""

import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.props.diagnostics import spin_polarization
from xtddft_tpu.response.reference_state import make_reference
from xtddft_tpu.scf import ROKS, ROHF


@pytest.fixture(scope="module")
def o_triplet():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98; H 0 0 -0.98",
                              basis="sto-3g", spin=2)
    return ROHF(mol).kernel()


def test_spin_polarization_shapes(o_triplet, capsys):
    ref = make_reference(o_triplet)
    out = spin_polarization(ref, report=True)
    nc, no, nv = ref.nc, ref.no, ref.nv
    assert out["homo"].shape == (nc, nv)
    assert out["lumo"].shape == (nc, nv)
    # <LH|HL> is an exchange-type matrix element: real, nonzero, bounded
    # (its sign follows the SF-response convention, not raw (LH|HL) > 0)
    assert 1e-4 < abs(out["lhhl"]) < 1.0
    assert "<LH|HL>" in capsys.readouterr().out


def test_spin_polarization_rejects_non_triplet():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.98", basis="sto-3g", spin=1)
    mf = ROHF(mol).kernel()
    with pytest.raises(ValueError):
        spin_polarization(make_reference(mf))
