"""BDF fso-file interop reader (`soc/interop.py`) — roundtrip tests.

The reference reads SOC matrices exported by the BDF program
(`/root/reference/x2c_hamiltonian/utils/fso_utils.py:13-49`).
"""

import numpy as np
import pytest

from xtddft_tpu.soc.interop import read_fso_file, space_dims


def _write_fso(path, mat, iop):
    ncomp, nb, _ = mat.shape
    with open(path, "w") as f:
        f.write(f"iop= {iop} ncomp= {ncomp} nbas= {nb}\n")
        if iop == 0:
            payload = mat.ravel(order="F")
        else:
            payload = np.moveaxis(mat, 0, -1).ravel(order="F")
        for v in payload:
            f.write(f"{v:.17g}\n")


@pytest.mark.parametrize("iop", [0, 1])
def test_fso_roundtrip(tmp_path, iop):
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((3, 5, 5))
    p = tmp_path / "fso.txt"
    _write_fso(p, mat, iop)
    out = read_fso_file(str(p))
    assert out["ncomp"] == 3 and out["nbas"] == 5 and out["iop"] == iop
    assert np.abs(out["matrix"] - mat).max() < 1e-14


def test_fso_bad_header(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("hello world\n1.0\n")
    with pytest.raises(ValueError):
        read_fso_file(str(p))


def test_space_dims():
    # O atom triplet in sto-3g: 8 electrons, 5 AOs, S=1 -> nc=3, no=2, nv=0
    nao, nc, no, nv, sc, so, sv = space_dims(8, 5, 1.0)
    assert (nao, nc, no, nv) == (5, 3, 2, 0)
    assert sc == slice(0, 3) and so == slice(3, 5)
