"""Differentiable integral layer (ints/jaxints.py) vs the host engine.

The host McMurchie-Davidson engine (`ints/mcmurchie.py`) is the accuracy
anchor (itself validated against stored libcint values in test_ints.py);
jaxints must reproduce it bit-for-bit at fixed geometry and must be
differentiable in the nuclear coordinates (FD cross-check).
"""

import jax
import numpy as np
import pytest

from xtddft_tpu.chem import Molecule
from xtddft_tpu.ints import build_layout
from xtddft_tpu.ints.jaxints import make_integral_fn
from xtddft_tpu.ints.one_electron import kinetic, nuclear_attraction, overlap
from xtddft_tpu.ints.two_electron import eri_full


@pytest.fixture(scope="module")
def water():
    return Molecule.from_atoms(
        [("O", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 1.8)),
         ("H", (1.7, 0.0, -0.4))],
        basis="6-31g", unit="bohr",
    )


def test_jaxints_matches_host_engine(water):
    lay = build_layout(water)
    ints = make_integral_fn(lay)(np.asarray(water.coords))
    assert np.abs(np.asarray(ints["S"]) - np.asarray(overlap(lay))).max() < 1e-13
    # relative gate: steep-primitive kinetic elements reach ~30, and the
    # block-jit executables sum primitive pairs in a different order
    # than the host engine (f64 rounding-order noise, ~1e-13 relative)
    T_host = np.asarray(kinetic(lay))
    assert (np.abs(np.asarray(ints["T"]) - T_host).max()
            < 1e-12 * max(1.0, np.abs(T_host).max()))
    assert (
        np.abs(np.asarray(ints["V"]) - np.asarray(nuclear_attraction(lay))).max()
        < 1e-12
    )
    assert np.abs(np.asarray(ints["eri"]) - np.asarray(eri_full(lay))).max() < 1e-12


def test_jaxints_gradient_vs_fd(water):
    lay = build_layout(water)
    fn = make_integral_fn(lay, do_eri=False)

    def scalar(coords):
        ints = fn(coords)
        # an arbitrary smooth functional touching S, T, and V
        return (ints["S"].sum() + 0.3 * ints["T"].sum()
                + 0.1 * (ints["V"] ** 2).sum())

    c0 = np.asarray(water.coords)
    g = np.asarray(jax.grad(scalar)(c0))
    h = 1e-4
    for (ia, x) in [(0, 2), (1, 2), (2, 0)]:
        cp, cm = c0.copy(), c0.copy()
        cp[ia, x] += h
        cm[ia, x] -= h
        fd = (float(scalar(cp)) - float(scalar(cm))) / (2 * h)
        assert g[ia, x] == pytest.approx(fd, abs=5e-7)
