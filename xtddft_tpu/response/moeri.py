"""MO-basis ERI transforms (replaces pyscf ao2mo.general)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SCRIPTS = [
    ("pqrs,pi->iqrs", 0),
    ("iqrs,qj->ijrs", 1),
    ("ijrs,rk->ijks", 2),
    ("ijks,sl->ijkl", 3),
]


def mo_eri(eri_ao, c1, c2, c3, c4) -> np.ndarray:
    """(c1 c2 | c3 c4) chemists' notation from AO (pq|rs).

    The four quarter-transforms are applied smallest-target-dimension
    first, keeping the largest intermediate no bigger than
    nao^3 * min(nmo_i) — essential when slicing small (e.g. open-shell)
    blocks out of a large ERI tensor.
    """
    cs = [jnp.asarray(c) for c in (c1, c2, c3, c4)]
    order = np.argsort([c.shape[1] for c in cs], kind="stable")
    t = jnp.asarray(eri_ao)
    labels = list("pqrs")
    out_labels = list("ijkl")
    for pos in order:
        src = "".join(labels)
        labels[pos] = out_labels[pos]
        dst = "".join(labels)
        t = jnp.einsum(f"{src},{'pqrs'[pos]}{out_labels[pos]}->{dst}", t, cs[pos])
    return np.array(t)
