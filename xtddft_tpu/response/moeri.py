"""MO-basis ERI transforms (replaces pyscf ao2mo.general)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mo_eri(eri_ao, c1, c2, c3, c4) -> np.ndarray:
    """(c1 c2 | c3 c4) chemists' notation from AO (pq|rs)."""
    t = jnp.einsum("pqrs,pi->iqrs", eri_ao, jnp.asarray(c1))
    t = jnp.einsum("iqrs,qj->ijrs", t, jnp.asarray(c2))
    t = jnp.einsum("ijrs,rk->ijks", t, jnp.asarray(c3))
    t = jnp.einsum("ijks,sl->ijkl", t, jnp.asarray(c4))
    return np.array(t)
