"""Oscillator and rotatory strengths.

Conventions follow the reference exactly (X normalized X^T X = 1; closed
shell scaled by sqrt(2) to match pyscf's 1/2 normalization,
`xtddft/TDA.py:233-234`; rotatory strengths in 1e-40 cgs via
`units.CGS2AU`, Gaussian/ORCA sign conventions, `xtddft/TDA.py:250-275`).
"""

from __future__ import annotations

import numpy as np

from xtddft_tpu import units
from xtddft_tpu.response.reference_state import Reference


def _dip_blocks(ref: Reference):
    """MO dipole integrals over (alpha occ x alpha vir) and beta blocks,
    flattened in the CV|OV and CO|CV blocked layout."""
    dip = np.asarray(ref.env.dip)
    da = np.einsum("xpq,pi,qa->xia", dip, ref.orbo_a, ref.orbv_a)
    db = np.einsum("xpq,pi,qa->xia", dip, ref.orbo_b, ref.orbv_b)
    no = ref.no
    db_blocked = np.concatenate(
        [db[:, :, :no].reshape(3, -1), db[:, :, no:].reshape(3, -1)], axis=1
    )
    return da.reshape(3, -1), db_blocked


def closed_shell_osc(ref: Reference, e: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Singlet TDA oscillator strengths; v is (nc*nv, nstates)."""
    da, _ = _dip_blocks(ref)
    xy = v.T * np.sqrt(2.0)
    td = np.einsum("xi,si->sx", da, xy)
    return (2.0 / 3.0) * e * np.einsum("sx,sx->s", td, td)


def closed_shell_rot(ref: Reference, e: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Velocity-gauge rotatory strengths (1e-40 cgs)."""
    ip = np.asarray(ref.env.ipovlp)
    rxp = np.asarray(ref.env.rxp)
    de = np.einsum("xpq,pi,qa->xia", ip, ref.orbo_a, ref.orbv_a).reshape(3, -1)
    dm = np.einsum("xpq,pi,qa->xia", rxp, ref.orbo_a, ref.orbv_a).reshape(3, -1)
    xy = v.T * np.sqrt(2.0)
    t_e = -np.einsum("xi,si->sx", de, xy)
    t_m = 0.5 * np.einsum("xi,si->sx", dm, xy)
    f = np.einsum("s,sx,sx->s", 1.0 / e, t_e, t_m)
    return f / units.CGS2AU


def spin_conserving_osc(ref: Reference, e: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Oscillator strengths for the blocked CV(a)|OV(a)|CO(b)|CV(b) space
    (UTDA/XTDA), `xtddft/XTDA.py:838-858`."""
    da, db = _dip_blocks(ref)
    na = ref.nocc_a * ref.nvir_a
    xa = v[:na, :].T
    xb = v[na:, :].T
    td = np.einsum("xi,si->sx", da, xa) + np.einsum("xi,si->sx", db, xb)
    return (2.0 / 3.0) * e * np.einsum("sx,sx->s", td, td)


def spin_conserving_rot(ref: Reference, e: np.ndarray, v: np.ndarray) -> np.ndarray:
    ip = np.asarray(ref.env.ipovlp)
    rxp = np.asarray(ref.env.rxp)
    no = ref.no

    def blocks(ints):
        ba = np.einsum("xpq,pi,qa->xia", ints, ref.orbo_a, ref.orbv_a).reshape(3, -1)
        bb = np.einsum("xpq,pi,qa->xia", ints, ref.orbo_b, ref.orbv_b)
        bb = np.concatenate(
            [bb[:, :, :no].reshape(3, -1), bb[:, :, no:].reshape(3, -1)], axis=1
        )
        return ba, bb

    dea, deb = blocks(ip)
    dma, dmb = blocks(rxp)
    na = ref.nocc_a * ref.nvir_a
    xa = v[:na, :].T
    xb = v[na:, :].T
    t_e = -(np.einsum("xi,si->sx", dea, xa) + np.einsum("xi,si->sx", deb, xb))
    t_m = 0.5 * (np.einsum("xi,si->sx", dma, xa) + np.einsum("xi,si->sx", dmb, xb))
    f = np.einsum("s,sx,sx->s", 1.0 / e, t_e, t_m)
    return f / units.CGS2AU
