"""Matrix-free XSF-TDA sigma operator (the flagship Davidson path).

Mirrors `xtddft/XSF_TDA.py:1029-1290` (gen_tda_operation_sf): the SF-TDA
base response (exchange + ALDA0 kernel, no Coulomb) plus the spin-adapted
dA applied blockwise, with the Sf=Si contaminant handled by compressing
the OO block through the orthogonal `vects` basis.

The dA two-electron terms all carry at least two open-shell (O) indices,
so they are precomputed as small MO tensors (<= 2 large indices each)
and applied as einsums inside the jitted matvec — equivalent to the
reference's batched get_jk formulation but with no per-iteration AO pass.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from xtddft_tpu.response.moeri import mo_eri
from xtddft_tpu.response.reference_state import Reference
from xtddft_tpu.response.sigma import (
    SigmaOperator,
    _sf_vresp_consts,
    _sf_vresp_raw,
)
from xtddft_tpu.response.spaces import sf_oo_projector


def xsf_sigma_operator(
    ref: Reference,
    SA: int | None = None,
    foo: float = 1.0,
    fglobal: float = 1.0,
    method: int = 0,
    remove: bool | None = None,
    dtype=None,
) -> SigmaOperator:
    """dtype: compute precision of the device hot path.  f64 is exact but
    software-emulated on TPU (slow compile/execute); f32 is the fast TPU
    path (compensated-f32 Pallas kernels are the roadmap for full f64
    accuracy at TPU speed).  Default: follow ref.env tensors."""
    nc, no, nv = ref.nc, ref.no, ref.nv
    if SA is None:
        SA = 3 if ref.restricted_open else 0
    if remove is None:
        remove = ref.restricted_open and no > 0
    n_o, n_v = nc + no, no + nv
    d1, d2, d3 = nc * nv, nc * nv + nc * no, nc * nv + nc * no + no * nv
    noo = no * no - 1 if remove else no * no
    dim = d3 + noo

    import numpy as _np
    if dtype is None:
        dtype = _np.asarray(ref.env.eri).dtype if hasattr(ref.env.eri, "dtype") else _np.float64
    fa = jnp.asarray(ref.fock_a_mo, dtype=dtype)
    fb = jnp.asarray(ref.fock_b_mo, dtype=dtype)
    hyb, alpha = ref.hyb, ref.alpha
    # all device tensors travel as jit ARGUMENTS (args-pytree pattern;
    # closure capture bakes the ERI into the HLO as a multi-GB constant)
    consts = _sf_vresp_consts(ref, method)
    consts.update(
        orbo=jnp.asarray(ref.orbo_a, dtype=dtype),
        orbv=jnp.asarray(ref.orbv_b, dtype=dtype),
        f_occ=fa[:n_o, :n_o],
        f_vir=fb[nc:, nc:],
    )
    if remove:
        consts["vects"] = jnp.asarray(sf_oo_projector(no), dtype=dtype)

    dA_on = SA > 0 and ref.restricted_open and no > 0
    if dA_on:
        si = 0.5 * no
        from xtddft_tpu.response.xsf_terms import (
            delta_a_fock_blocks,
            delta_a_tensors_from_eri,
        )

        dA_T = delta_a_tensors_from_eri(ref, SA, dtype)
        dA_T.update(
            delta_a_fock_blocks(ref.fock_a_hf_mo, ref.fock_b_hf_mo, nc, no, dtype)
        )
        consts["dA_T"] = dA_T

    def matvec_raw(consts, zs):
        orbo, orbv = consts["orbo"], consts["orbv"]
        f_occ, f_vir = consts["f_occ"], consts["f_vir"]
        zs = jnp.asarray(zs, dtype=dtype)
        nz = zs.shape[0]
        zcv = zs[:, :d1].reshape(nz, nc, nv)
        zco = zs[:, d1:d2].reshape(nz, nc, no)
        zov = zs[:, d2:d3].reshape(nz, no, nv)
        if remove:
            zoo = jnp.einsum("pq,xq->xp", consts["vects"],
                             zs[:, d3:]).reshape(nz, no, no)
        else:
            zoo = zs[:, d3:].reshape(nz, no, no)
        # assemble natural (n_o, n_v) layout: rows C|O, cols O|V
        z = jnp.zeros((nz, n_o, n_v), dtype=dtype)
        z = z.at[:, :nc, no:].set(zcv)
        z = z.at[:, :nc, :no].set(zco)
        z = z.at[:, nc:, no:].set(zov)
        z = z.at[:, nc:, :no].set(zoo)
        # SF base response
        dms = jnp.einsum("xov,qv,po->xpq", z, orbv, orbo)
        v1ao = _sf_vresp_raw(hyb, alpha, consts, dms)
        vs = jnp.einsum("xpq,po,qv->xov", v1ao, orbo, orbv)
        vs = vs + jnp.einsum("ab,xib->xia", f_vir, z) - jnp.einsum(
            "ij,xja->xia", f_occ, z
        )
        if dA_on:
            from xtddft_tpu.response.xsf_terms import apply_delta_a

            dcv, dco, dov, doo = apply_delta_a(
                consts["dA_T"], si, SA, foo, zcv, zco, zov, zoo, dtype
            )
            vs = vs.at[:, :nc, no:].add(fglobal * dcv)
            vs = vs.at[:, :nc, :no].add(fglobal * dco)
            vs = vs.at[:, nc:, no:].add(fglobal * dov)
            vs = vs.at[:, nc:, :no].add(fglobal * doo)
        # disassemble back to blocked layout
        ocv = vs[:, :nc, no:].reshape(nz, -1)
        oco = vs[:, :nc, :no].reshape(nz, -1)
        oov = vs[:, nc:, no:].reshape(nz, -1)
        ooo = vs[:, nc:, :no].reshape(nz, -1)
        if remove:
            ooo = jnp.einsum("pq,xp->xq", consts["vects"], ooo)
        return jnp.concatenate([ocv, oco, oov, ooo], axis=1)

    jitted = jax.jit(matvec_raw)

    def matvec(zs):
        return jitted(consts, zs)

    # hdiag from orbital-energy differences in blocked order
    e_occ = np.diag(ref.fock_a_mo)[:n_o]
    e_vir = np.diag(ref.fock_b_mo)[nc:]
    e_full = e_vir[None, :] - e_occ[:, None]  # (n_o, n_v)
    h_cv = e_full[:nc, no:].ravel()
    h_co = e_full[:nc, :no].ravel()
    h_ov = e_full[nc:, no:].ravel()
    h_oo = e_full[nc:, :no].ravel()
    if remove:
        V = np.asarray(sf_oo_projector(no))
        h_oo = np.einsum("pq,p,pq->q", V, h_oo, V)
    hdiag = np.concatenate([h_cv, h_co, h_ov, h_oo])

    def expand(v):
        """Expand compressed OO back to the full no^2 block."""
        if not remove:
            return v
        V = np.asarray(sf_oo_projector(no))
        return np.concatenate([v[:d3], V @ v[d3:]], axis=0)

    return SigmaOperator(matvec=matvec, hdiag=hdiag, dim=dim,
                         _to_blocked=expand, matvec_raw=matvec_raw,
                         consts=consts)
