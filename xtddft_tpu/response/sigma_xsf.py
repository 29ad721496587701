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
from xtddft_tpu.response.sigma import SigmaOperator, make_sf_vresp
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
    orbo = jnp.asarray(ref.orbo_a, dtype=dtype)
    orbv = jnp.asarray(ref.orbv_b, dtype=dtype)
    fa = jnp.asarray(ref.fock_a_mo, dtype=dtype)
    fb = jnp.asarray(ref.fock_b_mo, dtype=dtype)
    f_occ = fa[:n_o, :n_o]
    f_vir = fb[nc:, nc:]
    vresp = make_sf_vresp(ref, method)
    vects = jnp.asarray(sf_oo_projector(no), dtype=dtype) if remove else None

    dA_on = SA > 0 and ref.restricted_open and no > 0
    if dA_on:
        si = 0.5 * no
        fahf = jnp.asarray(ref.fock_a_hf_mo, dtype=dtype)
        fbhf = jnp.asarray(ref.fock_b_hf_mo, dtype=dtype)
        fockS = 0.5 * (fbhf - fahf)
        C, O, V = slice(0, nc), slice(nc, nc + no), slice(nc + no, None)
        mo = ref.mo_a
        moC, moO, moV = mo[:, C], mo[:, O], mo[:, V]
        eri_ao = ref.env.eri

        def _moeri_d(*args):
            return np.asarray(mo_eri(*args), dtype=dtype)
        # dA two-electron blocks (small: every tensor has >= 2 O indices)
        e_OCCO = jnp.asarray(_moeri_d(eri_ao, moO, moC, moC, moO))
        e_VOOV = jnp.asarray(_moeri_d(eri_ao, moV, moO, moO, moV))
        if SA > 1:
            e_VOCC = jnp.asarray(_moeri_d(eri_ao, moV, moO, moC, moC))
            e_VVOC = jnp.asarray(_moeri_d(eri_ao, moV, moV, moO, moC))
            e_OCOV = jnp.asarray(_moeri_d(eri_ao, moO, moC, moO, moV))
            e_OVOC = jnp.asarray(_moeri_d(eri_ao, moO, moV, moO, moC))
        if SA > 2:
            e_VOOC = jnp.asarray(_moeri_d(eri_ao, moV, moO, moO, moC))
            e_OOOC = jnp.asarray(_moeri_d(eri_ao, moO, moO, moO, moC))
            e_VOOO = jnp.asarray(_moeri_d(eri_ao, moV, moO, moO, moO))
        fS_C = fockS[C, C]
        fS_V = fockS[V, V]
        fS_CV = fockS[C, V]
        fbhf_VO = fbhf[V, O]
        fahf_CO = fahf[C, O]
        fahf_OC = fahf[O, C]
        fbhf_CO = fbhf[C, O]
        fahf_OV = fahf[O, V]
        c1 = np.sqrt(1.0 + 1.0 / (2 * si)) - 1.0
        c2 = np.sqrt(2 * si / (2 * si - 1)) - 1.0
        c3 = 1.0 / np.sqrt(2 * si * (2 * si - 1))
        factor = np.sqrt((2 * si + 1) / (2 * si - 1))

    @jax.jit
    def matvec(zs):
        zs = jnp.asarray(zs, dtype=dtype)
        nz = zs.shape[0]
        zcv = zs[:, :d1].reshape(nz, nc, nv)
        zco = zs[:, d1:d2].reshape(nz, nc, no)
        zov = zs[:, d2:d3].reshape(nz, no, nv)
        if remove:
            zoo = jnp.einsum("pq,xq->xp", vects, zs[:, d3:]).reshape(nz, no, no)
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
        v1ao = vresp(dms)
        vs = jnp.einsum("xpq,po,qv->xov", v1ao, orbo, orbv)
        vs = vs + jnp.einsum("ab,xib->xia", f_vir, z) - jnp.einsum(
            "ij,xja->xia", f_occ, z
        )
        if dA_on:
            dcv = jnp.zeros((nz, nc, nv), dtype=dtype)
            dco = jnp.zeros((nz, nc, no), dtype=dtype)
            dov = jnp.zeros((nz, no, nv), dtype=dtype)
            doo = jnp.zeros((nz, no, no), dtype=dtype)
            # diagonal blocks (SA >= 1), `xtddft/XSF_TDA.py:343-350`
            dcv = dcv + (
                jnp.einsum("ab,xib->xia", fS_V, zcv)
                + jnp.einsum("ji,xja->xia", fS_C, zcv)
            ) / si
            dco = dco + (
                jnp.einsum("ji,xju->xiu", fS_C, zco) * 2.0 / (2 * si - 1)
                - jnp.einsum("uijv,xjv->xiu", e_OCCO, zco) / (2 * si - 1)
            )
            dov = dov + (
                jnp.einsum("ab,xub->xua", fS_V, zov) * 2.0 / (2 * si - 1)
                - jnp.einsum("auvb,xvb->xua", e_VOOV, zov) / (2 * si - 1)
            )
            if SA > 1:
                # CV<->CO (`:355-358`)
                dcv = dcv + c1 * (
                    jnp.einsum("av,xiv->xia", fbhf_VO, zco)
                    - jnp.einsum("avji,xjv->xia", e_VOCC, zco)
                )
                dco = dco + c1 * (
                    jnp.einsum("av,xia->xiv", fbhf_VO, zcv)
                    - jnp.einsum("avji,xia->xjv", e_VOCC, zcv)
                )
                # CV<->OV (`:360-363`)
                dcv = dcv + c1 * (
                    -jnp.einsum("iv,xva->xia", fahf_CO, zov)
                    - jnp.einsum("abvi,xvb->xia", e_VVOC, zov)
                )
                dov = dov + c1 * (
                    -jnp.einsum("iv,xia->xva", fahf_CO, zcv)
                    - jnp.einsum("abvi,xib->xva", e_VVOC, zcv)
                )
                # CO<->OV (`:365-368`)
                dco = dco + (1.0 / (2 * si - 1)) * (
                    jnp.einsum("uivb,xvb->xiu", e_OCOV, zov)
                    - jnp.einsum("ubvi,xvb->xiu", e_OVOC, zov)
                )
                dov = dov + (1.0 / (2 * si - 1)) * (
                    jnp.einsum("uivb,xiu->xvb", e_OCOV, zco)
                    - jnp.einsum("ubvi,xiu->xvb", e_OVOC, zco)
                )
            if SA > 2:
                # CV<->OO (`:374-377`)
                dcv = dcv + foo * (
                    -(factor - 1.0) * jnp.einsum("avwi,xwv->xia", e_VOOC, zoo)
                    + (factor / si) * jnp.einsum("ia,xww->xia", fS_CV, zoo)
                )
                doo = doo + foo * (
                    -(factor - 1.0) * jnp.einsum("avwi,xia->xwv", e_VOOC, zcv)
                    + (factor / si)
                    * jnp.einsum(
                        "ia,xia,wv->xwv", fS_CV, zcv, jnp.eye(no, dtype=dtype)
                    )
                )
                # CO<->OO (`:380-384`)
                dco = dco + foo * (
                    c2
                    * (
                        -jnp.einsum("wi,xwu->xiu", fahf_OC, zoo)
                        - jnp.einsum("uvwi,xwv->xiu", e_OOOC, zoo)
                    )
                    + c3 * jnp.einsum("iu,xww->xiu", fbhf_CO, zoo)
                )
                doo = doo + foo * (
                    c2
                    * (
                        -jnp.einsum("wi,xiv->xwv", fahf_OC, zco)
                        - jnp.einsum("uvwi,xiu->xwv", e_OOOC, zco)
                    )
                    + c3
                    * jnp.einsum("iu,xiu,wv->xwv", fbhf_CO, zco, jnp.eye(no, dtype=dtype))
                )
                # OV<->OO (`:386-390`)
                dov = dov + foo * (
                    c2
                    * (
                        jnp.einsum("av,xuv->xua", fbhf_VO, zoo)
                        - jnp.einsum("avwu,xwv->xua", e_VOOO, zoo)
                    )
                    - c3 * jnp.einsum("ua,xww->xua", fahf_OV, zoo)
                )
                doo = doo + foo * (
                    c2
                    * (
                        jnp.einsum("av,xwa->xwv", fbhf_VO, zov)
                        - jnp.einsum("avwu,xua->xwv", e_VOOO, zov)
                    )
                    - c3 * jnp.einsum("ua,xua,wv->xwv", fahf_OV, zov, jnp.eye(no, dtype=dtype))
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
            ooo = jnp.einsum("pq,xp->xq", vects, ooo)
        return jnp.concatenate([ocv, oco, oov, ooo], axis=1)

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

    return SigmaOperator(matvec=matvec, hdiag=hdiag, dim=dim, _to_blocked=expand)
