"""Shared XSF-TDA spin-adaptation (dA) machinery.

The blockwise dA coupling einsums (`xtddft/XSF_TDA.py:343-390, 1131-1276`)
are identical between the in-core and density-fitted sigma operators; only
the provenance of the small MO ERI tensors differs (exact `mo_eri` vs
DF B-contractions).  All tensors carry at least two open-shell indices, so
they are tiny and precomputed once.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def delta_a_tensors_from_eri(ref, SA: int, dtype):
    """In-core MO tensors for dA (exact ERIs)."""
    from xtddft_tpu.response.moeri import mo_eri

    nc, no = ref.nc, ref.no
    C, O, V = slice(0, nc), slice(nc, nc + no), slice(nc + no, None)
    mo = ref.mo_a
    moC, moO, moV = mo[:, C], mo[:, O], mo[:, V]
    eri_ao = ref.env.eri

    def _m(*orbs):
        return jnp.asarray(np.asarray(mo_eri(eri_ao, *orbs), dtype=dtype))

    t = {
        "e_OCCO": _m(moO, moC, moC, moO),
        "e_VOOV": _m(moV, moO, moO, moV),
    }
    if SA > 1:
        t["e_VOCC"] = _m(moV, moO, moC, moC)
        t["e_VVOC"] = _m(moV, moV, moO, moC)
        t["e_OCOV"] = _m(moO, moC, moO, moV)
        t["e_OVOC"] = _m(moO, moV, moO, moC)
    if SA > 2:
        t["e_VOOC"] = _m(moV, moO, moO, moC)
        t["e_OOOC"] = _m(moO, moO, moO, moC)
        t["e_VOOO"] = _m(moV, moO, moO, moO)
    return t


def delta_a_tensors_from_df(B, nc: int, no: int, SA: int, dtype):
    """The same MO tensors from the fitted B (P, nmo, nmo)."""
    C, O, V = slice(0, nc), slice(nc, nc + no), slice(nc + no, None)

    def _m(s1, s2, s3, s4):
        return jnp.einsum(
            "Ppq,Prs->pqrs", B[:, s1, s2], B[:, s3, s4]
        ).astype(dtype)

    t = {
        "e_OCCO": _m(O, C, C, O),
        "e_VOOV": _m(V, O, O, V),
    }
    if SA > 1:
        t["e_VOCC"] = _m(V, O, C, C)
        t["e_VVOC"] = _m(V, V, O, C)
        t["e_OCOV"] = _m(O, C, O, V)
        t["e_OVOC"] = _m(O, V, O, C)
    if SA > 2:
        t["e_VOOC"] = _m(V, O, O, C)
        t["e_OOOC"] = _m(O, O, O, C)
        t["e_VOOO"] = _m(V, O, O, O)
    return t


def delta_a_tensors_from_df_packed(Bp, f2p, nmo: int, nc: int, no: int,
                                   SA: int, dtype,
                                   panel_budget: float = 2.5e8):
    """The same MO tensors from PACKED-symmetric B (naux, npair).

    Every dA tensor carries at least two open-shell indices, so all
    gathered panels except VV are small (O has ``no`` columns, C at most
    ``nc``); they are gathered once at full aux length.  The one
    VV-panel term (e_VVOC, SA>1) is accumulated over aux chunks so the
    (naux, nv, nv) panel — multi-GB at 862 AO — never materializes.
    ``f2p`` is `scf/df_build.pack_indices(nmo)[1]`."""
    import jax

    C, O, V = slice(0, nc), slice(nc, nc + no), slice(nc + no, None)
    f2p_m = np.asarray(f2p).reshape(nmo, nmo)
    naux = int(Bp.shape[0])
    nv = nmo - nc - no

    def panel(s1, s2):
        idx = f2p_m[s1, s2]
        return jnp.take(Bp, jnp.asarray(idx.ravel()), axis=1).reshape(
            naux, *idx.shape)

    B_OC = panel(O, C)
    B_VO = panel(V, O)

    def _m2(Bx, By):
        return jnp.einsum("Ppq,Prs->pqrs", Bx, By).astype(dtype)

    # B is symmetric in its MO pair: B[:, s2, s1] = transpose(B[:, s1, s2])
    B_CO = jnp.swapaxes(B_OC, 1, 2)
    B_OV = jnp.swapaxes(B_VO, 1, 2)
    t = {
        "e_OCCO": _m2(B_OC, B_CO),
        "e_VOOV": _m2(B_VO, B_OV),
    }
    if SA > 1:
        B_CC = panel(C, C)
        t["e_VOCC"] = _m2(B_VO, B_CC)
        t["e_OCOV"] = _m2(B_OC, B_OV)
        t["e_OVOC"] = _m2(B_OV, B_OC)
        del B_CC
        # e_VVOC: aux-chunked so the VV panel stays (chunk, nv, nv)
        idx_vv = jnp.asarray(f2p_m[V, V].ravel())
        target = int(max(1, panel_budget // max(1, nv * nv * 4)))
        chunk = 1
        for c in range(min(target, naux), 0, -1):
            if naux % c == 0:
                chunk = c
                break
        acc = jnp.zeros((nv, nv, no, nc), dtype=dtype)
        for i in range(naux // chunk):
            Bc = jax.lax.dynamic_slice_in_dim(Bp, i * chunk, chunk, 0)
            Bvv = jnp.take(Bc, idx_vv, axis=1).reshape(chunk, nv, nv)
            Boc = jax.lax.dynamic_slice_in_dim(B_OC, i * chunk, chunk, 0)
            acc = acc + jnp.einsum("Pab,Pvi->abvi", Bvv, Boc).astype(dtype)
        t["e_VVOC"] = acc
    if SA > 2:
        B_OO = panel(O, O)
        t["e_VOOC"] = _m2(B_VO, B_OC)
        t["e_OOOC"] = _m2(B_OO, B_OC)
        t["e_VOOO"] = _m2(B_VO, B_OO)
    return t


def delta_a_fock_blocks(fock_hf_a, fock_hf_b, nc: int, no: int, dtype):
    """HF-Fock-pair ingredients of dA (`xtddft/XSF_TDA.py:317-341`)."""
    C, O, V = slice(0, nc), slice(nc, nc + no), slice(nc + no, None)
    fahf = jnp.asarray(fock_hf_a, dtype=dtype)
    fbhf = jnp.asarray(fock_hf_b, dtype=dtype)
    fockS = 0.5 * (fbhf - fahf)
    return {
        "fS_C": fockS[C, C],
        "fS_V": fockS[V, V],
        "fS_CV": fockS[C, V],
        "fbhf_VO": fbhf[V, O],
        "fahf_CO": fahf[C, O],
        "fahf_OC": fahf[O, C],
        "fbhf_CO": fbhf[C, O],
        "fahf_OV": fahf[O, V],
    }


def apply_delta_a(T, si: float, SA: int, foo: float,
                  zcv, zco, zov, zoo, dtype):
    """(dcv, dco, dov, doo) spin-adaptation couplings applied to the z
    blocks; T holds the tensors from `delta_a_tensors_*` +
    `delta_a_fock_blocks`."""
    no = zoo.shape[-1]
    nz = zcv.shape[0]
    c1 = float(np.sqrt(1.0 + 1.0 / (2 * si)) - 1.0)
    c2 = float(np.sqrt(2 * si / (2 * si - 1)) - 1.0)
    c3 = float(1.0 / np.sqrt(2 * si * (2 * si - 1)))
    factor = float(np.sqrt((2 * si + 1) / (2 * si - 1)))
    eye_o = jnp.eye(no, dtype=dtype)

    dcv = (
        jnp.einsum("ab,xib->xia", T["fS_V"], zcv)
        + jnp.einsum("ji,xja->xia", T["fS_C"], zcv)
    ) / si
    dco = (
        jnp.einsum("ji,xju->xiu", T["fS_C"], zco) * 2.0 / (2 * si - 1)
        - jnp.einsum("uijv,xjv->xiu", T["e_OCCO"], zco) / (2 * si - 1)
    )
    dov = (
        jnp.einsum("ab,xub->xua", T["fS_V"], zov) * 2.0 / (2 * si - 1)
        - jnp.einsum("auvb,xvb->xua", T["e_VOOV"], zov) / (2 * si - 1)
    )
    doo = jnp.zeros_like(zoo)
    if SA > 1:
        dcv = dcv + c1 * (
            jnp.einsum("av,xiv->xia", T["fbhf_VO"], zco)
            - jnp.einsum("avji,xjv->xia", T["e_VOCC"], zco)
        )
        dco = dco + c1 * (
            jnp.einsum("av,xia->xiv", T["fbhf_VO"], zcv)
            - jnp.einsum("avji,xia->xjv", T["e_VOCC"], zcv)
        )
        dcv = dcv + c1 * (
            -jnp.einsum("iv,xva->xia", T["fahf_CO"], zov)
            - jnp.einsum("abvi,xvb->xia", T["e_VVOC"], zov)
        )
        dov = dov + c1 * (
            -jnp.einsum("iv,xia->xva", T["fahf_CO"], zcv)
            - jnp.einsum("abvi,xib->xva", T["e_VVOC"], zcv)
        )
        dco = dco + (1.0 / (2 * si - 1)) * (
            jnp.einsum("uivb,xvb->xiu", T["e_OCOV"], zov)
            - jnp.einsum("ubvi,xvb->xiu", T["e_OVOC"], zov)
        )
        dov = dov + (1.0 / (2 * si - 1)) * (
            jnp.einsum("uivb,xiu->xvb", T["e_OCOV"], zco)
            - jnp.einsum("ubvi,xiu->xvb", T["e_OVOC"], zco)
        )
    if SA > 2:
        dcv = dcv + foo * (
            -(factor - 1.0) * jnp.einsum("avwi,xwv->xia", T["e_VOOC"], zoo)
            + (factor / si) * jnp.einsum("ia,xww->xia", T["fS_CV"], zoo)
        )
        doo = doo + foo * (
            -(factor - 1.0) * jnp.einsum("avwi,xia->xwv", T["e_VOOC"], zcv)
            + (factor / si)
            * jnp.einsum("ia,xia,wv->xwv", T["fS_CV"], zcv, eye_o)
        )
        dco = dco + foo * (
            c2 * (
                -jnp.einsum("wi,xwu->xiu", T["fahf_OC"], zoo)
                - jnp.einsum("uvwi,xwv->xiu", T["e_OOOC"], zoo)
            )
            + c3 * jnp.einsum("iu,xww->xiu", T["fbhf_CO"], zoo)
        )
        doo = doo + foo * (
            c2 * (
                -jnp.einsum("wi,xiv->xwv", T["fahf_OC"], zco)
                - jnp.einsum("uvwi,xiu->xwv", T["e_OOOC"], zco)
            )
            + c3 * jnp.einsum("iu,xiu,wv->xwv", T["fbhf_CO"], zco, eye_o)
        )
        dov = dov + foo * (
            c2 * (
                jnp.einsum("av,xuv->xua", T["fbhf_VO"], zoo)
                - jnp.einsum("avwu,xwv->xua", T["e_VOOO"], zoo)
            )
            - c3 * jnp.einsum("ua,xww->xua", T["fahf_OV"], zoo)
        )
        doo = doo + foo * (
            c2 * (
                jnp.einsum("av,xwa->xwv", T["fbhf_VO"], zov)
                - jnp.einsum("avwu,xua->xwv", T["e_VOOO"], zov)
            )
            - c3 * jnp.einsum("ua,xua,wv->xwv", T["fahf_OV"], zov, eye_o)
        )
    return dcv, dco, dov, doo
