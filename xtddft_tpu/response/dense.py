"""Dense response-matrix builders (correctness anchors for all methods).

Each builder reproduces the corresponding dense A assembly in the
reference, re-derived on top of this framework's own SCF/integrals/XC:

- ``utda_blocks``    UKS-TDA aa/ab/bb tensors (`xtddft/XTDA.py:128-275`,
                     `xtddft/UTDA.py:269-351`)
- ``tda_singlet/triplet`` closed-shell TDA (`xtddft/TDA.py:49-191`)
- ``xtda_dense``     spin-adapted X-TDA with dA (`xtddft/XTDA.py:277-398`)
- ``sf_up_dense``    SF-TDA spin-flip-up (`xtddft/SF_TDA.py:448-560`)
- ``sf_down_dense``  SF-TDA spin-flip-down (`xtddft/SF_TDA.py:624-804`)
- ``xsf_dense``      XSF-TDA dA on top of SF-down (`xtddft/XSF_TDA.py:265-395`)

All matrices use the blocked layouts of `response/spaces.py`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from xtddft_tpu.response.fxc_tensor import fxc_blocks
from xtddft_tpu.response.moeri import mo_eri
from xtddft_tpu.response.reference_state import Reference
from xtddft_tpu.response.spaces import sf_oo_projector
from xtddft_tpu.xc.interface import cache_rho, sf_kernel_alda0
from xtddft_tpu.xc.registry import XCSpec


def _rho0(ref: Reference):
    ao = ref.env.ao
    da = jnp.asarray(ref.orbo_a @ ref.orbo_a.T)
    db = jnp.asarray(ref.orbo_b @ ref.orbo_b.T)
    if ref.spec is not None and ref.spec.needs_tau:
        ra, ga, ta = cache_rho(ao, da, tau=True)
        rb, gb, tb = cache_rho(ao, db, tau=True)
        return (ra, rb, ga, gb, ta, tb)
    ra, ga = cache_rho(ao, da)
    rb, gb = cache_rho(ao, db)
    return (ra, rb, ga, gb)


def _k_eri(ref: Reference, co, cv):
    """(ij|ab) exchange-type MO integrals with RSH handling:
    hyb*(ij|ab) + (alpha-hyb)*(ij|ab)_omega."""
    env = ref.env
    out = ref.hyb * mo_eri(env.eri, co, co, cv, cv)
    if ref.omega != 0.0 and abs(ref.alpha - ref.hyb) > 1e-12:
        out = out + (ref.alpha - ref.hyb) * mo_eri(
            env.eri_omega(ref.omega), co, co, cv, cv
        )
    return out


def utda_blocks(ref: Reference):
    """(aa, ab, bb) 4-index tensors of the UKS-TDA coupling matrix
    (no orbital-energy/Fock diagonal terms)."""
    oa, va = ref.orbo_a, ref.orbv_a
    ob, vb = ref.orbo_b, ref.orbv_b
    eri = ref.env.eri
    aa = mo_eri(eri, oa, va, oa, va)
    bb = mo_eri(eri, ob, vb, ob, vb)
    ab = mo_eri(eri, oa, va, ob, vb)
    kaa = _k_eri(ref, oa, va)
    kbb = _k_eri(ref, ob, vb)
    aa -= np.einsum("ijab->iajb", kaa)
    bb -= np.einsum("ijab->iajb", kbb)
    if ref.spec is not None and ref.spec.components:
        rho0 = _rho0(ref)
        faa, fab, fbb = fxc_blocks(
            ref.spec, ref.env.ao, ref.env.grid_weights, rho0, (oa, va), (ob, vb)
        )
        na, nva = oa.shape[1], va.shape[1]
        nb, nvb = ob.shape[1], vb.shape[1]
        aa += faa.reshape(na, nva, na, nva)
        ab += fab.reshape(na, nva, nb, nvb)
        bb += fbb.reshape(nb, nvb, nb, nvb)
    return aa, ab, bb


def tda_singlet_dense(ref: Reference) -> np.ndarray:
    """Closed-shell singlet TDA matrix (nocc*nvir square), orbital-energy
    diagonal included (`xtddft/TDA.py:49-191`)."""
    aa, ab, _ = utda_blocks(ref)
    no_, nv_ = aa.shape[0], aa.shape[1]
    e_occ = np.diag(ref.fock_a_mo)[:no_]
    e_vir = np.diag(ref.fock_a_mo)[no_:]
    e_ia = (e_vir[None, :] - e_occ[:, None]).ravel()
    A = (aa + ab).reshape(no_ * nv_, no_ * nv_)
    return A + np.diag(e_ia)


def tda_triplet_dense(ref: Reference) -> np.ndarray:
    aa, ab, _ = utda_blocks(ref)
    no_, nv_ = aa.shape[0], aa.shape[1]
    e_occ = np.diag(ref.fock_a_mo)[:no_]
    e_vir = np.diag(ref.fock_a_mo)[no_:]
    e_ia = (e_vir[None, :] - e_occ[:, None]).ravel()
    A = (aa - ab).reshape(no_ * nv_, no_ * nv_)
    return A + np.diag(e_ia)


def utda_dense(ref: Reference) -> np.ndarray:
    """Unrestricted TDA in the blocked CV(a)|OV(a)|CO(b)|CV(b) layout with
    Fock diagonal terms (valid for UKS and for ROKS-as-UKS without dA)."""
    return xtda_dense(ref, spin_adapt=False)


def xtda_dense(ref: Reference, spin_adapt: bool = True) -> np.ndarray:
    """Spin-adapted X-TDA dense matrix (`xtddft/XTDA.py:277-398`).

    Layout: CV(aa)[nc*nv] | OV(aa)[no*nv] | CO(bb)[nc*no] | CV(bb)[nc*nv],
    dim = (nc+no)*nv + nc*(no+nv).
    """
    nc, no, nv = ref.nc, ref.no, ref.nv
    fa = ref.fock_a_mo
    fb = ref.fock_b_mo
    aa, ab, bb = utda_blocks(ref)
    # aa: (nc+no, nv, nc+no, nv); ab: (nc+no, nv, nc, no+nv); bb: (nc, no+nv, nc, no+nv)
    dim = (nc + no) * nv + nc * (no + nv)
    A = np.zeros((dim, dim))
    d1 = nc * nv
    d2 = (nc + no) * nv
    d3 = d2 + nc * no
    I_c = np.eye(nc)
    I_o = np.eye(no)
    I_v = np.eye(nv)
    # alpha-space Fock blocks (full MO indexing, c|o|v order)
    faVV = fa[nc + no :, nc + no :]
    faCC = fa[:nc, :nc]
    faCO = fa[:nc, nc : nc + no]
    faOO = fa[nc : nc + no, nc : nc + no]
    fbOO = fb[nc : nc + no, nc : nc + no]
    fbCC = fb[:nc, :nc]
    fbOV = fb[nc : nc + no, nc + no :]
    fbVV = fb[nc + no :, nc + no :]

    # CV(aa)-CV(aa)
    A[:d1, :d1] = (
        np.einsum("ij,ab->iajb", I_c, faVV)
        - np.einsum("ij,ab->iajb", faCC, I_v)
        + aa[:nc, :, :nc, :]
    ).reshape(d1, d1)
    # CV(aa)-OV(aa)
    blk = (
        -np.einsum("ij,ab->iajb", faCO, I_v) + aa[:nc, :, nc : nc + no, :]
    ).reshape(d1, no * nv)
    A[:d1, d1:d2] = blk
    A[d1:d2, :d1] = blk.T
    # CV(aa)-CO(bb)
    blk = ab[:nc, :, :, :no].reshape(d1, nc * no)
    A[:d1, d2:d3] = blk
    A[d2:d3, :d1] = blk.T
    # CV(aa)-CV(bb)
    cvaacvbb = ab[:nc, :, :, no:].reshape(d1, nc * nv)
    # OV(aa)-OV(aa)
    A[d1:d2, d1:d2] = (
        np.einsum("ij,ab->iajb", I_o, faVV)
        - np.einsum("ij,ab->iajb", faOO, I_v)
        + aa[nc : nc + no, :, nc : nc + no, :]
    ).reshape(no * nv, no * nv)
    # OV(aa)-CO(bb)
    blk = ab[nc : nc + no, :, :, :no].reshape(no * nv, nc * no)
    A[d1:d2, d2:d3] = blk
    A[d2:d3, d1:d2] = blk.T
    # OV(aa)-CV(bb)
    blk = ab[nc : nc + no, :, :, no:].reshape(no * nv, nc * nv)
    A[d1:d2, d3:] = blk
    A[d3:, d1:d2] = blk.T
    # CO(bb)-CO(bb)
    A[d2:d3, d2:d3] = (
        np.einsum("ij,ab->iajb", I_c, fbOO)
        - np.einsum("ij,ab->iajb", fbCC, I_o)
        + bb[:, :no, :, :no]
    ).reshape(nc * no, nc * no)
    # CO(bb)-CV(bb)
    blk = (
        np.einsum("ij,ab->iajb", I_c, fbOV) + bb[:, :no, :, no:]
    ).reshape(nc * no, nc * nv)
    A[d2:d3, d3:] = blk
    A[d3:, d2:d3] = blk.T
    # CV(bb)-CV(bb)
    A[d3:, d3:] = (
        np.einsum("ij,ab->iajb", I_c, fbVV)
        - np.einsum("ij,ab->iajb", fbCC, I_v)
        + bb[:, no:, :, no:]
    ).reshape(nc * nv, nc * nv)

    if spin_adapt and ref.restricted_open and no > 0:
        si = 0.5 * no
        fahf = ref.fock_a_hf_mo
        fbhf = ref.fock_b_hf_mo
        dFV = fbhf[nc + no :, nc + no :] - fahf[nc + no :, nc + no :]
        dFC = fbhf[:nc, :nc] - fahf[:nc, :nc]
        f1 = 0.5 * (1.0 - np.sqrt((si + 1.0) / si) + 1.0 / (2.0 * si))
        f2 = 0.5 * (-1.0 + np.sqrt((si + 1.0) / si) + 1.0 / (2.0 * si))
        dA_aa = (
            f1 * np.einsum("ij,ab->iajb", I_c, dFV)
            + f2 * np.einsum("ij,ab->iajb", dFC, I_v)
        ).reshape(d1, d1)
        dA_bb = (
            f2 * np.einsum("ij,ab->iajb", I_c, dFV)
            + f1 * np.einsum("ij,ab->iajb", dFC, I_v)
        ).reshape(d1, d1)
        dA_x = (
            -0.5
            / (2.0 * si)
            * (
                np.einsum("ij,ab->iajb", I_c, dFV)
                + np.einsum("ij,ab->iajb", dFC, I_v)
            )
        ).reshape(d1, d1)
        A[:d1, :d1] += dA_aa
        A[d3:, d3:] += dA_bb
        cvaacvbb = cvaacvbb + dA_x
    A[:d1, d3:] = cvaacvbb
    A[d3:, :d1] = cvaacvbb.T
    return A


# ---------------------------------------------------------------- spin flip

def _sf_fxc_tensor(ref: Reference, orb_o, orb_v):
    """ALDA0 SF kernel tensor f_{ia,jb} = sum_g w fxc_sf rho_ia rho_jb with
    rho_ia = phi_i^(occ-spin) phi_a^(vir-spin)."""
    ao = ref.env.ao
    rho0 = _rho0(ref)
    fw = sf_kernel_alda0(ref.spec, ref.env.grid_weights, rho0)
    po = jnp.einsum("gp,pi->gi", ao[0], jnp.asarray(orb_o))
    pv = jnp.einsum("gp,pa->ga", ao[0], jnp.asarray(orb_v))
    rov = jnp.einsum("gi,ga->gia", po, pv)
    t = jnp.einsum("gia,g,gjb->iajb", rov, fw, rov, optimize=True)
    return np.asarray(t)


def sf_coupling_tensor(ref: Reference, extype: str, method: int = 0):
    """SF coupling a^{sf}_{ia,jb}: -K + SF xc kernel.

    method: 0 = ALDA0 (noncollinear LDA-limit), 1 = multicollinear,
    2 = collinear (HF exchange only), `xtddft/SF_TDA.py:19`.
    extype='down': i,j alpha-occ; a,b beta-vir.  extype='up': i,j beta-occ;
    a,b alpha-vir.  No Coulomb J in spin-flip channels
    (`xtddft/SF_TDA.py:269-271`).
    """
    if extype == "down":
        co, cv = ref.orbo_a, ref.orbv_b
    else:
        co, cv = ref.orbo_b, ref.orbv_a
    k = _k_eri(ref, co, cv)
    a = -np.einsum("ijab->iajb", k)
    if ref.spec is not None and ref.spec.components:
        if method == 0:
            a = a + _sf_fxc_tensor(ref, co, cv)
        elif method == 1:
            from xtddft_tpu.xc.mcol import sf_kernel_mcol, sf_mcol_tensor

            fxcH = sf_kernel_mcol(
                ref.spec, ref.env.grid_weights, _rho0(ref)
            )
            a = a + np.asarray(sf_mcol_tensor(fxcH, ref.env.ao, co, cv))
    return a


def sf_up_dense(ref: Reference, method: int = 0) -> np.ndarray:
    """SF-TDA-up CV(b->a) dense matrix, (nc*nv)^2 (`xtddft/SF_TDA.py:448-560`)."""
    nc, no, nv = ref.nc, ref.no, ref.nv
    a = sf_coupling_tensor(ref, "up", method)  # (nc, nv, nc, nv)
    fa = ref.fock_a_mo
    fb = ref.fock_b_mo
    faVV = fa[nc + no :, nc + no :]
    fbCC = fb[:nc, :nc]
    A = (
        np.einsum("ij,ab->iajb", np.eye(nc), faVV)
        - np.einsum("ij,ab->iajb", fbCC, np.eye(nv))
        + a
    )
    return A.reshape(nc * nv, nc * nv)


def sf_down_dense(ref: Reference, method: int = 0) -> np.ndarray:
    """SF-TDA-down dense matrix in CV|CO|OV|OO layout,
    dim = (nc+no)(nv+no) (`xtddft/SF_TDA.py:624-804`)."""
    nc, no, nv = ref.nc, ref.no, ref.nv
    a = sf_coupling_tensor(ref, "down", method)  # (nc+no, no+nv, nc+no, no+nv)
    fa = ref.fock_a_mo
    fb = ref.fock_b_mo
    I_c, I_o, I_v = np.eye(nc), np.eye(no), np.eye(nv)
    faC = fa[:nc, :nc]
    faO = fa[nc : nc + no, nc : nc + no]
    fbO = fb[nc : nc + no, nc : nc + no]
    fbV = fb[nc + no :, nc + no :]
    faOC = fa[nc : nc + no, :nc]
    fbVO = fb[nc + no :, nc : nc + no]
    dim = (nc + no) * (nv + no)
    d1 = nc * nv
    d2 = d1 + nc * no
    d3 = d2 + no * nv
    A = np.zeros((dim, dim))
    # CV-CV
    A[:d1, :d1] = (
        np.einsum("ij,ab->iajb", I_c, fbV)
        - np.einsum("ji,ab->iajb", faC, I_v)
        + a[:nc, no:, :nc, no:]
    ).reshape(d1, d1)
    # CO-CO
    A[d1:d2, d1:d2] = (
        np.einsum("ij,xy->ixjy", I_c, fbO)
        - np.einsum("ji,xy->ixjy", faC, I_o)
        + a[:nc, :no, :nc, :no]
    ).reshape(nc * no, nc * no)
    # OV-OV
    A[d2:d3, d2:d3] = (
        np.einsum("xy,ab->xayb", I_o, fbV)
        - np.einsum("yx,ab->xayb", faO, I_v)
        + a[nc:, no:, nc:, no:]
    ).reshape(no * nv, no * nv)
    # OO-OO
    A[d3:, d3:] = (
        np.einsum("uv,tw->utvw", I_o, fbO)
        - np.einsum("vu,tw->utvw", faO, I_o)
        + a[nc : nc + no, :no, nc : nc + no, :no]
    ).reshape(no * no, no * no)
    # CV-CO
    blk = (
        np.einsum("ij,ay->iajy", I_c, fbVO) + a[:nc, no:, :nc, :no]
    ).reshape(d1, nc * no)
    A[:d1, d1:d2] = blk
    A[d1:d2, :d1] = blk.T
    # CV-OV
    blk = (
        -np.einsum("yi,ab->iayb", faOC, I_v) + a[:nc, no:, nc : nc + no, no:]
    ).reshape(d1, no * nv)
    A[:d1, d2:d3] = blk
    A[d2:d3, :d1] = blk.T
    # CO-OV
    blk = a[:nc, :no, nc : nc + no, no:].reshape(nc * no, no * nv)
    A[d1:d2, d2:d3] = blk
    A[d2:d3, d1:d2] = blk.T
    # CV-OO
    blk = a[:nc, no:, nc : nc + no, :no].reshape(d1, no * no)
    A[:d1, d3:] = blk
    A[d3:, :d1] = blk.T
    # CO-OO
    blk = (
        -np.einsum("yi,WZ->iWyZ", faOC, I_o) + a[:nc, :no, nc : nc + no, :no]
    ).reshape(nc * no, no * no)
    A[d1:d2, d3:] = blk
    A[d3:, d1:d2] = blk.T
    # OV-OO
    blk = (
        np.einsum("yx,aZ->xayZ", I_o, fbVO) + a[nc:, no:, nc:, :no]
    ).reshape(no * nv, no * no)
    A[d2:d3, d3:] = blk
    A[d3:, d2:d3] = blk.T
    return A


def xsf_delta_a(ref: Reference, SA: int = 3, foo: float = 1.0) -> np.ndarray:
    """Spin-adaptation correction dA for XSF-TDA
    (`xtddft/XSF_TDA.py:341-390`), in the CV|CO|OV|OO layout.

    Only defined for restricted-open references; SA semantics:
    0 = none, 1 = diagonal blocks only, 2 = + off-diagonal except OO,
    3 = full (default for ROKS).
    """
    nc, no, nv = ref.nc, ref.no, ref.nv
    dim = (nc + no) * (nv + no)
    dA = np.zeros((dim, dim))
    if SA == 0 or not ref.restricted_open or no == 0:
        return dA
    si = 0.5 * no
    fahf = ref.fock_a_hf_mo
    fbhf = ref.fock_b_hf_mo
    fockS = 0.5 * (fbhf - fahf)
    fS_C = fockS[:nc, :nc]
    fS_V = fockS[nc + no :, nc + no :]
    fS_CV = fockS[:nc, nc + no :]
    I_c, I_o, I_v = np.eye(nc), np.eye(no), np.eye(nv)
    mo = ref.mo_a
    eri = mo_eri(ref.env.eri, mo, mo, mo, mo)
    d1 = nc * nv
    d2 = d1 + nc * no
    d3 = d2 + no * nv
    C = slice(0, nc)
    O = slice(nc, nc + no)
    V = slice(nc + no, None)

    # diagonal blocks (SA >= 1)
    dA[:d1, :d1] += (
        (
            np.einsum("ij,ab->iajb", I_c, fS_V)
            + np.einsum("ji,ab->iajb", fS_C, I_v)
        )
        / si
    ).reshape(d1, d1)
    dA[d1:d2, d1:d2] += (
        np.einsum("ji,uv->iujv", fS_C, I_o) * 2.0 / (2 * si - 1)
        - np.einsum("uijv->iujv", eri[O, C, C, O]) / (2 * si - 1)
    ).reshape(nc * no, nc * no)
    dA[d2:d3, d2:d3] += (
        np.einsum("uv,ab->uavb", I_o, fS_V) * 2.0 / (2 * si - 1)
        - np.einsum("auvb->uavb", eri[V, O, O, V]) / (2 * si - 1)
    ).reshape(no * nv, no * nv)

    if SA > 1:
        fbhf_VO = fbhf[nc + no :, nc : nc + no]
        fahf_CO = fahf[:nc, nc : nc + no]
        c1 = np.sqrt(1.0 + 1.0 / (2 * si)) - 1.0
        blk = (
            c1
            * (
                np.einsum("ij,av->iajv", I_c, fbhf_VO)
                - np.einsum("avji->iajv", eri[V, O, C, C])
            )
        ).reshape(d1, nc * no)
        dA[:d1, d1:d2] += blk
        dA[d1:d2, :d1] += blk.T
        blk = (
            c1
            * (
                -np.einsum("iv,ab->iavb", fahf_CO, I_v)
                - np.einsum("abvi->iavb", eri[V, V, O, C])
            )
        ).reshape(d1, no * nv)
        dA[:d1, d2:d3] += blk
        dA[d2:d3, :d1] += blk.T
        blk = (
            (1.0 / (2 * si - 1))
            * (
                np.einsum("uivb->iuvb", eri[O, C, O, V])
                - np.einsum("ubvi->iuvb", eri[O, V, O, C])
            )
        ).reshape(nc * no, no * nv)
        dA[d1:d2, d2:d3] += blk
        dA[d2:d3, d1:d2] += blk.T

    if SA > 2:
        factor = np.sqrt((2 * si + 1) / (2 * si - 1))
        c2 = np.sqrt(2 * si / (2 * si - 1)) - 1.0
        c3 = 1.0 / np.sqrt(2 * si * (2 * si - 1))
        blk = (
            -(factor - 1.0) * np.einsum("avwi->iawv", eri[V, O, O, C])
            + (1.0 / si) * factor * np.einsum("ia,wv->iawv", fS_CV, I_o)
        ).reshape(d1, no * no)
        dA[:d1, d3:] += foo * blk
        dA[d3:, :d1] += foo * blk.T
        fahf_OC = fahf[nc : nc + no, :nc]
        fbhf_CO = fbhf[:nc, nc : nc + no]
        blk = (
            c2
            * (
                -np.einsum("wi,uv->iuwv", fahf_OC, I_o)
                - np.einsum("uvwi->iuwv", eri[O, O, O, C])
            )
            + c3 * np.einsum("iu,wv->iuwv", fbhf_CO, I_o)
        ).reshape(nc * no, no * no)
        dA[d1:d2, d3:] += foo * blk
        dA[d3:, d1:d2] += foo * blk.T
        fbhf_VO2 = fbhf[nc + no :, nc : nc + no]
        fahf_OV = fahf[nc : nc + no, nc + no :]
        blk = (
            c2
            * (
                np.einsum("wu,av->uawv", I_o, fbhf_VO2)
                - np.einsum("avwu->uawv", eri[V, O, O, O])
            )
            - c3 * np.einsum("ua,wv->uawv", fahf_OV, I_o)
        ).reshape(no * nv, no * no)
        dA[d2:d3, d3:] += foo * blk
        dA[d3:, d2:d3] += foo * blk.T
    return dA


def xsf_dense(
    ref: Reference,
    SA: int = 3,
    foo: float = 1.0,
    fglobal: float = 1.0,
    method: int = 0,
    remove: bool = True,
):
    """XSF-TDA dense matrix = SF-down + fglobal * dA, optionally with the
    Sf=Si contaminant projected out of the OO block
    (`xtddft/XSF_TDA.py:393,416-427`).  Returns (A, vects) where vects is
    the OO projector (None if not removed)."""
    A = sf_down_dense(ref, method) + fglobal * xsf_delta_a(ref, SA, foo)
    if not remove or ref.no == 0 or not ref.restricted_open:
        return A, None
    nc, no, nv = ref.nc, ref.no, ref.nv
    d3 = nc * nv + nc * no + no * nv
    vects = sf_oo_projector(no)
    dim = A.shape[0]
    Ar = np.zeros((dim - 1, dim - 1))
    Ar[:d3, :d3] = A[:d3, :d3]
    Ar[:d3, d3:] = A[:d3, d3:] @ vects
    Ar[d3:, :d3] = vects.T @ A[d3:, :d3]
    Ar[d3:, d3:] = vects.T @ A[d3:, d3:] @ vects
    return Ar, vects
