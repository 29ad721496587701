"""Matrix-free batched sigma operators (the Davidson hot path).

Each operator packages a jit-compiled ``matvec(Z) -> AZ`` over stacked
trial vectors — one device round trip per Davidson iteration.  The math
mirrors the reference's `vind` closures:

- spin-conserving (UTDA/XTDA): `xtddft/XTDA.py:558-692`
- spin-flip (SF/XSF): `xtddft/SF_TDA.py:162-244`, `xtddft/XSF_TDA.py:1029-1290`

but is expressed as pure jitted functions over device-resident tensors
(in-core ERIs for now; the DF/Pallas J/K path slots in behind the same
interface).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xtddft_tpu.response.reference_state import Reference
from xtddft_tpu.xc import interface as xci


def _rho0_jnp(ref: Reference, tau: bool = False):
    """Ground-state grid densities; tau=True appends (ta, tb) for MGGA
    specs (the multicollinear SF kernel consumes the 6-tuple)."""
    mgga = ref.spec is not None and ref.spec.needs_tau
    if mgga and not tau:
        raise NotImplementedError(
            "MGGA reference: this rho0 consumer has no tau channel — "
            "request the 6-tuple with tau=True (dense fxc_tensor, "
            "in-core fxc_v1mat, and the DF MO-grid fxc all carry tau)")
    ao = ref.env.ao
    da = jnp.asarray(ref.orbo_a @ ref.orbo_a.T)
    db = jnp.asarray(ref.orbo_b @ ref.orbo_b.T)
    if mgga:
        ra, ga, ta = xci.cache_rho(ao, da, tau=True)
        rb, gb, tb = xci.cache_rho(ao, db, tau=True)
        return (ra, rb, ga, gb, ta, tb)
    ra, ga = xci.cache_rho(ao, da)
    rb, gb = xci.cache_rho(ao, db)
    return (ra, rb, ga, gb)


@dataclasses.dataclass
class SigmaOperator:
    """Note: the fulljit solver cache keys on ``matvec_raw``'s function
    identity — reuse one SigmaOperator object across solves of the same
    problem, or each fresh operator recompiles the fused solver."""

    matvec: callable  # (n, dim) -> (n, dim)
    hdiag: np.ndarray
    dim: int
    _to_blocked: callable | None = None
    # pure form for fully-jitted solvers: matvec_raw(consts, z) with all
    # device tensors passed as arguments (never closure-captured)
    matvec_raw: callable | None = None
    consts: object | None = None

    def init_guess(self, nstates: int, spread: float = 1e-3) -> np.ndarray:
        """Koopmans guess: unit vectors on the lowest diagonal gaps
        (`xtddft/XTDA.py:700-734`)."""
        n = min(nstates, self.dim)
        thresh = np.partition(self.hdiag, n - 1)[n - 1] + spread
        idx = np.where(self.hdiag <= thresh)[0]
        x0 = np.zeros((idx.size, self.dim))
        x0[np.arange(idx.size), idx] = 1.0
        return x0

    def to_blocked(self, v: np.ndarray) -> np.ndarray:
        return v if self._to_blocked is None else self._to_blocked(v)


# ------------------------------------------------------- spin-conserving

def _uks_vresp_consts(ref: Reference) -> dict:
    """Device tensors of the UKS response, as a pytree to pass through
    jit arguments (closure-capturing them bakes multi-GB constants into
    the HLO and triggers minutes-long XLA constant folding per compiled
    shape — the TPU anti-pattern tracked in GAPS.md)."""
    env = ref.env
    consts = {"eri": env.eri}
    if ref.omega != 0 and abs(ref.alpha - ref.hyb) > 1e-12:
        consts["eri_w"] = env.eri_omega(ref.omega)
    if ref.spec is not None and bool(ref.spec.components):
        consts["ao"] = env.ao
        consts["w"] = env.grid_weights
        # MGGA: the 6-tuple rho0 routes fxc_v1mat through its tau branch
        # (the in-core response is fully MGGA-capable; only the DF
        # MO-grid factorization still lacks the tau channel)
        consts["rho0"] = _rho0_jnp(ref, tau=ref.spec.needs_tau)
    return consts


def _uks_vresp_raw(spec, hyb: float, alpha: float, consts: dict, dms):
    """Pure UKS response: dms (n,2,nao,nao) -> v1ao (n,2,nao,nao).
    J + fxc - hyb*K (+ RSH correction), hermi=0 (`xtddft/XTDA.py:482-556`)."""
    eri = consts["eri"]
    dmtot = dms[:, 0] + dms[:, 1]
    vj = jnp.einsum("pqrs,xsr->xpq", eri, dmtot)
    v1 = jnp.stack([vj, vj], axis=1)
    if "ao" in consts:
        v1 = v1 + xci.fxc_v1mat(spec, consts["ao"], consts["w"],
                                consts["rho0"], dms, hermi=False)
    if hyb != 0.0 or "eri_w" in consts:
        flat = dms.reshape(-1, *dms.shape[2:])
        vk = hyb * jnp.einsum("prsq,xrs->xpq", eri, flat).reshape(dms.shape)
        if "eri_w" in consts:
            vk = vk + (alpha - hyb) * jnp.einsum(
                "prsq,xrs->xpq", consts["eri_w"], flat
            ).reshape(dms.shape)
        v1 = v1 - vk
    return v1


def make_uks_vresp(ref: Reference):
    """Closure convenience wrapper over `_uks_vresp_raw` (host-side use)."""
    consts = _uks_vresp_consts(ref)
    spec, hyb, alpha = ref.spec, ref.hyb, ref.alpha
    return lambda dms: _uks_vresp_raw(spec, hyb, alpha, consts, dms)


def spin_conserving_sigma(ref: Reference, spin_adapt: bool | None = None) -> SigmaOperator:
    """Batched sigma for UTDA (spin_adapt=False) / X-TDA (ROKS, dA on).

    Vector layout: [ z_alpha (nocc_a*nvir_a) | z_beta (nocc_b*nvir_b) ]
    with z_beta row-major over (C, [O,V]) — the 'interleaved' layout; use
    `to_blocked` for the CV|OV|CO|CV property layout.
    """
    if spin_adapt is None:
        spin_adapt = ref.restricted_open
    nc, no, nv = ref.nc, ref.no, ref.nv
    nocca, nvira = ref.nocc_a, ref.nvir_a
    noccb, nvirb = ref.nocc_b, ref.nvir_b
    na = nocca * nvira
    dim = na + noccb * nvirb
    spec, hyb, alpha = ref.spec, ref.hyb, ref.alpha

    consts = _uks_vresp_consts(ref)
    consts.update(
        oa=jnp.asarray(ref.orbo_a), vaa=jnp.asarray(ref.orbv_a),
        ob=jnp.asarray(ref.orbo_b), vbb=jnp.asarray(ref.orbv_b),
        fa=jnp.asarray(ref.fock_a_mo), fb=jnp.asarray(ref.fock_b_mo),
    )
    dA = spin_adapt and ref.restricted_open and no > 0
    if dA:
        si = 0.5 * no
        fahf = jnp.asarray(ref.fock_a_hf_mo)
        fbhf = jnp.asarray(ref.fock_b_hf_mo)
        consts["dFV"] = (fbhf[nc + no :, nc + no :]
                         - fahf[nc + no :, nc + no :])
        consts["dFC"] = fbhf[:nc, :nc] - fahf[:nc, :nc]
        f1 = 0.5 * (1.0 - np.sqrt((si + 1) / si) + 1.0 / (2 * si))
        f2 = 0.5 * (-1.0 + np.sqrt((si + 1) / si) + 1.0 / (2 * si))
        fx = 0.5 / (2.0 * si)

    def matvec_raw(consts, zs):
        oa, vaa = consts["oa"], consts["vaa"]
        ob, vbb = consts["ob"], consts["vbb"]
        fa, fb = consts["fa"], consts["fb"]
        zs = jnp.asarray(zs)
        za = zs[:, :na].reshape(-1, nocca, nvira)
        zb = zs[:, na:].reshape(-1, noccb, nvirb)
        dma = jnp.einsum("xov,pv,qo->xpq", za, vaa, oa)
        dmb = jnp.einsum("xov,pv,qo->xpq", zb, vbb, ob)
        v1ao = _uks_vresp_raw(spec, hyb, alpha, consts,
                              jnp.stack([dma, dmb], axis=1))
        v1a = jnp.einsum("xpq,qo,pv->xov", v1ao[:, 0], oa, vaa)
        v1b = jnp.einsum("xpq,qo,pv->xov", v1ao[:, 1], ob, vbb)
        # Fock couplings (ROKS orbitals are not canonical per spin)
        v1a = v1a + jnp.einsum("xib,ab->xia", za, fa[nocca:, nocca:]) - jnp.einsum(
            "xja,ij->xia", za, fa[:nocca, :nocca]
        )
        v1b = v1b + jnp.einsum("xib,ab->xia", zb, fb[noccb:, noccb:]) - jnp.einsum(
            "xja,ij->xia", zb, fb[:noccb, :noccb]
        )
        if dA:
            dFV, dFC = consts["dFV"], consts["dFC"]
            zac = za[:, :noccb, :]
            zbv = zb[:, :, -nvira:]
            coup_a = f1 * jnp.einsum("xib,ab->xia", zac, dFV) + f2 * jnp.einsum(
                "xja,ij->xia", zac, dFC
            )
            cross_b = fx * (
                jnp.einsum("xib,ab->xia", zbv, dFV)
                + jnp.einsum("xja,ij->xia", zbv, dFC)
            )
            coup_b = f2 * jnp.einsum("xib,ab->xia", zbv, dFV) + f1 * jnp.einsum(
                "xja,ij->xia", zbv, dFC
            )
            cross_a = fx * (
                jnp.einsum("xib,ab->xia", zac, dFV)
                + jnp.einsum("xja,ij->xia", zac, dFC)
            )
            v1a = v1a.at[:, :noccb, :].add(coup_a - cross_b)
            v1b = v1b.at[:, :, -nvira:].add(coup_b - cross_a)
        return jnp.concatenate(
            [v1a.reshape(zs.shape[0], -1), v1b.reshape(zs.shape[0], -1)], axis=1
        )

    jitted = jax.jit(matvec_raw)

    def matvec(zs):
        return jitted(consts, zs)

    e_ia_a = (
        np.diag(ref.fock_a_mo)[nocca:][None, :] - np.diag(ref.fock_a_mo)[:nocca][:, None]
    ).ravel()
    e_ia_b = (
        np.diag(ref.fock_b_mo)[noccb:][None, :] - np.diag(ref.fock_b_mo)[:noccb][:, None]
    ).ravel()
    hdiag = np.concatenate([e_ia_a, e_ia_b])

    def to_blocked(v):
        # beta interleaved (C rows x [O,V] cols) -> CO | CV blocks
        top = v[:na]
        beta = v[na:].reshape(noccb, nvirb, -1)
        co = beta[:, :no].reshape(noccb * no, -1)
        cv = beta[:, no:].reshape(noccb * nv, -1)
        return np.concatenate([top, co, cv], axis=0)

    return SigmaOperator(matvec=matvec, hdiag=hdiag, dim=dim,
                         _to_blocked=to_blocked, matvec_raw=matvec_raw,
                         consts=consts)


def xtda_sigma_operator(ref: Reference) -> SigmaOperator:
    return spin_conserving_sigma(ref, spin_adapt=True)


def utda_sigma_operator(ref: Reference) -> SigmaOperator:
    return spin_conserving_sigma(ref, spin_adapt=False)


# ------------------------------------------------------------- spin-flip

def _sf_vresp_consts(ref: Reference, method: int = 0) -> dict:
    """Device tensors for the SF response (args-pytree form; see
    `_uks_vresp_consts` for why closure capture is avoided)."""
    env = ref.env
    consts = {"eri": env.eri}
    if ref.omega != 0 and abs(ref.alpha - ref.hyb) > 1e-12:
        consts["eri_w"] = env.eri_omega(ref.omega)
    if method in (0, 1) and ref.spec is not None and bool(ref.spec.components):
        consts["ao"] = env.ao
        if method == 0:
            consts["fw"] = xci.sf_kernel_alda0(
                ref.spec, env.grid_weights, _rho0_jnp(ref))
        else:
            from xtddft_tpu.xc.mcol import sf_kernel_mcol

            consts["fH"] = sf_kernel_mcol(
                ref.spec, env.grid_weights,
                _rho0_jnp(ref, tau=ref.spec.needs_tau))
    return consts


def _sf_vresp_raw(hyb: float, alpha: float, consts: dict, dms):
    """Pure SF response: dms (n,nao,nao) (alpha->beta transition
    densities) -> v1ao; ALDA0 kernel ('fw'), multicollinear ('fH'), or
    collinear/HF-only; no J (`xtddft/SF_TDA.py:246-286`)."""
    v1 = jnp.zeros_like(dms)
    if "fw" in consts:
        v1 = v1 + xci.sf_v1mat(consts["ao"], consts["fw"], dms)
    elif "fH" in consts:
        from xtddft_tpu.xc.mcol import sf_v1mat_mcol

        v1 = v1 + sf_v1mat_mcol(consts["ao"], consts["fH"], dms)
    if hyb != 0.0 or "eri_w" in consts:
        vk = hyb * jnp.einsum("prsq,xrs->xpq", consts["eri"], dms)
        if "eri_w" in consts:
            vk = vk + (alpha - hyb) * jnp.einsum(
                "prsq,xrs->xpq", consts["eri_w"], dms)
        v1 = v1 - vk
    return v1


def make_sf_vresp(ref: Reference, method: int = 0):
    """Closure convenience wrapper over `_sf_vresp_raw` (host-side use)."""
    consts = _sf_vresp_consts(ref, method)
    hyb, alpha = ref.hyb, ref.alpha
    return lambda dms: _sf_vresp_raw(hyb, alpha, consts, dms)


def sf_sigma_operator(ref: Reference, extype: str = "down", method: int = 0) -> SigmaOperator:
    """Plain SF-TDA sigma over the full (occ, vir) space.

    'down': z (nocc_a, nvir_b) row-major over (C∪O, [O,V]);
    'up':   z (nocc_b, nvir_a).
    """
    nc, no, nv = ref.nc, ref.no, ref.nv
    if extype == "down":
        n_o, n_v = ref.nocc_a, ref.nvir_b
        orbo = jnp.asarray(ref.orbo_a)
        orbv = jnp.asarray(ref.orbv_b)
        f_occ = jnp.asarray(ref.fock_a_mo[: ref.nocc_a, : ref.nocc_a])
        f_vir = jnp.asarray(ref.fock_b_mo[ref.nocc_b :, ref.nocc_b :])
        e_occ = np.diag(ref.fock_a_mo)[: ref.nocc_a]
        e_vir = np.diag(ref.fock_b_mo)[ref.nocc_b :]
    else:
        n_o, n_v = ref.nocc_b, ref.nvir_a
        orbo = jnp.asarray(ref.orbo_b)
        orbv = jnp.asarray(ref.orbv_a)
        f_occ = jnp.asarray(ref.fock_b_mo[: ref.nocc_b, : ref.nocc_b])
        f_vir = jnp.asarray(ref.fock_a_mo[ref.nocc_a :, ref.nocc_a :])
        e_occ = np.diag(ref.fock_b_mo)[: ref.nocc_b]
        e_vir = np.diag(ref.fock_a_mo)[ref.nocc_a :]
    dim = n_o * n_v
    hyb, alpha = ref.hyb, ref.alpha
    consts = _sf_vresp_consts(ref, method)
    consts.update(orbo=orbo, orbv=orbv, f_occ=f_occ, f_vir=f_vir)

    def matvec_raw(consts, zs):
        orbo, orbv = consts["orbo"], consts["orbv"]
        zs = jnp.asarray(zs).reshape(-1, n_o, n_v)
        dms = jnp.einsum("xov,qv,po->xpq", zs, orbv, orbo)
        v1ao = _sf_vresp_raw(hyb, alpha, consts, dms)
        vs = jnp.einsum("xpq,po,qv->xov", v1ao, orbo, orbv)
        vs = vs + jnp.einsum("ab,xib->xia", consts["f_vir"], zs) - jnp.einsum(
            "ij,xja->xia", consts["f_occ"], zs
        )
        return vs.reshape(zs.shape[0], -1)

    jitted = jax.jit(matvec_raw)

    def matvec(zs):
        return jitted(consts, zs)

    hdiag = (e_vir[None, :] - e_occ[:, None]).ravel()

    def to_blocked(v):
        # (C∪O rows x [O,V] cols) row-major -> CV | CO | OV | OO
        z = v.reshape(n_o, n_v, -1)
        cv = z[:nc, no:].reshape(nc * nv, -1)
        co = z[:nc, :no].reshape(nc * no, -1)
        ov = z[nc:, no:].reshape(no * nv, -1)
        oo = z[nc:, :no].reshape(no * no, -1)
        return np.concatenate([cv, co, ov, oo], axis=0)

    return SigmaOperator(
        matvec=matvec, hdiag=hdiag, dim=dim,
        _to_blocked=to_blocked if extype == "down" else None,
        matvec_raw=matvec_raw, consts=consts,
    )
