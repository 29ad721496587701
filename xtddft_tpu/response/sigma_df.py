"""Density-fitted MO-basis sigma operators (the large-Nbf TPU path).

The reference's Davidson hot loop rebuilds J/K from AO-direct libcint
integrals every iteration (`mf.get_jk` inside `vind`, `xtddft/XTDA.py:
520-543`) — infeasible to translate at Nbf~1000 (nao^4 ERIs are TBs).
The TPU-native answer (SURVEY.md §7 hard part 2) is density fitting with
an even-tempered AutoAux basis: one (P|mu nu) build at setup, then every
sigma build is a handful of MXU matmuls over the fitted MO tensor

    B[P, p, q]  (metric^{-1/2}-dressed),

    J:  t_P   = B[P,ov] . z          ;  v += B[ov,P] . t_P
    K:  T[P,o,v'] = B_vv[P,v',v] z_ov;  v -= B_oo[P,o,o'] T[P,o,v']

with cost O(naux * nocc * nvir * nmo * batch) per Davidson iteration —
linear in naux instead of quartic in nao.  The fxc quadrature is factored
through MO values on the grid (no AO-basis density matrices are ever
formed), so HBM holds only B (optionally bf16 with f32 accumulation),
the MO grid table, and the trial vectors.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from xtddft_tpu.response.reference_state import Reference
from xtddft_tpu.response.sigma import SigmaOperator
from xtddft_tpu.xc import interface as xci
from xtddft_tpu.xc.registry import XCSpec


@dataclasses.dataclass
class DFData:
    """Everything the DF sigma path needs, device-resident.

    B: (naux, nmo, nmo) fitted MO integrals, metric-dressed so that
       (pq|rs) ~= sum_P B[P,p,q] B[P,r,s].
    phi: (4, ngrid, nmo) MO values+gradients on the DFT grid (None for
       hybrid-only references).
    """

    nc: int
    no: int
    nv: int
    B: jnp.ndarray
    fock_mo: np.ndarray  # (2, nmo, nmo) alpha/beta MO Fock
    hyb: float
    spec: XCSpec | None = None
    phi: jnp.ndarray | None = None
    grid_w: jnp.ndarray | None = None
    rho0: tuple | None = None
    fock_hf_mo: np.ndarray | None = None  # (2, nmo, nmo) for dA
    # RSH: long-range (erf-attenuated) fitted MO tensor and the K
    # coefficient (alpha - hyb) it enters with (`xtddft/XTDA.py:94-99`)
    B_lr: jnp.ndarray | None = None
    hyb_lr: float = 0.0
    # genuinely-unrestricted (UHF/UKS) references carry beta-MO
    # transforms of the same AO tensors; None means the beta spatial
    # orbitals equal the alpha ones (R/RO references) and `B`/`phi`
    # serve both spins
    B_b: jnp.ndarray | None = None
    B_lr_b: jnp.ndarray | None = None
    phi_b: jnp.ndarray | None = None
    # packed-symmetric B: (naux, nmo*(nmo+1)/2) lower pair triangle —
    # exact f32 at half the HBM, the storage that fits TTM-1Cz/dzp
    # (862 AO) on a 16 GB v5e.  The sigma unpacks per aux chunk
    # (`scf/df_build.pack_indices`); the aux axis may be zero-row padded
    # by the packed builder (dressed zero rows contribute nothing).
    packed: bool = False

    @property
    def nmo(self):
        return self.fock_mo.shape[-1]


def _aux_chunk(naux, nz, nocc, nvir, budget=None, unpack_cols=0):
    """Largest divisor of naux keeping the K chunk intermediate
    (nz*chunk*nocc*nvir elements) under budget; with packed B the
    chunk's unpacked/gathered (chunk, unpack_cols) buffer is capped at
    ~256 MB (the packed builder zero-pads naux to a multiple of 256, so
    power-of-2-ish divisors exist).

    budget defaults to 1.5e8 elements, overridable via
    XTDDFT_AUX_BUDGET (elements) — the profiling knob for the
    HBM-residency / loop-overhead trade at production sizes."""
    if budget is None:
        import os

        budget = float(os.environ.get("XTDDFT_AUX_BUDGET", 1.5e8))
    target = int(max(1, budget // max(1, nz * nocc * nvir)))
    if unpack_cols:
        target = min(target, max(1, int(6.4e7 // unpack_cols)))
    for c in range(min(target, naux), 0, -1):
        if naux % c == 0:
            return c
    return 1


def _mo_transform(B_ao, mo) -> jnp.ndarray:
    """(naux, nao, nao) -> (naux, nmo, nmo), batched over aux on device."""
    mo_d = jnp.asarray(mo)

    @jax.jit
    def one(b):
        return mo_d.T @ b @ mo_d

    return jax.lax.map(one, jnp.asarray(B_ao), batch_size=64)


def build_df_data(ref: Reference, beta: float | None = None) -> DFData:
    """Real-molecule DF data from a converged Reference (AutoAux fit).

    Reuses the Env's cached B tensor when the Env is in DF mode (so the
    SCF and the response share one fit); RSH references get a second
    erf-attenuated B tensor for the long-range K term."""
    from xtddft_tpu.scf.env import Env

    env = ref.env
    if beta is not None and beta != env.aux_beta:
        env = Env(env.mol, grid_level=env.grid_level, df=True, aux_beta=beta)
    mo = ref.mo_a
    # UHF/UKS references have genuinely different beta spatial orbitals
    # (`reference_state.py:120-121` vs the shared `mo_a = mo_b` of the
    # R/RO branch): the beta blocks of the sigma then need beta-MO
    # transforms of the same fitted AO tensors
    unrestricted = ref.mo_b is not ref.mo_a and not np.array_equal(
        ref.mo_a, ref.mo_b)
    B = _mo_transform(env.df_B(0.0), mo)
    B_b = _mo_transform(env.df_B(0.0), ref.mo_b) if unrestricted else None
    B_lr = B_lr_b = None
    hyb_lr = 0.0
    if ref.omega != 0.0 and abs(ref.alpha - ref.hyb) > 1e-12:
        B_lr = _mo_transform(env.df_B(ref.omega), mo)
        if unrestricted:
            B_lr_b = _mo_transform(env.df_B(ref.omega), ref.mo_b)
        hyb_lr = ref.alpha - ref.hyb
    phi = phi_b = grid_w = rho0 = None
    if ref.spec is not None and ref.spec.components:
        phi = jnp.einsum("xgm,mp->xgp", env.ao, jnp.asarray(mo))
        if unrestricted:
            phi_b = jnp.einsum("xgm,mp->xgp", env.ao, jnp.asarray(ref.mo_b))
        grid_w = env.grid_weights
        from xtddft_tpu.response.sigma import _rho0_jnp

        rho0 = _rho0_jnp(ref, tau=ref.spec.needs_tau)
    fock_mo = np.stack([ref.fock_a_mo, ref.fock_b_mo])
    fock_hf = (
        np.stack([ref.fock_a_hf_mo, ref.fock_b_hf_mo])
        if ref.fock_a_hf_mo is not None
        else None
    )
    return DFData(
        nc=ref.nc, no=ref.no, nv=ref.nv, B=B, fock_mo=fock_mo,
        hyb=ref.hyb, spec=ref.spec, phi=phi, grid_w=grid_w, rho0=rho0,
        fock_hf_mo=fock_hf, B_lr=B_lr, hyb_lr=hyb_lr,
        B_b=B_b, B_lr_b=B_lr_b, phi_b=phi_b,
    )


def cast_df_data(data: DFData, dtype=np.float32, b_dtype=None,
                 rho_floor: float = 3e-7) -> DFData:
    """Precision-cast a (typically f64 host-built) DFData for the chip hot
    path: B in ``b_dtype`` (bf16 halves the dominant HBM tensor), grid
    and Fock tensors in ``dtype``.  The f64 original stays on host for
    Rayleigh-Ritz refinement of the chip eigenpairs (bench.py).

    Grid points whose density falls below ``rho_floor`` are neutralized
    (weight 0, density 1): real-molecule grids reach rho ~ 1e-30 where
    GGA fxc derivatives overflow in f32 (the f64 MASK_RHO=1e-11 floor is
    not low-precision-safe); their true contribution is negligible."""
    import dataclasses

    bd = b_dtype if b_dtype is not None else dtype
    kw = {
        "B": jnp.asarray(data.B, dtype=bd),
        "fock_mo": np.asarray(data.fock_mo, dtype=dtype),
    }
    if data.B_lr is not None:
        kw["B_lr"] = jnp.asarray(data.B_lr, dtype=bd)
    if data.B_b is not None:
        kw["B_b"] = jnp.asarray(data.B_b, dtype=bd)
    if data.B_lr_b is not None:
        kw["B_lr_b"] = jnp.asarray(data.B_lr_b, dtype=bd)
    if data.phi_b is not None:
        kw["phi_b"] = jnp.asarray(data.phi_b, dtype=dtype)
    if data.fock_hf_mo is not None:
        kw["fock_hf_mo"] = np.asarray(data.fock_hf_mo, dtype=dtype)
    if data.phi is not None:
        ra, rb, ga, gb, *taus = [np.asarray(r, dtype=np.float64)
                                 for r in data.rho0]
        w = np.asarray(data.grid_w, dtype=np.float64)
        mask = (ra > rho_floor) | (rb > rho_floor)
        w = np.where(mask, w, 0.0)
        ra = np.where(mask, ra, 1.0)
        rb = np.where(mask, rb, 1.0)
        ga = np.where(mask[None, :], ga, 0.0)
        gb = np.where(mask[None, :], gb, 0.0)
        rho_cast = (ra, rb, ga, gb) + tuple(
            np.where(mask, t, 1.0) for t in taus)  # benign tau: z=0 at g=0
        kw["phi"] = jnp.asarray(data.phi, dtype=dtype)
        kw["grid_w"] = jnp.asarray(w, dtype=dtype)
        kw["rho0"] = tuple(jnp.asarray(r, dtype=dtype) for r in rho_cast)
    return dataclasses.replace(data, **kw)


def synthetic_df_data(nmo=1000, nc=78, no=2, naux=2000, ngrid=49152,
                      xc: str = "bhandhlyp", seed: int = 0,
                      dtype=np.float32, b_dtype=None) -> DFData:
    """Random but well-formed DF data for benchmarks / compile checks."""
    from xtddft_tpu.xc import registry as xc_registry

    rng = np.random.default_rng(seed)
    nv = nmo - nc - no
    # generate B directly in the target dtype on device (a host f64 array
    # at production sizes would be ~16 GB)
    bd = b_dtype if b_dtype is not None else dtype
    key = jax.random.PRNGKey(seed)
    # symmetric by construction (B_P = G_P G_P^T) without a second
    # full-size buffer
    k_rank = 8
    G = jax.random.normal(key, (naux, nmo, k_rank), dtype=jnp.float32)

    @jax.jit
    def _make_b(G):
        return (
            jnp.einsum("Pik,Pjk->Pij", G, G) / np.sqrt(naux * nmo * k_rank)
        ).astype(bd)

    B = _make_b(G)
    spec = xc_registry.resolve(xc)
    # fock matrices stay host-side (small); grid tensors are generated on
    # device — the host->device tunnel can be only a few MB/s, so a 0.8 GB
    # host phi array would take minutes to ship
    e = np.sort(rng.uniform(-20.0, 5.0, size=nmo))
    fa = np.diag(e) + 1e-3 * rng.normal(size=(nmo, nmo))
    fa = 0.5 * (fa + fa.T)
    fb = fa + 1e-3 * rng.normal(size=(nmo, nmo))
    fb = 0.5 * (fb + fb.T)
    fhfa = fa + 1e-3 * rng.normal(size=(nmo, nmo))
    fhfa = 0.5 * (fhfa + fhfa.T)
    fhfb = fb + 1e-3 * rng.normal(size=(nmo, nmo))
    fhfb = 0.5 * (fhfb + fhfb.T)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 6)
    phi = jax.random.normal(ks[0], (4, ngrid, nmo), dtype=dtype) / float(
        np.sqrt(nmo)
    )
    w = jax.random.uniform(ks[1], (ngrid,), dtype=dtype, minval=0.01, maxval=1.0)
    ra = jax.random.uniform(ks[2], (ngrid,), dtype=dtype, minval=0.05, maxval=1.0)
    rb = ra * jax.random.uniform(ks[3], (ngrid,), dtype=dtype, minval=0.5, maxval=1.0)
    ga = 0.1 * jax.random.normal(ks[4], (3, ngrid), dtype=dtype)
    gb = 0.1 * jax.random.normal(ks[5], (3, ngrid), dtype=dtype)
    return DFData(
        nc=nc, no=no, nv=nv,
        B=B,
        fock_mo=np.stack([fa, fb]),
        hyb=spec.hyb,
        spec=spec,
        phi=phi,
        grid_w=w,
        rho0=(ra, rb, ga, gb),
        fock_hf_mo=np.stack([fhfa, fhfb]),
    )


def xtda_sigma_df(data: DFData, spin_adapt: bool = True,
                  dtype=None, spmd: bool = False,
                  precision: str | None = None,
                  with_b: bool = False) -> SigmaOperator:
    """Spin-conserving (U/X-)TDA sigma over DF tensors.

    with_b=True turns the operator into the full TDHF/RPA pair: matvec
    returns the stacked (2, nz, dim) array [A z, B z], where B is the
    RPA coupling B_ia,jb = (ia|jb) - cx (ib|ja) + fxc (exchange
    same-spin only; no Fock or dA terms — B couples single excitations
    through two-electron integrals only, see `response/tdhf.py`).  The
    Coulomb/fxc intermediates are shared with the A pass, so the pair
    costs ~1.5 A-matvecs.  Consumed by `solver/rpa.rpa_davidson` — the
    matrix-free production TDHF path (the reference's TDHF exists only
    through pyscf's in-core ``tdscf.TDHF`` at gradient-validation scale,
    `xtddft/grad_jp/grad/rtdhf.py:13`).

    precision: None uses the backend default matmul precision (TPU:
    fast bf16-pass MXU matmuls, the headline speed mode) — 'highest'
    forces full-f32 contractions (3-pass bf16 on the MXU, ~3x slower),
    the residual-floor mode that closes the last Davidson roots at
    tol<=1e-4 (the CPU backend is unaffected: its f32 einsums are
    already exact-f32).

    Same natural layout and dA math as `sigma.spin_conserving_sigma`
    (alpha (nocca x nvira) rows then beta (noccb x nvirb)), with J/K from
    B and fxc through the MO-grid factorization.

    spmd=False (single chip): aux and grid axes are lax.scan-chunked to
    bound HBM intermediates.  spmd=True (multi-chip): plain einsums over
    tensors sharded across the mesh (`parallel.mesh.shard_df_data`) — each
    chip holds 1/N of the aux and grid axes, GSPMD inserts the psum
    reductions over ICI, and the per-chip shard provides the memory relief
    the scan gave on one chip."""
    nc, no, nv = data.nc, data.no, data.nv
    nmo = data.nmo
    nocca, nvira = nc + no, nv
    noccb, nvirb = nc, no + nv
    if dtype is None:
        dtype = data.B.dtype
    acc = jnp.float32 if dtype in (jnp.bfloat16, np.dtype("bfloat16")) else dtype
    hyb = data.hyb
    has_xc = data.spec is not None and bool(data.spec.components) and data.phi is not None
    # All large tensors are passed as jit ARGUMENTS via this pytree —
    # closure-captured device arrays get embedded as XLA constants, which
    # compiles ~100x slower on TPU.
    consts = {
        "B": data.B,
        "fa": jnp.asarray(data.fock_mo[0], dtype=acc),
        "fb": jnp.asarray(data.fock_mo[1], dtype=acc),
    }
    has_lr = data.B_lr is not None and data.hyb_lr != 0.0
    hyb_lr = data.hyb_lr
    packed = bool(getattr(data, "packed", False))
    if packed:
        if spmd:
            raise NotImplementedError(
                "packed B: single-chip sigma only (multi-chip shards the "
                "dense layout, where per-device memory is already 1/N)")
        if has_lr or data.B_b is not None:
            raise NotImplementedError(
                "packed B covers R/RO non-RSH references (the 862-AO "
                "production target); use the dense layout otherwise")
        from xtddft_tpu.scf.df_build import pack_indices

        consts["f2p"] = jnp.asarray(pack_indices(nmo)[1])
    if has_lr:
        consts["B_lr"] = data.B_lr
    # UHF/UKS: beta-MO-transformed tensors for the beta blocks
    # (trace-time dict-key selection, so R/RO references keep the
    # single-tensor path bit-identical)
    if data.B_b is not None:
        consts["B_b"] = data.B_b
        if has_lr and data.B_lr_b is not None:
            consts["B_lr_b"] = data.B_lr_b
    if has_xc:
        from xtddft_tpu.xc.interface import _sanitize

        respond = xci.make_fxc_jvp(data.spec)
        w_s, rho_s, mask = _sanitize(data.grid_w, data.rho0)
        # chunk the grid axis (the reference's ni.block_loop analog): the
        # ngrid x nvir intermediates of the rho1 build must never
        # materialize at full grid size.  Pad with zero-weight points.
        ngrid = int(w_s.shape[0])
        gc = ngrid if spmd else min(4096, ngrid)
        ngc = -(-ngrid // gc)
        pad = ngc * gc - ngrid

        def _chunked(a, fill=0.0):
            a = jnp.asarray(a)
            if pad:
                width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                a = jnp.pad(a, width, constant_values=fill)
            return a.reshape(ngc, gc, *a.shape[1:])

        consts["phi_c"] = jnp.moveaxis(
            _chunked(jnp.moveaxis(data.phi, 0, 1)), 2, 1
        )  # (ngc, 4, gc, nmo)
        if data.phi_b is not None:
            consts["phi_b_c"] = jnp.moveaxis(
                _chunked(jnp.moveaxis(data.phi_b, 0, 1)), 2, 1
            )
        consts["w_c"] = _chunked(w_s)
        ra_s, rb_s, ga_s, gb_s, *tau_s = rho_s
        consts["rho_c"] = (
            _chunked(ra_s, 1.0), _chunked(rb_s, 1.0),
            jnp.moveaxis(_chunked(jnp.moveaxis(ga_s, 0, 1)), 2, 1),
            jnp.moveaxis(_chunked(jnp.moveaxis(gb_s, 0, 1)), 2, 1),
        ) + tuple(_chunked(t, 1.0) for t in tau_s)  # MGGA: (ta, tb) chunks
        consts["mask_c"] = _chunked(mask)

    dA = spin_adapt and data.fock_hf_mo is not None and no > 0
    if dA:
        si = 0.5 * no
        dF = data.fock_hf_mo[1] - data.fock_hf_mo[0]
        consts["dFV"] = jnp.asarray(dF[nc + no :, nc + no :], dtype=acc)
        consts["dFC"] = jnp.asarray(dF[:nc, :nc], dtype=acc)
        f1 = float(0.5 * (1.0 - np.sqrt((si + 1) / si) + 1.0 / (2 * si)))
        f2 = float(0.5 * (-1.0 + np.sqrt((si + 1) / si) + 1.0 / (2 * si)))
        fx = float(0.5 / (2.0 * si))

    na = nocca * nvira
    dim = na + noccb * nvirb
    oa, va = slice(0, nocca), slice(nocca, None)
    ob, vb = slice(0, noccb), slice(noccb, None)

    def _unpack(Bc, f2p):
        """(chunk, npair) packed rows -> (chunk, nmo, nmo) full."""
        return jnp.take(Bc, f2p, axis=1).reshape(Bc.shape[0], nmo, nmo)

    def _jk(B, z, o, v, f2p=None):
        """(t_P contribution, K applied) for one spin block.

        The K intermediate T[x,P,j,a] at full naux would be
        batch*naux*nocc*nvir (>10 GB at production sizes), so the aux axis
        is processed in fori_loop chunks with accumulation (chunk size a
        divisor of naux), sliced IN PLACE from B with dynamic_slice — a
        lax.scan over a reshaped (naux/chunk, chunk, cols) B materializes
        a full relaid copy whose chunk axis lands in the 128-lane tile
        (measured at TTM/dzp: 2.7 GB copy + a 4x-padded 10.9 GB temp at
        chunk=32 — the r4 'highest'-solve OOM).  With packed B (f2p
        given) each chunk is unpacked by one gather first — the extra
        HBM traffic buys the halved residency that fits 862-AO problems
        on one chip."""
        naux = B.shape[0]
        nz, nocc, nvir = z.shape
        chunk = naux if spmd else _aux_chunk(
            naux, nz, nocc, nvir,
            unpack_cols=0 if f2p is None else nmo * nmo)

        def body(i, carry):
            K_acc, t_acc = carry
            Bc = jax.lax.dynamic_slice_in_dim(B, i * chunk, chunk, 0)
            if f2p is not None:
                Bc = _unpack(Bc, f2p)
            t_c = jnp.einsum("Pjb,xjb->xP", Bc[:, o, v], z)
            T = jnp.einsum("Pab,xjb->xPja", Bc[:, v, v], z)
            K_acc = K_acc + jnp.einsum("Pji,xPja->xia", Bc[:, o, o], T)
            t_acc = jax.lax.dynamic_update_slice(t_acc, t_c, (0, i * chunk))
            return K_acc, t_acc

        K0 = jnp.zeros((nz, nocc, nvir), dtype=z.dtype)
        t0 = jnp.zeros((nz, naux), dtype=z.dtype)
        K, t = jax.lax.fori_loop(0, naux // chunk, body, (K0, t0))
        return t, K

    def _j_back_both(B, t, f2p):
        """Packed-B Coulomb back-projection for BOTH spin blocks in one
        aux-chunked pass: j_x,ia = sum_P B[P, o, v] t_xP (the dense path
        slices B[:, o, v] at full naux, which packed storage cannot
        afford to materialize)."""
        naux = B.shape[0]
        nz = t.shape[0]
        chunk = _aux_chunk(naux, nz, nocca, nvira,
                           unpack_cols=nmo * nmo)

        def body(i, accs):
            ja, jb = accs
            Bc = jax.lax.dynamic_slice_in_dim(B, i * chunk, chunk, 0)
            tc = jax.lax.dynamic_slice_in_dim(t, i * chunk, chunk, 1)
            Bf = _unpack(Bc, f2p)
            ja = ja + jnp.einsum("Pia,xP->xia", Bf[:, oa, va], tc)
            jb = jb + jnp.einsum("Pia,xP->xia", Bf[:, ob, vb], tc)
            return ja, jb

        acc0 = (jnp.zeros((nz, nocca, nvira), dtype=B.dtype),
                jnp.zeros((nz, noccb, nvirb), dtype=B.dtype))
        ja, jb = jax.lax.fori_loop(0, naux // chunk, body, acc0)
        return ja, jb

    def _k2(B, z, o, v, f2p=None):
        """RPA B-coupling exchange (ib|ja) z_jb for one spin block,
        aux-chunked like `_jk` (the T intermediate here is
        nz*chunk*nvir^2, so the chunk budget uses the vv footprint)."""
        naux = B.shape[0]
        nz, nocc, nvir = z.shape
        chunk = naux if spmd else _aux_chunk(
            naux, nz, nvir, nvir,
            unpack_cols=0 if f2p is None else nmo * nmo)

        def body(i, acc):
            Bc = jax.lax.dynamic_slice_in_dim(B, i * chunk, chunk, 0)
            if f2p is not None:
                Bc = _unpack(Bc, f2p)
            T = jnp.einsum("Pja,xjb->xPab", Bc[:, o, v], z)
            return acc + jnp.einsum("Pib,xPab->xia", Bc[:, o, v], T)

        K0 = jnp.zeros((nz, nocc, nvir), dtype=z.dtype)
        return jax.lax.fori_loop(0, naux // chunk, body, K0)

    def _fxc(C, za, zb):
        """Grid-chunked fxc response (lax.scan over grid blocks); all
        intermediates are (batch, gc, nocc)-sized.  Unrestricted
        references scan a second (beta-MO) grid table for the beta-spin
        density response/backprojection."""
        has_pb = "phi_b_c" in C

        def body(acc, xs):
            if has_pb:
                phi_ch, phib_ch, w_ch, rho_ch, mask_ch = xs
            else:
                phi_ch, w_ch, rho_ch, mask_ch = xs
                phib_ch = phi_ch

            mgga = len(rho_ch) == 6

            def rho1(z, o, v, p0, p1):
                tmp = jnp.einsum("xov,gv->xgo", z, p0[:, v])  # (x, gc, nocc)
                r = jnp.einsum("xgo,go->xg", tmp, p0[:, o])
                g = jnp.einsum("xgo,ygo->xyg", tmp, p1[:, :, o])
                tmp2 = jnp.einsum("xov,ygv->xygo", z, p1[:, :, v])
                g = g + jnp.einsum("xygo,go->xyg", tmp2, p0[:, o])
                out = (
                    jnp.where(mask_ch[None], r, 0.0),
                    jnp.where(mask_ch[None, None], g, 0.0),
                )
                if mgga:
                    t = 0.5 * jnp.einsum("xygo,ygo->xg", tmp2, p1[:, :, o])
                    out = out + (jnp.where(mask_ch[None], t, 0.0),)
                return out

            rho1_a = rho1(za, oa, va, phi_ch[0], phi_ch[1:4])
            rho1_b = rho1(zb, ob, vb, phib_ch[0], phib_ch[1:4])

            def one(args):
                return respond(w_ch, rho_ch, args)

            if mgga:
                args1 = (rho1_a[0], rho1_b[0], rho1_a[1], rho1_b[1],
                         rho1_a[2], rho1_b[2])
                dwva, dwvb, dwga, dwgb, dwta, dwtb = jax.vmap(one)(args1)
            else:
                dwva, dwvb, dwga, dwgb = jax.vmap(one)(
                    (rho1_a[0], rho1_b[0], rho1_a[1], rho1_b[1]))
                dwta = dwtb = None

            def back(dwv, dwg, dwt, o, v, p0, p1):
                tmp = jnp.einsum("xg,go->xgo", dwv, p0[:, o])
                tmp = tmp + jnp.einsum("xyg,ygo->xgo", dwg, p1[:, :, o])
                r = jnp.einsum("xgo,gv->xov", tmp, p0[:, v])
                tmp2 = jnp.einsum("xyg,go->xygo", dwg, p0[:, o])
                r = r + jnp.einsum("xygo,ygv->xov", tmp2, p1[:, :, v])
                if dwt is not None:
                    r = r + 0.5 * jnp.einsum(
                        "xg,ygo,ygv->xov", dwt, p1[:, :, o], p1[:, :, v])
                return r

            va_acc, vb_acc = acc
            return (
                va_acc + back(dwva, dwga, dwta, oa, va,
                              phi_ch[0], phi_ch[1:4]),
                vb_acc + back(dwvb, dwgb, dwtb, ob, vb,
                              phib_ch[0], phib_ch[1:4]),
            ), None

        nz = za.shape[0]
        acc0 = (
            jnp.zeros((nz, nocca, nvira), dtype=za.dtype),
            jnp.zeros((nz, noccb, nvirb), dtype=zb.dtype),
        )
        if has_pb:
            xs = (C["phi_c"], C["phi_b_c"], C["w_c"], C["rho_c"], C["mask_c"])
        else:
            xs = (C["phi_c"], C["w_c"], C["rho_c"], C["mask_c"])
        (fxa, fxb), _ = jax.lax.scan(body, acc0, xs)
        return fxa, fxb

    def _matvec_body(C, zs):
        B = C["B"]
        Bb = C["B_b"] if "B_b" in C else B
        fa = C["fa"]
        fb = C["fb"]
        zs = jnp.asarray(zs, dtype=acc)
        nz = zs.shape[0]
        za = zs[:, :na].reshape(nz, nocca, nvira)
        zb = zs[:, na:].reshape(nz, noccb, nvirb)
        za_b = za.astype(B.dtype)
        zb_b = zb.astype(B.dtype)
        f2p = C.get("f2p") if packed else None
        ta, Ka = _jk(B, za_b, oa, va, f2p)
        tb, Kb = _jk(Bb, zb_b, ob, vb, f2p)
        t = ta + tb
        if packed:
            ja, jb = _j_back_both(B, t, f2p)
            ja_c = ja.astype(acc)
            jb_c = jb.astype(acc)
        else:
            ja_c = jnp.einsum("Pia,xP->xia", B[:, oa, va], t).astype(acc)
            jb_c = jnp.einsum("Pia,xP->xia", Bb[:, ob, vb], t).astype(acc)
        v1a = ja_c - hyb * Ka.astype(acc)
        v1b = jb_c - hyb * Kb.astype(acc)
        if has_lr:
            # RSH long-range exchange: (alpha-hyb) * K over the
            # erf-attenuated B (`xtddft/XTDA.py:94-99,520-543` omega split)
            B_lr = C["B_lr"]
            Bb_lr = C["B_lr_b"] if "B_lr_b" in C else B_lr
            _, Ka_lr = _jk(B_lr, za_b, oa, va)
            _, Kb_lr = _jk(Bb_lr, zb_b, ob, vb)
            v1a = v1a - hyb_lr * Ka_lr.astype(acc)
            v1b = v1b - hyb_lr * Kb_lr.astype(acc)
        fxa = fxb = None
        if has_xc:
            fxa, fxb = _fxc(C, za.astype(C["phi_c"].dtype), zb.astype(C["phi_c"].dtype))
            v1a = v1a + fxa.astype(acc)
            v1b = v1b + fxb.astype(acc)
        if with_b:
            # RPA B: shared Coulomb/fxc pieces, (ib|ja)-type exchange,
            # no Fock/dA terms (`response/tdhf.py:tdhf_b_blocks`)
            b1a = ja_c - hyb * _k2(B, za_b, oa, va, f2p).astype(acc)
            b1b = jb_c - hyb * _k2(Bb, zb_b, ob, vb, f2p).astype(acc)
            if has_lr:
                b1a = b1a - hyb_lr * _k2(C["B_lr"], za_b, oa, va).astype(acc)
                b1b = b1b - hyb_lr * _k2(
                    C["B_lr_b"] if "B_lr_b" in C else C["B_lr"],
                    zb_b, ob, vb).astype(acc)
            if has_xc:
                b1a = b1a + fxa.astype(acc)
                b1b = b1b + fxb.astype(acc)
        v1a = v1a + jnp.einsum("xib,ab->xia", za, fa[va, va]) - jnp.einsum(
            "xja,ij->xia", za, fa[oa, oa]
        )
        v1b = v1b + jnp.einsum("xib,ab->xia", zb, fb[vb, vb]) - jnp.einsum(
            "xja,ij->xia", zb, fb[ob, ob]
        )
        if dA:
            dFV = C["dFV"]
            dFC = C["dFC"]
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
        az = jnp.concatenate(
            [v1a.reshape(nz, -1), v1b.reshape(nz, -1)], axis=1
        )
        if not with_b:
            return az
        bz = jnp.concatenate(
            [b1a.reshape(nz, -1), b1b.reshape(nz, -1)], axis=1
        )
        return jnp.stack([az, bz])

    if precision is None:
        _matvec = jax.jit(_matvec_body)
    else:
        @jax.jit
        def _matvec(C, zs):
            with jax.default_matmul_precision(precision):
                return _matvec_body(C, zs)

    def matvec(zs):
        return _matvec(consts, zs)

    matvec_raw = _matvec

    ea = np.diag(data.fock_mo[0])
    eb = np.diag(data.fock_mo[1])
    hdiag = np.concatenate([
        (ea[nocca:][None, :] - ea[:nocca][:, None]).ravel(),
        (eb[noccb:][None, :] - eb[:noccb][:, None]).ravel(),
    ])

    def to_blocked(v):
        top = v[:na]
        beta = v[na:].reshape(noccb, nvirb, -1)
        co = beta[:, :no].reshape(noccb * no, -1)
        cv = beta[:, no:].reshape(noccb * nv, -1)
        return np.concatenate([top, co, cv], axis=0)

    return SigmaOperator(
        matvec=matvec, hdiag=hdiag, dim=dim, _to_blocked=to_blocked,
        matvec_raw=matvec_raw, consts=consts,
    )


def sf_sigma_df(data: DFData, extype: str = "up", method: int = 0,
                dtype=None, precision: str | None = None,
                spmd: bool = False) -> SigmaOperator:
    """Density-fitted plain SF-TDA sigma (flip-up AND flip-down).

    The reference's accelerated SF class covers both extypes
    (`xtddft/XSF_TDA_GPU.py:143-144`: extype 0 = spin-flip up, 1 = down);
    its flip-up space is beta-occupied x alpha-virtual with exchange-only
    two-electron coupling (no Coulomb J in spin-flip channels,
    `xtddft/SF_TDA.py:269-277`) plus the SF xc kernel.  This operator is
    that production path over the fitted B tensor: for each trial z,

        v_ia = -cx sum_P Bocc[P,ij] Bvir[P,ab] z_jb  (aux-chunked scan)
             + SF-kernel quadrature through the MO-grid factorization
             + Fock diagonal terms,

    where for flip-up (occ, vir) = (beta-occ [0,nc), alpha-vir
    [nc+no,nmo)) and for flip-down (alpha-occ [0,nc+no), beta-vir
    [nc,nmo)).  Row-major (n_o, n_v) trial layout, identical to the
    in-core `sigma.sf_sigma_operator`; flip-down's `to_blocked` converts
    to the CV|CO|OV|OO convention.

    method: 0 = ALDA0, 1 = multicollinear (incl. the MGGA tau channel),
    2 = collinear (HF exchange only) — `xtddft/SF_TDA.py:19`.
    """
    nc, no, nv = data.nc, data.no, data.nv
    nmo = data.nmo
    if extype == "up":
        n_o, n_v = nc, nv
        osl = slice(0, nc)               # beta-occupied MOs
        vsl = slice(nc + no, None)       # alpha-virtual MOs
        # occupied side is BETA-MO-transformed, virtual side ALPHA
        occ_key, vir_key = "Bocc", "Bvir"
        f_occ = data.fock_mo[1][:nc, :nc]
        f_vir = data.fock_mo[0][nc + no:, nc + no:]
        po_key, pv_key = "phi_o", "phi_v"
    elif extype == "down":
        n_o, n_v = nc + no, no + nv
        osl = slice(0, nc + no)          # alpha-occupied MOs
        vsl = slice(nc, None)            # beta-virtual MOs
        occ_key, vir_key = "Bocc", "Bvir"
        f_occ = data.fock_mo[0][:n_o, :n_o]
        f_vir = data.fock_mo[1][nc:, nc:]
        po_key, pv_key = "phi_o", "phi_v"
    else:
        raise ValueError(f"extype must be 'up' or 'down', got {extype!r}")
    packed = bool(getattr(data, "packed", False))
    if packed and (data.B_b is not None or
                   (data.B_lr is not None and data.hyb_lr != 0.0)):
        raise NotImplementedError(
            "packed B covers R/RO non-RSH references (the 862-AO "
            "production target); use the dense layout otherwise")
    if packed and spmd:
        raise NotImplementedError(
            "packed B: single-chip sigma only (multi-chip shards the "
            "dense layout, where per-device memory is already 1/N)")
    dim = n_o * n_v
    if dtype is None:
        dtype = data.B.dtype
    acc = jnp.float32 if dtype in (jnp.bfloat16, np.dtype("bfloat16")) else dtype
    hyb = data.hyb

    # slice ONCE at build time: the sliced occ/vir panels are the only
    # large tensors the matvec touches, and slicing inside jit would
    # re-materialize the full B per call
    def _occ_panel(B_a, B_b):
        src = (B_b if extype == "up" else B_a)
        return src[:, osl, osl]

    def _vir_panel(B_a, B_b):
        src = (B_a if extype == "up" else B_b)
        return src[:, vsl, vsl]

    B_b = data.B_b if data.B_b is not None else data.B
    if packed:
        # packed-symmetric storage cannot be panel-sliced up front (the
        # pair triangle interleaves rows): keep the packed tensor whole
        # and gather the occ/vir panels per aux chunk inside the matvec
        # — the same gather-per-chunk trade the spin-conserving packed
        # path makes, which is what fits TTM-1Cz/dzp (862 AO) on 16 GB
        from xtddft_tpu.scf.df_build import pack_indices

        f2p_m = np.asarray(pack_indices(nmo)[1]).reshape(nmo, nmo)
        consts = {
            "Bp": data.B,
            "f2p_oo": jnp.asarray(f2p_m[osl, osl].ravel()),
            "f2p_vv": jnp.asarray(f2p_m[vsl, vsl].ravel()),
            "f_occ": jnp.asarray(f_occ, dtype=acc),
            "f_vir": jnp.asarray(f_vir, dtype=acc),
        }
    else:
        consts = {
            occ_key: _occ_panel(data.B, B_b),
            vir_key: _vir_panel(data.B, B_b),
            "f_occ": jnp.asarray(f_occ, dtype=acc),
            "f_vir": jnp.asarray(f_vir, dtype=acc),
        }
    has_lr = data.B_lr is not None and data.hyb_lr != 0.0
    hyb_lr = data.hyb_lr
    if has_lr:
        B_lr_b = data.B_lr_b if data.B_lr_b is not None else data.B_lr
        consts["Bocc_lr"] = _occ_panel(data.B_lr, B_lr_b)
        consts["Bvir_lr"] = _vir_panel(data.B_lr, B_lr_b)
    has_xc = (
        method in (0, 1)
        and data.spec is not None
        and bool(data.spec.components)
        and data.phi is not None
    )
    if has_xc:
        from xtddft_tpu.xc.interface import sf_kernel_alda0

        if method == 0:
            fw = sf_kernel_alda0(data.spec, data.grid_w, data.rho0)
            consts["sf_k"] = fw.astype(acc)[:, None, None] * jnp.eye(
                1, dtype=acc)
            kdim = 1
        else:
            from xtddft_tpu.xc.mcol import sf_kernel_mcol

            consts["sf_k"] = sf_kernel_mcol(
                data.spec, data.grid_w, data.rho0).astype(acc)
            kdim = int(consts["sf_k"].shape[-1])
        phi_b = data.phi_b if data.phi_b is not None else data.phi
        consts[po_key] = (phi_b if extype == "up" else data.phi)[:, :, osl]
        consts[pv_key] = (data.phi if extype == "up" else phi_b)[:, :, vsl]

    def _matvec_body(C, zs):
        Bref = C["Bp"] if packed else C[occ_key]
        zs = jnp.asarray(zs, dtype=acc)
        nz = zs.shape[0]
        z = zs.reshape(nz, n_o, n_v)
        zb = z.astype(Bref.dtype)
        naux = Bref.shape[0]
        # aux-chunked exchange (same budget rule as xsf_sigma_df); with
        # packed B the per-chunk gathered panels (chunk*(n_o^2+n_v^2))
        # are capped too.  spmd: one full-aux einsum over the sharded
        # tensors — GSPMD inserts the psum over the mesh's tp axis, and
        # the per-chip shard provides the memory relief the chunk loop
        # gives on one chip.
        chunk = naux if spmd else _aux_chunk(
            naux, nz, n_o, n_v,
            unpack_cols=(n_o * n_o + n_v * n_v) if packed else 0)

        def _k(Bo, Bv):
            """Dense panels: sliced IN PLACE per chunk (a reshaped scan
            materializes a relaid copy whose chunk axis lands in the
            128-lane tile — the r4 10.9 GB OOM pattern)."""

            def body(i, K_acc):
                Bc_o = jax.lax.dynamic_slice_in_dim(Bo, i * chunk, chunk, 0)
                Bc_v = jax.lax.dynamic_slice_in_dim(Bv, i * chunk, chunk, 0)
                T = jnp.einsum("Pab,xjb->xPja", Bc_v, zb)
                return K_acc + jnp.einsum("Pij,xPja->xia", Bc_o, T)

            K0 = jnp.zeros((nz, n_o, n_v), dtype=Bo.dtype)
            return jax.lax.fori_loop(0, naux // chunk, body, K0)

        def _k_packed(Bp):
            f2p_oo, f2p_vv = C["f2p_oo"], C["f2p_vv"]

            def body(i, K_acc):
                Bc = jax.lax.dynamic_slice_in_dim(Bp, i * chunk, chunk, 0)
                Bc_o = jnp.take(Bc, f2p_oo, axis=1).reshape(
                    chunk, n_o, n_o)
                Bc_v = jnp.take(Bc, f2p_vv, axis=1).reshape(
                    chunk, n_v, n_v)
                T = jnp.einsum("Pab,xjb->xPja", Bc_v, zb)
                return K_acc + jnp.einsum("Pij,xPja->xia", Bc_o, T)

            K0 = jnp.zeros((nz, n_o, n_v), dtype=Bp.dtype)
            return jax.lax.fori_loop(0, naux // chunk, body, K0)

        if packed:
            vs = -hyb * _k_packed(C["Bp"]).astype(acc)
        else:
            vs = -hyb * _k(C[occ_key], C[vir_key]).astype(acc)
        if has_lr:
            vs = vs - hyb_lr * _k(C["Bocc_lr"], C["Bvir_lr"]).astype(acc)
        if has_xc:
            po, pv = C[po_key], C[pv_key]
            tmp = jnp.einsum("xov,gv->xgo", z.astype(po.dtype), pv[0])
            r0 = jnp.einsum("xgo,go->xg", tmp, po[0])
            if kdim == 1:
                wv = C["sf_k"][:, 0, 0][None] * r0
                vs = vs + jnp.einsum(
                    "xg,go,gv->xov", wv, po[0], pv[0]).astype(acc)
            else:
                g1 = jnp.einsum("xgo,ygo->xyg", tmp, po[1:4])
                tmp2 = jnp.einsum("xov,ygv->xygo", z.astype(po.dtype), pv[1:4])
                g1 = g1 + jnp.einsum("xygo,go->xyg", tmp2, po[0])
                parts = [r0[:, None], g1]
                if kdim == 5:
                    parts.append(0.5 * jnp.einsum(
                        "xygo,ygo->xg", tmp2, po[1:4])[:, None])
                rho1 = jnp.concatenate(parts, axis=1)
                wv = jnp.einsum("gab,xbg->xag", C["sf_k"], rho1)
                v = jnp.einsum("xg,go,gv->xov", wv[:, 0], po[0], pv[0])
                t3 = jnp.einsum("xyg,ygo->xgo", wv[:, 1:4], po[1:4])
                v = v + jnp.einsum("xgo,gv->xov", t3, pv[0])
                t4 = jnp.einsum("xyg,ygv->xgv", wv[:, 1:4], pv[1:4])
                v = v + jnp.einsum("xgv,go->xov", t4, po[0])
                if kdim == 5:
                    v = v + 0.5 * jnp.einsum(
                        "xg,ygo,ygv->xov", wv[:, 4], po[1:4], pv[1:4])
                vs = vs + v.astype(acc)
        vs = vs + jnp.einsum("ab,xib->xia", C["f_vir"], z) - jnp.einsum(
            "ij,xja->xia", C["f_occ"], z)
        return vs.reshape(nz, -1)

    if precision is None:
        _matvec = jax.jit(_matvec_body)
    else:
        @jax.jit
        def _matvec(C, zs):
            with jax.default_matmul_precision(precision):
                return _matvec_body(C, zs)

    def matvec(zs):
        return _matvec(consts, zs)

    e_occ = np.diag(np.asarray(f_occ))
    e_vir = np.diag(np.asarray(f_vir))
    hdiag = (e_vir[None, :] - e_occ[:, None]).ravel()

    def to_blocked(v):
        z = v.reshape(n_o, n_v, -1)
        cv = z[:nc, no:].reshape(nc * nv, -1)
        co = z[:nc, :no].reshape(nc * no, -1)
        ov = z[nc:, no:].reshape(no * nv, -1)
        oo = z[nc:, :no].reshape(no * no, -1)
        return np.concatenate([cv, co, ov, oo], axis=0)

    return SigmaOperator(
        matvec=matvec, hdiag=hdiag, dim=dim,
        _to_blocked=to_blocked if extype == "down" else None,
        matvec_raw=_matvec, consts=consts,
    )


def xsf_sigma_df(data: DFData, SA: int = 3, foo: float = 1.0,
                 fglobal: float = 1.0, method: int = 0,
                 remove: bool = True, dtype=None,
                 precision: str | None = None,
                 spmd: bool = False) -> SigmaOperator:
    """Density-fitted XSF-TDA sigma (the flagship method at production
    scale): SF exchange from the fitted B tensor, ALDA0 or multicollinear
    kernel through the MO-grid factorization, and the spin-adapted dA with
    its small MO tensors built from B (`response/xsf_terms.py`).

    Vector layout and semantics mirror `sigma_xsf.xsf_sigma_operator`
    (CV|CO|OV|OO blocked, OO compressed through the Sf=Si projector when
    ``remove``).

    Packed-symmetric B (`data.packed`) is supported for R/RO non-RSH
    references — the layout that fits the 862-AO flagship runs on one
    16 GB chip (the reference's accelerated flip class is
    `xtddft/XSF_TDA_GPU.py:130-145`): the occ/vir panels are gathered
    per aux chunk inside the matvec, and the dA MO tensors come from
    `delta_a_tensors_from_df_packed`.

    precision: None = backend-default matmul precision; 'highest' forces
    full-f32 MXU contractions (the production residual-floor mode, same
    contract as `xtda_sigma_df`)."""
    from xtddft_tpu.response.spaces import sf_oo_projector
    from xtddft_tpu.response.xsf_terms import (
        apply_delta_a,
        delta_a_fock_blocks,
        delta_a_tensors_from_df,
        delta_a_tensors_from_df_packed,
    )

    nc, no, nv = data.nc, data.no, data.nv
    nmo = data.nmo
    n_o, n_v = nc + no, no + nv
    d1, d2, d3 = nc * nv, nc * nv + nc * no, nc * nv + nc * no + no * nv
    noo = no * no - 1 if remove else no * no
    dim = d3 + noo
    if dtype is None:
        dtype = data.B.dtype
    acc = jnp.float32 if dtype in (jnp.bfloat16, np.dtype("bfloat16")) else dtype
    hyb = data.hyb
    oa = slice(0, n_o)          # alpha occupied MOs
    vb = slice(nc, None)        # beta virtual MOs
    packed = bool(getattr(data, "packed", False))
    if packed and (data.B_b is not None or
                   (data.B_lr is not None and data.hyb_lr != 0.0)):
        raise NotImplementedError(
            "packed B covers R/RO non-RSH references (the 862-AO "
            "production target); use the dense layout otherwise")
    if packed and spmd:
        raise NotImplementedError(
            "packed B: single-chip sigma only (multi-chip shards the "
            "dense layout, where per-device memory is already 1/N)")

    consts = {
        "B": data.B,
        "f_occ": jnp.asarray(data.fock_mo[0][:n_o, :n_o], dtype=acc),
        "f_vir": jnp.asarray(data.fock_mo[1][nc:, nc:], dtype=acc),
    }
    if packed:
        from xtddft_tpu.scf.df_build import pack_indices

        f2p_m = np.asarray(pack_indices(nmo)[1]).reshape(nmo, nmo)
        consts["f2p_oo"] = jnp.asarray(f2p_m[oa, oa].ravel())
        consts["f2p_vv"] = jnp.asarray(f2p_m[vb, vb].ravel())
    has_lr = data.B_lr is not None and data.hyb_lr != 0.0
    hyb_lr = data.hyb_lr
    if has_lr:
        consts["B_lr"] = data.B_lr
    # UHF/UKS (USF-TDA, SA=0): the flip-down blocks pair alpha-occupied
    # with beta-virtual orbitals, so (ij|ab) = sum_P B_a[P,ij] B_b[P,ab]
    # needs the beta-MO transform on the virtual side (R/RO references
    # share one MO set and keep the single-tensor path)
    if data.B_b is not None:
        consts["B_b"] = data.B_b
        if has_lr and data.B_lr_b is not None:
            consts["B_lr_b"] = data.B_lr_b
    if remove:
        consts["vects"] = jnp.asarray(sf_oo_projector(no), dtype=acc)
    has_xc = (
        method in (0, 1)
        and data.spec is not None
        and bool(data.spec.components)
        and data.phi is not None
    )
    if has_xc:
        from xtddft_tpu.xc.interface import _sanitize, sf_kernel_alda0

        w_s, rho_s, mask = _sanitize(data.grid_w, data.rho0)
        if method == 0:
            fw = sf_kernel_alda0(data.spec, data.grid_w, data.rho0)
            consts["sf_k"] = fw.astype(acc)[:, None, None] * jnp.eye(
                1, dtype=acc
            )  # (g,1,1): value-only kernel
            kdim = 1
        else:
            from xtddft_tpu.xc.mcol import sf_kernel_mcol

            consts["sf_k"] = sf_kernel_mcol(
                data.spec, data.grid_w, data.rho0
            ).astype(acc)
            kdim = int(consts["sf_k"].shape[-1])  # 4, or 5 with MGGA tau
        consts["phi"] = data.phi
        if data.phi_b is not None:
            consts["phi_b"] = data.phi_b
    dA_on = SA > 0 and data.fock_hf_mo is not None and no > 0
    if dA_on:
        si = 0.5 * no
        if packed:
            consts["dA"] = delta_a_tensors_from_df_packed(
                data.B, f2p_m.reshape(-1), nmo, nc, no, SA, acc)
        else:
            consts["dA"] = delta_a_tensors_from_df(data.B, nc, no, SA, acc)
        consts["dA"].update(
            delta_a_fock_blocks(data.fock_hf_mo[0], data.fock_hf_mo[1],
                                nc, no, acc)
        )

    def _matvec_body(C, zs):
        B = C["B"]
        zs = jnp.asarray(zs, dtype=acc)
        nz = zs.shape[0]
        zcv = zs[:, :d1].reshape(nz, nc, nv)
        zco = zs[:, d1:d2].reshape(nz, nc, no)
        zov = zs[:, d2:d3].reshape(nz, no, nv)
        if remove:
            zoo = jnp.einsum("pq,xq->xp", C["vects"], zs[:, d3:]).reshape(
                nz, no, no
            )
        else:
            zoo = zs[:, d3:].reshape(nz, no, no)
        z = jnp.zeros((nz, n_o, n_v), dtype=acc)
        z = z.at[:, :nc, no:].set(zcv)
        z = z.at[:, :nc, :no].set(zco)
        z = z.at[:, nc:, no:].set(zov)
        z = z.at[:, nc:, :no].set(zoo)
        # SF exchange: v_ia = -hyb sum_jb (ij|ab) z_jb  (i,j alpha-occ;
        # a,b beta-vir), DF-factored — aux chunks sliced IN PLACE with
        # dynamic_slice (a reshaped scan materializes a relaid copy,
        # the r4 OOM pattern); packed B gathers the occ/vir panels per
        # chunk
        zb = z.astype(B.dtype)
        naux = B.shape[0]
        chunk = naux if spmd else _aux_chunk(
            naux, nz, n_o, n_v,
            unpack_cols=(n_o * n_o + n_v * n_v) if packed else 0)
        K0 = jnp.zeros((nz, n_o, n_v), dtype=B.dtype)

        def _k(Ba, Bb_):
            """Dense: occupied-side panel from Ba, virtual-side from Bb_
            (twin tensors for UKS references, one tensor for R/RO)."""

            def body(i, K_acc):
                Bc_a = jax.lax.dynamic_slice_in_dim(Ba, i * chunk, chunk, 0)
                Bc_b = jax.lax.dynamic_slice_in_dim(Bb_, i * chunk, chunk, 0)
                T = jnp.einsum("Pab,xjb->xPja", Bc_b[:, vb, vb], zb)
                return K_acc + jnp.einsum(
                    "Pij,xPja->xia", Bc_a[:, oa, oa], T)

            return jax.lax.fori_loop(0, naux // chunk, body, K0)

        def _k_packed(Bp):
            f2p_oo, f2p_vv = C["f2p_oo"], C["f2p_vv"]

            def body(i, K_acc):
                Bc = jax.lax.dynamic_slice_in_dim(Bp, i * chunk, chunk, 0)
                Bc_o = jnp.take(Bc, f2p_oo, axis=1).reshape(
                    chunk, n_o, n_o)
                Bc_v = jnp.take(Bc, f2p_vv, axis=1).reshape(
                    chunk, n_v, n_v)
                T = jnp.einsum("Pab,xjb->xPja", Bc_v, zb)
                return K_acc + jnp.einsum("Pij,xPja->xia", Bc_o, T)

            return jax.lax.fori_loop(0, naux // chunk, body, K0)

        if packed:
            vs = -hyb * _k_packed(B).astype(acc)
        else:
            Bb_t = C["B_b"] if "B_b" in C else B
            vs = -hyb * _k(B, Bb_t).astype(acc)
            if has_lr:
                # RSH long-range SF exchange (same omega split as
                # xtda_sigma_df; B_lr shares the aux layout, so the same
                # chunking divides it)
                Blr = C["B_lr"]
                Blrb = C["B_lr_b"] if "B_lr_b" in C else Blr
                vs = vs - hyb_lr * _k(Blr, Blrb).astype(acc)
        if has_xc:
            phi = C["phi"]
            po = phi[:, :, oa]
            pv = (C["phi_b"] if "phi_b" in C else phi)[:, :, vb]
            # transition density components on the grid
            tmp = jnp.einsum("xov,gv->xgo", z.astype(phi.dtype), pv[0])
            r0 = jnp.einsum("xgo,go->xg", tmp, po[0])
            if kdim == 1:
                wv = C["sf_k"][:, 0, 0][None] * r0
                vs = vs + jnp.einsum(
                    "xg,go,gv->xov", wv, po[0], pv[0]
                ).astype(acc)
            else:
                g1 = jnp.einsum("xgo,ygo->xyg", tmp, po[1:4])
                tmp2 = jnp.einsum("xov,ygv->xygo", z.astype(phi.dtype), pv[1:4])
                g1 = g1 + jnp.einsum("xygo,go->xyg", tmp2, po[0])
                parts = [r0[:, None], g1]
                if kdim == 5:
                    # MGGA tau channel of the transition density
                    parts.append(0.5 * jnp.einsum(
                        "xygo,ygo->xg", tmp2, po[1:4])[:, None])
                rho1 = jnp.concatenate(parts, axis=1)  # (x, kdim, g)
                wv = jnp.einsum("gab,xbg->xag", C["sf_k"], rho1)
                v = jnp.einsum("xg,go,gv->xov", wv[:, 0], po[0], pv[0])
                t3 = jnp.einsum("xyg,ygo->xgo", wv[:, 1:4], po[1:4])
                v = v + jnp.einsum("xgo,gv->xov", t3, pv[0])
                t4 = jnp.einsum("xyg,ygv->xgv", wv[:, 1:4], pv[1:4])
                v = v + jnp.einsum("xgv,go->xov", t4, po[0])
                if kdim == 5:
                    v = v + 0.5 * jnp.einsum(
                        "xg,ygo,ygv->xov", wv[:, 4], po[1:4], pv[1:4])
                vs = vs + v.astype(acc)
        vs = vs + jnp.einsum("ab,xib->xia", C["f_vir"], z) - jnp.einsum(
            "ij,xja->xia", C["f_occ"], z
        )
        if dA_on:
            dcv, dco, dov, doo = apply_delta_a(
                C["dA"], si, SA, foo, zcv, zco, zov, zoo, acc
            )
            vs = vs.at[:, :nc, no:].add(fglobal * dcv)
            vs = vs.at[:, :nc, :no].add(fglobal * dco)
            vs = vs.at[:, nc:, no:].add(fglobal * dov)
            vs = vs.at[:, nc:, :no].add(fglobal * doo)
        ocv = vs[:, :nc, no:].reshape(nz, -1)
        oco = vs[:, :nc, :no].reshape(nz, -1)
        oov = vs[:, nc:, no:].reshape(nz, -1)
        ooo = vs[:, nc:, :no].reshape(nz, -1)
        if remove:
            ooo = jnp.einsum("pq,xp->xq", C["vects"], ooo)
        return jnp.concatenate([ocv, oco, oov, ooo], axis=1)

    if precision is None:
        _matvec = jax.jit(_matvec_body)
    else:
        @jax.jit
        def _matvec(C, zs):
            with jax.default_matmul_precision(precision):
                return _matvec_body(C, zs)

    def matvec(zs):
        return _matvec(consts, zs)

    ea = np.diag(data.fock_mo[0])[:n_o]
    eb = np.diag(data.fock_mo[1])[nc:]
    e_full = eb[None, :] - ea[:, None]
    h_cv = e_full[:nc, no:].ravel()
    h_co = e_full[:nc, :no].ravel()
    h_ov = e_full[nc:, no:].ravel()
    h_oo = e_full[nc:, :no].ravel()
    if remove:
        Vp = np.asarray(sf_oo_projector(no))
        h_oo = np.einsum("pq,p,pq->q", Vp, h_oo, Vp)
    hdiag = np.concatenate([h_cv, h_co, h_ov, h_oo])

    def expand(v):
        if not remove:
            return v
        Vp = np.asarray(sf_oo_projector(no))
        return np.concatenate([v[:d3], Vp @ v[d3:]], axis=0)

    return SigmaOperator(
        matvec=matvec, hdiag=hdiag, dim=dim, _to_blocked=expand,
        matvec_raw=_matvec, consts=consts,
    )
