"""Production-scale DF response state build: every O(N^4) contraction
on the chip, nothing bigger than nao^2 computed in host f64.

`build_df_data` (`sigma_df.py`) prepares the response tensors with host
dressing + host MO transforms — fine to ~200 AO, hopeless at production
sizes on a 1-core host (TTM/dzp 598 AO: the metric dressing alone is
1.1e16 f64 flops).  The reference sidesteps state preparation entirely
by taking pyscf-converged objects and in-core AO tensors
(`/root/reference/xtddft/XTDA_GPU.py` consumes `mf` + host einsums); a
TPU-native framework has to own it.  This module builds the same
`DFData` through the streaming compensated-arithmetic device builders
(`scf/df_build.py`):

    j3c (host mmap) --h2d--> MO transform --> metric dressing   [chip,
        double-single (hi,lo) f32 pairs, ~2^-45 relative]
    grid AO (host)  --h2d--> MO transform                        [chip]

yielding BOTH precisions from one pass:

  * the f32 production operator: `DFData(B=hi, phi=phi_hi, ...)`,
    already device-resident — no cast, no re-upload;
  * the f64 refinement operator: hi + lo joined on host (exact to the
    compensated build's ~5e-8 f32-pair floor, `utils/dsmat.py` header)
    for the Rayleigh-Ritz accuracy statement of the chip solve.

The joined f64 tensors can be disk-cached (`cache=`): the driver's cold
bench then skips the build entirely and uploads the stored hi tensor
(~seconds) instead of re-dressing (~minutes).

Reference classes covered: R/RO and genuinely-unrestricted UKS (beta-MO
twin tensors, `DFData.B_b`/`phi_b`), global hybrids AND range-separated
hybrids (a second erf-attenuated dressed tensor `B_lr` from the
omega-metric/omega-j3c pair — `/root/reference/xtddft/XTDA.py:94-99`
RSH split), LDA/GGA/MGGA functionals (the tau channel rides the same
4-component MO grid table).
"""

from __future__ import annotations

import pathlib

import numpy as np

__all__ = ["build_production_state"]


def build_production_state(ref, cache: str | pathlib.Path | None = None,
                           tag: str = "prod", aux_chunk: int = 256,
                           b_dtype=np.float32, want_f64: bool = True,
                           packed: bool | None = None):
    """Returns (data32, data64): the chip-resident reduced-precision
    `DFData` and its host-f64 twin for refinement.

    want_f64=False skips assembling the host-f64 B (an 11+ GB allocation
    at production sizes) and returns data64=None — the bench cold path,
    which only runs the chip solve against a stored golden.

    ref:    `Reference` — R/RO (shared spatial orbitals) or genuinely
            unrestricted UKS (beta twin tensors are built from ``mo_b``);
            RSH references additionally dress the erf-attenuated tensor
            (requires the omega j3c/metric via ``env.df_j3c_host(omega)``
            — inject with ``env.set_df_j3c(arr, omega)`` for disk-cached
            builds).
    cache:  directory for the dressed-tensor disk cache; when the cached
            arrays exist the chip build is skipped and the hi halves are
            uploaded directly (the bench cold path).
    b_dtype: dtype of the device B for the solve (np.float32 headline;
            jnp.bfloat16 halves HBM at 862-AO-class sizes).
    packed: store B^MO packed-symmetric (lower pair triangle, EXACT f32
            at half the HBM + bf16 lo — `df_build.build_bmo_device_packed`)
            — the layout that fits TTM-1Cz/dzp (862 AO) on a 16 GB v5e.
            None = auto by device HBM budget.  Packed is R/RO non-RSH
            only (the sigma's unpack path covers the single-tensor
            layout); UKS/RSH references force the dense layout.

    Requires `ref.env` to be in DF mode with the raw j3c available
    (`env.set_df_j3c` mmap injection or `df_j3c_host`).
    """
    import jax.numpy as jnp

    from xtddft_tpu.grids import eval_ao
    from xtddft_tpu.response.sigma_df import DFData
    from xtddft_tpu.scf.df_build import (build_bmo_device,
                                         build_bmo_device_packed,
                                         transform_mo_device)
    from xtddft_tpu.scf.jk_device import _hbm_budget

    unrestricted = ref.mo_b is not ref.mo_a and not np.array_equal(
        ref.mo_a, ref.mo_b)
    has_lr = ref.omega != 0.0 and abs(ref.alpha - ref.hyb) > 1e-12

    env = ref.env
    mo = np.asarray(ref.mo_a, dtype=np.float64)
    mo_b = np.asarray(ref.mo_b, dtype=np.float64) if unrestricted else None
    nmo = mo.shape[1]
    cache = pathlib.Path(cache) if cache is not None else None

    def _cached(name):
        return cache / f"{tag}_{name}.npy" if cache is not None else None

    naux = env.aux_layout.nao
    if unrestricted or has_lr:
        # the packed unpack path in the sigma covers the single-tensor
        # R/RO non-RSH layout only; twin/lr tensors use dense rows
        packed = False
    if packed is None:
        # an existing dressed cache pins the layout; otherwise decide by
        # the device HBM budget (full hi/lo build peak vs packed ~60%)
        if cache is not None and _cached("bmo_hi").exists():
            packed = False
        elif cache is not None and _cached("bmop_hi").exists():
            packed = True
        else:
            budget = _hbm_budget()
            pair_bytes = 2.0 * naux * nmo * nmo * 4
            packed = budget is not None and pair_bytes + 1e9 > budget

    # ---- B^MO (hi, lo), one leg per (orbital set, omega) -----------------
    def _build_b(name, mo_t, omega):
        """Returns (B_dev_hi, B64_or_None) for one dressed-tensor leg,
        cache-first; the hi half stays device-resident."""
        pfx = ("bmop" if packed else "bmo") + name
        bhi_p, blo_p = _cached(f"{pfx}_hi"), _cached(f"{pfx}_lo")
        if bhi_p is not None and bhi_p.exists() and blo_p.exists():
            from xtddft_tpu.scf.df_build import h2d_rows

            Bhi_np = np.load(bhi_p, mmap_mode="r")
            Blo_np = np.load(blo_p, mmap_mode="r")
            Bhi = h2d_rows(Bhi_np)  # multi-GB: chunked h2d, OOM backoff
            Blo_dev = None
        else:
            meig = env.df_metric_eig_host(omega)
            j3c = env.df_j3c_host(omega)
            if packed:
                Bhi, Blo = build_bmo_device_packed(
                    meig, j3c, mo_t, aux_chunk=min(aux_chunk, 128))
            else:
                Bhi, Blo = build_bmo_device(
                    meig, j3c, mo_t, aux_chunk=aux_chunk)
            Bhi_np = np.asarray(Bhi)  # d2h once, for the f64 twin + cache
            # bf16 has no npy dtype: persist the packed lo as f32.
            # CHUNKED d2h: a whole-array np.asarray(Blo, f32) first
            # materializes a full-size f32 copy on the device — on the
            # post-dressing fragmented arena that (2x the lo bytes in
            # one contiguous block) was the r5 RESOURCE_EXHAUSTED at
            # 598 AO; per-row-chunk casts keep the transient tiny
            Blo_np = np.empty(Blo.shape, np.float32)
            rows = max(1, int(6.4e7 // max(1, int(np.prod(Blo.shape[1:])))))
            for i0 in range(0, Blo.shape[0], rows):
                Blo_np[i0:i0 + rows] = np.asarray(
                    Blo[i0:i0 + rows].astype(jnp.float32))
            if bhi_p is not None:
                np.save(bhi_p, Bhi_np)
                np.save(blo_p, Blo_np)
            Blo_dev = Blo
            del Blo
        B64 = Bhi_np.astype(np.float64) + Blo_np if want_f64 else None
        if Blo_dev is not None:
            # the lo half has served its purpose on device; free the HBM
            Blo_dev.delete()
        return Bhi, B64

    Bhi, B64 = _build_b("", mo, 0.0)
    Bhi_b = B64_b = Bhi_lr = B64_lr = Bhi_lr_b = B64_lr_b = None
    if unrestricted:
        Bhi_b, B64_b = _build_b("_b", mo_b, 0.0)
    if has_lr:
        Bhi_lr, B64_lr = _build_b("_lr", mo, float(ref.omega))
        if unrestricted:
            Bhi_lr_b, B64_lr_b = _build_b("_lr_b", mo_b, float(ref.omega))

    # ---- grid tensors (hybrid-DFT references) -----------------------------
    phi_hi = phi64 = grid_w32 = grid_w64 = rho0_32 = rho0_64 = None
    phib_hi = phib64 = None
    if ref.spec is not None and ref.spec.components:
        needs_tau = bool(getattr(ref.spec, "needs_tau", False))

        def _build_phi(name, mo_t):
            phi_hi_p, phi_lo_p = _cached(f"phimo{name}_hi"), _cached(
                f"phimo{name}_lo")
            if (phi_hi_p is not None and phi_hi_p.exists()
                    and phi_lo_p.exists()):
                from xtddft_tpu.scf.df_build import h2d_rows

                p_hi_np = np.load(phi_hi_p, mmap_mode="r")
                p64 = p_hi_np.astype(np.float64) + np.load(
                    phi_lo_p, mmap_mode="r")
                p_hi = h2d_rows(p_hi_np)
            else:
                ao = np.asarray(eval_ao(env.layout, env.grid.coords,
                                        deriv=1))
                p_hi, p_lo = transform_mo_device(ao, mo_t)
                p_hi_np = np.asarray(p_hi)
                p_lo_np = np.asarray(p_lo)
                if phi_hi_p is not None:
                    np.save(phi_hi_p, p_hi_np)
                    np.save(phi_lo_p, p_lo_np)
                p64 = p_hi_np.astype(np.float64) + p_lo_np
                p_lo.delete()
            return p_hi, p64

        phi_hi, phi64 = _build_phi("", mo)
        if unrestricted:
            phib_hi, phib64 = _build_phi("_b", mo_b)
        grid_w64 = np.asarray(env.grid.weights, dtype=np.float64)
        # rho0 from the occupied MO values: exact given phi64,
        # O(ngrid nocc); the MGGA tau channel rides the same 4-component
        # table (tau = 1/2 sum_occ |grad phi_i|^2)
        rho0_64 = _rho0_from_phimo(
            phi64, phib64 if unrestricted else phi64, ref, tau=needs_tau)
        # f32-safe density floor for the reduced-precision operator: the
        # GGA derivative ladders overflow f32 below ~3e-7 (same constant
        # and masking as `sigma_df.cast_df_data` — without it the chip
        # operator returns NaN from far-tail grid points)
        ra, rb, ga, gb, *taus = (
            np.asarray(r, dtype=np.float64) for r in rho0_64)
        mask = (ra > 3e-7) | (rb > 3e-7)
        w32 = np.where(mask, grid_w64, 0.0)
        rho0_32 = tuple(
            jnp.asarray(np.asarray(r, dtype=np.float32))
            for r in (np.where(mask, ra, 1.0), np.where(mask, rb, 1.0),
                      np.where(mask[None, :], ga, 0.0),
                      np.where(mask[None, :], gb, 0.0))
            + tuple(np.where(mask, t, 1.0) for t in taus))
        grid_w32 = jnp.asarray(w32.astype(np.float32))

    fock_mo = np.stack([ref.fock_a_mo, ref.fock_b_mo])
    fock_hf = None
    if ref.restricted_open and ref.fock_a_hf_mo is not None:
        fock_hf = np.stack([ref.fock_a_hf_mo, ref.fock_b_hf_mo])

    hyb_lr = (ref.alpha - ref.hyb) if has_lr else 0.0
    common = dict(nc=ref.nc, no=ref.no, nv=ref.nv, hyb=ref.hyb,
                  spec=ref.spec, fock_mo=fock_mo, fock_hf_mo=fock_hf,
                  hyb_lr=hyb_lr)
    def _cast_b(B):
        # b_dtype (bf16 HBM-saving option) applies to EVERY B leg — the
        # UKS/RSH twin tensors are where HBM pressure peaks (ADVICE r3)
        if B is None or b_dtype == np.float32:
            return B
        return B.astype(b_dtype)

    data32 = DFData(B=_cast_b(Bhi), phi=phi_hi, grid_w=grid_w32,
                    rho0=rho0_32, packed=packed, B_b=_cast_b(Bhi_b),
                    B_lr=_cast_b(Bhi_lr), B_lr_b=_cast_b(Bhi_lr_b),
                    phi_b=phib_hi, **common)
    data64 = (DFData(B=B64, phi=phi64, grid_w=grid_w64, rho0=rho0_64,
                     packed=packed, B_b=B64_b, B_lr=B64_lr,
                     B_lr_b=B64_lr_b, phi_b=phib64, **common)
              if want_f64 else None)
    return data32, data64


def _rho0_from_phimo(phi64: np.ndarray, phib64: np.ndarray, ref,
                     tau: bool = False):
    """(ra, rb, ga, gb[, ta, tb]) ground-state densities/gradients on the
    grid from the MO-basis grid tables — same contract as
    `sigma._rho0_jnp` but O(ngrid nocc) given phi instead of
    O(ngrid nao^2).  ``phib64`` is the beta-MO table (same array as
    ``phi64`` for R/RO references)."""
    pa = phi64[:, :, : ref.nocc_a]
    pb = phib64[:, :, : ref.nocc_b]
    ra = np.einsum("gi,gi->g", pa[0], pa[0])
    rb = np.einsum("gi,gi->g", pb[0], pb[0])
    ga = 2.0 * np.einsum("xgi,gi->xg", pa[1:4], pa[0])
    gb = 2.0 * np.einsum("xgi,gi->xg", pb[1:4], pb[0])
    out = (ra, rb, ga, gb)
    if tau:
        ta = 0.5 * np.einsum("xgi,xgi->g", pa[1:4], pa[1:4])
        tb = 0.5 * np.einsum("xgi,xgi->g", pb[1:4], pb[1:4])
        out = out + (ta, tb)
    return out
