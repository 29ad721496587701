"""User-facing excited-state method drivers.

Thin orchestration over `response/` (matrix builders + sigma operators),
`solver/` (eigensolvers) and `props/`, with the same method semantics as
the reference classes:

- TDA     closed-shell singlet/triplet TDA       (`xtddft/TDA.py:16`)
- UTDA    unrestricted TDA, blocked layout       (`xtddft/UTDA.py:16`)
- XTDA    spin-adapted X-TDA (ROKS reference)    (`xtddft/XTDA.py:21`)
- SFTDA   spin-flip up/down TDA                  (`xtddft/SF_TDA.py:17`)
- XSFTDA  spin-adapted spin-flip-down TDA        (`xtddft/XSF_TDA.py:146`)
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from xtddft_tpu import units
from xtddft_tpu.props import oscillator, spin
from xtddft_tpu.response import dense
from xtddft_tpu.response.reference_state import Reference, make_reference
from xtddft_tpu.response.spaces import so2st
from xtddft_tpu.scf.driver import MeanField


@dataclasses.dataclass
class ExcitationResult:
    e: np.ndarray  # hartree
    v: np.ndarray  # (dim, nstates) blocked eigenvectors
    osc: np.ndarray | None = None
    rot: np.ndarray | None = None
    ds2: np.ndarray | None = None
    converged: bool = True
    irreps: list | None = None  # Mulliken labels (with symmetry=True)

    @property
    def e_eV(self) -> np.ndarray:
        return self.e * units.HA2EV


def _ref_of(mf) -> Reference:
    if isinstance(mf, Reference):
        return mf
    if isinstance(mf, MeanField):
        return make_reference(mf)
    raise TypeError(f"expected MeanField or Reference, got {type(mf)}")


class _Base:
    def __init__(self, mf, nstates: int = 5):
        self.ref = _ref_of(mf)
        self.nstates = nstates


def _resolve_backend(ref: Reference, backend: str, dim: int,
                     use_davidson) -> str:
    """'dense' (full eigh), 'incore' (matrix-free sigma over in-core MO
    ERIs + Davidson), or 'df' (density-fitted sigma + device Davidson —
    the TPU production path).  'auto' picks by problem size, mirroring the
    reference's dense->eigsh->Davidson ladder (`xtddft/XSF_TDA.py:
    1529-1534`) but with DF as the large-system answer."""
    if backend != "auto":
        return backend
    if use_davidson:  # explicit legacy flag: iterative on the in-core path
        return "incore"
    if ref.env.df or ref.env.nao > 120 or dim > 4000:
        return "df"
    return "dense"


class TDA(_Base):
    """Closed-shell TDA (RKS/RHF reference)."""

    def __init__(self, mf, nstates: int = 5, singlet: bool = True):
        super().__init__(mf, nstates)
        self.singlet = singlet
        if self.ref.no != 0:
            raise ValueError(
                "TDA requires a closed-shell (RKS/RHF) reference; use UTDA "
                "or XTDA for open-shell systems"
            )

    def kernel(self) -> ExcitationResult:
        ref = self.ref
        A = (
            dense.tda_singlet_dense(ref)
            if self.singlet
            else dense.tda_triplet_dense(ref)
        )
        e, v = np.linalg.eigh(A)
        n = min(self.nstates, e.shape[0])
        e, v = e[:n], v[:, :n]
        if self.singlet:
            osc = oscillator.closed_shell_osc(ref, e, v)
            rot = oscillator.closed_shell_rot(ref, e, v)
        else:
            osc = np.zeros(n)
            rot = np.zeros(n)
        return ExcitationResult(e=e, v=v, osc=osc, rot=rot)


class UTDA(_Base):
    """Unrestricted TDA in the blocked CV(a)|OV(a)|CO(b)|CV(b) layout."""

    def kernel(self) -> ExcitationResult:
        ref = self.ref
        A = dense.utda_dense(ref)
        e, v = np.linalg.eigh(A)
        n = min(self.nstates, e.shape[0])
        e, v = e[:n], v[:, :n]
        osc = oscillator.spin_conserving_osc(ref, e, v)
        rot = oscillator.spin_conserving_rot(ref, e, v)
        ds2 = spin.utda_delta_s2(ref, v)
        return ExcitationResult(e=e, v=v, osc=osc, rot=rot, ds2=ds2)


class XTDA(_Base):
    """Spin-adapted spin-conserving X-TDA on a restricted-open reference.

    backend: 'auto' (size-dispatched) | 'dense' | 'incore' | 'df'.
    The 'df' route is the TPU production path: density-fitted sigma
    (J/K from the fitted B tensor + MO-grid fxc + dA) with the
    device-resident block Davidson — the TPU-native equivalent of the
    reference's AO-direct hot loop (`xtddft/XTDA.py:520-543`)."""

    def __init__(self, mf, nstates: int = 10, so2st_out: bool = False,
                 use_davidson: bool = False, backend: str = "auto",
                 symmetry: bool = False):
        super().__init__(mf, nstates)
        self.so2st_out = so2st_out
        self.use_davidson = use_davidson
        self.backend = backend
        self.symmetry = symmetry
        if not self.ref.restricted_open:
            raise ValueError("XTDA requires a ROKS/ROHF reference")

    def kernel(self) -> ExcitationResult:
        ref = self.ref
        dim = (ref.nc + ref.no) * ref.nv + ref.nc * (ref.no + ref.nv)
        backend = _resolve_backend(ref, self.backend, dim, self.use_davidson)
        if backend == "df":
            from xtddft_tpu.response.sigma_df import build_df_data, xtda_sigma_df
            from xtddft_tpu.solver.davidson_jit import davidson_device

            op = xtda_sigma_df(build_df_data(ref))
            e, vv, conv = davidson_device(
                op.matvec, op.hdiag, nroots=self.nstates,
                init_guess=op.init_guess(self.nstates),
                pick_positive=True, tol=None,
            )
            v = op.to_blocked(vv)
            converged = bool(np.all(conv))
        elif backend == "incore":
            from xtddft_tpu.response.sigma import xtda_sigma_operator
            from xtddft_tpu.solver.davidson import davidson

            op = xtda_sigma_operator(ref)
            e, vv, conv = davidson(
                op.matvec, op.hdiag, nroots=self.nstates,
                init_guess=op.init_guess(self.nstates),
                pick_positive=True,
            )
            v = op.to_blocked(vv)
            converged = bool(np.all(conv))
        else:
            A = dense.xtda_dense(ref)
            e, v = np.linalg.eigh(A)
            converged = True
        n = min(self.nstates, e.shape[0])
        e, v = e[:n], v[:, :n]
        osc = oscillator.spin_conserving_osc(ref, e, v)
        rot = oscillator.spin_conserving_rot(ref, e, v)
        ds2 = spin.xtda_delta_s2(ref, v)
        irreps = None
        if self.symmetry:
            # the reference's calculate_irrep (`xtddft/XTDA.py:1467`)
            from xtddft_tpu.props.irreps import state_irreps

            irreps, _ = state_irreps(ref, v, kind="spin_conserving")
        if self.so2st_out:
            v = so2st(v, ref.nc, ref.no, ref.nv)
        return ExcitationResult(e=e, v=v, osc=osc, rot=rot, ds2=ds2,
                                converged=converged, irreps=irreps)


class SFTDA(_Base):
    """Spin-flip TDA; extype='up' (Sf=Si+1) or 'down' (Sf=Si-1)."""

    def __init__(self, mf, nstates: int = 5, extype: str = "down",
                 method: int = 0, use_davidson: bool = False):
        super().__init__(mf, nstates)
        self.extype = extype
        self.method = method
        self.use_davidson = use_davidson

    def kernel(self) -> ExcitationResult:
        ref = self.ref
        converged = True
        if self.use_davidson:
            from xtddft_tpu.response.sigma import sf_sigma_operator
            from xtddft_tpu.solver.davidson import davidson

            op = sf_sigma_operator(ref, self.extype, self.method)
            e, vv, conv = davidson(
                op.matvec, op.hdiag, nroots=self.nstates,
                init_guess=op.init_guess(self.nstates),
            )
            v = op.to_blocked(vv)
            converged = bool(np.all(conv))
        else:
            if self.extype == "up":
                A = dense.sf_up_dense(ref, self.method)
            else:
                A = dense.sf_down_dense(ref, self.method)
            e, v = np.linalg.eigh(A)
        n = min(self.nstates, e.shape[0])
        e, v = e[:n], v[:, :n]
        ds2 = None
        if self.extype == "down" and ref.restricted_open:
            ds2 = spin.xsf_delta_s2_roks(ref, v)
        return ExcitationResult(e=e, v=v, ds2=ds2, converged=converged)


class XSFTDA(_Base):
    """Spin-adapted spin-flip-down XSF-TDA (arXiv:2511.16906).

    SA levels and the fglobal=(1-d_lda)*cx+d_lda kernel scaling follow
    `xtddft/XSF_TDA.py:148-152,1511-1518`.
    """

    def __init__(self, mf, nstates: int = 5, SA: int | None = None,
                 method: int = 0, use_davidson: bool = False,
                 backend: str = "auto", symmetry: bool = False):
        super().__init__(mf, nstates)
        self.SA = SA if SA is not None else (3 if self.ref.restricted_open else 0)
        self.method = method
        self.use_davidson = use_davidson
        self.backend = backend
        self.symmetry = symmetry

    def kernel(
        self,
        nstates: int | None = None,
        remove: bool | None = None,
        foo: float = 1.0,
        d_lda: float = 0.3,
        fglobal: float | None = None,
        fit: bool = True,
    ) -> ExcitationResult:
        ref = self.ref
        n = nstates if nstates is not None else self.nstates
        if self.SA > 0 and ref.no < 2:
            # the spin-adaptation factors contain 1/(2S-1) terms
            # (`xtddft/XSF_TDA.py:346-350`): singular for a doublet
            # reference — the spin-adapted flip-down ansatz needs S >= 1.
            raise ValueError(
                "spin-adapted XSF-TDA requires a reference with S >= 1 "
                "(>= 2 open shells); for a doublet use SA=0 (USF-TDA)"
            )
        if remove is None:
            remove = ref.restricted_open
        if fglobal is None:
            if ref.omega == 0:
                cx = ref.hyb
            else:
                cx = ref.hyb + (ref.alpha - ref.hyb) * math.erf(ref.omega)
            fglobal = (1.0 - d_lda) * cx + d_lda
            if self.method == 1 and fit:
                # the reference damps the dA spin-adaptation on the
                # multicollinear kernel with a 4(cx-1/2)^2 fit factor
                # (`xtddft/XSF_TDA.py:1517-1518`) — exactly zero for
                # half-and-half hybrids
                fglobal = fglobal * 4.0 * (cx - 0.5) ** 2
        converged = True
        dim = (ref.nc + ref.no) * (ref.no + ref.nv)
        backend = _resolve_backend(ref, self.backend, dim, self.use_davidson)
        if backend == "df":
            from xtddft_tpu.response.sigma_df import build_df_data, xsf_sigma_df
            from xtddft_tpu.solver.davidson_jit import davidson_device

            op = xsf_sigma_df(
                build_df_data(ref), SA=self.SA, foo=foo, fglobal=fglobal,
                method=self.method, remove=remove,
            )
            n = min(n, op.dim)
            e, vv, conv = davidson_device(
                op.matvec, op.hdiag, nroots=n,
                init_guess=op.init_guess(n), tol=None,
            )
            v_full = op.to_blocked(vv)
            converged = bool(np.all(conv))
        elif backend == "incore":
            from xtddft_tpu.response.sigma_xsf import xsf_sigma_operator
            from xtddft_tpu.solver.davidson import davidson

            op = xsf_sigma_operator(
                ref, SA=self.SA, foo=foo, fglobal=fglobal,
                method=self.method, remove=remove,
            )
            n = min(n, op.dim)
            e, vv, conv = davidson(
                op.matvec, op.hdiag, nroots=n, init_guess=op.init_guess(n)
            )
            v_full = op.to_blocked(vv)
            converged = bool(np.all(conv))
        else:
            A, vects = dense.xsf_dense(
                ref, SA=self.SA, foo=foo, fglobal=fglobal, method=self.method,
                remove=remove,
            )
            e, v = np.linalg.eigh(A)
            n = min(n, e.shape[0])
            e, v = e[:n], v[:, :n]
            if vects is not None:
                d3 = ref.nc * ref.nv + ref.nc * ref.no + ref.no * ref.nv
                v_full = np.concatenate([v[:d3], vects @ v[d3:]], axis=0)
            else:
                v_full = v
        if ref.restricted_open and self.SA != 0:
            ds2 = None  # spin-adapted states: dS2 fixed by construction
        elif ref.restricted_open:
            ds2 = spin.xsf_delta_s2_roks(ref, v_full)
        else:
            ds2 = spin.xsf_delta_s2_uks(ref, v_full)
        irreps = None
        if self.symmetry:
            from xtddft_tpu.props.irreps import state_irreps

            irreps, _ = state_irreps(ref, v_full, kind="spin_flip")
        return ExcitationResult(e=e, v=v_full, ds2=ds2, converged=converged,
                                irreps=irreps)
