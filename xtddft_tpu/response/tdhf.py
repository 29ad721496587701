"""Full TDHF/RPA (A,B) pencil response: dense builders + Casida solver.

The reference's gradient layer consumes genuine (X, Y) TDHF amplitudes
(`/root/reference/xtddft/grad_jp/grad/rtdhf.py:13` ``grad_elec(td_grad,
x_y, ...)`` handles X±Y; `utdhf.py:13` the unrestricted case) produced by
pyscf's ``tdscf.TDHF``; its own response classes are TDA-only.  This
module owns the response side in-house:

- dense (A, B) builders on top of the existing TDA coupling tensors —
  for real orbitals the B matrix reuses the SAME MO-ERI tensors with an
  index transpose ((ib|ja) = (ia|jb).transpose(0,3,2,1)) and the same
  adiabatic fxc coupling, so no new integral work is needed;
- the Casida symmetrized solve: with S = A - B positive definite
  (stable reference), M = S^{1/2} (A+B) S^{1/2} is symmetric positive
  and M Z = w^2 Z gives w plus (X+Y), (X-Y) with the standard
  <X+Y|X-Y> = 1 normalization.  A non-PD S is reported as an external
  (triplet/nonreal) instability instead of silently returning complex
  roots.

Layouts match the TDA drivers: closed shell (nocc*nvir), unrestricted
blocked [occ_a*vir_a | occ_b*vir_b] (the CV|OV|CO|CV order of
`dense.utda_dense` flattened per spin).
"""

from __future__ import annotations

import numpy as np

from xtddft_tpu.response import dense as _d
from xtddft_tpu.response.dense import _rho0, fxc_blocks, mo_eri
from xtddft_tpu.response.reference_state import Reference


def _coulomb_iajb(ref: Reference, co1, cv1, co2, cv2) -> np.ndarray:
    """(i1 a1 | j2 b2) coulomb-type MO tensor."""
    return mo_eri(ref.env.eri, co1, cv1, co2, cv2)


def _exchange_ibja(ref: Reference, co, cv) -> np.ndarray:
    """hyb*(ib|ja) + (alpha-hyb)*(ib|ja)_omega as an (i,a,j,b) tensor.

    (ib|ja) is the (ia|jb) coulomb tensor with a<->b swapped, so the RSH
    mixing mirrors `dense._k_eri` without new integral classes."""
    m = ref.hyb * mo_eri(ref.env.eri, co, cv, co, cv)
    if ref.omega != 0.0 and abs(ref.alpha - ref.hyb) > 1e-12:
        m = m + (ref.alpha - ref.hyb) * mo_eri(
            ref.env.eri_omega(ref.omega), co, cv, co, cv
        )
    return np.einsum("ibja->iajb", m)


def tdhf_b_blocks(ref: Reference):
    """(baa, bab, bbb) 4-index tensors of the RPA B coupling matrix
    (no Fock terms; B has none).  B_ia,jb = (ia|jb) - cx (ib|ja) + fxc,
    with exchange only in the same-spin blocks."""
    oa, va = ref.orbo_a, ref.orbv_a
    ob, vb = ref.orbo_b, ref.orbv_b
    baa = _coulomb_iajb(ref, oa, va, oa, va) - _exchange_ibja(ref, oa, va)
    bbb = _coulomb_iajb(ref, ob, vb, ob, vb) - _exchange_ibja(ref, ob, vb)
    bab = _coulomb_iajb(ref, oa, va, ob, vb)
    if ref.spec is not None and ref.spec.components:
        rho0 = _rho0(ref)
        faa, fab, fbb = fxc_blocks(
            ref.spec, ref.env.ao, ref.env.grid_weights, rho0,
            (oa, va), (ob, vb),
        )
        na, nva = oa.shape[1], va.shape[1]
        nb, nvb = ob.shape[1], vb.shape[1]
        baa += faa.reshape(na, nva, na, nva)
        bab += fab.reshape(na, nva, nb, nvb)
        bbb += fbb.reshape(nb, nvb, nb, nvb)
    return baa, bab, bbb


def rtdhf_dense(ref: Reference, singlet: bool = True):
    """Closed-shell (A, B): A from the TDA builders, B per tdhf_b_blocks
    collapsed to the singlet/triplet combinations."""
    A = (_d.tda_singlet_dense(ref) if singlet else _d.tda_triplet_dense(ref))
    baa, bab, _ = tdhf_b_blocks(ref)
    no_, nv_ = baa.shape[0], baa.shape[1]
    B = (baa + bab) if singlet else (baa - bab)
    return A, B.reshape(no_ * nv_, no_ * nv_)


def blocked_b(ref: Reference) -> np.ndarray:
    """The RPA B matrix in the blocked CV(a)|OV(a)|CO(b)|CV(b) layout
    (matches `dense.utda_dense`/`dense.xtda_dense`; the beta part is
    permuted from the natural row-major ov order by
    `spaces.order_interleaved2blocked`)."""
    from xtddft_tpu.response.spaces import order_interleaved2blocked

    baa, bab, bbb = tdhf_b_blocks(ref)
    na = baa.shape[0] * baa.shape[1]
    nb = bbb.shape[0] * bbb.shape[1]
    B = np.zeros((na + nb, na + nb))
    B[:na, :na] = baa.reshape(na, na)
    B[:na, na:] = bab.reshape(na, nb)
    B[na:, :na] = B[:na, na:].T
    B[na:, na:] = bbb.reshape(nb, nb)
    perm = order_interleaved2blocked(ref.nc, ref.no, ref.nv)
    return B[np.ix_(perm, perm)]


def utdhf_dense(ref: Reference):
    """Unrestricted (A, B) in the blocked CV(a)|OV(a)|CO(b)|CV(b)
    layout."""
    return _d.utda_dense(ref), blocked_b(ref)


def xtdhf_dense(ref: Reference):
    """Spin-adapted X-TDHF (A, B) pencil on a restricted-open reference.

    A is the spin-adapted X-TDA matrix (`dense.xtda_dense`, incl. the dA
    Fock-difference terms of `xtddft/XTDA.py:291-331`).  B carries NO dA
    analog: the dA corrections are effective one-electron (Fock
    difference) couplings between single excitations, while RPA B
    elements <0|H|double> contain no one-electron parts (Slater-Condon)
    — so B on the X space is exactly the bare antisymmetrized coupling
    `blocked_b`.  NOTE this genuinely extends the reference: its
    ``XTDHF`` class (`xtddft/grad_jp/grad/xtdhf.py:534`) subclasses XCIS
    and produces Y=0 TDA amplitudes; no X-space B matrix exists there."""
    if not ref.restricted_open:
        raise ValueError("xtdhf_dense requires a ROKS/ROHF reference")
    return _d.xtda_dense(ref), blocked_b(ref)


class RPAInstabilityError(RuntimeError):
    """A - B is not positive definite: the reference is externally
    unstable and the RPA pencil has non-real roots."""


def solve_casida(A: np.ndarray, B: np.ndarray, nroots: int,
                 pos_threshold: float = 1e-6):
    """Solve the RPA pencil [[A,B],[B,A]] [X,Y] = w [X,-Y] for real
    orbitals via the symmetrized form.

    Returns (w, xpy, xmy): the lowest ``nroots`` excitation energies and
    the (X+Y), (X-Y) vectors as (dim, nroots) columns with
    <X+Y|X-Y> = 1 (pyscf's convention, so amplitudes interoperate with
    reference-style gradient code).

    Roots below ``pos_threshold`` (e.g. the exact zero-frequency spin
    rotation of an open-shell UHF/UKS reference) are skipped — they are
    marginal Goldstone modes, not excitations, and the matrix-free DF
    solver (`solver/rpa.py` pick_positive) makes the same choice, so the
    two backends return identical state lists.  Pass 0.0 to keep them."""
    S = A - B
    ws, Us = np.linalg.eigh(0.5 * (S + S.T))
    if ws.min() < -1e-9:
        raise RPAInstabilityError(
            f"A-B has lowest eigenvalue {ws.min():.3e} < 0: reference is "
            "externally unstable (run stability analysis / relax the SCF)"
        )
    # exact/near-zero modes of A-B (e.g. rotations among degenerate
    # partially-occupied orbitals — OH's singly-occupied pi pair) are
    # zero-frequency marginal modes, not excitations: project them out
    # (canonical orthogonalization), do not refuse
    keep = ws > max(1e-10, float(ws.max()) * 1e-14)
    Uk = Us[:, keep]
    sk = np.sqrt(ws[keep])
    P = Uk * sk[None, :]          # S^{1/2} restricted to the range
    Pm = Uk / sk[None, :]         # S^{-1/2} on the range
    M = P.T @ (A + B) @ P
    w2, Z = np.linalg.eigh(0.5 * (M + M.T))
    w2 = np.maximum(w2, 0.0)
    w = np.sqrt(w2)
    if pos_threshold > 0.0:
        sel = w > pos_threshold
        w, Z = w[sel], Z[:, sel]
    n = min(nroots, w.shape[0])
    w, Z = w[:n], Z[:, :n]
    sw = np.sqrt(np.where(w > 0, w, 1.0))
    xpy = P @ Z / sw[None, :]
    xmy = Pm @ Z * sw[None, :]
    return w, xpy, xmy
