"""Analytic nuclear gradients for Hartree-Fock references (RHF/UHF/ROHF).

The reference's gradient modules are work-in-progress Z-vector codes built
on PySCF's integral derivatives (`grad_jp/grad/*.py`); here the ground
-state gradient is assembled from the in-house derivative shell pairs:

    dE/dA = Tr(D dh/dA) + 1/2 Gamma . d(pq|rs)/dA - Tr(W dS/dA) + dEnuc/dA

with W = sum_s D_s F_s D_s (the energy-weighted density, valid at any
converged SCF stationary point incl. the Roothaan ROHF one) and
Gamma_pqrs = Dtot_pq Dtot_rs - sum_s Ds_ps Ds_qr (hyb-scaled exchange).

Validated against the FD harness (`grad/fd.py`) to ~1e-7 hartree/bohr.
DFT gradients additionally need grid-weight derivatives and are not yet
implemented (use FD)."""

from __future__ import annotations

import numpy as np

from xtddft_tpu.ints import mcmurchie as md
from xtddft_tpu.ints.one_electron import ip_kinetic, ip_overlap, ip_rinv
from xtddft_tpu.ints.two_electron import _quartet_cart, _sph4
from xtddft_tpu.ints.shell import BasisLayout


def _grad_eri_contract(layout: BasisLayout, Gamma: np.ndarray) -> np.ndarray:
    """(natm, 3) contraction g[A] = sum over derivative positions on atom A
    of Gamma_pqrs (d pq|rs)/dr; each ordered (bra-pair, ket-pair) loop entry
    covers the derivative on the first bra function exactly once."""
    shells = layout.shells
    nsh = len(shells)
    natm = layout.mol.natm
    g = np.zeros((natm, 3))
    # cache plain pairs (kets) and derivative pairs (bras)
    plain = {}
    for k1 in range(nsh):
        for k2 in range(nsh):
            plain[(k1, k2)] = md.make_shell_pair(shells[k1], shells[k2])

    def sl(s):
        return slice(s.ao_offset, s.ao_offset + s.nao)

    for b1 in range(nsh):
        ia = shells[b1].atom_index
        for b2 in range(nsh):
            dpairs = [
                md.make_shell_pair_deriv(shells[b1], shells[b2], d_bra=d)
                for d in range(3)
            ]
            for k1 in range(nsh):
                for k2 in range(nsh):
                    Gblk = Gamma[
                        sl(shells[b1]), sl(shells[b2]),
                        sl(shells[k1]), sl(shells[k2]),
                    ]
                    ket = plain[(k1, k2)]
                    for d in range(3):
                        t = _quartet_cart(dpairs[d], ket)
                        t = _sph4(
                            t, shells[b1].l, shells[b2].l,
                            shells[k1].l, shells[k2].l,
                        )
                        # d/dA = -d/dr on the bra function
                        g[ia, d] -= np.einsum("pqrs,pqrs->", t, Gblk)
    return g


def grad_nuc(mol) -> np.ndarray:
    z = mol.charges
    r = mol.coords
    g = np.zeros((mol.natm, 3))
    for i in range(mol.natm):
        for j in range(mol.natm):
            if i == j:
                continue
            rij = r[i] - r[j]
            g[i] -= z[i] * z[j] * rij / np.linalg.norm(rij) ** 3
    return g


def hf_gradient(mf) -> np.ndarray:
    """(natm, 3) analytic HF gradient of a converged RHF/UHF/ROHF MeanField."""
    if mf.xc is not None:
        raise NotImplementedError(
            "analytic gradients are HF-only for now (DFT grid-response "
            "terms not implemented); use grad.fd_gradient"
        )
    env = mf.env
    layout = env.layout
    mol = env.mol
    natm = mol.natm
    ao_atoms = layout.ao_atoms
    dm = np.asarray(mf.make_rdm1())
    if dm.ndim == 3:
        da, db = dm[0], dm[1]
    else:
        da = db = 0.5 * dm
    dtot = da + db

    # energy-weighted density W = sum_s D_s F_s D_s
    W = da @ np.asarray(mf.fock_a) @ da + db @ np.asarray(mf.fock_b) @ db

    atom_mask = np.zeros((natm, layout.nao))
    atom_mask[ao_atoms, np.arange(layout.nao)] = 1.0

    g = grad_nuc(mol)

    # overlap (Pulay) term: dS/dA[pq] = -dS_ip[x,p,q] (p in A) - (q in A)
    ipS = ip_overlap(layout)
    g += 2.0 * np.einsum("Ap,xpq,pq->Ax", atom_mask, ipS, W)

    # kinetic term
    ipT = ip_kinetic(layout)
    g -= 2.0 * np.einsum("Ap,xpq,pq->Ax", atom_mask, ipT, dtot)

    # nuclear attraction: basis-center + operator-center (transl. invariance)
    for C, (Z, Rc) in enumerate(zip(mol.charges, mol.coords)):
        ipr = ip_rinv(layout, Rc)  # <d_r p|1/r_C|q>
        # basis-center part: d/dA = -d/dr, V carries -Z
        g += 2.0 * Z * np.einsum("Ap,xpq,pq->Ax", atom_mask, ipr, dtot)
        # operator-center part: dW0/dC = +(ipr + ipr^T)
        g[C] -= 2.0 * Z * np.einsum("xpq,pq->x", ipr, dtot)

    # two-electron term
    hyb = 1.0
    Gamma = np.einsum("pq,rs->pqrs", dtot, dtot)
    Gamma -= hyb * (
        np.einsum("ps,qr->pqrs", da, da) + np.einsum("ps,qr->pqrs", db, db)
    )
    # dE2 = 1/2 Gamma . [4 derivative positions] = 2 * (single-position sum)
    # (relabeling symmetry of Gamma and the integral)
    g += 2.0 * _grad_eri_contract(layout, Gamma)
    return g
