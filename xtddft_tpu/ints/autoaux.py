"""Automatic even-tempered auxiliary basis generation for density fitting.

No tabulated JKFIT sets are available in this environment, so auxiliary
bases are generated from the orbital basis with the even-tempered
product-span heuristic (in the spirit of Stoychev et al., JCTC 13, 554
(2017) 'AutoAux'): for each angular momentum reachable by orbital-product
pairs, span [min, max] of the pair-exponent sums with an even-tempered
progression.
"""

from __future__ import annotations

import numpy as np

from xtddft_tpu.chem.molecule import Molecule
from xtddft_tpu.chem import basis as basis_registry
from xtddft_tpu.ints.shell import BasisLayout, Shell, nsph


def autoaux_shells(element_shells, beta: float = 2.2, l_cap: int = 4,
                   extra_l: int = 1, mode: str = "full"):
    """[(l, exps)] even-tempered aux shells from [(l, exps, coefs)].

    ``extra_l`` adds angular momenta beyond the one-center product limit
    2*lmax: atom-centered aux functions cannot exactly span *off-center*
    (bond) orbital products, and one extra l drops the max ERI fitting
    error by ~40x (measured on OH/6-31G: 2.4e-3 -> 5.7e-5).

    ``mode="jk"`` is the lean production recipe for J/K fitting at scale
    (the role of the hand-optimized def2 JKFIT sets, unobtainable
    offline): per-l ranges from the *reachable* pair sums only (no
    full-range fallback — the default recipe puts ~13 f shells on every
    hydrogen), a wider progression, l capped at 3, and the core-product
    top of the range cut for polarization l (high-exponent d/f products
    of core orbitals contribute negligibly to valence J/K but dominate
    naux).  ~2.5-3x fewer functions; excitation-energy error measured in
    tests/test_df.py."""
    by_l: dict[int, np.ndarray] = {}
    for l, exps, _ in element_shells:
        by_l.setdefault(l, [])
        by_l[l].append(np.asarray(exps))
    by_l = {l: np.concatenate(v) for l, v in by_l.items()}
    lmax = max(by_l)
    all_sums = np.concatenate(
        [
            (e1[:, None] + e2[None, :]).ravel()
            for e1 in by_l.values()
            for e2 in by_l.values()
        ]
    )
    jk = mode == "jk"
    if jk:
        beta = max(beta, 2.6)
        # one l beyond the element's own lmax covers bond products; the
        # 2*lmax reachable by one-center products adds little to J/K
        l_cap = min(l_cap, 3, lmax + 1)
        hi_frac = (1.0, 1.0, 0.25, 0.08)
    out = []
    for laux in range(min(2 * lmax + extra_l, l_cap) + 1):
        sums = []
        for l1, e1 in by_l.items():
            for l2, e2 in by_l.items():
                if abs(l1 - l2) <= laux <= l1 + l2:
                    sums.append((e1[:, None] + e2[None, :]).ravel())
        if not sums and jk:
            # beyond the one-center product limit: cover only the valence
            # (bond-product) scale instead of the full exponent range
            vv = np.concatenate([e[e < np.median(e) * 4] for e in by_l.values()])
            sums = [(vv[:, None] + vv[None, :]).ravel()]
        s = np.concatenate(sums) if sums else all_sums
        amin = max(s.min() * 0.6, 0.02)
        amax = min(s.max() * 1.2, 5e6)
        b = beta
        if jk:
            f = hi_frac[laux] if laux < len(hi_frac) else hi_frac[-1]
            amax = max(amax * f, amin * beta)
            # widen the progression with l: high-l fit functions resolve
            # angular structure, not radial detail (JKFIT sets carry only
            # ~4d/2f per first-row atom for the same reason)
            b = beta * (1.0 + 0.2 * laux)
        n = max(1, int(np.ceil(np.log(amax / amin) / np.log(b))) + 1)
        exps = amax / b ** np.arange(n)
        out.append((laux, exps))
    return out


def autoaux_layout(mol: Molecule, beta: float = 2.2, l_cap: int = 4,
                   extra_l: int = 1, mode: str = "full") -> BasisLayout:
    shells = []
    offset = 0
    for ia, sym in enumerate(mol.symbols):
        el_shells = basis_registry.get_element_basis(mol.basis, sym)
        for l, exps in autoaux_shells(el_shells, beta=beta, l_cap=l_cap,
                                      extra_l=extra_l, mode=mode):
            for e in exps:
                ex = np.array([e])
                # normalized single primitive
                from xtddft_tpu.ints.shell import _normalize_contraction

                c = _normalize_contraction(l, ex, np.array([1.0]))
                shells.append(
                    Shell(
                        l=l,
                        center=mol.coords[ia].copy(),
                        exps=ex,
                        coefs=c,
                        atom_index=ia,
                        ao_offset=offset,
                    )
                )
                offset += nsph(l)
    return BasisLayout(mol=mol, shells=tuple(shells), nao=offset)
