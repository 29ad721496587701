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


def autoaux_shells(element_shells, beta: float = 2.2, l_cap: int = 4):
    """[(l, exps)] even-tempered aux shells from [(l, exps, coefs)]."""
    by_l: dict[int, np.ndarray] = {}
    for l, exps, _ in element_shells:
        by_l.setdefault(l, [])
        by_l[l].append(np.asarray(exps))
    by_l = {l: np.concatenate(v) for l, v in by_l.items()}
    lmax = max(by_l)
    out = []
    for laux in range(min(2 * lmax, l_cap) + 1):
        sums = []
        for l1, e1 in by_l.items():
            for l2, e2 in by_l.items():
                if abs(l1 - l2) <= laux <= l1 + l2:
                    sums.append((e1[:, None] + e2[None, :]).ravel())
        if not sums:
            continue
        s = np.concatenate(sums)
        amin = max(s.min() * 0.6, 0.02)
        amax = min(s.max() * 1.2, 5e6)
        n = max(1, int(np.ceil(np.log(amax / amin) / np.log(beta))) + 1)
        exps = amax / beta ** np.arange(n)
        out.append((laux, exps))
    return out


def autoaux_layout(mol: Molecule, beta: float = 2.2, l_cap: int = 4) -> BasisLayout:
    shells = []
    offset = 0
    for ia, sym in enumerate(mol.symbols):
        el_shells = basis_registry.get_element_basis(mol.basis, sym)
        for l, exps in autoaux_shells(el_shells, beta=beta, l_cap=l_cap):
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
