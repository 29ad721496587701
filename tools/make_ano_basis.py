"""Generate ANO-style contracted basis sets from in-house atomic SCF.

Zero-egress substitute for published contracted tables (cc-pVDZ etc. are
unavailable offline beyond the light elements): for each element, run an
atomic ROHF/UHF in the even-tempered primitive basis
(`chem/basis/even_tempered.py`), spherically average the density per
angular momentum, and contract the primitives with the natural radial
orbitals (ANO recipe: Almlöf & Taylor's scheme, re-derived — occupation-
weighted radial eigenvectors of the per-l density matrix).  Keep the
occupied naturals plus ``n_extra`` correlating/diffuse naturals per l and
add one polarization primitive shell set at l_max+1.

Output: `xtddft_tpu/chem/basis/data_anodz.py` (generated data file,
registered as basis name "ano-dz").

Run:  XTDDFT_PLATFORM=cpu python tools/make_ano_basis.py H C N O F S Cl As
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# neutral-atom ground-state 2S values
_SPIN = {
    "H": 1, "He": 0, "Li": 1, "Be": 0, "B": 1, "C": 2, "N": 3, "O": 2,
    "F": 1, "Ne": 0, "Na": 1, "Mg": 0, "Al": 1, "Si": 2, "P": 3, "S": 2,
    "Cl": 1, "Ar": 0, "K": 1, "Ca": 0, "Sc": 1, "Ti": 2, "V": 3, "Cr": 6,
    "Mn": 5, "Fe": 4, "Co": 3, "Ni": 2, "Cu": 1, "Zn": 0, "Ga": 1,
    "Ge": 2, "As": 3, "Se": 2, "Br": 1, "Kr": 0,
}
# extra (beyond-occupied) naturals kept per l -> double-zeta valence
_N_EXTRA = 1


def ano_shells(symbol: str, n_extra: int = _N_EXTRA, verbose: bool = True):
    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.ints import build_layout
    from xtddft_tpu.scf.driver import SCF

    mol = Molecule.from_atoms(f"{symbol} 0 0 0", basis="etb",
                              spin=_SPIN[symbol.capitalize()])
    kind = "rohf" if mol.spin else "rhf"
    mf = SCF(mol, kind).kernel()
    assert mf.converged, symbol
    lay = build_layout(mol)

    dm = np.asarray(mf.make_rdm1())
    dm = dm.sum(axis=0) if dm.ndim == 3 else dm

    # group uncontracted shells per l (each etb shell = 1 primitive)
    by_l: dict[int, list] = {}
    for sh in lay.shells:
        by_l.setdefault(sh.l, []).append(sh)
    from xtddft_tpu.ints.one_electron import overlap

    S_ao = np.asarray(overlap(lay))

    labels = "SPDFG"
    out = []
    occ_l = {}
    for l, shells in sorted(by_l.items()):
        exps = np.array([sh.exps[0] for sh in shells])
        npr = len(shells)
        # per-l spherically averaged radial density matrix
        Dl = np.zeros((npr, npr))
        for i, shi in enumerate(shells):
            for j, shj in enumerate(shells):
                for m in range(2 * l + 1):
                    Dl[i, j] += dm[shi.ao_offset + m, shj.ao_offset + m]
        Dl /= (2 * l + 1)
        # radial overlap of the actual (loader-normalized) AO functions:
        # the m=0 diagonal block of the computed overlap matrix — no
        # hand-derived normalization conventions to get wrong
        Sl = np.array([[S_ao[shi.ao_offset, shj.ao_offset]
                        for shj in shells] for shi in shells])
        # natural radial orbitals: eigenvectors of S^1/2 D S^1/2
        w_s, V_s = np.linalg.eigh(Sl)
        Sh = (V_s * np.sqrt(np.maximum(w_s, 1e-14))) @ V_s.T
        Shi = (V_s / np.sqrt(np.maximum(w_s, 1e-14))) @ V_s.T
        occs, U = np.linalg.eigh(Sh @ Dl @ Sh)
        order = np.argsort(-occs)
        occs, U = occs[order], U[:, order]
        n_occ = int(np.sum(occs > 1e-3))
        occ_l[l] = n_occ
        if n_occ == 0:
            # zero-density channel (the etb polarization shells): the
            # naturals are arbitrary rotations — keep the designed
            # primitives as-is instead
            for sh in shells:
                out.append((labels[l], [(float(sh.exps[0]), 1.0)]))
            if verbose:
                print(f"  l={l}: {npr} prims kept uncontracted (pol)")
            continue
        nkeep = min(npr, n_occ + n_extra)
        C = Shi @ U[:, :nkeep]  # primitive-space contraction coefficients
        if verbose:
            print(f"  l={l}: {npr} prims -> {nkeep} naturals "
                  f"(occ {np.round(occs[:nkeep], 4)})")
        for k in range(nkeep):
            # coefficients are for loader-normalized primitives (the same
            # convention the published-table data files use)
            col = C[:, k]
            keep = np.abs(col) > 1e-8 * np.abs(col).max()
            out.append((labels[l],
                        [(float(e), float(c))
                         for e, c in zip(exps[keep], col[keep])]))
    # one polarization primitive set at l_max+1 (same recipe as etb)
    lpol = max(by_l) + 1
    if lpol <= 4:
        z = mol.charges[0]
        for e in (2.2, 0.7):
            out.append((labels[lpol], [(float(e * (1.0 + 0.02 * z)), 1.0)]))
    return out, float(mf.e_tot)


def main():
    elements = sys.argv[1:] or ["H", "C", "N", "O", "F", "S", "Cl", "As"]
    entries = {}
    energies = {}
    for sym in elements:
        print(f"== {sym}")
        shells, e_at = ano_shells(sym)
        entries[sym.capitalize()] = shells
        energies[sym.capitalize()] = e_at
        print(f"  atomic ROHF(etb) E = {e_at:.6f}, "
              f"{len(shells)} contracted shells")

    path = (pathlib.Path(__file__).resolve().parents[1]
            / "xtddft_tpu" / "chem" / "basis" / "data_anodz.py")
    with open(path, "w") as f:
        f.write('"""ANO-DZ generated basis data.\n\n')
        f.write("GENERATED by tools/make_ano_basis.py — atomic-natural-\n")
        f.write("orbital contractions of the in-house even-tempered\n")
        f.write("primitives (no external basis tables; see the tool\n")
        f.write("docstring for the recipe and GAPS.md for scope).\n")
        f.write('Atomic ROHF energies at generation time:\n')
        for k, v in energies.items():
            f.write(f"  {k}: {v:.6f} Ha\n")
        f.write('"""\n\nANO_DZ = {\n')
        for sym, shells in entries.items():
            f.write(f"    {sym!r}: [\n")
            for lab, prims in shells:
                f.write(f"        ({lab!r}, [\n")
                for e, c in prims:
                    f.write(f"            ({e!r}, {c!r}),\n")
                f.write("        ]),\n")
            f.write("    ],\n")
        f.write("}\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
