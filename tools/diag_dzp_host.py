"""Host-f64 energy decomposition at the projected TTM/dzp guess.

Diagnostic for the r3/r4 phase-b divergence: evaluates each energy
component of the projected initial density ON THE HOST in f64 —
independently of the device engine — so a wrong component on the chip
shows up as a host/device mismatch, and a genuinely bad guess shows up
as bad host numbers.

Run with XTDDFT_PLATFORM=cpu (host arithmetic only):
  XTDDFT_PLATFORM=cpu python tools/diag_dzp_host.py [geometry]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
CACHE = ROOT / "cache"

GEOM = sys.argv[1] if len(sys.argv) > 1 else "ttm_vacuum"
TAG = GEOM.replace("_vacuum", "") + "_dzp"


def main():
    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.chem import geometries as G
    from xtddft_tpu.scf.checkpoint import load_mf
    from xtddft_tpu.scf.env import Env
    from xtddft_tpu.scf.project import project_mo
    from xtddft_tpu.xc import interface as xci
    from xtddft_tpu.xc import registry as xc_registry

    mol = Molecule.from_atoms(getattr(G, GEOM), basis="dzp", spin=1)
    env = Env(mol, grid_level=1, df=True, aux_mode="jk")
    print(f"nao={env.nao} naux={env.aux_layout.nao}", flush=True)

    small_ck = ROOT / "tests" / "data" / f"{GEOM.replace('_vacuum','')}_ckpt.npz"
    mf_s = load_mf(str(small_ck), df=True)
    S = np.asarray(env.S)
    C = project_mo(mf_s.mo_coeff, mf_s.env.layout, env.layout, s_big=S)
    print(f"projected C: {C.shape}, orthonormality err "
          f"{np.abs(C.T @ S @ C - np.eye(C.shape[1])).max():.2e}", flush=True)

    occ = np.asarray(mf_s.mo_occ)
    na = int((occ > 0.5).sum())
    nb = int((occ > 1.5).sum())
    Ca, Cb = C[:, :na], C[:, :nb]
    Da, Db = Ca @ Ca.T, Cb @ Cb.T
    D = Da + Db
    print(f"na={na} nb={nb} tr(Da S)={np.einsum('mn,nm->', Da, S):.6f} "
          f"tr(Db S)={np.einsum('mn,nm->', Db, S):.6f}", flush=True)

    h = np.asarray(env.hcore)
    e1 = np.einsum("mn,nm->", D, h)
    enuc = float(mol.energy_nuc())
    print(f"E1 = {e1:.6f}  Enuc = {enuc:.6f}", flush=True)

    # small-basis twins for comparison
    Da_s = mf_s.mo_coeff[:, :na] @ mf_s.mo_coeff[:, :na].T
    Db_s = mf_s.mo_coeff[:, :nb] @ mf_s.mo_coeff[:, :nb].T
    h_s = np.asarray(mf_s.env.hcore)
    print(f"E1(small basis) = {np.einsum('mn,nm->', Da_s + Db_s, h_s):.6f}",
          flush=True)

    # host f64 DF Coulomb WITHOUT dressing: J = j3c . (M^-1 t)
    t0 = time.time()
    j3c = np.load(CACHE / f"{TAG}_j3c.npy", mmap_mode="r")
    w = np.load(CACHE / f"{TAG}_metric_w.npy")
    U = np.load(CACHE / f"{TAG}_metric_U.npy")
    nao = env.nao
    naux = j3c.shape[0]
    t = np.zeros(naux)
    chunk = 256
    for p0 in range(0, naux, chunk):
        blk = np.asarray(j3c[p0:p0 + chunk])
        t[p0:p0 + blk.shape[0]] = blk.reshape(blk.shape[0], -1) @ D.reshape(-1)
    c = U @ ((U.T @ t) / w)
    J = np.zeros((nao, nao))
    for p0 in range(0, naux, chunk):
        blk = np.asarray(j3c[p0:p0 + chunk])
        J += np.einsum("Pmn,P->mn", blk, c[p0:p0 + blk.shape[0]])
    ej = 0.5 * np.einsum("mn,nm->", D, J)
    print(f"E_J(host f64 DF) = {ej:.6f}   ({time.time()-t0:.0f}s)", flush=True)

    # host f64 XC quadrature
    t0 = time.time()
    spec = xc_registry.resolve("b3lyp")
    ao = env.ao
    import jax.numpy as jnp

    ra, ga = xci.cache_rho(ao, jnp.asarray(Da))
    rb, gb = xci.cache_rho(ao, jnp.asarray(Db))
    exc = float(xci.eval_exc(spec, env.grid_weights, (ra, rb, ga, gb)))
    ne_grid = float(np.dot(np.asarray(env.grid_weights),
                           np.asarray(ra) + np.asarray(rb)))
    print(f"E_xc(host f64) = {exc:.6f}  ngrid={np.asarray(env.grid_weights).size} "
          f"N_e(grid)={ne_grid:.4f}  ({time.time()-t0:.0f}s)", flush=True)

    print(f"E(without K) = {e1 + enuc + ej + exc:.6f}  "
          f"[small-basis converged: {mf_s.e_tot:.6f}]", flush=True)


if __name__ == "__main__":
    main()
