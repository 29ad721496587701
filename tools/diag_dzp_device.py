"""Device-engine energy decomposition at the projected TTM/dzp guess.

Twin of `diag_dzp_host.py`: computes ej/eka/ekb/exc through the chip
engine's fast (f32) and refined (compensated) paths, with both packed
and full B storage, so each component can be diffed against the host-f64
numbers component by component.

Run on the TPU backend:  python tools/diag_dzp_device.py [geometry]
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
    from xtddft_tpu.scf.jk_device import DeviceVeff, _jk_fast, _jk_fast_packed, _prec, _xc_fast
    from xtddft_tpu.scf.project import project_mo
    from xtddft_tpu.xc import registry as xc_registry

    import jax.numpy as jnp

    mol = Molecule.from_atoms(getattr(G, GEOM), basis="dzp", spin=1)
    env = Env(mol, grid_level=1, df=True, aux_mode="jk")
    env.set_df_j3c(np.load(CACHE / f"{TAG}_j3c.npy", mmap_mode="r"))
    w = np.load(CACHE / f"{TAG}_metric_w.npy")
    U = np.load(CACHE / f"{TAG}_metric_U.npy")
    env._df_meig_cache = {0.0: (w, U)}
    print(f"nao={env.nao} naux={env.aux_layout.nao}", flush=True)

    small_ck = ROOT / "tests" / "data" / f"{GEOM.replace('_vacuum','')}_ckpt.npz"
    mf_s = load_mf(str(small_ck), df=True)
    S = np.asarray(env.S)
    C = project_mo(mf_s.mo_coeff, mf_s.env.layout, env.layout, s_big=S)
    occ = np.asarray(mf_s.mo_occ)
    na = int((occ > 0.5).sum())
    nb = int((occ > 1.5).sum())
    Ca, Cb = C[:, :na], C[:, :nb]

    spec = xc_registry.resolve("b3lyp")
    for storage in ("packed",):
        t0 = time.time()
        dev = DeviceVeff(env, spec, b_storage=storage)
        print(f"[{storage}] build: {time.time()-t0:.0f}s", flush=True)
        Ca32 = jnp.asarray(np.asarray(Ca, dtype=np.float32))
        Cb32 = jnp.asarray(np.asarray(Cb, dtype=np.float32))
        prec = _prec("f32")
        if storage == "packed":
            va, vb, ej, eka, ekb = _jk_fast_packed(
                dev.Bhi, dev._f2p, dev._fpk, dev._dupl, Ca32, Cb32,
                prec, dev.hyb)
        else:
            va, vb, ej, eka, ekb = _jk_fast(
                dev.Bhi, Ca32, Cb32, prec, dev.hyb, dev.hyb_lr, dev.Blr)
        exc, _, _ = _xc_fast(dev.phi, dev.w32, Ca32, Cb32, prec, dev.spec)
        print(f"[{storage} f32]  E_J={float(ej):.6f}  "
              f"E_K={float(eka)+float(ekb):.6f} (hyb-scaled)  "
              f"E_xc={float(exc):.6f}", flush=True)
        # refined path: full e2 decomposition is internal; print e2 total
        t0 = time.time()
        va_r, vb_r, e2_r = dev.veff(Ca, Cb, mode="refined")
        va_f, vb_f, e2_f = dev.veff(Ca, Cb, mode="f32")
        print(f"[{storage}] e2 fast={e2_f:.6f}  refined={e2_r:.6f}  "
              f"|veff_a fast-refined|max="
              f"{np.abs(va_f - va_r).max():.3e}  ({time.time()-t0:.0f}s)",
              flush=True)
        del dev


if __name__ == "__main__":
    main()
