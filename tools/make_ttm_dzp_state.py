"""Build the TTM/dzp (598 AO) production reference state end-to-end.

This is the round-1 north star (VERDICT.md item 1): a real open-shell
chromophore at DZ+P scale, converged through the density-fitted SCF with
the chip-resident mixed-precision engine, checkpointed for the 20-root
DF X-TDA production run (`tools/run_ttm_dzp_xtda.py`, bench.py).

The reference computes this class of system through PySCF's AO-direct
host SCF (`/root/reference/xtddft/XTDA.py:520` takes a converged pyscf
``mf``; the TTM benchmark geometries live in
`/root/reference/xtddft/utils/atom.py`).  On this host (one CPU core)
a single AO-direct J/K cycle at 598 AO is ~hours; the TPU-native design
splits the work as:

  phase a (host, one-time):  native C++ screened 3c/2c integrals
                             -> disk cache (~11 GB raw j3c)
  phase b (chip):            streaming on-chip metric dressing, then the
                             bf16 -> f32 -> refined DF-SCF hot loop on
                             the MXU (`scf/jk_device.py`)

Run:
  python tools/make_ttm_dzp_state.py a [geometry] [basis]  # host ints -> cache/
  python tools/make_ttm_dzp_state.py b [geometry] [basis]  # chip SCF -> ckpt

``geometry`` is any radical from `chem/geometries.py` (default
``ttm_vacuum``, 598 AO; ``ttm1cz_vacuum`` is the 862-AO TTM-1Cz
emissive radical of the reference's benchmark sets; ``mttm2_vacuum`` is
the TTM-TTM TRIPLET diradical — the S=1 reference for the flagship
spin-adapted XSF-TDA at production scale).  ``basis`` defaults to dzp.
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

os.environ.setdefault("XTDDFT_PROGRESS", "1")  # streaming-loop liveness
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ROOT = pathlib.Path(__file__).resolve().parents[1]
CACHE = ROOT / "cache"

AUX_MODE = "jk"
XC = "b3lyp"
GRID_LEVEL = 1

GEOM = sys.argv[2] if len(sys.argv) > 2 else "ttm_vacuum"
BASIS = sys.argv[3] if len(sys.argv) > 3 else "dzp"
# open-shell multiplicities of the production radicals (N_alpha-N_beta)
SPIN = {"mttm2_vacuum": 2, "mttm2_toluene": 2}.get(GEOM, 1)
# short tag: ttm_vacuum/dzp -> ttm_dzp, mttm2_vacuum/6-31g -> mttm2_631g
TAG = GEOM.replace("_vacuum", "") + "_" + BASIS.replace("-", "")
CKPT = ROOT / "tests" / "data" / f"{TAG}_ckpt.npz"


def build_env():
    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.chem import geometries as G
    from xtddft_tpu.scf.env import Env

    mol = Molecule.from_atoms(getattr(G, GEOM), basis=BASIS, spin=SPIN)
    return Env(mol, grid_level=GRID_LEVEL, df=True, aux_mode=AUX_MODE)


def phase_a():
    import numpy as np

    CACHE.mkdir(exist_ok=True)
    env = build_env()
    print(f"nao={env.nao} naux={env.aux_layout.nao}", flush=True)

    # resumable: each artifact is skipped if already on disk
    wp, Up = CACHE / f"{TAG}_metric_w.npy", CACHE / f"{TAG}_metric_U.npy"
    if wp.exists() and Up.exists():
        print("metric eig: cached", flush=True)
    else:
        t0 = time.time()
        w, U = env.df_metric_eig_host(0.0)
        print(f"metric eig: {time.time()-t0:.0f}s  naux_kept={w.size}",
              flush=True)
        np.save(wp, w)
        np.save(Up, U)

    j3p = CACHE / f"{TAG}_j3c.npy"
    if j3p.exists():
        print("j3c: cached", flush=True)
    else:
        t0 = time.time()
        j3c = env.df_j3c_host(0.0)
        print(f"j3c: {time.time()-t0:.0f}s  {j3c.nbytes/1e9:.1f} GB",
              flush=True)
        tmp = j3p.with_suffix(".npy.tmp.npy")
        np.save(tmp, j3c)
        tmp.rename(j3p)
    print("phase a done", flush=True)


def _device_warmup(timeout: float = 240.0):
    """Fail fast when the tunneled backend's session init deadlocks.

    The axon client occasionally races the remote's teardown of a
    previous session and then waits on a futex FOREVER (r3: four
    phase-b attempts frozen at ~10 s CPU; r4: one attempt frozen INSIDE
    `import jax`/backend registration, before any jax op ran).  Other
    processes connect fine while the wedged one starves, so the cure is
    process-level: a detached WATCHDOG thread (started before any
    jax-touching import) exits(7) unless the main thread completes the
    first device ops in time, letting the retry loop relaunch.  The
    device work runs on the MAIN thread — the wedge can strike any
    first-touch path, and only a thread that does NO device work is
    guaranteed to stay alive to pull the trigger."""
    import os
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(timeout):
            print("device session init wedged; exiting for retry",
                  flush=True)
            os._exit(7)

    threading.Thread(target=_watch, daemon=True).start()

    import numpy as np
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.ones((256, 256), dtype=np.float32))
    (x @ x).block_until_ready()
    jnp.asarray(np.ones((64, 64))).sum().block_until_ready()  # f64 path
    done.set()
    print("device warmup ok", flush=True)


def phase_b():
    _device_warmup()  # FIRST: the wedge can strike inside `import jax`

    import numpy as np

    from xtddft_tpu.scf import ROKS
    from xtddft_tpu.scf.checkpoint import save_mf

    env = build_env()
    env.set_df_j3c(np.load(CACHE / f"{TAG}_j3c.npy", mmap_mode="r"))
    w = np.load(CACHE / f"{TAG}_metric_w.npy")
    U = np.load(CACHE / f"{TAG}_metric_U.npy")
    env._df_meig_cache = {0.0: (w, U)}

    mf = ROKS(env.mol, xc=XC, grid_level=GRID_LEVEL, env=env,
              engine="device")
    # packed-symmetric B: the dense layout FITS 16 GB at 598 AO on paper
    # (7.5 GB live) but the dense-K intermediates on top of it trip the
    # fragmented post-stream staging arena (two r3 OOMs); packed holds
    # 2.9 GB and chunks K over the aux axis
    mf.device_b_storage = "packed"
    mf.verbose = 1
    # initial guess: the GWH core guess is outside every reachable basin
    # at this size (locked +5000 Ha period-2 oscillation, r3 logs) — the
    # production answer is cross-basis projection of the committed
    # STO-3G TTM solution (`scf/project.py`, pyscf's project_init_guess
    # pattern).  Falls back to GWH if no small-basis checkpoint matches.
    init = None
    small_ck = ROOT / "tests" / "data" / f"{GEOM.replace('_vacuum','')}_ckpt.npz"
    if not small_ck.exists():
        # no small-basis solution to project: SAD natural orbitals (the
        # pyscf-equivalent production guess) instead of the hopeless GWH
        from xtddft_tpu.scf.guess import sad_mo

        init = sad_mo(env.layout, S=np.asarray(env.S))
        mf.device_start_mode = "f32"
        print("SAD natural-orbital init, start mode f32", flush=True)
    if small_ck.exists():
        from xtddft_tpu.scf.checkpoint import load_mf
        from xtddft_tpu.scf.project import project_mo

        mf_s = load_mf(str(small_ck), df=True)
        init = project_mo(mf_s.mo_coeff, mf_s.env.layout, env.layout,
                          s_big=np.asarray(env.S))
        # the projected guess is already near the basin: start at f32
        # (bf16's error-vector norm at this Fock scale is pure noise and
        # wrecks the guess before the stall logic advances the mode)
        mf.device_start_mode = "f32"
        print(f"projected init from {small_ck.name} "
              f"({mf_s.env.nao} -> {env.nao} AO), start mode f32",
              flush=True)
    t0 = time.time()
    out = mf.kernel(init=init)
    print(f"device DF-SCF: E = {out.e_tot:.10f} converged={out.converged} "
          f"({time.time()-t0:.0f}s)", flush=True)
    assert out.converged
    save_mf(out, str(CKPT))
    print("wrote", CKPT, flush=True)


if __name__ == "__main__":
    try:
        {"a": phase_a, "b": phase_b}[sys.argv[1]]()
    except Exception as exc:  # noqa: BLE001
        if "RESOURCE_EXHAUSTED" in str(exc):
            # nondeterministic staging-arena fragmentation on the
            # tunneled chip: a fresh process gets a fresh arena and the
            # disk caches make the restart cheap (same contract as
            # run_ttm_dzp_xtda.py) — rc=7 for the retry wrapper
            import os
            import traceback

            traceback.print_exc()
            print("HBM arena exhausted; exiting for retry", flush=True)
            os._exit(7)
        raise
