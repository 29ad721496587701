"""Converge TTM-1Cz/STO-3G through the chip DF-SCF and checkpoint it.

The small-basis solution that seeds the 862-AO DZ+P production SCF via
cross-basis projection (`tools/make_ttm_dzp_state.py b ttm1cz_vacuum`
looks for tests/data/ttm1cz_ckpt.npz).  At ~290 AO the host DF path's
one-time metric dressing is hours on this 1-core host, while the chip
engine streams it in seconds — so unlike TTM/sto-3g this one runs on
the device.

Run:  python tools/make_ttm1cz_ckpt.py [geometry]

``geometry`` defaults to ttm1cz_vacuum; ``mttm2_vacuum`` (the TTM-TTM
TRIPLET diradical, 380 AO at STO-3G — the S=1 reference for the
production spin-adapted XSF-TDA) is handled with spin=2.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _device_warmup(timeout: float = 240.0):
    """Same wedge watchdog as make_ttm_dzp_state (import-level races)."""
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
    import jax.numpy as jnp

    x = jnp.asarray(np.ones((256, 256), dtype=np.float32))
    (x @ x).block_until_ready()
    jnp.asarray(np.ones((64, 64))).sum().block_until_ready()
    done.set()
    print("device warmup ok", flush=True)


def main():
    _device_warmup()

    from xtddft_tpu.chem import Molecule
    from xtddft_tpu.chem import geometries as G
    from xtddft_tpu.scf import ROKS
    from xtddft_tpu.scf.checkpoint import save_mf

    geom = sys.argv[1] if len(sys.argv) > 1 else "ttm1cz_vacuum"
    spin = {"mttm2_vacuum": 2, "mttm2_toluene": 2}.get(geom, 1)
    short = geom.replace("_vacuum", "")
    data_dir = pathlib.Path(__file__).resolve().parents[1] / "tests" / "data"
    mol = Molecule.from_atoms(getattr(G, geom), basis="sto-3g", spin=spin)
    t0 = time.time()
    scf = ROKS(mol, xc="b3lyp", grid_level=1, df=True, engine="device")
    # SAD natural-orbital init: the GWH guess locks into a period-2
    # oscillation at this size (r4 log, 200 cycles without descending);
    # skip the bf16 leg (its error-vector norm at this Fock scale is
    # noise — same reasoning as the dzp phase-b f32 start)
    from xtddft_tpu.scf.guess import sad_mo

    init = sad_mo(scf.env.layout, S=scf.env.S)
    scf.device_start_mode = "f32"
    scf.verbose = 1
    mf = scf.kernel(init=init)
    print(f"device DF-SCF: E = {mf.e_tot:.10f} converged={mf.converged} "
          f"({time.time()-t0:.0f}s)", flush=True)
    assert mf.converged
    save_mf(mf, str(data_dir / f"{short}_ckpt.npz"))
    print("wrote", data_dir / f"{short}_ckpt.npz", flush=True)


if __name__ == "__main__":
    main()
