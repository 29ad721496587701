"""xtddft_tpu — TPU-native spin-adapted TDDFT response framework.

A standalone JAX/XLA/Pallas re-design of the capabilities of the XTDDFT
reference (spin-adapted TDA response theory for open-shell molecules:
X-TDA, SF-TDA, XSF-TDA, sTDA, SOC state interaction), built TPU-first.

Unlike the reference (which delegates integrals/XC/SCF to PySCF+libcint+libxc),
this framework owns the full stack:

- ``chem``     molecules, Gaussian basis sets, geometry registry
- ``ints``     McMurchie–Davidson Gaussian integrals (host + device paths)
- ``grids``    Becke molecular quadrature grids
- ``xc``       exchange-correlation functionals in JAX; vxc/fxc via autodiff
- ``scf``      RHF/UHF/ROHF and RKS/UKS/ROKS self-consistent field
- ``response`` dense A-matrix builders and batched matrix-free sigma operators
- ``solver``   jit-compiled block Davidson eigensolver
- ``methods``  user-facing drivers: TDA, UTDA, XTDA, SFTDA, XSFTDA, sTDA
- ``props``    oscillator/rotatory strengths, <ΔS²>, transition density matrices
- ``parallel`` jax.sharding mesh utilities (ia/grid/aux axis sharding)
- ``kernels``  Pallas TPU kernels for the hot sigma contractions

Everything runs in float64 (``jax_enable_x64``) to meet the 1e-5 eV
agreement gate of the reference baselines.
"""

from xtddft_tpu import config as _config

_config.initialize()

__version__ = "0.1.0"
