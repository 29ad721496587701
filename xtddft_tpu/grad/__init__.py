"""Nuclear gradients.

- `fd`: finite-difference gradients of ground- and excited-state energies
  for every method driver — the validation harness the reference builds
  for its analytic gradients (`grad_hb/tdroks_sfu.py:37-57`,
  `grad_jp/grad/xtdhf.py:576-686`).
- `analytic`: analytic HF-reference ground-state gradients from the
  in-house derivative shell pairs (validated against fd to ~1e-7).
  Excited-state Z-vector and DFT grid-response terms are the follow-up.
"""

from xtddft_tpu.grad.fd import fd_gradient, fd_excited_gradient
from xtddft_tpu.grad.analytic import hf_gradient

__all__ = ["fd_gradient", "fd_excited_gradient", "hf_gradient"]
