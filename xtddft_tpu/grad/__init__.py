"""Nuclear gradients.

Round-1 scope: finite-difference gradients of ground- and excited-state
energies for every method driver — the validation harness the reference
builds for its analytic gradients (`grad_hb/tdroks_sfu.py:37-57`,
`grad_jp/grad/xtdhf.py:576-686`).  Analytic Z-vector gradients are the
follow-up (the derivative-integral machinery in `ints/mcmurchie.py`
already provides the d/dA shell pairs they need).
"""

from xtddft_tpu.grad.fd import fd_gradient, fd_excited_gradient

__all__ = ["fd_gradient", "fd_excited_gradient"]
