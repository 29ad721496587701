"""Relativistic spin-orbit layer: sfX2C decoupling, SO-DKH1 SOMF Vso
integrals, Zeeman integrals, and SOC state interaction.

Replaces `x2c_hamiltonian/` (reference).
"""

from xtddft_tpu.soc.x2c import sfx2c1e, uncontract, get_p
from xtddft_tpu.soc.somf import build_vso

__all__ = ["sfx2c1e", "uncontract", "get_p", "build_vso"]
