"""Simplified TDA (sTDA) fast path: monopole-approximation X-TDA/UTDA.

Replaces `xtddft/sTDA/` (reference): `STDA` is the `OSsTDA` equivalent.
"""

from xtddft_tpu.stda.driver import STDA
from xtddft_tpu.stda.core import gamma_jk, lowdin_charges
from xtddft_tpu.stda.diagnostics import (
    subspace_overlap,
    match_states,
    truncation_scan,
    save_scan_csv,
)

__all__ = ["STDA", "gamma_jk", "lowdin_charges", "subspace_overlap",
           "match_states", "truncation_scan", "save_scan_csv"]
