from xtddft_tpu.xc.registry import XCSpec, resolve
from xtddft_tpu.xc.interface import (
    eval_exc,
    eval_vxc,
    vxc_matrices,
    fxc_response,
    cache_rho,
)

__all__ = [
    "XCSpec",
    "resolve",
    "eval_exc",
    "eval_vxc",
    "vxc_matrices",
    "fxc_response",
    "cache_rho",
]
