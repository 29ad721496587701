from xtddft_tpu.scf.driver import (
    SCF,
    MeanField,
    RHF,
    UHF,
    ROHF,
    RKS,
    UKS,
    ROKS,
)

__all__ = ["SCF", "MeanField", "RHF", "UHF", "ROHF", "RKS", "UKS", "ROKS"]
