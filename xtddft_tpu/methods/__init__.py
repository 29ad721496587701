from xtddft_tpu.methods.drivers import TDA, UTDA, XTDA, SFTDA, XSFTDA

__all__ = ["TDA", "UTDA", "XTDA", "SFTDA", "XSFTDA"]
