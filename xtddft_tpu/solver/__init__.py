from xtddft_tpu.solver.davidson import davidson

__all__ = ["davidson"]
