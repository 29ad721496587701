from xtddft_tpu.parallel.mesh import make_mesh, shard_reference

__all__ = ["make_mesh", "shard_reference"]
