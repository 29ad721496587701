from xtddft_tpu.parallel.mesh import make_mesh, shard_df_data, trial_sharding

__all__ = ["make_mesh", "shard_df_data", "trial_sharding"]
