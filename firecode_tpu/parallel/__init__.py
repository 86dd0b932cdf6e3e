from firecode_tpu.parallel.mesh import ensemble_mesh, shard_ensemble, sharded_pipeline_step

__all__ = ["ensemble_mesh", "shard_ensemble", "sharded_pipeline_step"]
