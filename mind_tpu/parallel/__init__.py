from mind_tpu.parallel.mesh import make_mesh, shard_rollouts
