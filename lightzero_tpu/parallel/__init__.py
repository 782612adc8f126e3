from lightzero_tpu.parallel.mesh import make_mesh, shard_batch, replicate, dp_train_step
