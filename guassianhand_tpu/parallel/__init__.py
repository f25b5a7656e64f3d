from guassianhand_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from guassianhand_tpu.parallel.step import make_sharded_fit_step, shard_batch
