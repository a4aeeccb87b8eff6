from .sharding import (data_parallel_sampler, data_parallel_step, make_mesh,
                       replicate, shard_batch, shard_eval_batches)
