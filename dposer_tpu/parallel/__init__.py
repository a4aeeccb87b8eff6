from .sharding import (allgather_ragged_1d, batch_sharding,
                       data_parallel_multi_step, data_parallel_sampler,
                       data_parallel_sampler_params,
                       data_parallel_step, make_mesh,
                       multi_hypothesis_imputation_sampler,
                       multi_hypothesis_imputation_sampler_params,
                       pad_batch_to_multiple, replicate, shard_batch,
                       shard_eval_batches, shard_global_batch,
                       shard_global_multi_batch)
