from monoforce_tpu.parallel.sharding import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
from monoforce_tpu.parallel.rollout import sharded_shoot

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "sharded_shoot"]
