from .mesh import (make_mesh, make_sharded_train_step, replicate,
                   shard_batch, shard_params_tp, tp_shardings)

__all__ = ["make_mesh", "make_sharded_train_step", "replicate",
           "shard_batch", "shard_params_tp", "tp_shardings"]
