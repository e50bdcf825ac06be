from .mesh import (gather_replicated, is_main_process, make_mesh, make_sharded_train_step,
                   put_tree, replicate, setup_distributed, shard_batch, shard_params_tp,
                   spatial_folded_train_ok, tp_shardings)

__all__ = ["gather_replicated", "is_main_process", "make_mesh", "make_sharded_train_step",
           "put_tree", "replicate", "setup_distributed", "shard_batch",
           "shard_params_tp", "spatial_folded_train_ok", "tp_shardings"]
