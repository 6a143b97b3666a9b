from rassengine_tpu.parallel.topk_merge import sharded_topk
from rassengine_tpu.parallel.sharding import encoder_param_spec, shard_params

__all__ = ["sharded_topk", "encoder_param_spec", "shard_params"]
