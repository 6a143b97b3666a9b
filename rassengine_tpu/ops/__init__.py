from rassengine_tpu.ops.fused_topk import fused_topk

__all__ = ["fused_topk"]
