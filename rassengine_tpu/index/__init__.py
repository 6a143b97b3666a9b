from rassengine_tpu.index.store import FilterSpec, TenantIndex
from rassengine_tpu.index.exact import exact_topk

__all__ = ["FilterSpec", "TenantIndex", "exact_topk"]
