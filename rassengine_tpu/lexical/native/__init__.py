from rassengine_tpu.lexical.native.loader import get_native_bm25

__all__ = ["get_native_bm25"]
