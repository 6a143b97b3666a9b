from rassengine_tpu.fusion.strategies import Retriever

__all__ = ["Retriever"]
