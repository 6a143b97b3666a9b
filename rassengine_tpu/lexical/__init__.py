from rassengine_tpu.lexical.bm25 import LexicalIndex, analyze

__all__ = ["LexicalIndex", "analyze"]
