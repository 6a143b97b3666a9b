"""rassengine_tpu — a TPU-native retrieval-augmented semantic search framework.

Rebuilds the capabilities of NeuralRevenant/RASSEngine (FastAPI + Ollama +
OpenSearch HNSW/BM25) as a single in-process JAX/XLA/Pallas engine:

- ``models/``   Flax bi-encoder (1024-d) + NLU heads — replaces Ollama + torch HF models
- ``index/``    HBM-resident vector index, exact / IVF-PQ search — replaces OpenSearch k-NN
- ``ops/``      Pallas TPU kernels (fused distance+top-k, int8 scan, BM25 scoring)
- ``lexical/``  on-device BM25 over host-built postings — replaces Lucene BM25
- ``fusion/``   the 12 intent-specific retrieval strategies (hybrid score fusion)
- ``parallel/`` multi-chip index sharding + all-gather top-k merge over ICI
- ``nlu/``      intent classification + medical NER + patient-ID resolution
- ``ingest/``   FHIR / markdown / text parsing, chunking, streaming indexing
- ``serve/``    REST /ask + WS /ws/ask + /upload_data, chat persistence, LLM clients
- ``train/``    TPU training harnesses for the intent + NER models
"""

__version__ = "0.1.0"

# persistent XLA compilation cache: first compile of the big kernels is
# 20-40 s; every process after this hits the disk cache instead
import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rass_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
