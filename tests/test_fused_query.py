"""Fused encode+scan single-ask path (fusion/fused_query.py, ROADMAP #4).

The fused program must be SEMANTICALLY IDENTICAL to embed_query followed by
semantic_search / hybrid_search — same encoder function, same additive-scan
math, one dispatch instead of two."""

import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.schema import QueryIntent
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.fusion.strategies import Retriever
from rassengine_tpu.models.bert import BertConfig

VOCAB = ["diabetes", "insulin", "hypertension", "lisinopril", "asthma",
         "albuterol", "fracture", "radiograph", "anemia", "ferritin"]


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=512,
                       intent_model_path="/none", ner_model_path="/none",
                       database_path=":memory:", llm_backend="echo")
    eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
    rng = np.random.default_rng(3)
    docs = [{"doc_id": f"d{i}", "doc_type": "unstructured",
             "patientId": f"p{i % 4}",
             "unstructuredText": " ".join(rng.choice(VOCAB, 5))}
            for i in range(64)]
    eng.ingest_docs("u", [], docs)
    return eng


def _unfused(engine, query, kind, k=5, **kw):
    t = engine.tenant("u")
    emb = engine.embedder.embed_query(query)
    method = {"semantic": t.retriever.semantic_search,
              "hybrid": t.retriever.hybrid_search,
              "multi_intent": t.retriever.multi_intent_search}[kind]
    return method(query, emb, k=k, **kw), emb


@pytest.mark.parametrize("kind", ["semantic", "hybrid", "multi_intent"])
def test_fused_matches_unfused(engine, kind):
    t = engine.tenant("u")
    for query in ("insulin diabetes", "asthma albuterol inhaler",
                  "ferritin low anemia workup"):
        got = t.retriever.fused_encode_search(engine.embedder, query, kind,
                                              k=5)
        assert got is not None
        hits, emb = got
        want_hits, want_emb = _unfused(engine, query, kind)
        np.testing.assert_allclose(emb, want_emb, rtol=1e-4, atol=1e-5)
        assert [h[0]["doc_id"] for h in hits] \
            == [h[0]["doc_id"] for h in want_hits], (kind, query)
        np.testing.assert_allclose([s for _, s in hits],
                                   [s for _, s in want_hits],
                                   rtol=2e-2, atol=2e-2)


def test_fused_respects_patient_filter(engine):
    t = engine.tenant("u")
    hits, _ = t.retriever.fused_encode_search(
        engine.embedder, "diabetes insulin", "hybrid", k=5, patient_id="p2")
    assert hits and all(h[0]["patientId"] == "p2" for h in hits)


def test_fused_ineligible_cases(engine):
    t = engine.tenant("u")
    r = t.retriever
    assert r.fused_encode_search(engine.embedder, "   ", "hybrid") is None
    assert r.fused_encode_search(None, "diabetes", "hybrid") is None
    # sharded meshes keep their multi-stage path
    mesh_save = r.mesh
    r.mesh = object()
    try:
        assert r.fused_encode_search(engine.embedder, "diabetes",
                                     "semantic") is None
    finally:
        r.mesh = mesh_save


def test_engine_retrieve_uses_fused_path(engine, monkeypatch):
    """engine.retrieve must route lone SEMANTIC/HYBRID asks through the
    fused dispatch, and the result (hits + query_emb) must match."""
    t = engine.tenant("u")
    want = engine.retrieve("u", "tell me about diabetes treatment",
                           intent=QueryIntent.HYBRID)
    calls = []
    real = Retriever.fused_encode_search

    def spy(self, *a, **kw):
        out = real(self, *a, **kw)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(Retriever, "fused_encode_search", spy)
    got = engine.retrieve("u", "tell me about diabetes treatment",
                          intent=QueryIntent.HYBRID)
    assert calls == [True]
    assert [h["doc_id"] for h, _ in got.hits] \
        == [h["doc_id"] for h, _ in want.hits]
    assert got.query_emb is not None
    np.testing.assert_allclose(got.query_emb, want.query_emb,
                               rtol=1e-4, atol=1e-5)
    # precomputed embeddings (the batcher) must NOT re-enter the fused path
    calls.clear()
    engine.retrieve("u", "tell me about diabetes treatment",
                    intent=QueryIntent.HYBRID, query_emb=want.query_emb)
    assert calls == []
