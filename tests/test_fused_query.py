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


def test_fused_ineligible_cases(engine, monkeypatch):
    from rassengine_tpu.fusion import strategies as st

    t = engine.tenant("u")
    r = t.retriever
    assert r.fused_encode_search(engine.embedder, "   ", "hybrid") is None
    assert r.fused_encode_search(None, "diabetes", "hybrid") is None
    # past the bf16 budget: semantic keeps multi-stage (its int8 tier
    # re-ranks host-side), and without the Pallas int8 kernel (use_pallas
    # False) hybrid does too; past the int8 budget everything multi-stages
    monkeypatch.setattr(st, "HYBRID_BF16_BUDGET_BYTES", 1)
    assert r.fused_encode_search(engine.embedder, "diabetes",
                                 "semantic") is None
    assert not r.use_pallas  # CPU test engine
    assert r.fused_encode_search(engine.embedder, "diabetes",
                                 "hybrid") is None
    r8 = Retriever(t.index, t.lexical,
                   EngineConfig(int8_hbm_budget_bytes=1), use_pallas=True)
    assert r8.fused_encode_search(engine.embedder, "diabetes",
                                  "hybrid") is None


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


class TestFusedInt8LoneAsk:
    """Past the bf16 HBM budget, hybrid/multi_intent lone asks fuse encode +
    int8-only scan (mode pallas_int8) — same regime _hybrid_batch_device
    serves batched. Scores must track the exact in-budget additive hybrid
    within the int8 quantization band; the additive BM25 mask must survive
    the kernel's per-query requantization rescale exactly."""

    @pytest.mark.parametrize("kind", ["hybrid", "multi_intent"])
    def test_matches_exact_within_quant_band(self, engine, monkeypatch, kind):
        import rassengine_tpu.fusion.fused_query as fq
        from rassengine_tpu.fusion import strategies as st

        t = engine.tenant("u")
        queries = ["insulin diabetes", "asthma albuterol inhaler"]
        want = {q: _unfused(engine, q, kind)[0] for q in queries}

        monkeypatch.setattr(st, "HYBRID_BF16_BUDGET_BYTES", 1)
        seen = {}
        real = fq.encode_scan_topk

        def spy(*a, **kw):
            seen["mode"] = kw.get("mode")
            kw["interpret"] = True  # CPU test host: run Pallas interpreted
            return real(*a, **kw)

        monkeypatch.setattr(fq, "encode_scan_topk", spy)
        r8 = Retriever(t.index, t.lexical, use_pallas=True)
        for q in queries:
            got = r8.fused_encode_search(engine.embedder, q, kind, k=5)
            assert got is not None and seen["mode"] == "pallas_int8"
            hits, _emb = got
            sa = {h["doc_id"]: s for h, s in want[q]}
            sb = {h["doc_id"]: s for h, s in hits}
            for d in set(sa) & set(sb):
                assert abs(sa[d] - sb[d]) <= 3e-2, (q, d, sa[d], sb[d])
            kth = min(sa.values())
            for d in set(sa) ^ set(sb):  # membership flips only on near-ties
                sc = sa.get(d, sb.get(d))
                assert abs(sc - kth) <= 6e-2, (q, d, sc, kth)

    def test_patient_filter(self, engine, monkeypatch):
        import rassengine_tpu.fusion.fused_query as fq
        from rassengine_tpu.fusion import strategies as st

        t = engine.tenant("u")
        monkeypatch.setattr(st, "HYBRID_BF16_BUDGET_BYTES", 1)
        real = fq.encode_scan_topk

        def spy(*a, **kw):
            kw["interpret"] = True
            return real(*a, **kw)

        monkeypatch.setattr(fq, "encode_scan_topk", spy)
        r8 = Retriever(t.index, t.lexical, use_pallas=True)
        hits, _ = r8.fused_encode_search(engine.embedder, "diabetes insulin",
                                         "hybrid", k=5, patient_id="p2")
        assert hits and all(h["patientId"] == "p2" for h, _ in hits)


class TestFusedShardedLoneAsk:
    """Meshed lone asks fuse encode + scatter + shard_map scan into one
    program (fused_query.encode_scan_topk_sharded). Must equal the meshed
    multi-stage path (_additive_hybrid over sharded_topk) and the
    single-chip fused path."""

    @pytest.fixture(scope="class")
    def sharded(self, engine):
        cfg = EngineConfig(embed_dim=32, embed_batch_size=4,
                           index_capacity=2048, index_block_rows=256,
                           shard_count=8, database_path=":memory:",
                           llm_backend="echo", intent_model_path="/none",
                           ner_model_path="/none")
        eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        assert eng.mesh is not None
        rng = np.random.default_rng(3)
        docs = [{"doc_id": f"d{i}", "doc_type": "unstructured",
                 "patientId": f"p{i % 4}",
                 "unstructuredText": " ".join(rng.choice(VOCAB, 5))}
                for i in range(64)]
        eng.ingest_docs("u", [], docs)
        return eng

    @pytest.mark.parametrize("kind", ["semantic", "hybrid", "multi_intent"])
    def test_fused_matches_meshed_multistage(self, sharded, kind):
        t = sharded.tenant("u")
        for query in ("insulin diabetes", "ferritin low anemia workup"):
            got = t.retriever.fused_encode_search(sharded.embedder, query,
                                                  kind, k=5)
            assert got is not None, (kind, query)
            hits, emb = got
            want_hits, want_emb = _unfused(sharded, query, kind)
            np.testing.assert_allclose(emb, want_emb, rtol=1e-4, atol=1e-5)
            assert [h["doc_id"] for h, _ in hits] \
                == [h["doc_id"] for h, _ in want_hits], (kind, query)
            np.testing.assert_allclose([s for _, s in hits],
                                       [s for _, s in want_hits],
                                       rtol=2e-2, atol=2e-2)

    def test_fused_patient_filter_routed(self, sharded):
        t = sharded.tenant("u")
        hits, _ = t.retriever.fused_encode_search(
            sharded.embedder, "diabetes insulin", "hybrid", k=5,
            patient_id="p2")
        assert hits and all(h["patientId"] == "p2" for h, _ in hits)

    def test_meshed_retrieve_takes_fused_path(self, sharded, monkeypatch):
        calls = []
        real = Retriever.fused_encode_search

        def spy(self, *a, **kw):
            out = real(self, *a, **kw)
            calls.append(out is not None)
            return out

        monkeypatch.setattr(Retriever, "fused_encode_search", spy)
        res = sharded.retrieve("u", "tell me about diabetes treatment",
                               intent=QueryIntent.HYBRID)
        assert calls == [True]
        assert res.hits and res.query_emb is not None

    def test_replica_mesh_pads_lone_ask(self):
        """(replica, shard) mesh: the B=1 token batch pads to the replica
        count inside the fused path and results match an unfused ask."""
        cfg = EngineConfig(embed_dim=32, embed_batch_size=4,
                           index_capacity=2048, index_block_rows=256,
                           shard_count=4, replica_count=2,
                           database_path=":memory:", llm_backend="echo",
                           intent_model_path="/none", ner_model_path="/none")
        eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        rng = np.random.default_rng(3)
        docs = [{"doc_id": f"d{i}", "doc_type": "unstructured",
                 "patientId": f"p{i % 4}",
                 "unstructuredText": " ".join(rng.choice(VOCAB, 5))}
                for i in range(64)]
        eng.ingest_docs("u", [], docs)
        t = eng.tenant("u")
        got = t.retriever.fused_encode_search(eng.embedder,
                                              "insulin diabetes", "hybrid",
                                              k=5)
        assert got is not None
        hits, emb = got
        want_hits, _ = _unfused(eng, "insulin diabetes", "hybrid")
        assert emb.shape[0] == 1
        assert [h["doc_id"] for h, _ in hits] \
            == [h["doc_id"] for h, _ in want_hits]
