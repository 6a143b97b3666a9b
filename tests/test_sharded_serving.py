"""Integrated multi-chip serving on the virtual 8-device CPU mesh.

VERDICT round-1 #5: a TenantIndex living row-sharded inside the serving
engine, Retriever scanning through sharded_topk, ShardRouter masking for
patient-routed queries — with results identical to single-device serving.
"""

import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig


def mk_engine(shard_count):
    cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=2048,
                       index_block_rows=256, shard_count=shard_count,
                       database_path=":memory:", llm_backend="echo",
                       intent_model_path="/none", ner_model_path="/none")
    return RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)


def corpus_docs(n=60):
    conds = ["hypertension", "diabetes", "asthma", "bronchitis"]
    return [{"doc_id": f"d{i}", "doc_type": "unstructured",
             "patientId": f"p{i % 7}",
             "unstructuredText":
             f"patient note {i} about {conds[i % 4]} management"}
            for i in range(n)]


@pytest.fixture(scope="module")
def engines():
    single = mk_engine(1)
    sharded = mk_engine(8)
    assert sharded.mesh is not None, "8 virtual devices expected (conftest)"
    docs = corpus_docs()
    single.ingest_docs("u", [], docs)
    sharded.ingest_docs("u", [], docs)
    return single, sharded


def hit_ids(res):
    return [h["doc_id"] for h, _ in res.hits]


class TestShardedServing:
    def test_rows_placed_by_patient_region(self, engines):
        _single, sharded = engines
        idx = sharded.tenant("u").index
        assert idx.mesh is not None and idx.n_shards == 8
        rs = idx.capacity // 8
        from rassengine_tpu.index.store import stable_hash32

        for row in np.nonzero(idx._allocated)[0]:
            doc = idx.docs[int(row)]
            shard = stable_hash32(doc["patientId"]) % 8
            assert shard * rs <= row < (shard + 1) * rs

    def test_semantic_matches_single_device(self, engines):
        single, sharded = engines
        for q in ("tell me about diabetes management",
                  "overview of asthma for the patient"):
            a = single.retrieve("u", q, top_k=5, intent=None)
            b = sharded.retrieve("u", q, top_k=5, intent=None)
            assert hit_ids(a) == hit_ids(b), (q, hit_ids(a), hit_ids(b))

    def test_hybrid_matches_single_device(self, engines):
        single, sharded = engines
        from rassengine_tpu.core.schema import QueryIntent

        q = "hypertension management options"
        a = single.retrieve("u", q, top_k=5, intent=QueryIntent.HYBRID)
        b = sharded.retrieve("u", q, top_k=5, intent=QueryIntent.HYBRID)
        assert hit_ids(a) == hit_ids(b)

    def test_routed_query_identical_to_unrouted(self, engines):
        """Patient-routed masking must be result-preserving (the owner shard
        holds every row of that patient)."""
        single, sharded = engines
        from rassengine_tpu.core.schema import QueryIntent

        for pid in ("p1", "p4"):
            q = "diabetes note"
            a = single.retrieve("u", q, top_k=8, intent=QueryIntent.SEMANTIC,
                                patient_id=pid)
            b = sharded.retrieve("u", q, top_k=8, intent=QueryIntent.SEMANTIC,
                                 patient_id=pid)
            assert hit_ids(a) == hit_ids(b)
            assert all(h["patientId"] == pid for h, _ in b.hits)

    def test_routed_mask_restricts_to_owner_shard(self, engines):
        _single, sharded = engines
        t = sharded.tenant("u")
        r = t.retriever
        from rassengine_tpu.index.store import FilterSpec, stable_hash32

        spec = FilterSpec(patient_id="p2", require_embedding=True)
        mask = np.asarray(r._routed_mask(t.index.filter_mask(spec), spec))
        live = np.nonzero(mask > -1e29)[0]
        rs = t.index.capacity // 8
        owner = stable_hash32("p2") % 8
        assert live.size > 0
        assert all(owner * rs <= row < (owner + 1) * rs for row in live)

    def test_sharded_grow_matches_single_device(self):
        """Overflowing one patient's region forces the doubling region-move
        grow; results must still match the single-device engine."""
        single, sharded = mk_engine(1), mk_engine(8)
        extra = [{"doc_id": f"x{i}", "doc_type": "unstructured",
                  "patientId": "p1",
                  "unstructuredText": f"extra filler note {i}"}
                 for i in range(300)]  # one region is capacity/8 = 256 rows
        for eng in (single, sharded):
            eng.ingest_docs("g", [], corpus_docs(30))
            eng.ingest_docs("g", [], extra)
        assert sharded.tenant("g").index.capacity > 2048  # grew
        for q in ("asthma management", "extra filler note 123"):
            a = single.retrieve("g", q, top_k=5)
            b = sharded.retrieve("g", q, top_k=5)
            assert hit_ids(a) == hit_ids(b), q
        res = sharded.retrieve("g", "extra filler note 123", top_k=40)
        assert any(h["doc_id"] == "x123" for h, _ in res.hits)

    def test_sharded_delete_and_compact(self):
        eng = mk_engine(8)
        eng.ingest_docs("dl", [], corpus_docs(40))
        t = eng.tenant("dl")
        assert eng.delete_docs("dl", ["d0", "d8"]) == 2
        eng.compact_tenant(t)
        res = eng.retrieve("dl", "patient note 0", top_k=40)
        assert not any(h["doc_id"] == "d0" for h, _ in res.hits)
        # region invariant still holds after compaction
        from rassengine_tpu.index.store import stable_hash32

        rs = t.index.capacity // 8
        for row in np.nonzero(t.index._allocated)[0]:
            doc = t.index.docs[int(row)]
            shard = stable_hash32(doc["patientId"]) % 8
            assert shard * rs <= row < (shard + 1) * rs

    def test_sharded_checkpoint_roundtrip(self, tmp_path):
        from rassengine_tpu.index.checkpoint import load_engine, save_engine

        eng = mk_engine(8)
        eng.ingest_docs("ck", [], corpus_docs(30))
        want = hit_ids(eng.retrieve("ck", "bronchitis management", top_k=5))
        save_engine(eng, str(tmp_path / "sck"))
        eng2 = mk_engine(8)
        load_engine(eng2, str(tmp_path / "sck"))
        got = hit_ids(eng2.retrieve("ck", "bronchitis management", top_k=5))
        assert want == got
        # and a sharded checkpoint loads into a single-device engine too
        eng3 = mk_engine(1)
        load_engine(eng3, str(tmp_path / "sck"))
        got3 = hit_ids(eng3.retrieve("ck", "bronchitis management", top_k=5))
        assert want == got3

    def test_reupsert_moves_shard_region_on_patient_change(self):
        """Changing a doc's patientId must move its row to the new owner
        shard, or routed masks would miss it."""
        eng = mk_engine(8)
        eng.ingest_docs("mv", [], corpus_docs(20))
        t = eng.tenant("mv")
        from rassengine_tpu.core.schema import QueryIntent
        from rassengine_tpu.index.store import stable_hash32

        doc = dict(t.index.docs[int(np.nonzero(t.index._allocated)[0][0])])
        old_pid = doc["patientId"]
        new_pid = next(p for p in ("p0", "p1", "p2", "p3", "p4", "p5", "p6")
                       if stable_hash32(p) % 8 != stable_hash32(old_pid) % 8)
        doc["patientId"] = new_pid
        eng.ingest_docs("mv", [], [doc])
        row = t.index._id_to_row[doc["doc_id"]]
        rs = t.index.capacity // 8
        assert row // rs == stable_hash32(new_pid) % 8
        res = eng.retrieve("mv", "patient note", top_k=20,
                           intent=QueryIntent.SEMANTIC, patient_id=new_pid)
        assert any(h["doc_id"] == doc["doc_id"] for h, _ in res.hits)
        res_old = eng.retrieve("mv", "patient note", top_k=20,
                               intent=QueryIntent.SEMANTIC, patient_id=old_pid)
        assert not any(h["doc_id"] == doc["doc_id"] for h, _ in res_old.hits)

    def test_sharded_pq4_tier_beyond_int8_budget(self, monkeypatch):
        """Past the per-shard int8 budget the sharded tier scans fused-PQ4
        codes + exact re-rank; quality must match single-device retrieval
        (VERDICT r2 #4: the auto tier selector is now mesh-invariant)."""
        import rassengine_tpu.fusion.strategies as strat

        single, sharded = mk_engine(1), mk_engine(8)
        for eng in (single, sharded):
            eng.ingest_docs("pqs", [], corpus_docs(48))
        monkeypatch.setattr(strat, "HYBRID_BF16_BUDGET_BYTES", 1)
        import dataclasses

        t = sharded.tenant("pqs")
        t.retriever.config = dataclasses.replace(
            t.retriever.config, int8_hbm_budget_bytes=0)
        assert not t.retriever._bf16_fits()
        from rassengine_tpu.core.schema import QueryIntent

        for pid in (None, "p3"):
            a = single.retrieve("pqs", "diabetes management note", top_k=5,
                                intent=QueryIntent.SEMANTIC, patient_id=pid)
            b = sharded.retrieve("pqs", "diabetes management note", top_k=5,
                                 intent=QueryIntent.SEMANTIC, patient_id=pid)
            assert len(b.hits) == len(a.hits), pid
            kth = min(s for _h, s in a.hits)
            # tiny random encoder → near-ties; assert tie-aware quality
            assert all(s >= kth - 5e-3 for _h, s in b.hits), (pid, b.hits)
            if pid:
                assert all(h["patientId"] == pid for h, _ in b.hits)

    def test_sharded_int8_tier_beyond_bf16_budget(self, monkeypatch):
        """Past the per-chip bf16 budget the sharded tier scans int8 codes +
        exact re-rank; results must still match single-device retrieval."""
        import rassengine_tpu.fusion.strategies as strat

        single, sharded = mk_engine(1), mk_engine(8)
        for eng in (single, sharded):
            eng.ingest_docs("q8", [], corpus_docs(48))
        monkeypatch.setattr(strat, "HYBRID_BF16_BUDGET_BYTES", 1)
        t = sharded.tenant("q8")
        assert not t.retriever._bf16_fits()
        from rassengine_tpu.core.schema import QueryIntent

        # the random tiny encoder makes every pair a near-tie (all cosines
        # within ~0.005), so ID equality is ill-posed between the bf16 exact
        # scan and the int8+f32-rerank path; assert tie-aware quality instead
        for pid in (None, "p3"):
            a = single.retrieve("q8", "diabetes management note", top_k=5,
                                intent=QueryIntent.SEMANTIC, patient_id=pid)
            b = sharded.retrieve("q8", "diabetes management note", top_k=5,
                                 intent=QueryIntent.SEMANTIC, patient_id=pid)
            assert len(b.hits) == len(a.hits), pid
            kth = min(s for _h, s in a.hits)
            assert all(s >= kth - 5e-3 for _h, s in b.hits), (pid, a.hits, b.hits)
            if pid:
                assert all(h["patientId"] == pid for h, _ in b.hits)


class TestReplicaServing:
    """REPLICA_COUNT > 1 → (replica, shard) mesh: query batches split over
    replica groups, each holding a full copy of the sharded corpus
    (core.meshes.replica_shard_mesh; reference REPLICA_COUNT main.py:90)."""

    def mk_replica_engine(self, replicas, shards):
        cfg = EngineConfig(embed_dim=32, embed_batch_size=4,
                           index_capacity=2048, index_block_rows=256,
                           shard_count=shards, replica_count=replicas,
                           database_path=":memory:", llm_backend="echo",
                           intent_model_path="/none", ner_model_path="/none")
        return RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)

    @pytest.fixture(scope="class")
    def rep_engines(self, engines):
        single, _ = engines
        rep = self.mk_replica_engine(2, 4)
        assert rep.mesh is not None and "replica" in rep.mesh.axis_names
        rep.ingest_docs("u", [], corpus_docs())
        return single, rep

    def test_mesh_shape(self, rep_engines):
        _, rep = rep_engines
        assert dict(rep.mesh.shape) == {"replica": 2, "shard": 4}
        assert rep.tenant("u").index.n_shards == 4

    def test_single_query_matches_single_device(self, rep_engines):
        single, rep = rep_engines
        for q in ("tell me about diabetes", "asthma management note"):
            assert hit_ids(rep.retrieve("u", q, top_k=5)) == \
                hit_ids(single.retrieve("u", q, top_k=5))

    def test_batch_not_divisible_by_replicas(self, rep_engines):
        # B=3 over 2 replicas: the wrapper pads the batch and slices it back
        single, rep = rep_engines
        qs = ["tell me about diabetes", "hypertension note",
              "bronchitis patient"]
        got = rep.retrieve_batch("u", qs, 5)
        want = single.retrieve_batch("u", qs, 5)
        assert [hit_ids(g) for g in got] == [hit_ids(w) for w in want]

    def test_routed_query_on_replica_mesh(self, rep_engines):
        single, rep = rep_engines
        a = single.retrieve("u", "asthma note", top_k=5, patient_id="p2")
        b = rep.retrieve("u", "asthma note", top_k=5, patient_id="p2")
        assert hit_ids(a) == hit_ids(b)
        assert all(h["patientId"] == "p2" for h, _ in b.hits)

    def test_replica_only_mesh(self, engines):
        # shard_count=1, replica_count=8: pure query-data-parallel serving
        single, _ = engines
        rep = self.mk_replica_engine(8, 1)
        assert dict(rep.mesh.shape) == {"replica": 8, "shard": 1}
        rep.ingest_docs("u", [], corpus_docs())
        qs = [f"note about {c}" for c in
              ("diabetes", "asthma", "hypertension", "bronchitis", "diabetes")]
        got = rep.retrieve_batch("u", qs, 5)
        want = single.retrieve_batch("u", qs, 5)
        assert [hit_ids(g) for g in got] == [hit_ids(w) for w in want]


class TestLiveReshard:
    """engine.reshard: live topology change without restart/checkpoint —
    the host-failure degradation path (re-place every doc into its patient's
    region under the new shard count, swap per tenant under the lock)."""

    def _fresh(self, shards):
        eng = mk_engine(shards)
        eng.ingest_docs("u", [], corpus_docs())
        return eng

    def test_shrink_8_to_4_preserves_results(self):
        eng = self._fresh(8)
        before = {q: hit_ids(eng.retrieve("u", q, top_k=5))
                  for q in ("tell me about diabetes management",
                            "patient note hypertension")}
        moved = eng.reshard(4)
        assert moved == {"rass-index-u": 60}
        idx = eng.tenant("u").index
        assert idx.n_shards == 4 and eng.mesh.shape["shard"] == 4
        # rows re-placed into the NEW shard regions
        from rassengine_tpu.index.store import stable_hash32

        rs = idx.capacity // 4
        for row in np.nonzero(idx._allocated & ~idx._deleted)[0]:
            shard = stable_hash32(idx.docs[int(row)]["patientId"]) % 4
            assert shard * rs <= row < (shard + 1) * rs
        for q, want in before.items():
            assert hit_ids(eng.retrieve("u", q, top_k=5)) == want

    def test_reshard_to_single_chip(self):
        eng = self._fresh(8)
        want = hit_ids(eng.retrieve("u", "asthma management", top_k=5))
        eng.reshard(1)
        assert eng.mesh is None and eng.router is None
        assert eng.tenant("u").index.mesh is None
        assert hit_ids(eng.retrieve("u", "asthma management", top_k=5)) == want

    def test_patient_isolation_after_reshard(self):
        eng = self._fresh(8)
        eng.reshard(2)
        res = eng.retrieve("u", "patient note", top_k=10, patient_id="p3")
        assert res.hits
        assert all(h["patientId"] == "p3" for h, _ in res.hits)

    def test_ingest_after_reshard_lands_in_new_regions(self):
        eng = self._fresh(8)
        eng.reshard(4)
        eng.ingest_docs("u", [], [{"doc_id": "fresh1", "doc_type":
                                   "unstructured", "patientId": "p2",
                                   "unstructuredText": "freshterm note"}])
        from rassengine_tpu.core.schema import QueryIntent

        res = eng.retrieve("u", "freshterm", top_k=3,
                           intent=QueryIntent.KEYWORD)
        assert any(h["doc_id"] == "fresh1" for h, _ in res.hits)

    def test_too_many_shards_raises(self):
        eng = self._fresh(1)
        with pytest.raises(ValueError):
            eng.reshard(64)


class TestShardedHybridBatch:
    """Sharded ONE-dISPATCH batched hybrid (topk_merge.sharded_hybrid_topk):
    per-shard scan + replicated-postings BM25 + exact fusion + all-gather
    merge must equal the single-chip device hybrid, and the meshed
    hybrid_search_batch must actually take it (no host candidate union)."""

    def _embs(self, engine, queries):
        return engine.embedder.embed_texts_in_batches(queries)

    def test_batch_matches_single_device(self, engines):
        single, sharded = engines
        queries = ["hypertension management", "asthma note overview",
                   "diabetes bronchitis", "patient note management"]
        embs = self._embs(single, queries)
        a = single.tenant("u").retriever.hybrid_search_batch(queries, embs,
                                                             k=5)
        b = sharded.tenant("u").retriever.hybrid_search_batch(queries, embs,
                                                              k=5)
        for qa, qb, q in zip(a, b, queries):
            # same docs and same scores; ties may order differently between
            # one global top_k and the per-shard merge (bf16 score ties)
            sa = {src["doc_id"]: s for src, s in qa}
            sb = {src["doc_id"]: s for src, s in qb}
            swapped = set(sa) ^ set(sb)
            for d in swapped:  # a swapped-in/out doc must be a k-th-score tie
                kth = min(sa.values())
                sc = sa.get(d, sb.get(d))
                assert abs(sc - kth) <= 3e-2, (q, d, sc, kth)
            for d in set(sa) & set(sb):
                assert abs(sa[d] - sb[d]) <= 3e-2, (q, d, sa[d], sb[d])
            np.testing.assert_allclose(sorted(sa.values()),
                                       sorted(sb.values()),
                                       rtol=2e-2, atol=3e-2)

    def test_meshed_batch_takes_device_path(self, engines, monkeypatch):
        _single, sharded = engines
        import rassengine_tpu.parallel.topk_merge as tm

        called = {}
        real = tm.sharded_hybrid_topk

        def spy(*a, **kw):
            called["yes"] = True
            return real(*a, **kw)

        monkeypatch.setattr(tm, "sharded_hybrid_topk", spy)
        queries = ["hypertension management"]
        embs = self._embs(sharded, queries)
        sharded.tenant("u").retriever.hybrid_search_batch(queries, embs, k=5)
        assert called.get("yes")

    def test_hybrid_sem_m_knob_narrows_without_loss(self, engines):
        """HYBRID_SEM_M narrows the scan's semantic candidate width (the
        bench's M64/m48 fast path); on a corpus far smaller than the width
        the hits must be identical to the derived default, on both the
        single-device and the sharded dispatch."""
        import dataclasses

        single, sharded = engines
        queries = ["hypertension management", "asthma note overview"]
        embs = self._embs(single, queries)
        base = single.tenant("u").retriever.hybrid_search_batch(
            queries, embs, k=5)
        for eng in (single, sharded):
            rt = eng.tenant("u").retriever
            old = rt.config
            try:
                rt.config = dataclasses.replace(old, hybrid_sem_m=8)
                narrow = rt.hybrid_search_batch(queries, embs, k=5)
            finally:
                rt.config = old
            for qa, qb, q in zip(base, narrow, queries):
                assert {h[0]["doc_id"] for h in qa} \
                    == {h[0]["doc_id"] for h in qb}, (q, qa, qb)

    def test_batch_respects_patient_filter(self, engines):
        single, sharded = engines
        from rassengine_tpu.index.store import FilterSpec

        queries = ["diabetes note", "asthma note"]
        embs = self._embs(single, queries)
        b = sharded.tenant("u").retriever.hybrid_search_batch(
            queries, embs, k=5, filter_clause=FilterSpec(patient_id="p3"))
        assert any(b)
        for hits in b:
            assert all(h[0]["patientId"] == "p3" for h in hits)
        a = single.tenant("u").retriever.hybrid_search_batch(
            queries, embs, k=5, filter_clause=FilterSpec(patient_id="p3"))
        assert [[h[0]["doc_id"] for h in hb] for hb in b] \
            == [[h[0]["doc_id"] for h in ha] for ha in a]

    def test_replica_mesh_batch(self):
        """(replica, shard) mesh: batch splits over replicas, results match
        a single-device engine, odd batch sizes pad correctly."""
        cfg = EngineConfig(embed_dim=32, embed_batch_size=4,
                           index_capacity=2048, index_block_rows=256,
                           shard_count=4, replica_count=2,
                           database_path=":memory:", llm_backend="echo",
                           intent_model_path="/none", ner_model_path="/none")
        rep = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        single = mk_engine(1)
        docs = corpus_docs()
        rep.ingest_docs("u", [], docs)
        single.ingest_docs("u", [], docs)
        queries = ["hypertension management", "asthma overview",
                   "note about diabetes"]  # 3 % 2 != 0 → pad path
        embs = single.embedder.embed_texts_in_batches(queries)
        a = single.tenant("u").retriever.hybrid_search_batch(queries, embs,
                                                             k=5)
        b = rep.tenant("u").retriever.hybrid_search_batch(queries, embs, k=5)
        assert [[h[0]["doc_id"] for h in hb] for hb in b] \
            == [[h[0]["doc_id"] for h in ha] for ha in a]

    def test_int8_sharded_over_budget(self, engines, monkeypatch):
        """Past the per-shard bf16 budget the sharded one-dispatch hybrid
        must run int8-only (vecs=None) and track the exact in-budget hits
        within the quantization band."""
        import rassengine_tpu.parallel.topk_merge as tm
        from rassengine_tpu.fusion import strategies as st

        single, sharded = engines
        queries = ["hypertension management", "asthma note overview"]
        embs = self._embs(single, queries)
        want = single.tenant("u").retriever.hybrid_search_batch(queries,
                                                                embs, k=5)
        monkeypatch.setattr(st, "HYBRID_BF16_BUDGET_BYTES", 1)
        seen = {}
        real = tm.sharded_hybrid_topk

        def spy(mesh, vecs, *a, **kw):
            seen["int8"] = (vecs is None
                            and kw.get("int8_tables") is not None)
            return real(mesh, vecs, *a, **kw)

        monkeypatch.setattr(tm, "sharded_hybrid_topk", spy)
        got = sharded.tenant("u").retriever.hybrid_search_batch(queries,
                                                                embs, k=5)
        assert seen.get("int8"), "expected the int8-only sharded dispatch"
        for qa, qb, q in zip(want, got, queries):
            sa = {h["doc_id"]: s for h, s in qa}
            sb = {h["doc_id"]: s for h, s in qb}
            for d in set(sa) & set(sb):
                assert abs(sa[d] - sb[d]) <= 3e-2, (q, d, sa[d], sb[d])
            kth = min(sa.values())
            for d in set(sa) ^ set(sb):  # flips only on near-ties
                sc = sa.get(d, sb.get(d))
                assert abs(sc - kth) <= 6e-2, (q, d, sc, kth)

    def test_int8_sharded_respects_patient_filter(self, engines,
                                                  monkeypatch):
        from rassengine_tpu.fusion import strategies as st
        from rassengine_tpu.index.store import FilterSpec

        _single, sharded = engines
        queries = ["diabetes note"]
        embs = self._embs(sharded, queries)
        monkeypatch.setattr(st, "HYBRID_BF16_BUDGET_BYTES", 1)
        got = sharded.tenant("u").retriever.hybrid_search_batch(
            queries, embs, k=5, filter_clause=FilterSpec(patient_id="p3"))
        assert any(got)
        for hits in got:
            assert all(h["patientId"] == "p3" for h, _ in hits)


class TestShardedHybridSelectPolicy:
    """hybrid_select="int8" on a meshed engine: the sharded batched hybrid
    runs per-shard int8 SELECT + bf16 re-score and must return the same
    docs/scores as the default bf16 sharded path (re-score is exact)."""

    def test_meshed_select_matches_default(self, engines):
        import dataclasses

        single, sharded = engines
        queries = ["hypertension management", "asthma note overview",
                   "diabetes bronchitis"]
        embs = single.embedder.embed_texts_in_batches(queries)
        rt = sharded.tenant("u").retriever
        want = rt.hybrid_search_batch(queries, embs, k=5)
        old = rt.config
        try:
            rt.config = dataclasses.replace(old, hybrid_select="int8")
            got = rt.hybrid_search_batch(queries, embs, k=5)
        finally:
            rt.config = old
        for qa, qb, q in zip(want, got, queries):
            sa = {src["doc_id"]: s for src, s in qa}
            sb = {src["doc_id"]: s for src, s in qb}
            for d in set(sa) & set(sb):
                assert abs(sa[d] - sb[d]) <= 3e-2, (q, d, sa[d], sb[d])
            kth = min(sa.values()) if sa else 0.0
            for d in set(sa) ^ set(sb):  # near-tie flips only
                sc = sa.get(d, sb.get(d))
                assert abs(sc - kth) <= 6e-2, (q, d, sc, kth)
