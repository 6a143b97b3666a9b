"""Regression tests for round-3 fixes (ADVICE round 2 + VERDICT papercuts).

- sharded bf16 scan must not surface filter-masked rows (patient isolation),
- multi_intent_search fallback must not give unknown doc_ids row 0's bonus,
- bare 5-digit numbers are not CPT codes without a billing-code context,
- IVF serves re-upserted vectors and bounds its brute-forced fresh tail.
"""

import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.schema import QueryIntent
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig


def mk_engine(shard_count=1, **kw):
    cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=2048,
                       index_block_rows=256, shard_count=shard_count,
                       database_path=":memory:", llm_backend="echo",
                       intent_model_path="/none", ner_model_path="/none", **kw)
    return RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)


def docs_for(pid, n, start=0, topic="hypertension"):
    return [{"doc_id": f"{pid}-d{start + i}", "doc_type": "unstructured",
             "patientId": pid,
             "unstructuredText": f"note {start + i} about {topic} for {pid}"}
            for i in range(n)]


class TestShardedFilterIsolation:
    def test_hybrid_batch_under_patient_filter_returns_only_that_patient(self):
        """ADVICE r2 high: the sharded bf16 _sharded_top_m returned masked
        rows (other patients' docs) whenever spec-matching candidates < k."""
        eng = mk_engine(8)
        eng.ingest_docs("iso", [], docs_for("alice", 2) + docs_for("bob", 40))
        t = eng.tenant("iso")
        q = ["hypertension note"]
        emb = eng.embedder.embed_texts_in_batches(q)
        hits = t.retriever.hybrid_search_batch(q, emb, k=8, patient_id="alice")
        assert hits[0], "alice's docs must be found"
        assert all(h["patientId"] == "alice" for h, _ in hits[0]), hits[0]

    def test_semantic_batch_under_patient_filter(self):
        eng = mk_engine(8)
        eng.ingest_docs("iso2", [], docs_for("alice", 2) + docs_for("bob", 40))
        t = eng.tenant("iso2")
        q = ["hypertension note"]
        emb = eng.embedder.embed_texts_in_batches(q)
        hits = t.retriever.semantic_search_batch(q, emb, k=8, patient_id="alice")
        assert hits[0] and all(h["patientId"] == "alice" for h, _ in hits[0])


class TestMultiIntentBonus:
    def test_unknown_doc_id_gets_no_row0_recency_bonus(self):
        """VERDICT r2 weak #6: `_id_to_row.get(doc_id, 0)` let any unknown
        doc_id inherit row 0's recency bonus in the fallback path."""
        import datetime as dt

        eng = mk_engine(1)
        recent = (dt.date.today() - dt.timedelta(days=10)).isoformat()
        base = [{"doc_id": "recent0", "doc_type": "unstructured",
                 "patientId": "p0", "conditionOnsetDateTime": recent,
                 "unstructuredText": "fresh cardiology note"}]
        twins = [{"doc_id": f"twin{i}", "doc_type": "unstructured",
                  "patientId": "p1",
                  "unstructuredText": "identical asthma wording here"}
                 for i in range(2)]
        eng.ingest_docs("mi", [], base + twins)
        t = eng.tenant("mi")
        # make row of twin0 unknown to the id map (simulates the advisor's
        # unknown-doc_id scenario without touching private fusion internals)
        row = t.index._id_to_row.pop("twin0")
        t.index.docs[row]["doc_id"] = "ghost"
        # no query_emb → the non-device fallback path with the bonus rescore
        hits = t.retriever.multi_intent_search("identical asthma wording here",
                                               None, k=5)
        scores = {h["doc_id"]: s for h, s in hits}
        assert "ghost" in scores and "twin1" in scores
        # identical docs, neither recent → identical scores (before the fix
        # ghost got +0.5 from row 0's recent date)
        assert scores["ghost"] == pytest.approx(scores["twin1"])


class TestCptContext:
    def test_zip_code_is_not_cpt(self):
        from rassengine_tpu.nlu.ner import RuleNER

        ents = RuleNER().extract("patients living in zip 90210 with asthma")
        assert not any(e["label"] == "CPT_CODE" for e in ents)

    def test_cpt_with_context_still_extracts(self):
        from rassengine_tpu.nlu.ner import RuleNER

        ents = RuleNER().extract("visits billed under CPT code 99213")
        assert any(e["label"] == "CPT_CODE" and e["text"] == "99213"
                   for e in ents)


class TestIvfFreshness:
    def mk_ivf_engine(self):
        return mk_engine(ann_mode="ivf", ann_threshold=1, ivf_nprobe=1,
                         ivf_nlist=8)

    def seed_clustered(self, eng, user):
        """Two well-separated clusters in the tiny 32-d embedding space."""
        rng = np.random.default_rng(0)
        t = eng.tenant(user)
        a = np.zeros(32); a[0] = 1.0
        b = np.zeros(32); b[1] = 1.0
        docs = []
        for i in range(64):
            center = a if i % 2 == 0 else b
            v = center + 0.05 * rng.standard_normal(32)
            d = {"doc_id": f"v{i}", "doc_type": "unstructured",
                 "patientId": "p", "unstructuredText": f"vec doc {i}"}
            with t.lock:
                t.index.upsert(d, v)
                t.lexical.index_doc(t.index._id_to_row[f"v{i}"], d)
            docs.append(d)
        return t, a, b

    def test_reupserted_vector_is_retrievable(self):
        """ADVICE r2 medium: a re-upserted doc whose vector moved to another
        centroid's list was unretrievable until a 25%-growth rebuild."""
        eng = self.mk_ivf_engine()
        t, a, b = self.seed_clustered(eng, "ivf")
        r = t.retriever
        # trigger the build with a query
        rows, _ = r._sem_top_m(a, r._spec(None, None), 5)
        assert rows.size
        built, _log, _ivf = r._ivf_cache
        # move v0 (cluster a) to an extreme point of cluster b
        new_v = np.zeros(32); new_v[1] = 2.0
        with t.lock:
            t.index.upsert({"doc_id": "v0", "doc_type": "unstructured",
                            "patientId": "p",
                            "unstructuredText": "vec doc 0"}, new_v)
        # same cache (no rebuild): the dirty row must still be found as the
        # best match for cluster-b queries
        assert r._ivf_cache is not None and r._ivf_cache[0] == built
        rows2, scores2 = r._sem_top_m(np.asarray(new_v, np.float32),
                                      r._spec(None, None), 3)
        got = [t.index.docs[int(x)]["doc_id"] for x in rows2]
        assert got[0] == "v0", got
        # and no duplicate rows in the merged candidate list
        assert len(set(rows2.tolist())) == len(rows2.tolist())

    def test_tail_bound_triggers_rebuild(self):
        eng = mk_engine(ann_mode="ivf", ann_threshold=1, ivf_nprobe=1,
                        ivf_nlist=8, ivf_tail_bound=4)
        t, a, b = self.seed_clustered(eng, "ivf2")
        r = t.retriever
        r._sem_top_m(a, r._spec(None, None), 5)
        built0 = r._ivf_cache[0]
        # 6 upserts (> tail bound 4, < 25% growth) must force a rebuild
        for i in range(6):
            d = {"doc_id": f"extra{i}", "doc_type": "unstructured",
                 "patientId": "p", "unstructuredText": f"extra {i}"}
            with t.lock:
                t.index.upsert(d, b)
        r._sem_top_m(a, r._spec(None, None), 5)
        assert r._ivf_cache[0] > built0


class TestShardMoveLexicalEviction:
    def test_old_rows_postings_removed_on_shard_move(self):
        """ADVICE r2 low: shard-move re-upsert left the old row's postings
        in the lexical index, inflating doc stats until compaction."""
        from rassengine_tpu.index.store import stable_hash32

        eng = mk_engine(8)
        eng.ingest_docs("lex", [], docs_for("p0", 8))
        t = eng.tenant("lex")
        n_docs_before = t.lexical._n_docs
        doc = dict(t.index.docs[int(np.nonzero(t.index._allocated)[0][0])])
        old_row = t.index._id_to_row[doc["doc_id"]]
        new_pid = next(p for p in ("q0", "q1", "q2", "q3", "q4")
                       if stable_hash32(p) % 8 != stable_hash32("p0") % 8)
        doc["patientId"] = new_pid
        eng.ingest_docs("lex", [], [doc])
        assert t.index._id_to_row[doc["doc_id"]] != old_row  # moved
        # doc count unchanged: old row's postings evicted, new row indexed
        assert t.lexical._n_docs == n_docs_before
        rows, _ = t.lexical.top_m("note", t.index.capacity, 16, "text")
        assert old_row not in rows.tolist()


class TestReviewFixesR3b:
    """Round-3 self-review findings (second batch)."""

    def test_tail_bound_counts_appended_rows_once(self):
        """The upsert log also records appends; the rebuild bound must not
        double-count them (old code rebuilt at ~half ivf_tail_bound)."""
        eng = mk_engine(ann_mode="ivf", ann_threshold=1, ivf_nprobe=1,
                        ivf_nlist=8, ivf_tail_bound=8)
        t = eng.tenant("ivf3")
        rng = np.random.default_rng(1)
        a = np.zeros(32); a[0] = 1.0
        with t.lock:
            for i in range(64):
                v = a + 0.05 * rng.standard_normal(32)
                d = {"doc_id": f"v{i}", "doc_type": "unstructured",
                     "patientId": "p", "unstructuredText": f"vec doc {i}"}
                t.index.upsert(d, v)
                t.lexical.index_doc(t.index._id_to_row[f"v{i}"], d)
        r = t.retriever
        r._sem_top_m(a, r._spec(None, None), 5)
        built0 = r._ivf_cache[0]
        # 6 pure appends: tail = 6 <= 8 -> same build must survive (the old
        # double count gave 12 > 8 and rebuilt here)
        with t.lock:
            for i in range(6):
                t.index.upsert({"doc_id": f"x{i}", "doc_type": "unstructured",
                                "patientId": "p",
                                "unstructuredText": f"x {i}"},
                               a + 0.05 * rng.standard_normal(32))
        r._sem_top_m(a, r._spec(None, None), 5)
        assert r._ivf_cache[0] == built0
        # 4 more (tail 10 > 8) -> rebuild
        with t.lock:
            for i in range(4):
                t.index.upsert({"doc_id": f"y{i}", "doc_type": "unstructured",
                                "patientId": "p",
                                "unstructuredText": f"y {i}"},
                               a + 0.05 * rng.standard_normal(32))
        r._sem_top_m(a, r._spec(None, None), 5)
        assert r._ivf_cache[0] > built0

    def test_int8_ivf_probe_scores_are_exact(self):
        """When the IVF probe gathers from int8 codes, final scores must be
        exact f32 re-ranks — never the ~0.5%-noisy quantized dot."""
        from rassengine_tpu.fusion.strategies import Retriever
        from rassengine_tpu.index.store import FilterSpec, TenantIndex
        from rassengine_tpu.lexical.bm25 import LexicalIndex

        rng = np.random.default_rng(3)
        n, d = 512, 32
        v = rng.normal(size=(n, d)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        idx = TenantIndex("t", d, capacity=n, block_rows=256)
        for i in range(n):
            idx.upsert({"doc_id": f"d{i}", "doc_type": "unstructured",
                        "unstructuredText": "x"}, v[i])
        # budget between cap*dim (16384) and 2*cap*dim: int8 gather regime,
        # not the PQ4 route
        cfg = EngineConfig(ann_mode="ivf", ann_threshold=1, ivf_nlist=8,
                           ivf_nprobe=8, int8_hbm_budget_bytes=20000)
        r = Retriever(idx, LexicalIndex(), cfg, use_pallas=False)
        q = v[7]
        rows, scores = r._sem_top_m(q, FilterSpec(require_embedding=True), 5)
        assert int(rows[0]) == 7
        exact = float(v[7] @ q)
        assert abs(float(scores[0]) - exact) < 1e-5, (scores[0], exact)

    def test_update_log_dedups_under_churn(self, monkeypatch):
        """Re-upsert churn on tenants that never take the IVF path must not
        grow the update log unboundedly."""
        from rassengine_tpu.index import store as store_mod
        from rassengine_tpu.index.store import TenantIndex

        monkeypatch.setattr(store_mod, "UPDATE_LOG_DEDUP_AT", 64)
        idx = TenantIndex("t", 8, capacity=128, block_rows=128)
        v = np.ones(8, np.float32)
        for _round in range(40):
            for i in range(4):
                idx.upsert({"doc_id": f"d{i}", "doc_type": "unstructured",
                            "unstructuredText": "x"}, v)
        assert len(idx._update_log) <= 65, len(idx._update_log)
        assert set(idx._update_log) <= set(range(4))

    def test_host_local_rows_covers_all_shards(self, monkeypatch):
        """Remainder shards (n_shards % processes != 0) belong to the LAST
        process; every row must be owned by exactly one process."""
        import jax

        from rassengine_tpu.parallel.multihost import host_local_rows

        monkeypatch.setattr(jax, "process_count", lambda: 3)
        spans = []
        for pid in range(3):
            monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
            spans.append(host_local_rows(800, 8))
        assert spans == [(0, 200), (200, 400), (400, 800)]

    def test_403_not_blocked_by_slow_retrieval(self, monkeypatch):
        """Auth failure must surface at sqlite speed: cancel() cannot stop a
        running to_thread retrieval, so the 403 path must abandon it rather
        than await it."""
        import asyncio
        import time

        from rassengine_tpu.serve.ask import AskService, AuthorizationError
        from rassengine_tpu.serve.db import ChatStore

        eng = mk_engine()
        eng.ingest_docs("owner", [], docs_for("p1", 4))
        svc = AskService(eng, db=ChatStore(":memory:"))

        async def scenario():
            await svc.ask("hello there", "owner", "chatX")  # claim the chat
            real = eng.retrieve

            def slow_retrieve(*a, **kw):
                time.sleep(1.5)
                return real(*a, **kw)

            monkeypatch.setattr(eng, "retrieve", slow_retrieve)
            t0 = time.monotonic()
            try:
                await svc.ask("hypertension note", "intruder", "chatX")
            except AuthorizationError:
                return time.monotonic() - t0
            raise AssertionError("403 expected")

        dt = asyncio.run(scenario())
        assert dt < 1.2, f"403 took {dt:.2f}s — waited on the retrieval"


class TestHybridSelectInt8Only:
    """HYBRID_SELECT=int8only: the in-budget hybrid serves entirely from
    block-scale int8 codes (the max-QPS opt-in bench.py's fast path
    measures) — docs must substantially agree with the default bf16 path."""

    def _hits(self, eng, mode):
        import dataclasses

        rt = eng.tenant("u").retriever
        old = rt.config
        queries = ["hypertension management", "diabetes bronchitis note"]
        embs = eng.embedder.embed_texts_in_batches(queries)
        try:
            rt.config = dataclasses.replace(old, hybrid_select=mode)
            return rt.hybrid_search_batch(queries, embs, k=5)
        finally:
            rt.config = old

    def test_single_and_sharded_agree_with_default(self):
        for shards in (1, 8):
            eng = mk_engine(shard_count=shards)
            eng.ingest_docs("u", [], docs_for("p1", 24)
                            + docs_for("p2", 24, topic="diabetes"))
            want = self._hits(eng, "auto")
            got = self._hits(eng, "int8only")
            for qa, qb in zip(want, got):
                sa = {h[0]["doc_id"] for h in qa}
                sb = {h[0]["doc_id"] for h in qb}
                assert len(sa & sb) >= min(3, len(sa)), (shards, sa, sb)

    def test_policy_routes_to_codes_only_dispatch(self, monkeypatch):
        """With pallas available, int8only must dispatch vecs=None +
        pallas_int8 (codes are the only operand) even in budget."""
        import dataclasses

        import jax.numpy as jnp

        import rassengine_tpu.lexical.device_bm25 as db

        eng = mk_engine()
        eng.ingest_docs("u", [], docs_for("p1", 32))
        rt = eng.tenant("u").retriever
        rt.use_pallas = True
        seen = {}

        def stub(vecs, mask, q, tables, ci, wvec, w, k, **kw):
            seen["vecs"] = vecs
            seen["scan_mode"] = kw.get("scan_mode")
            seen["bscales"] = kw.get("int8_block_scales") is not None
            b = q.shape[0]
            return (jnp.zeros((b, k), jnp.float32),
                    jnp.full((b, k), -1, jnp.int32))

        monkeypatch.setattr(db, "hybrid_topk_batch", stub)
        old = rt.config
        try:
            rt.config = dataclasses.replace(old, hybrid_select="int8only")
            rt.hybrid_search_batch(["hypertension"], np.zeros((1, 32)), k=3)
        finally:
            rt.config = old
            rt.use_pallas = False
        assert seen["vecs"] is None and seen["scan_mode"] == "pallas_int8"
        assert seen["bscales"]


class TestStoreReviewFixes:
    def test_unknown_resource_type_matches_nothing(self):
        """A requested-but-unknown resourceType must return NO docs
        (OpenSearch term semantics), not every resource type."""
        from rassengine_tpu.index.store import FilterSpec

        eng = mk_engine()
        eng.ingest_docs("u", [], docs_for("p1", 8))
        t = eng.tenant("u")
        spec = FilterSpec(resource_type="NoSuchResource")
        assert not t.index.host_mask(spec).any()
        mask = np.asarray(t.index.filter_mask(spec))
        assert (mask < -1e29).all()

    def test_auto_doc_id_written_back_and_survives_compact(self):
        from rassengine_tpu.index.store import TenantIndex

        idx = TenantIndex("t", 8, capacity=128, block_rows=128)
        v = np.ones(8, np.float32)
        d1, d2 = {"doc_type": "unstructured", "unstructuredText": "a"}, \
                 {"doc_type": "unstructured", "unstructuredText": "b"}
        r1 = idx.upsert(d1, v)
        r2 = idx.upsert(d2, v)
        assert d1["doc_id"] != d2["doc_id"]  # written back, distinct
        assert idx.delete(d1["doc_id"])      # deletable by the auto id
        idx.compact()
        # the survivor keeps its id through the rebuild, and a NEW auto id
        # must not collide with it (count reset by compact)
        assert idx._id_to_row.get(d2["doc_id"]) is not None
        d3 = {"doc_type": "unstructured", "unstructuredText": "c"}
        idx.upsert(d3, v)
        assert d3["doc_id"] != d2["doc_id"]
        assert idx.count == 2

    def test_filter_allows_up_to_eight_or_values(self):
        from rassengine_tpu.index.store import FilterSpec, TenantIndex

        idx = TenantIndex("t", 8, capacity=128, block_rows=128)
        v = np.ones(8, np.float32)
        for i in range(8):
            idx.upsert({"doc_id": f"d{i}", "doc_type": "structured",
                        "conditionCategory": f"cat{i}"}, None)
        spec = FilterSpec(keyword_terms={
            "conditionCategory": [f"cat{i}" for i in range(6)]})
        hm = idx.host_mask(spec)
        assert hm.sum() == 6  # value #5 and #6 no longer truncated away
        mask = np.asarray(idx.filter_mask(spec))
        assert (mask > -1.0).sum() == 6

    def test_cached_device_columns_stay_row_sharded(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rassengine_tpu.core.meshes import shard_mesh
        from rassengine_tpu.index.store import FilterSpec, TenantIndex

        mesh = shard_mesh(8)
        idx = TenantIndex("t", 8, capacity=1024, block_rows=128, mesh=mesh)
        v = np.ones(8, np.float32)
        for i in range(16):
            idx.upsert({"doc_id": f"d{i}", "doc_type": "unstructured",
                        "patientId": f"p{i % 3}",
                        "unstructuredText": "x"}, v)
        # serving order: filter mask first (no vecs), THEN the scan's vecs —
        # the lazily-added vecs must come back row-sharded, not replicated
        # on one device
        idx.filter_mask(FilterSpec())
        vecs = idx.device_columns()["vecs"]
        want = NamedSharding(mesh, P("shard"))
        assert vecs.sharding == want, vecs.sharding


class TestAuditRotationBytes:
    def test_rotation_counts_utf8_bytes(self, tmp_path):
        import os

        from rassengine_tpu.serve.audit import AuditLog

        p = tmp_path / "a.jsonl"
        audit = AuditLog(str(p), max_bytes=2048)
        for i in range(64):
            audit.emit("ask", "ü" * 40, note="é" * 40)  # 2-byte chars
        assert os.path.getsize(p) <= 2048, os.path.getsize(p)
