"""Deletion + compaction: tombstones, masks, compaction remap, HTTP endpoint."""

import asyncio
import json

import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig


def mk_engine(**kw):
    cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=512,
                       index_block_rows=512, database_path=":memory:",
                       llm_backend="echo", intent_model_path="/none",
                       ner_model_path="/none", **kw)
    return RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)


def docs_for(n, start=0):
    return [{"doc_id": f"d{start + i}", "doc_type": "unstructured",
             "patientId": f"p{(start + i) % 3}",
             "unstructuredText": f"clinical note number {start + i} hypertension"}
            for i in range(n)]


class TestDelete:
    def test_deleted_doc_unfindable(self):
        eng = mk_engine()
        eng.ingest_docs("u", [], docs_for(20))
        res = eng.retrieve("u", "clinical note number 5", top_k=20)
        assert any(h["doc_id"] == "d5" for h, _ in res.hits)
        assert eng.delete_docs("u", ["d5"]) == 1
        res = eng.retrieve("u", "clinical note number 5", top_k=20)
        assert not any(h["doc_id"] == "d5" for h, _ in res.hits)
        # unknown ids are not counted
        assert eng.delete_docs("u", ["nope"]) == 0

    def test_delete_excluded_from_semantic_and_aggregate(self):
        eng = mk_engine()
        eng.ingest_docs("u", [], docs_for(10))
        t = eng.tenant("u")
        emb = t.index._vecs[3].copy()
        eng.delete_docs("u", ["d3"])
        hits = t.retriever.semantic_search("q", emb, k=10)
        assert not any(h[0]["doc_id"] == "d3" for h in hits)
        aggs = t.retriever.aggregate_search("")
        total = sum(b["doc_count"] for b in aggs["by_patient"]["buckets"])
        assert total == 9

    def test_reupsert_after_delete(self):
        eng = mk_engine()
        eng.ingest_docs("u", [], docs_for(5))
        eng.delete_docs("u", ["d2"])
        eng.ingest_docs("u", [], docs_for(1, start=2))  # same doc_id d2
        res = eng.retrieve("u", "clinical note number 2", top_k=10)
        assert any(h["doc_id"] == "d2" for h, _ in res.hits)

    def test_compaction_triggers_and_preserves_retrieval(self):
        eng = mk_engine()
        eng.ingest_docs("u", [], docs_for(40))
        t = eng.tenant("u")
        # force compaction threshold low by deleting > count//4 (256-min is
        # bypassed by calling compact_tenant directly after tombstoning)
        eng.delete_docs("u", [f"d{i}" for i in range(0, 20)])
        eng.compact_tenant(t)
        assert t.index.count == 20
        assert t.index.deleted_count == 0
        res = eng.retrieve("u", "clinical note number 25", top_k=5)
        assert any(h["doc_id"] == "d25" for h, _ in res.hits)
        # lexical rebuilt: row ids consistent
        rows, scores = t.lexical.top_m("hypertension", t.index.capacity, 30)
        assert rows.size and all(t.index.docs[int(r)] is not None for r in rows)
        # id map rebuilt
        assert set(t.index._id_to_row) == {f"d{i}" for i in range(20, 40)}

    def test_checkpoint_roundtrip_with_tombstones(self, tmp_path):
        """Checkpoints persist live rows only — saving is an implicit
        compaction point, so tombstones do not survive a restore."""
        from rassengine_tpu.index.checkpoint import load_engine, save_engine

        eng = mk_engine()
        eng.ingest_docs("u", [], docs_for(10))
        eng.delete_docs("u", ["d1", "d7"])
        save_engine(eng, str(tmp_path / "ck"))
        eng2 = mk_engine()
        load_engine(eng2, str(tmp_path / "ck"))
        t2 = eng2.tenant("u")
        assert t2.index.deleted_count == 0
        assert t2.index.count == 8
        res = eng2.retrieve("u", "clinical note number 7", top_k=20)
        assert not any(h["doc_id"] == "d7" for h, _ in res.hits)
        res = eng2.retrieve("u", "clinical note number 6", top_k=20)
        assert any(h["doc_id"] == "d6" for h, _ in res.hits)

    def test_delete_endpoint(self):
        from rassengine_tpu.serve.app import build_upload_app
        from rassengine_tpu.serve.ask import AskService
        from rassengine_tpu.serve.db import ChatStore
        from rassengine_tpu.serve.http import Request

        eng = mk_engine()
        eng.ingest_docs("u1", [], docs_for(6))
        svc = AskService(eng, db=ChatStore(":memory:"))
        svc.db.create_user("u1")
        app = build_upload_app(eng, svc)
        handler = app.routes[("POST", "/delete_docs")]

        async def scenario():
            ok = await handler(Request("POST", "/delete_docs", {}, {},
                                       json.dumps({"user_id": "u1",
                                                   "doc_ids": ["d0", "d4"]}).encode()))
            assert ok.status == 200
            assert json.loads(ok.body)["deleted"] == 2
            bad = await handler(Request("POST", "/delete_docs", {}, {},
                                        json.dumps({"user_id": "ghost",
                                                    "doc_ids": ["d1"]}).encode()))
            assert bad.status == 403
            empty = await handler(Request("POST", "/delete_docs", {}, {},
                                          json.dumps({"user_id": "u1",
                                                      "doc_ids": []}).encode()))
            assert empty.status == 400

        asyncio.run(scenario())
