"""C12 file utilities + failure-degradation paths."""

import asyncio
import json

import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig
from rassengine_tpu.serve.ask import AskService
from rassengine_tpu.serve.db import ChatStore
from rassengine_tpu.serve.llm import EchoLlm, LlmClient
from rassengine_tpu.utils.files import retrieve_ehr_document, validate_file_path


class TestFileUtils:
    def test_validate_file_path(self, tmp_path):
        ok = tmp_path / "a.json"
        ok.write_text("{}")
        assert validate_file_path(str(ok))
        assert not validate_file_path(str(tmp_path / "missing.json"))
        assert not validate_file_path(str(tmp_path))  # a directory
        bad_ext = tmp_path / "a.exe"
        bad_ext.write_text("x")
        assert not validate_file_path(str(bad_ext))

    def test_retrieve_reads_content(self, tmp_path):
        f = tmp_path / "doc.txt"
        f.write_text("patient note body")
        assert retrieve_ehr_document(str(f)) == "patient note body"

    def test_traversal_guard(self, tmp_path):
        root = tmp_path / "uploads"
        root.mkdir()
        inside = root / "ok.txt"
        inside.write_text("fine")
        outside = tmp_path / "secret.txt"
        outside.write_text("nope")
        assert retrieve_ehr_document(str(inside), upload_root=str(root)) == "fine"
        assert retrieve_ehr_document(str(outside), upload_root=str(root)) is None

    def test_max_bytes_cap(self, tmp_path):
        f = tmp_path / "big.txt"
        f.write_text("x" * 1000)
        assert len(retrieve_ehr_document(str(f), max_bytes=100)) == 100


class FailingLlm(LlmClient):
    async def generate_stream(self, prompt, system_msg=""):
        raise RuntimeError("backend down")
        yield  # pragma: no cover


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=256,
                       database_path=":memory:", llm_backend="echo",
                       intent_model_path="/none", ner_model_path="/none")
    eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
    eng.ingest_docs("u1", [], [{"doc_id": "d1", "doc_type": "unstructured",
                                "unstructuredText": "hypertension note"}])
    return eng


class TestDegradation:
    def test_llm_failure_degrades_not_crashes(self, engine):
        svc = AskService(engine, db=ChatStore(":memory:"), llm=FailingLlm())
        ans = asyncio.run(svc.ask("hypertension details", "u1", "c1"))
        assert "could not generate" in ans
        # Q&A still persisted (swallow-and-degrade, reference main.py:312-331)
        hist = svc.db.history("c1")
        assert len(hist) == 2

    def test_retrieval_on_empty_tenant(self, engine):
        svc = AskService(engine, db=ChatStore(":memory:"), llm=EchoLlm())
        ans = asyncio.run(svc.ask("anything at all", "brand-new-user", "c9"))
        assert isinstance(ans, str) and ans

    def test_health_details(self, engine):
        from rassengine_tpu.serve.app import build_app
        from rassengine_tpu.serve.http import Request

        app = build_app(engine, AskService(engine, db=ChatStore(":memory:")))
        handler = app.routes[("GET", "/health")]
        resp = asyncio.run(handler(Request("GET", "/health", {}, {})))
        body = json.loads(resp.body)
        assert body["status"] == "ok"
        assert body["encoder"]["dim"] == 32
        assert "rass-index-u1" in body["tenants"]
        assert body["nlu"] == {"intent_model": False, "ner_model": False}
