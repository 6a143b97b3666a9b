"""Multi-tenant isolation and serving-auth hardening (round-3 security
review): API bearer token, strict chat auth, authorize TOCTOU, tenant-name
safety, patient hash-collision post-check, cache scoping, tenant-creation
race, WS audit parity."""

from __future__ import annotations

import asyncio
import json
import threading

import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig
from rassengine_tpu.serve.app import build_app, build_upload_app
from rassengine_tpu.serve.ask import AskService, AuthorizationError
from rassengine_tpu.serve.db import ChatStore
from rassengine_tpu.serve.http import Request


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def mk_engine(**kw):
    cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=1024,
                       index_block_rows=256, database_path=":memory:",
                       llm_backend="echo", intent_model_path="/none",
                       ner_model_path="/none", **kw)
    return RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)


def docs_for(pid, n, topic="hypertension"):
    return [{"doc_id": f"{pid}-d{i}", "doc_type": "unstructured",
             "patientId": pid,
             "unstructuredText": f"note {i} about {topic} for patient"}
            for i in range(n)]


def _req(path, payload, headers=None):
    return Request("POST", path, {}, headers or {},
                   json.dumps(payload).encode())


class TestApiToken:
    def _handlers(self, **cfg_kw):
        eng = mk_engine(**cfg_kw)
        svc = AskService(eng, db=ChatStore(":memory:"))
        app = build_app(eng, svc)
        up = build_upload_app(eng, svc)
        return eng, svc, app.routes, up.routes

    def test_endpoints_401_without_token(self):
        eng, svc, routes, up_routes = self._handlers(api_token="sekret")
        ask = routes[("POST", "/ask")]
        users = routes[("POST", "/users")]
        delete = up_routes[("POST", "/delete_docs")]
        upload = up_routes[("POST", "/upload_data")]
        body = {"query": "q", "user_id": "u1", "chat_id": "c1"}
        assert run(ask(_req("/ask", body))).status == 401
        assert run(users(_req("/users", {"user_id": "u1"}))).status == 401
        assert run(delete(_req("/delete_docs",
                               {"user_id": "u1", "doc_ids": ["d"]}))).status == 401
        assert run(upload(Request("POST", "/upload_data", {}, {},
                                  b""))).status == 401

    def test_bearer_token_admits(self):
        eng, svc, routes, _ = self._handlers(api_token="sekret")
        hdr = {"authorization": "Bearer sekret"}
        r = run(routes[("POST", "/users")](
            _req("/users", {"user_id": "u1"}, hdr)))
        assert r.status == 201
        r = run(routes[("POST", "/ask")](
            _req("/ask", {"query": "hello", "user_id": "u1",
                          "chat_id": "c1"}, hdr)))
        assert r.status == 200

    def test_no_token_config_keeps_open_surface(self):
        eng, svc, routes, _ = self._handlers()
        r = run(routes[("POST", "/ask")](
            _req("/ask", {"query": "hello", "user_id": "u1",
                          "chat_id": "c1"})))
        assert r.status == 200

    def test_health_hides_tenant_names_without_token(self):
        eng, svc, routes, _ = self._handlers(api_token="sekret")
        eng.ingest_docs("victim-user", [], docs_for("p1", 3))
        health = routes[("GET", "/health")]
        body = json.loads(run(health(Request("GET", "/health", {}, {},
                                             b""))).body)
        assert "count" in body["tenants"]
        assert not any("victim" in k for k in body["tenants"])
        body2 = json.loads(run(health(Request(
            "GET", "/health", {},
            {"authorization": "Bearer sekret"}, b""))).body)
        assert any("victim-user" in k for k in body2["tenants"])


class TestChatAuth:
    def test_strict_mode_403s_unknown_chat(self):
        eng = mk_engine(strict_chat_auth=True)
        svc = AskService(eng, db=ChatStore(":memory:"))
        with pytest.raises(AuthorizationError):
            run(svc.ask("hello", "u1", "fresh-chat"))

    def test_authorize_rechecks_owner_after_create_race(self):
        """INSERT OR IGNORE means the loser of a concurrent chat-create must
        NOT proceed as authorized on the winner's chat."""
        eng = mk_engine()
        svc = AskService(eng, db=ChatStore(":memory:"))
        real_owner = svc.db.a_chat_owner
        calls = {"n": 0}

        async def racy_owner(chat_id):
            calls["n"] += 1
            if calls["n"] == 1:
                # simulate: A's row lands between B's check and B's create
                svc.db.create_user("userA")
                svc.db.create_chat("userA", chat_id)
                return None
            return await real_owner(chat_id)

        svc.db.a_chat_owner = racy_owner
        with pytest.raises(AuthorizationError):
            run(svc._authorize("userB", "contested-chat"))
        assert svc.db.chat_owner("contested-chat") == "userA"

    def test_ask_rejects_invalid_user_id(self):
        eng = mk_engine()
        svc = AskService(eng, db=ChatStore(":memory:"))
        app = build_app(eng, svc)
        r = run(app.routes[("POST", "/ask")](_req(
            "/ask", {"query": "q", "user_id": "a/b", "chat_id": "c"})))
        assert r.status == 400


class TestTenantSafety:
    def test_checkpoint_names_are_injective(self, tmp_path):
        from rassengine_tpu.index.checkpoint import load_engine, save_engine

        eng = mk_engine()
        eng.ingest_docs("a/b", [], docs_for("p1", 2, topic="asthma"))
        eng.ingest_docs("a_b", [], docs_for("p2", 3, topic="diabetes"))
        save_engine(eng, str(tmp_path))
        dirs = {d.name for d in tmp_path.iterdir() if d.is_dir()}
        assert len(dirs) == 2, dirs  # no collision/clobber
        eng2 = mk_engine()
        assert load_engine(eng2, str(tmp_path)) == 2
        assert eng2.tenant("a/b").index.count == 2
        assert eng2.tenant("a_b").index.count == 3

    def test_concurrent_first_touch_single_instance(self):
        eng = mk_engine()
        results = []
        barrier = threading.Barrier(8)

        def touch():
            barrier.wait()
            results.append(eng.tenant("shared-user"))

        threads = [threading.Thread(target=touch) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len({id(t) for t in results}) == 1


class TestPatientHashCollision:
    def test_colliding_patients_do_not_leak(self, monkeypatch):
        """Force every patientId to one hash: the device mask passes both
        patients, the engine's exact post-check must still isolate them."""
        import rassengine_tpu.index.store as store_mod

        real = store_mod.stable_hash32
        monkeypatch.setattr(store_mod, "stable_hash32",
                            lambda s: 12345 if s.startswith("p") else real(s))
        eng = mk_engine()
        eng.ingest_docs("u", [], docs_for("p1", 4, topic="asthma")
                        + docs_for("p2", 4, topic="asthma"))
        res = eng.retrieve("u", "asthma note", top_k=8, patient_id="p1")
        assert res.hits, "query must still match p1's docs"
        assert all(h["patientId"] == "p1" for h, _ in res.hits), res.hits


class TestCacheScope:
    def test_no_cross_chat_replay_without_patient(self):
        from rassengine_tpu.core.tracing import METRICS
        from rassengine_tpu.serve.cache import SemanticCache

        eng = mk_engine()
        eng.ingest_docs("u", [], docs_for("p1", 4))
        svc = AskService(eng, db=ChatStore(":memory:"))
        svc.cache = SemanticCache(16, 0.2, 300.0)  # loose threshold
        q = "tell me about hypertension"
        run(svc.ask(q, "u", "chat-one"))
        before = METRICS.snapshot()["counters"].get("cache_hits", 0)
        run(svc.ask(q, "u", "chat-one"))  # same chat → hit allowed
        mid = METRICS.snapshot()["counters"].get("cache_hits", 0)
        assert mid == before + 1
        run(svc.ask(q, "u", "chat-two"))  # other chat → MUST miss
        after = METRICS.snapshot()["counters"].get("cache_hits", 0)
        assert after == mid


class TestWsAudit:
    def test_ws_denied_and_success_are_audited(self, tmp_path):
        from rassengine_tpu.serve.audit import AuditLog

        eng = mk_engine()
        eng.ingest_docs("owner", [], docs_for("p1", 3))
        svc = AskService(eng, db=ChatStore(":memory:"))
        audit = AuditLog(str(tmp_path / "audit.jsonl"))
        app = build_app(eng, svc, audit)
        handler = app.ws_routes["/ws/ask"]

        class FakeWs:
            def __init__(self, msgs):
                self.msgs = list(msgs)
                self.sent = []

            async def recv_text(self):
                return self.msgs.pop(0) if self.msgs else None

            async def send_text(self, t):
                self.sent.append(t)

            async def close(self, code=1000):
                pass

        async def scenario():
            run_req = Request("GET", "/ws/ask", {}, {}, b"")
            await svc.ask("claim", "owner", "wschat")
            ws = FakeWs([json.dumps({"query": "hypertension", "user_id":
                                     "owner", "chat_id": "wschat"}),
                         json.dumps({"query": "x", "user_id": "intruder",
                                     "chat_id": "wschat"})])
            await handler(ws, run_req)
            return ws

        ws = run(scenario())
        assert any("[ERROR]" in s for s in ws.sent)
        lines = [json.loads(ln) for ln in
                 (tmp_path / "audit.jsonl").read_text().splitlines()]
        ws_events = [e for e in lines if e.get("transport") == "ws"]
        assert any(e.get("status") == "denied" and e["user_id"] == "intruder"
                   for e in ws_events), lines
        assert any(e.get("status") != "denied" and e["user_id"] == "owner"
                   for e in ws_events), lines


class TestUploadEarlyValidation:
    def test_unknown_user_rejected_at_stream_time(self, tmp_path):
        eng = mk_engine()
        eng.config = eng.config.replace(upload_dir=str(tmp_path))
        svc = AskService(eng, db=ChatStore(":memory:"))
        app = build_upload_app(eng, svc)
        boundary = "b1"
        body = (f'--{boundary}\r\nContent-Disposition: form-data; '
                f'name="user_id"\r\n\r\nghost\r\n'
                f'--{boundary}\r\nContent-Disposition: form-data; '
                f'name="files"; filename="x.txt"\r\n\r\ndata\r\n'
                f'--{boundary}--\r\n').encode()
        req = Request("POST", "/upload_data", {},
                      {"content-type":
                       f"multipart/form-data; boundary={boundary}"}, body)
        resp = run(app.routes[("POST", "/upload_data")](req))
        assert resp.status == 403
