"""Serving-protection features: rate limiting, audit trail, NLU hot-reload.

No reference counterpart (the reference bounds only a single request,
embedding_gen.py:1239-1250, and loads NLU models once at import,
main.py:109-134); these close the production-operations gaps ROADMAP #5
names.
"""

from __future__ import annotations

import asyncio
import json

import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig
from rassengine_tpu.serve.app import build_app, build_upload_app
from rassengine_tpu.serve.ask import AskService
from rassengine_tpu.serve.audit import AuditLog
from rassengine_tpu.serve.db import ChatStore
from rassengine_tpu.serve.http import Request
from rassengine_tpu.serve.ratelimit import RateLimiter


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class TestRateLimiter:
    def test_burst_then_block_then_refill(self):
        clock = FakeClock()
        rl = RateLimiter(rate_per_min=60.0, burst=2, now=clock)  # 1 token/s
        assert rl.allow("u") and rl.allow("u")
        assert not rl.allow("u")
        assert rl.retry_after("u") == pytest.approx(1.0, abs=0.01)
        clock.t += 1.0
        assert rl.allow("u")
        assert not rl.allow("u")

    def test_keys_are_independent(self):
        clock = FakeClock()
        rl = RateLimiter(rate_per_min=60.0, burst=1, now=clock)
        assert rl.allow("a")
        assert not rl.allow("a")
        assert rl.allow("b")

    def test_disabled_always_allows(self):
        rl = RateLimiter(0.0)
        assert all(rl.allow("u") for _ in range(100))
        assert rl.retry_after("u") == 0.0

    def test_prune_drops_only_full_buckets(self):
        clock = FakeClock()
        rl = RateLimiter(rate_per_min=60.0, burst=2, now=clock)
        rl.allow("drained")
        rl.allow("drained")          # 0/2 tokens left
        rl.allow("idle")             # 1/2 tokens left
        clock.t += 1.0               # drained: 1/2 (keep), idle: 2/2 (prune)
        rl._prune(clock.t)
        assert "idle" not in rl._buckets
        assert "drained" in rl._buckets


class TestAuditLog:
    def test_writes_jsonl(self, tmp_path):
        path = str(tmp_path / "audit.jsonl")
        a = AuditLog(path)
        a.emit("ask", "u1", chat_id="c1")
        a.emit("upload", "u2", status="denied")
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["event"] == "ask" and lines[0]["user_id"] == "u1"
        assert lines[0]["chat_id"] == "c1" and "ts" in lines[0]
        assert lines[1]["status"] == "denied"

    def test_rotation(self, tmp_path):
        path = str(tmp_path / "audit.jsonl")
        a = AuditLog(path, max_bytes=200)
        for i in range(20):
            a.emit("ask", f"user{i}")
        assert (tmp_path / "audit.jsonl.1").exists()
        # current file stays under the cap and every line is valid JSON
        assert (tmp_path / "audit.jsonl").stat().st_size <= 200
        for l in open(path):
            json.loads(l)

    def test_disabled_writes_nothing(self, tmp_path):
        a = AuditLog("")
        a.emit("ask", "u1")  # no-op, no crash
        assert not a.enabled


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig(
        embed_dim=32, embed_batch_size=4, index_capacity=512,
        index_block_rows=512, database_path=":memory:", llm_backend="echo",
        intent_model_path="/nonexistent", ner_model_path="/nonexistent",
    )
    return RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)


def _multipart(user_id: str, files: list[tuple[str, bytes]]) -> Request:
    b = "bnd"
    body = (f'--{b}\r\nContent-Disposition: form-data; name="user_id"'
            f"\r\n\r\n{user_id}\r\n").encode()
    for fname, data in files:
        body += (f'--{b}\r\nContent-Disposition: form-data; name="files"; '
                 f'filename="{fname}"\r\n\r\n').encode() + data + b"\r\n"
    body += f"--{b}--\r\n".encode()
    return Request("POST", "/upload_data", {},
                   {"content-type": f"multipart/form-data; boundary={b}"}, body)


class TestUploadRateLimit:
    def _mk(self, engine, tmp_path, audit=None):
        engine.config = engine.config.replace(
            upload_dir=str(tmp_path), upload_rate_limit_per_min=1.0)
        svc = AskService(engine, db=ChatStore(":memory:"))
        app = build_upload_app(engine, svc, audit)
        return svc, app.routes[("POST", "/upload_data")]

    def test_second_upload_within_window_gets_429(self, engine, tmp_path):
        audit_path = str(tmp_path / "a.jsonl")
        svc, handler = self._mk(engine, tmp_path, AuditLog(audit_path))
        svc.db.create_user("rl1")
        req = _multipart("rl1", [("n.txt", b"note text")])
        r1 = run(handler(req))
        assert r1.status == 200
        r2 = run(handler(_multipart("rl1", [("n2.txt", b"more")])))
        assert r2.status == 429
        assert int(r2.headers["Retry-After"]) >= 1
        events = [json.loads(l) for l in open(audit_path)]
        assert [e["status"] for e in events
                if e["event"] == "upload"] == ["ok", "rate_limited"]

    def test_other_user_not_limited(self, engine, tmp_path):
        svc, handler = self._mk(engine, tmp_path)
        svc.db.create_user("rl2")
        svc.db.create_user("rl3")
        assert run(handler(_multipart("rl2", [("a.txt", b"x")]))).status == 200
        assert run(handler(_multipart("rl3", [("b.txt", b"y")]))).status == 200


class TestNluHotReload:
    def test_reload_picks_up_new_checkpoint_paths(self, engine):
        # models start absent (paths are /nonexistent)
        assert engine.intent_classifier.model is None
        old_intent, old_ner = engine.intent_classifier, engine.ner
        state = engine.reload_nlu()
        assert state == {"intent_model": False, "ner_model": False}
        assert engine.intent_classifier is not old_intent
        assert engine.ner is not old_ner
        # pipeline still answers after the swap
        out = engine.retrieve("u-hot", "anything at all")
        assert out is not None

    def test_admin_endpoint_requires_token_when_set(self, engine, tmp_path):
        engine.config = engine.config.replace(admin_token="sekrit",
                                              upload_dir=str(tmp_path))
        app = build_upload_app(engine, AskService(engine,
                                                  db=ChatStore(":memory:")))
        handler = app.routes[("POST", "/admin/reload_nlu")]
        bad = run(handler(Request("POST", "/admin/reload_nlu", {}, {}, b"")))
        assert bad.status == 403
        ok = run(handler(Request("POST", "/admin/reload_nlu", {},
                                 {"x-admin-token": "sekrit"}, b"")))
        assert ok.status == 200
        assert json.loads(ok.body)["reloaded"] == {
            "intent_model": False, "ner_model": False}
        engine.config = engine.config.replace(admin_token="")

    def test_admin_endpoint_open_when_no_token(self, engine, tmp_path):
        engine.config = engine.config.replace(upload_dir=str(tmp_path))
        app = build_upload_app(engine, AskService(engine,
                                                  db=ChatStore(":memory:")))
        handler = app.routes[("POST", "/admin/reload_nlu")]
        assert run(handler(Request("POST", "/admin/reload_nlu", {}, {},
                                   b""))).status == 200


class TestAskAudit:
    def test_ask_and_denied_ask_are_audited(self, engine, tmp_path):
        audit_path = str(tmp_path / "ask.jsonl")
        svc = AskService(engine, db=ChatStore(":memory:"))
        app = build_app(engine, svc, AuditLog(audit_path))
        handler = app.routes[("POST", "/ask")]
        svc.db.create_user("au1")
        svc.db.create_user("au2")
        body = json.dumps({"query": "hello", "user_id": "au1",
                           "chat_id": "ch1"}).encode()
        assert run(handler(Request("POST", "/ask", {}, {}, body))).status == 200
        # au2 probing au1's chat → denied + audited
        body2 = json.dumps({"query": "hello", "user_id": "au2",
                            "chat_id": "ch1"}).encode()
        assert run(handler(Request("POST", "/ask", {}, {}, body2))).status == 403
        events = [json.loads(l) for l in open(audit_path)]
        assert [(e["user_id"], e["status"]) for e in events] == [
            ("au1", "ok"), ("au2", "denied")]


class TestCacheThresholdCalibration:
    def test_embedder_surfaces_checkpoint_threshold(self, tmp_path, engine):
        import json as _json

        d = tmp_path / "enc"
        d.mkdir()
        (d / "model_meta.json").write_text(_json.dumps({
            "bert_config": {"vocab_size": 512, "hidden_size": 32,
                            "num_layers": 1, "num_heads": 2,
                            "intermediate_size": 64, "max_position": 64,
                            "type_vocab_size": 2, "layer_norm_eps": 1e-12,
                            "dtype": "bfloat16", "pooling": "mean"},
            "cache_sim_threshold": 0.71}))
        from rassengine_tpu.models.embedder import Embedder

        cfg = engine.config.replace(encoder_weights_path=str(d), embed_dim=32)
        emb = Embedder(cfg)
        assert emb.suggested_cache_threshold == 0.71

        # the service picks it up when config holds the class default
        eng2 = RassEngine(cfg, embedder=emb)
        svc = AskService(eng2, db=ChatStore(":memory:"))
        assert svc.cache is not None and svc.cache.sim_threshold == 0.71

        # an explicit operator override wins
        cfg3 = cfg.replace(cache_sim_threshold=0.9)
        svc3 = AskService(RassEngine(cfg3, embedder=Embedder(cfg3)),
                          db=ChatStore(":memory:"))
        assert svc3.cache.sim_threshold == 0.9

    def test_calibration_separates_synthetic_encoder(self):
        # a deterministic "encoder" that maps texts to hashed bags gives
        # related pairs higher cosine than unrelated ones
        import hashlib

        def embed(texts):
            out = np.zeros((len(texts), 64), np.float32)
            for i, t in enumerate(texts):
                for w in t.lower().split():
                    h = int(hashlib.md5(w.encode()).hexdigest(), 16)
                    out[i, h % 64] += 1.0
            return out

        from rassengine_tpu.train.encoder_train import calibrate_cache_threshold

        calib = calibrate_cache_threshold(embed, n=128)
        assert 0.5 <= calib["cache_sim_threshold"] <= 0.95
