"""Serve-layer tests: ask pipeline, persistence, HTTP server, upload service.

Runs on the tiny encoder with the echo LLM backend — no network, no weights
(SURVEY §4: API tests with a fake generation backend).
"""

import asyncio
import json

import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig
from rassengine_tpu.serve.app import build_app, build_upload_app, secure_filename
from rassengine_tpu.serve.ask import AskService, AuthorizationError, build_context
from rassengine_tpu.serve.cache import SemanticCache
from rassengine_tpu.serve.db import ChatStore
from rassengine_tpu.serve.http import Request


def run(coro):
    return asyncio.run(coro)


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig(
        embed_dim=32, embed_batch_size=4, index_capacity=512, index_block_rows=512,
        database_path=":memory:", llm_backend="echo",
        intent_model_path="/nonexistent", ner_model_path="/nonexistent",
    )
    eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
    bundle = {"entry": [
        {"resource": {"resourceType": "Patient", "id": "p1",
                      "name": [{"given": ["Jane"], "family": "Doe"}],
                      "gender": "female"}},
        {"resource": {"resourceType": "Condition", "id": "c1",
                      "subject": {"reference": "Patient/p1"},
                      "code": {"text": "Essential hypertension"},
                      "note": [{"text": "BP elevated at repeated visits."}]}},
    ]}
    from rassengine_tpu.ingest.fhir import parse_fhir_bundle

    s, u = parse_fhir_bundle(bundle)
    eng.ingest_docs("u1", s, u)
    return eng


@pytest.fixture()
def service(engine):
    return AskService(engine, db=ChatStore(":memory:"))


class TestAskService:
    def test_ask_returns_answer_and_persists(self, service):
        ans = run(service.ask("hypertension blood pressure", "u1", "chat1"))
        assert isinstance(ans, str) and ans
        hist = service.db.history("chat1")
        assert [m["role"] for m in hist] == ["user", "assistant"]
        assert hist[1]["content"] == ans

    def test_context_cited(self, service):
        ans = run(service.ask("tell me about the hypertension note", "u1", "c2"))
        assert "[Doc:" in ans  # echo backend surfaces the cited context

    def test_foreign_chat_403(self, service):
        run(service.ask("q1", "u1", "shared-chat"))
        with pytest.raises(AuthorizationError):
            run(service.ask("q2", "other-user", "shared-chat"))

    def test_403_persists_nothing(self, service):
        """ask_stream overlaps authorize ‖ retrieve ‖ history; on a 403 the
        speculative retrieval's result must be discarded — no tokens yielded,
        no messages persisted to the foreign chat."""
        run(service.ask("q1", "u1", "shared-chat2"))
        before = service.db.history("shared-chat2")
        with pytest.raises(AuthorizationError):
            run(service.ask("hypertension note", "intruder", "shared-chat2"))
        assert service.db.history("shared-chat2") == before

    def test_empty_query_rejected(self, service):
        from rassengine_tpu.serve.ask import ValidationError

        with pytest.raises(ValidationError):
            run(service.ask("  ", "u1", "c3"))

    def test_history_limit(self, service):
        for i in range(12):
            service.db.add_messages("c4", [("user", f"q{i}"), ("assistant", f"a{i}")])
        hist = service.db.history("c4", limit=10)
        assert len(hist) == 10
        assert hist[-1]["content"] == "a11"

    def test_aggregate_returns_json(self, service):
        ans = run(service.ask("how many patients have hypertension?", "u1", "c5"))
        aggs = json.loads(ans)
        assert "by_condition" in aggs and "by_patient" in aggs

    def test_build_context_dedups(self):
        doc = {"doc_id": "d1", "doc_type": "unstructured", "unstructuredText": "x"}
        ctx = build_context([(doc, 1.0), (doc, 0.9)])
        assert ctx.count("[Doc: d1]") == 1


class TestSemanticCache:
    def test_hit_above_threshold(self):
        c = SemanticCache(sim_threshold=0.9)
        v = np.ones(8, np.float32)
        c.put("s", v, "answer")
        assert c.get("s", v * 2.0) == "answer"  # same direction
        assert c.get("other-scope", v) is None

    def test_miss_below_threshold(self):
        c = SemanticCache(sim_threshold=0.99)
        v = np.zeros(8, np.float32); v[0] = 1
        w = np.zeros(8, np.float32); w[1] = 1
        c.put("s", v, "a")
        assert c.get("s", w) is None

    def test_ttl_expiry(self):
        c = SemanticCache(ttl_seconds=-1.0)
        v = np.ones(4, np.float32)
        c.put("s", v, "a")
        assert c.get("s", v) is None


def _multipart_request(user_id: str, files: list[tuple[str, bytes]]) -> Request:
    boundary = "testboundary"
    body = b""
    body += f'--{boundary}\r\nContent-Disposition: form-data; name="user_id"\r\n\r\n{user_id}\r\n'.encode()
    for fname, data in files:
        body += (
            f'--{boundary}\r\nContent-Disposition: form-data; name="files"; '
            f'filename="{fname}"\r\nContent-Type: application/octet-stream\r\n\r\n'
        ).encode() + data + b"\r\n"
    body += f"--{boundary}--\r\n".encode()
    return Request("POST", "/upload_data", {},
                   {"content-type": f"multipart/form-data; boundary={boundary}"},
                   body)


class TestUploadApp:
    def make(self, engine, tmp_path):
        cfg = engine.config.replace(upload_dir=str(tmp_path))
        engine.config = cfg
        svc = AskService(engine, db=ChatStore(":memory:"))
        app = build_upload_app(engine, svc)
        handler = app.routes[("POST", "/upload_data")]
        return app, svc, handler

    def test_upload_fhir_and_text(self, engine, tmp_path):
        app, svc, handler = self.make(engine, tmp_path)
        svc.db.create_user("up1")
        bundle = {"entry": [{"resource": {"resourceType": "Condition", "id": "cc",
                                          "subject": {"reference": "Patient/p9"},
                                          "code": {"text": "Asthma"},
                                          "note": [{"text": "wheezing at night"}]}}]}
        req = _multipart_request("up1", [
            ("patient_9_bundle.json", json.dumps(bundle).encode()),
            ("patient_9_notes.txt", b"inhaler prescribed as needed"),
        ])
        resp = run(handler(req))
        assert resp.status == 200, resp.body
        msg = json.loads(resp.body)["message"]
        assert "indexed" in msg
        t = engine.tenant("up1")
        assert t.index.count >= 3  # structured + unstructured + text chunk

    def test_upload_rejects_unknown_user(self, engine, tmp_path):
        app, svc, handler = self.make(engine, tmp_path)
        req = _multipart_request("ghost", [("a.txt", b"hi")])
        assert run(handler(req)).status == 403

    def test_upload_rejects_bad_user_id(self, engine, tmp_path):
        app, svc, handler = self.make(engine, tmp_path)
        req = _multipart_request("../evil", [("a.txt", b"hi")])
        assert run(handler(req)).status == 400

    def test_upload_rejects_too_many_files(self, engine, tmp_path):
        app, svc, handler = self.make(engine, tmp_path)
        svc.db.create_user("up2")
        req = _multipart_request("up2", [(f"f{i}.txt", b"x") for i in range(6)])
        assert run(handler(req)).status == 400

    def test_upload_rejects_oversize(self, engine, tmp_path):
        app, svc, handler = self.make(engine, tmp_path)
        svc.db.create_user("up3")
        engine.config = engine.config.replace(max_file_size_bytes=10)
        app2, svc2, handler2 = self.make(engine, tmp_path)
        svc2.db.create_user("up3")
        req = _multipart_request("up3", [("big.txt", b"y" * 100)])
        assert run(handler2(req)).status == 400
        engine.config = engine.config.replace(max_file_size_bytes=10 * 1024 * 1024)

    def test_upload_rejects_non_bundle_json(self, engine, tmp_path):
        app, svc, handler = self.make(engine, tmp_path)
        svc.db.create_user("up4")
        req = _multipart_request("up4", [("x.json", b'{"no": "entry"}')])
        resp = run(handler(req))
        assert resp.status == 200
        assert "not a FHIR bundle" in json.loads(resp.body)["message"]

    def test_secure_filename(self):
        assert secure_filename("../../etc/passwd") == "passwd"
        assert "/" not in secure_filename("a/b\\c.txt")


class TestHttpServer:
    def test_end_to_end_sockets(self, engine):
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]

            async def http(method, path, body=b"", headers=""):
                r, w = await asyncio.open_connection("127.0.0.1", port)
                req = (f"{method} {path} HTTP/1.1\r\nHost: x\r\n"
                       f"Content-Length: {len(body)}\r\n{headers}Connection: close\r\n\r\n")
                w.write(req.encode() + body)
                await w.drain()
                data = await r.read()
                w.close()
                head, _, payload = data.partition(b"\r\n\r\n")
                status = int(head.split()[1])
                return status, payload

            status, body = await http("GET", "/health")
            assert status == 200 and json.loads(body)["status"] == "ok"

            status, body = await http(
                "POST", "/ask",
                json.dumps({"query": "hypertension", "user_id": "u1",
                            "chat_id": "hc1"}).encode())
            assert status == 200
            out = json.loads(body)
            assert out["query"] == "hypertension" and out["answer"]

            status, _ = await http("POST", "/ask", b"{}")
            assert status == 400
            status, _ = await http("GET", "/nope")
            assert status == 404

            # websocket handshake + one streamed answer
            r, w = await asyncio.open_connection("127.0.0.1", port)
            w.write(
                b"GET /ws/ask HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                b"Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
                b"Sec-WebSocket-Version: 13\r\n\r\n")
            await w.drain()
            head = await r.readuntil(b"\r\n\r\n")
            assert b"101" in head.split(b"\r\n")[0]

            # send masked text frame (clients must mask)
            payload = json.dumps({"query": "hypertension note", "user_id": "u1",
                                  "chat_id": "wc1"}).encode()
            mask = b"\x01\x02\x03\x04"
            masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
            ln = len(payload)
            assert ln < 126
            w.write(bytes([0x81, 0x80 | ln]) + mask + masked)
            await w.drain()

            chunks = []
            while True:
                h = await r.readexactly(2)
                n = h[1] & 0x7F
                if n == 126:
                    import struct as _s
                    n = _s.unpack(">H", await r.readexactly(2))[0]
                data = await r.readexactly(n)
                if h[0] & 0x0F == 0x8:
                    break
                chunks.append(data.decode())
                if chunks[-1] == "[DONE]":
                    break
            assert chunks and chunks[-1] == "[DONE]"
            assert any(c for c in chunks[:-1])
            w.close()
            server.close()
            await server.wait_closed()

        run(scenario())

    def test_ws_client_abort_mid_stream_keeps_server_alive(self, engine):
        """Soak-observed: a WS client vanishing mid-answer must be a quiet
        disconnect (no [ERROR]/[DONE] writes to the dead socket, handler
        returns), and the server keeps serving new connections."""
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]

            async def ws_connect():
                r, w = await asyncio.open_connection("127.0.0.1", port)
                w.write(
                    b"GET /ws/ask HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                    b"Connection: Upgrade\r\n"
                    b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
                    b"Sec-WebSocket-Version: 13\r\n\r\n")
                await w.drain()
                head = await r.readuntil(b"\r\n\r\n")
                assert b"101" in head.split(b"\r\n")[0]
                return r, w

            def frame(obj):
                payload = json.dumps(obj).encode()
                mask = b"\x05\x06\x07\x08"
                masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
                assert len(payload) < 126
                return bytes([0x81, 0x80 | len(payload)]) + mask + masked

            # connection 1: start an ask, read ONE frame, slam the socket
            r, w = await ws_connect()
            w.write(frame({"query": "hypertension note", "user_id": "u1",
                           "chat_id": "abort1"}))
            await w.drain()
            h = await r.readexactly(2)
            n = h[1] & 0x7F
            await r.readexactly(n)
            w.transport.abort()  # RST, not a close handshake
            await asyncio.sleep(0.2)  # let the server hit the dead socket

            # connection 2 on the same server still streams to [DONE]
            r, w = await ws_connect()
            w.write(frame({"query": "hypertension note", "user_id": "u1",
                           "chat_id": "abort2"}))
            await w.drain()
            chunks = []
            while True:
                h = await r.readexactly(2)
                n = h[1] & 0x7F
                if n == 126:
                    import struct as _s
                    n = _s.unpack(">H", await r.readexactly(2))[0]
                data = await r.readexactly(n)
                if h[0] & 0x0F == 0x8:
                    break
                chunks.append(data.decode())
                if chunks[-1] == "[DONE]":
                    break
            assert chunks and chunks[-1] == "[DONE]"
            w.close()
            server.close()
            await server.wait_closed()

        run(scenario())

    def test_ws_validation_error_to_vanished_client(self, engine):
        """ADVICE r4 (low): the [ERROR] writes in ws_ask's validation
        branches (missing fields, bad user_id) sat outside the dead-socket
        guards — a client that sent garbage and vanished made the handler
        raise on the dead socket. Both branches must be quiet disconnects
        and the server must keep serving."""
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]

            async def ws_connect():
                r, w = await asyncio.open_connection("127.0.0.1", port)
                w.write(
                    b"GET /ws/ask HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                    b"Connection: Upgrade\r\n"
                    b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
                    b"Sec-WebSocket-Version: 13\r\n\r\n")
                await w.drain()
                head = await r.readuntil(b"\r\n\r\n")
                assert b"101" in head.split(b"\r\n")[0]
                return r, w

            def frame(obj):
                payload = json.dumps(obj).encode()
                mask = b"\x05\x06\x07\x08"
                masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
                assert len(payload) < 126
                return bytes([0x81, 0x80 | len(payload)]) + mask + masked

            # missing chat_id, then RST before reading the [ERROR]
            r, w = await ws_connect()
            w.write(frame({"query": "q", "user_id": "u1"}))
            await w.drain()
            w.transport.abort()
            await asyncio.sleep(0.2)

            # invalid user_id charset, same vanish
            r, w = await ws_connect()
            w.write(frame({"query": "q", "user_id": "../evil",
                           "chat_id": "c"}))
            await w.drain()
            w.transport.abort()
            await asyncio.sleep(0.2)

            # the server still streams a full answer to a healthy client
            r, w = await ws_connect()
            w.write(frame({"query": "hypertension note", "user_id": "u1",
                           "chat_id": "ok1"}))
            await w.drain()
            chunks = []
            while True:
                h = await r.readexactly(2)
                n = h[1] & 0x7F
                if n == 126:
                    import struct as _s
                    n = _s.unpack(">H", await r.readexactly(2))[0]
                data = await r.readexactly(n)
                if h[0] & 0x0F == 0x8:
                    break
                chunks.append(data.decode())
                if chunks[-1] == "[DONE]":
                    break
            assert chunks and chunks[-1] == "[DONE]"
            w.close()
            server.close()
            await server.wait_closed()

        run(scenario())


class TestHttpRobustness:
    def test_malformed_requests(self, engine):
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]

            async def raw(data: bytes) -> bytes:
                r, w = await asyncio.open_connection("127.0.0.1", port)
                w.write(data)
                await w.drain()
                try:
                    out = await asyncio.wait_for(r.read(4096), 5)
                except asyncio.TimeoutError:
                    out = b""
                w.close()
                return out

            # garbage request line → connection closed without crash
            await raw(b"NOT A REQUEST\r\n\r\n")
            # bad JSON body → 400
            out = await raw(b"POST /ask HTTP/1.1\r\nHost: x\r\nContent-Length: 7\r\n"
                            b"Connection: close\r\n\r\nnotjson")
            assert b" 400 " in out.split(b"\r\n")[0] + b" "
            # oversized content-length → 413
            out = await raw(b"POST /ask HTTP/1.1\r\nHost: x\r\n"
                            b"Content-Length: 99999999999\r\nConnection: close\r\n\r\n")
            assert b"413" in out.split(b"\r\n")[0]
            # server still healthy afterwards
            out = await raw(b"GET /health HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
            assert b"200" in out.split(b"\r\n")[0]
            server.close()
            await server.wait_closed()

        run(scenario())

    def test_ws_fragmented_frames(self, engine):
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]
            r, w = await asyncio.open_connection("127.0.0.1", port)
            w.write(
                b"GET /ws/ask HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                b"Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
                b"Sec-WebSocket-Version: 13\r\n\r\n")
            await w.drain()
            await r.readuntil(b"\r\n\r\n")
            payload = json.dumps({"query": "hypertension", "user_id": "u1",
                                  "chat_id": "frag1"}).encode()
            half = len(payload) // 2
            mask = b"\x09\x08\x07\x06"

            def frame(data, fin, opcode):
                masked = bytes(x ^ mask[i % 4] for i, x in enumerate(data))
                return bytes([(0x80 if fin else 0) | opcode, 0x80 | len(data)]) + mask + masked

            # text frame split into two fragments (opcode 0x1 then continuation 0x0)
            w.write(frame(payload[:half], fin=False, opcode=0x1))
            await w.drain()
            await asyncio.sleep(0.05)
            w.write(frame(payload[half:], fin=True, opcode=0x0))
            await w.drain()
            chunks = []
            while True:
                h = await asyncio.wait_for(r.readexactly(2), 60)
                n = h[1] & 0x7F
                if n == 126:
                    import struct as _s
                    n = _s.unpack(">H", await r.readexactly(2))[0]
                data = await r.readexactly(n)
                if h[0] & 0x0F == 0x8:
                    break
                chunks.append(data.decode())
                if chunks[-1] == "[DONE]":
                    break
            assert chunks[-1] == "[DONE]" and len(chunks) >= 2
            w.close()
            server.close()
            await server.wait_closed()

        run(scenario())


class TestConcurrency:
    def test_concurrent_asks_share_engine(self, engine):
        """Many overlapping /ask coroutines against one engine + store —
        by-construction safety check (SURVEY §5: race detection is structural:
        single event loop + locked stores)."""
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            queries = [f"hypertension note {i}" for i in range(12)]
            answers = await asyncio.gather(*(
                svc.ask(q, "u1", f"cc{i % 3}") for i, q in enumerate(queries)
            ))
            assert all(isinstance(a, str) and a for a in answers)
            # all 24 messages landed across the 3 chats
            total = sum(len(svc.db.history(f"cc{c}", limit=100)) for c in range(3))
            assert total == 24

        run(scenario())


class TestUserEndpoint:
    def test_create_user_then_upload(self, engine, tmp_path):
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            handler = app.routes[("POST", "/users")]
            resp = await handler(Request("POST", "/users", {}, {},
                                         json.dumps({"user_id": "newbie"}).encode()))
            assert resp.status == 201
            assert svc.db.user_exists("newbie")
            # invalid ids rejected
            bad = await handler(Request("POST", "/users", {}, {},
                                        json.dumps({"user_id": "../x"}).encode()))
            assert bad.status == 400

        run(scenario())


class TestMicroBatching:
    def test_concurrent_queries_batched(self, engine):
        async def scenario():
            from rassengine_tpu.core.tracing import METRICS

            svc = AskService(engine, db=ChatStore(":memory:"))
            assert svc.batcher is not None
            before = METRICS.counters.get("microbatches", 0)
            answers = await asyncio.gather(*(
                svc.ask(f"hypertension note {i}", "u1", f"mb{i}") for i in range(6)
            ))
            assert all(a for a in answers)
            assert METRICS.counters.get("microbatches", 0) > before
            # per-chat persistence intact
            for i in range(6):
                assert len(svc.db.history(f"mb{i}")) == 2

        run(scenario())

    def test_batcher_propagates_errors(self, engine):
        async def scenario():
            from rassengine_tpu.serve.batching import MicroBatcher

            class Boom:
                config = engine.config
                def retrieve(self, *a, **k):
                    raise RuntimeError("boom")
                def retrieve_batch(self, *a, **k):
                    raise RuntimeError("boom")

            mb = MicroBatcher(Boom(), window_ms=1)
            with pytest.raises(RuntimeError):
                await mb.retrieve("u", "q")

        run(scenario())

    def test_batcher_survives_event_loop_restart(self, engine):
        # regression: the wakeup Event/runner task are loop-bound; a second
        # asyncio.run over the same service used to strand the request future
        # forever (found hanging the e2e anatomy bench's concurrent phase)
        from rassengine_tpu.serve.batching import MicroBatcher

        mb = MicroBatcher(engine, window_ms=1)

        async def one_ask():
            return await asyncio.wait_for(
                mb.retrieve("u1", "hypertension note"), timeout=30)

        first = asyncio.run(one_ask())
        second = asyncio.run(one_ask())   # fresh loop, same batcher
        assert first is not None and second is not None


class TestKeepAlive:
    def test_two_requests_one_connection(self, engine):
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]
            r, w = await asyncio.open_connection("127.0.0.1", port)
            for i in range(2):
                w.write(b"GET /health HTTP/1.1\r\nHost: x\r\nContent-Length: 0\r\n\r\n")
                await w.drain()
                head = await r.readuntil(b"\r\n\r\n")
                assert b"200" in head.split(b"\r\n")[0]
                length = int([ln.split(b":")[1] for ln in head.split(b"\r\n")
                              if ln.lower().startswith(b"content-length")][0])
                body = await r.readexactly(length)
                assert json.loads(body)["status"] == "ok"
            w.close()
            server.close()
            await server.wait_closed()

        run(scenario())


class TestChunkedRequests:
    def test_chunked_post_body(self, engine):
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]
            r, w = await asyncio.open_connection("127.0.0.1", port)
            payload = json.dumps({"query": "hypertension", "user_id": "u1",
                                  "chat_id": "chunked1"}).encode()
            half = len(payload) // 2
            w.write(b"POST /ask HTTP/1.1\r\nHost: x\r\n"
                    b"Transfer-Encoding: chunked\r\nConnection: close\r\n\r\n")
            for part in (payload[:half], payload[half:]):
                w.write(f"{len(part):x}\r\n".encode() + part + b"\r\n")
            w.write(b"0\r\n\r\n")
            await w.drain()
            data = await r.read()
            w.close()
            assert b" 200 " in data.split(b"\r\n")[0] + b" "
            body = data.split(b"\r\n\r\n", 1)[1]
            assert json.loads(body)["answer"]
            server.close()
            await server.wait_closed()

        run(scenario())


class TestAdviceRegressions:
    """Regression tests for round-1 advisor findings (ADVICE.md)."""

    def test_ws_oversized_frame_rejected(self, engine):
        """A client frame header declaring a multi-GB payload must close the
        socket (1009), not buffer it (serve/http.py recv_text cap)."""
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]
            r, w = await asyncio.open_connection("127.0.0.1", port)
            w.write(
                b"GET /ws/ask HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                b"Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
                b"Sec-WebSocket-Version: 13\r\n\r\n")
            await w.drain()
            await r.readuntil(b"\r\n\r\n")
            import struct as _s
            # 64-bit length frame claiming 8 GB, masked, no payload sent
            w.write(bytes([0x81, 0x80 | 127]) + _s.pack(">Q", 8 << 30)
                    + b"\x00\x00\x00\x00")
            await w.drain()
            head = await asyncio.wait_for(r.readexactly(2), 10)
            assert head[0] & 0x0F == 0x8  # close frame
            n = head[1] & 0x7F
            payload = await r.readexactly(n)
            assert _s.unpack(">H", payload[:2])[0] == 1009
            w.close()
            server.close()
            await server.wait_closed()

        run(scenario())

    def test_malformed_chunk_size_is_400(self, engine):
        """An unparsable chunk-size line is a protocol error, not a silent
        end-of-body truncation (serve/http.py _read_chunked)."""
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]
            r, w = await asyncio.open_connection("127.0.0.1", port)
            w.write(b"POST /ask HTTP/1.1\r\nHost: x\r\n"
                    b"Transfer-Encoding: chunked\r\nConnection: close\r\n\r\n"
                    b"ZZZ\r\ngarbage\r\n0\r\n\r\n")
            await w.drain()
            data = await r.read()
            w.close()
            assert b" 400 " in data.split(b"\r\n")[0] + b" "
            server.close()
            await server.wait_closed()

        run(scenario())

    def test_document_fetch_refuses_paths_outside_roots(self, engine, tmp_path):
        """Indexed file_path metadata must not read arbitrary disk paths
        (serve/ask.py _fetch_documents now passes upload_root)."""
        import types

        secret = tmp_path / "secret.txt"
        secret.write_text("TOP SECRET CONTENTS")
        svc = AskService(engine, db=ChatStore(":memory:"))
        result = types.SimpleNamespace(
            patient_ids=["p1"],
            hits=[({"doc_id": "d1", "file_path": str(secret),
                    "unstructuredText": "indexed body"}, 1.0)],
        )
        out = svc._fetch_documents(result)
        assert "TOP SECRET" not in out
        assert "indexed body" in out  # falls back to the indexed doc body

    def test_document_fetch_reads_inside_upload_root(self, engine, tmp_path):
        import types

        cfg = engine.config
        old = cfg.upload_dir
        object.__setattr__(cfg, "upload_dir", str(tmp_path))
        try:
            doc = tmp_path / "u1" / "rec.txt"
            doc.parent.mkdir(parents=True, exist_ok=True)
            doc.write_text("inside-root body")
            svc = AskService(engine, db=ChatStore(":memory:"))
            result = types.SimpleNamespace(
                patient_ids=["p1"],
                hits=[({"doc_id": "d1", "file_path": str(doc)}, 1.0)],
            )
            out = svc._fetch_documents(result)
            assert "inside-root body" in out
        finally:
            object.__setattr__(cfg, "upload_dir", old)

    def test_checkpoint_save_locks_tenants(self, engine, tmp_path):
        """save_engine snapshots the tenant dict and serializes under each
        tenant's lock — concurrent ingestion can't corrupt a checkpoint."""
        import threading
        from rassengine_tpu.index.checkpoint import load_engine, save_engine
        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.engine import RassEngine
        from rassengine_tpu.models.bert import BertConfig

        cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=4096,
                           index_block_rows=512, database_path=":memory:",
                           llm_backend="echo", intent_model_path="/nonexistent",
                           ner_model_path="/nonexistent")
        eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        stop = threading.Event()
        errors = []

        def churn():
            i = 0
            while not stop.is_set():
                try:
                    eng.ingest_docs(f"t{i % 3}", [], [
                        {"doc_id": f"d{i}", "doc_type": "unstructured",
                         "unstructuredText": f"note number {i} hypertension"}])
                except Exception as e:  # pragma: no cover
                    errors.append(e)
                i += 1

        t = threading.Thread(target=churn)
        t.start()
        try:
            for _ in range(5):
                save_engine(eng, str(tmp_path / "ckpt"))
        finally:
            stop.set()
            t.join()
        assert not errors
        # every persisted tenant loads back with fully-formed docs
        eng2 = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        load_engine(eng2, str(tmp_path / "ckpt"))
        for t2 in eng2._tenants.values():
            for row in range(t2.index.count):
                assert t2.index.docs[row] is not None


class TestStreamingUpload:
    def test_oversize_rejected_mid_stream(self, engine, tmp_path):
        """A too-large file must be rejected AT the limit, while the client is
        still sending — not buffered whole (reference embedding_gen.py
        8 KB-chunk reads; VERDICT round 1 Missing #5)."""
        async def scenario():
            cfg = engine.config.replace(upload_dir=str(tmp_path),
                                        max_file_size_bytes=1 * 1024 * 1024)
            engine.config = cfg
            svc = AskService(engine, db=ChatStore(":memory:"))
            svc.db.create_user("streamer")
            app = build_upload_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]
            r, w = await asyncio.open_connection("127.0.0.1", port)
            boundary = b"sb"
            prologue = (b"--sb\r\nContent-Disposition: form-data; "
                        b'name="files"; filename="big.txt"\r\n\r\n')
            epilogue = b"\r\n--sb--\r\n"
            total = 32 * 1024 * 1024  # declared body: 32 MB
            w.write(b"POST /upload_data HTTP/1.1\r\nHost: x\r\n"
                    b"Content-Type: multipart/form-data; boundary=sb\r\n"
                    + f"Content-Length: {total}\r\n\r\n".encode() + prologue)
            sent = len(prologue)
            chunk = b"z" * 65536
            got_response = None
            # stream data; the server must answer 400 soon after 1 MB
            for _ in range(total // len(chunk)):
                try:
                    w.write(chunk)
                    await w.drain()
                except ConnectionError:
                    break
                sent += len(chunk)
                if sent > 3 * 1024 * 1024:  # generous margin past the limit
                    try:
                        got_response = await asyncio.wait_for(r.read(4096), 5)
                        break
                    except asyncio.TimeoutError:
                        pass
            assert got_response, "server never rejected the oversized file"
            assert b" 400 " in got_response.split(b"\r\n")[0] + b" "
            assert b"file too large" in got_response
            assert sent < total / 2  # rejected long before the body finished
            w.close()
            server.close()
            await server.wait_closed()
            engine.config = engine.config.replace(
                max_file_size_bytes=10 * 1024 * 1024)

        run(scenario())

    def test_streamed_upload_indexes(self, engine, tmp_path):
        """End-to-end socket upload through the streaming parser."""
        async def scenario():
            engine.config = engine.config.replace(upload_dir=str(tmp_path))
            svc = AskService(engine, db=ChatStore(":memory:"))
            svc.db.create_user("sockup")
            app = build_upload_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]
            body = (b"--sb\r\nContent-Disposition: form-data; name=\"user_id\"\r\n"
                    b"\r\nsockup\r\n"
                    b"--sb\r\nContent-Disposition: form-data; name=\"files\"; "
                    b"filename=\"note.txt\"\r\n\r\n"
                    b"streamed clinical note about asthma\r\n"
                    b"--sb--\r\n")
            r, w = await asyncio.open_connection("127.0.0.1", port)
            w.write(b"POST /upload_data HTTP/1.1\r\nHost: x\r\n"
                    b"Content-Type: multipart/form-data; boundary=sb\r\n"
                    + f"Content-Length: {len(body)}\r\n\r\n".encode())
            # dribble the body across many small writes
            for i in range(0, len(body), 40):
                w.write(body[i: i + 40])
                await w.drain()
            data = await r.read()
            w.close()
            assert b" 200 " in data.split(b"\r\n")[0] + b" ", data
            assert b"indexed" in data
            t = engine.tenant("sockup")
            assert any(d and "asthma" in str(d.get("unstructuredText", ""))
                       for d in t.index.docs[: t.index.count])
            server.close()
            await server.wait_closed()

        run(scenario())

    def test_multipart_stream_parser_boundary_splits(self):
        """Delimiters split across read chunks must parse identically."""
        from rassengine_tpu.serve.http import MemoryBodyReader, MultipartStream

        body = (b"--bb\r\nContent-Disposition: form-data; name=\"a\"\r\n\r\n"
                + b"x" * 10000 +
                b"\r\n--bb\r\nContent-Disposition: form-data; name=\"files\"; "
                b"filename=\"f.txt\"\r\n\r\n" + b"y" * 5000 + b"\r\n--bb--\r\n")

        async def parse(chunk_size):
            stream = MultipartStream(MemoryBodyReader(body), b"bb",
                                     chunk_size=chunk_size)
            out = []
            async for headers, chunks in stream.parts():
                data = b""
                async for c in chunks:
                    data += c
                out.append((headers.get("content-disposition", ""), data))
            return out

        for cs in (7, 64, 8192):
            parts = asyncio.run(parse(cs))
            assert len(parts) == 2, (cs, len(parts))
            assert parts[0][1] == b"x" * 10000
            assert parts[1][1] == b"y" * 5000


class TestHttpRobustness:
    """Hostile/malformed input must never crash or hang the server: after
    every attack the listener must still serve a valid request."""

    def test_malformed_inputs_then_health(self, engine):
        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]

            async def raw(payload: bytes, read=True) -> bytes:
                r, w = await asyncio.open_connection("127.0.0.1", port)
                w.write(payload)
                try:
                    await w.drain()
                    if not read:
                        return b""
                    return await asyncio.wait_for(r.read(), timeout=5.0)
                except ConnectionError:
                    # server answered-and-closed mid-write (flood rejection)
                    return b""
                finally:
                    w.close()

            async def health_ok():
                out = await raw(b"GET /health HTTP/1.1\r\nHost: x\r\n"
                                b"Connection: close\r\n\r\n")
                assert b"200" in out.split(b"\r\n", 1)[0], out[:80]

            # binary garbage start line: connection drops, no crash
            await raw(b"\x00\xffgarbage\r\n\r\n")
            await health_ok()

            # non-numeric and negative Content-Length -> 400, not an
            # unhandled int() in the connection task
            out = await raw(b"POST /ask HTTP/1.1\r\nHost: x\r\n"
                            b"Content-Length: banana\r\n\r\n")
            assert b"400" in out.split(b"\r\n", 1)[0], out[:80]
            out = await raw(b"POST /ask HTTP/1.1\r\nHost: x\r\n"
                            b"Content-Length: -5\r\n\r\n")
            assert b"400" in out.split(b"\r\n", 1)[0], out[:80]
            await health_ok()

            # header line beyond the stream limit -> 431 (or the server
            # drops the flood mid-write), never an unhandled LimitOverrun
            big = b"X-Big: " + b"a" * (1 << 20) + b"\r\n"
            out = await raw(b"GET /health HTTP/1.1\r\nHost: x\r\n" + big
                            + b"\r\n")
            assert out == b"" or b"431" in out.split(b"\r\n", 1)[0], out[:80]
            await health_ok()

            # truncated body: client promises 100 bytes, sends 10, closes
            await raw(b"POST /ask HTTP/1.1\r\nHost: x\r\n"
                      b"Content-Length: 100\r\n\r\nshort body", read=False)
            await health_ok()

            # malformed chunked framing
            out = await raw(b"POST /ask HTTP/1.1\r\nHost: x\r\n"
                            b"Transfer-Encoding: chunked\r\n\r\nzz\r\nhi\r\n")
            assert b"400" in out.split(b"\r\n", 1)[0], out[:80]
            await health_ok()

            # seeded random-bytes fuzz: never crash the listener
            rng = np.random.default_rng(0)
            for _ in range(25):
                blob = rng.integers(0, 256,
                                    size=int(rng.integers(1, 2048))) \
                    .astype(np.uint8).tobytes()
                try:
                    await raw(blob)
                except (ConnectionError, asyncio.TimeoutError):
                    pass
            await health_ok()

            server.close()
            await server.wait_closed()

        run(scenario())


class TestLlmErrorContract:
    def test_openai_generate_returns_none_on_stream_error(self):
        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.serve.llm import OpenAiLlm

        llm = OpenAiLlm(EngineConfig(openai_api_key="k"))

        async def fake_stream(prompt, system_msg=""):
            yield "partial "
            yield "[ERROR] ReadTimeout"

        llm.generate_stream = fake_stream
        out = run(llm.generate("q"))
        assert out is None  # BlueHive None-on-error contract

    def test_mid_stream_error_answer_not_cached(self, engine):
        import types

        from rassengine_tpu.serve.cache import SemanticCache

        svc = AskService(engine, db=ChatStore(":memory:"))
        svc.cache = SemanticCache(8, 0.2, 300.0)

        async def failing_stream(prompt, system_msg=""):
            yield "partial answer "
            yield "[ERROR] boom"

        svc.llm = types.SimpleNamespace(generate_stream=failing_stream,
                                        generate=None)
        ans = run(svc.ask("hypertension note", "u1", "errchat"))
        assert "[ERROR]" in ans
        assert not svc.cache._entries  # never cached


class TestWsControlFrames:
    def test_pong_and_ping_interleaved_with_text(self, engine):
        """Unsolicited pong frames must not corrupt text reassembly, and a
        ping inside a fragmented message must be answered without breaking
        the fragments (RFC 6455 §5.4-5.5)."""
        import struct

        async def scenario():
            svc = AskService(engine, db=ChatStore(":memory:"))
            app = build_app(engine, svc)
            server = await app.start("127.0.0.1", 0)
            port = server.sockets[0].getsockname()[1]

            r, w = await asyncio.open_connection("127.0.0.1", port)
            w.write(
                b"GET /ws/ask HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                b"Connection: Upgrade\r\n"
                b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
                b"Sec-WebSocket-Version: 13\r\n\r\n")
            await w.drain()
            head = await r.readuntil(b"\r\n\r\n")
            assert b"101" in head.split(b"\r\n")[0]

            def frame(opcode, payload, fin=True):
                mask = b"\x01\x02\x03\x04"
                masked = bytes(b ^ mask[i % 4]
                               for i, b in enumerate(payload))
                assert len(payload) < 126
                return (bytes([(0x80 if fin else 0) | opcode,
                               0x80 | len(payload)]) + mask + masked)

            payload = json.dumps({"query": "hypertension", "user_id": "u1",
                                  "chat_id": "wsctl"}).encode()
            half = len(payload) // 2
            # text fragment 1 | unsolicited pong | ping | continuation
            w.write(frame(0x1, payload[:half], fin=False))
            w.write(frame(0xA, b"late-pong"))
            w.write(frame(0x9, b"hello"))
            w.write(frame(0x0, payload[half:], fin=True))
            await w.drain()

            got_pong = False
            text = b""
            for _ in range(200):
                hdr = await asyncio.wait_for(r.readexactly(2), timeout=10)
                op, n = hdr[0] & 0x0F, hdr[1] & 0x7F
                if n == 126:
                    n = struct.unpack(">H", await r.readexactly(2))[0]
                body = await r.readexactly(n)
                if op == 0xA:
                    got_pong = True
                    assert body == b"hello"
                elif op == 0x1:
                    text += body
                    if b"[DONE]" in body:
                        break
            assert got_pong
            assert b"[ERROR]" not in text, text
            w.close()
            server.close()
            await server.wait_closed()

        run(scenario())
