"""The ask() orchestrator — query → answer pipeline.

Reference pipeline (app/main.py:2750-2964, inline-duplicated for the WS path at
main.py:3054-3353; implemented once here with a streaming flag):

auth check → NER → intent → patient-ID resolution → chat history → embed →
intent-dispatched retrieval → context build (dedup by doc_id, structured docs
rendered as k=v pipes) → citation-enforcing prompt → LLM generate → persist.

Differences by design:
- every heavy step is an in-process TPU call instead of an HTTP hop,
- the semantic cache (reference's unused Redis block) short-circuits repeat
  queries,
- per-stage latencies land on the request trace (core/tracing.py).
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
from typing import AsyncIterator

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.schema import QueryIntent
from rassengine_tpu.core.tracing import METRICS, new_trace, stage
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.serve.cache import SemanticCache
from rassengine_tpu.serve.db import ChatStore
from rassengine_tpu.serve.llm import LlmClient, make_llm

log = logging.getLogger("rassengine.ask")

SYSTEM_PROMPT = (
    "You are a medical assistant answering strictly from the provided EHR "
    "context. Cite every factual claim with its document id in the form "
    "[Doc: <doc_id>]. If the context does not contain the answer, say you "
    "do not have that information. Do not invent patient data."
)


class AuthorizationError(Exception):
    pass


class ValidationError(Exception):
    pass


def render_structured(doc: dict) -> str:
    """Structured doc → 'k=v | k=v' line (reference main.py:2907-2917)."""
    parts = []
    for k, v in doc.items():
        if v is None or k in ("doc_id", "doc_type", "file_path", "file_type"):
            continue
        parts.append(f"{k}={v}")
    return " | ".join(parts)


def build_context(hits: list[tuple[dict, float]]) -> str:
    """Dedup by doc_id, render each doc with its citation tag (main.py:2894-2921)."""
    seen: set[str] = set()
    blocks = []
    for doc, _score in hits:
        doc_id = str(doc.get("doc_id"))
        if doc_id in seen:
            continue
        seen.add(doc_id)
        if doc.get("doc_type") == "structured":
            body = render_structured(doc)
        else:
            body = str(doc.get("unstructuredText") or "")
        blocks.append(f"[Doc: {doc_id}] {body}")
    return "\n".join(blocks)


class AskService:
    def __init__(self, engine: RassEngine, db: ChatStore | None = None,
                 llm: LlmClient | None = None, config: EngineConfig | None = None):
        self.engine = engine
        self.config = config or engine.config
        # DATABASE_PATH may be a local sqlite path (primary / single host)
        # or http://chat-primary:port (fleet follower — chatdb_remote.py)
        from rassengine_tpu.serve.chatdb_remote import open_chat_store

        # followers authenticate to the chat primary with the FLEET secret
        # (ADMIN_TOKEN), never the client bearer token (ADVICE r4)
        self.db = db or open_chat_store(self.config.database_path,
                                        self.config.admin_token)
        self.llm = llm or make_llm(self.config)
        use_cache = self.config.cache_enabled and getattr(
            engine.embedder, "trusted_semantics", True)
        # the similarity scale is an encoder property: prefer the checkpoint's
        # train-time paraphrase calibration (encoder_train
        # .calibrate_cache_threshold) over the reference's fixed 0.88
        # (.env.example:21) unless the operator overrode CACHE_SIM_THRESHOLD
        thr = self.config.cache_sim_threshold
        suggested = getattr(engine.embedder, "suggested_cache_threshold", None)
        default_thr = EngineConfig.__dataclass_fields__[
            "cache_sim_threshold"].default
        if suggested and thr == default_thr:
            thr = float(suggested)
        self.cache = (
            SemanticCache(self.config.cache_max_items, thr,
                          self.config.cache_ttl_seconds)
            if use_cache else None
        )
        if self.config.micro_batching:
            from rassengine_tpu.serve.batching import MicroBatcher

            self.batcher = MicroBatcher(engine, self.config.micro_batch_window_ms,
                                        self.config.micro_batch_max)
        else:
            self.batcher = None

    async def _authorize(self, user_id: str, chat_id: str) -> None:
        owner = await self.db.a_chat_owner(chat_id)
        if owner is None:
            if self.config.strict_chat_auth:
                # reference parity (main.py:2764-2767): chats are provisioned
                # out of band, an unknown chat is a 403
                raise AuthorizationError("chat does not belong to user")
            # unknown chat → create it for this user (standalone usability);
            # create_chat is INSERT OR IGNORE, so a concurrent creator may
            # win the race — re-read the owner instead of assuming we did,
            # or the loser would proceed "authorized" on someone else's chat
            self.db.create_user(user_id)
            self.db.create_chat(user_id, chat_id)
            owner = await self.db.a_chat_owner(chat_id)
        if owner != user_id:
            raise AuthorizationError("chat does not belong to user")

    async def ask(self, query: str, user_id: str, chat_id: str,
                  top_k: int | None = None) -> str:
        chunks = [c async for c in self.ask_stream(query, user_id, chat_id, top_k)]
        return "".join(chunks)

    async def ask_stream(self, query: str, user_id: str, chat_id: str,
                         top_k: int | None = None) -> AsyncIterator[str]:
        if not query or not query.strip():
            raise ValidationError("query must be non-empty")
        if not user_id or not chat_id:
            raise ValidationError("user_id and chat_id are required")
        trace = new_trace()
        METRICS.incr("ask_requests")

        # authorize ‖ retrieve ‖ history: serializing the per-request sqlite
        # hops in front of the batcher staggers concurrent arrivals past its
        # collect window (measured mean batch 16/64 on the 1-core host).
        # Speculative retrieval is user_id-scoped (tenant isolation holds
        # regardless of the chat check) and history is discarded on 403, so
        # overlapping leaks nothing; auth failures take precedence below.
        auth_t = asyncio.create_task(self._authorize(user_id, chat_id))
        entities = None
        if self.config.use_llm_ner:
            from rassengine_tpu.nlu.ner import llm_ner_extract

            await auth_t  # 403 before paying for the external LLM call
            with stage("llm_ner"):
                entities = await llm_ner_extract(query, self.llm)
        if self.batcher is not None and entities is None:
            ret_t = asyncio.create_task(
                self.batcher.retrieve(user_id, query, top_k))
        else:
            # worker thread (like the batcher's engine calls): device waits
            # release the GIL, so concurrent asks overlap instead of
            # serializing behind one retrieve on the event loop
            ret_t = asyncio.create_task(asyncio.to_thread(
                self.engine.retrieve, user_id, query, top_k=top_k,
                entities=entities))
        hist_t = asyncio.create_task(
            self.db.a_history(chat_id, self.config.max_chat_history))
        # FIRST_EXCEPTION so a 403 surfaces at sqlite speed, not after the
        # speculative retrieval finishes (auth precedence: if anything
        # failed, settle the cheap auth task and raise ITS error first)
        await asyncio.wait({auth_t, ret_t, hist_t},
                           return_when=asyncio.FIRST_EXCEPTION)
        if not auth_t.done():
            await asyncio.wait({auth_t})
        if auth_t.exception() is not None:
            # cancel() cannot interrupt a to_thread task already running on
            # the executor (Task.cancel defers until the inner future
            # settles), so AWAITING the cancelled tasks would hold the 403
            # until the whole speculative retrieval finishes. Abandon them
            # instead: consume the eventual result/exception via callback so
            # nothing is logged as never-retrieved, and raise now.
            def _swallow(t: asyncio.Task) -> None:
                if not t.cancelled():
                    t.exception()

            for t in (ret_t, hist_t):
                t.cancel()
                t.add_done_callback(_swallow)
            raise auth_t.exception()
        result, history = await asyncio.gather(ret_t, hist_t)

        # --- early-return branches (reference main.py:2804-2876) -------------
        if result.intent == QueryIntent.AGGREGATE:
            answer = json.dumps(result.aggregations or {}, indent=2)
            await self._persist(chat_id, query, answer)
            yield answer
            return

        if result.intent == QueryIntent.DOCUMENT_FETCH:
            answer = self._fetch_documents(result)
            await self._persist(chat_id, query, answer)
            yield answer
            return

        # --- cache lookup -----------------------------------------------------
        # reuse the retrieval-path embedding (RetrievalResult.query_emb) —
        # re-embedding here would serialize an extra forward + device
        # round-trip per request ON THE EVENT LOOP (measured ~30 ms each on
        # the tunneled chip); non-embedding intents embed lazily off-loop,
        # and only when the cache is actually on
        q_emb = result.query_emb
        # cache scope: per patient when one resolved, else per CHAT — a
        # 'user:*' scope would replay an answer generated with another
        # chat's history (and possibly another patient's context) into this
        # chat whenever two questions embed near each other
        scope = (f"{user_id}:{result.patient_ids[0]}" if result.patient_ids
                 else f"{user_id}:chat:{chat_id}")
        if self.cache is not None:
            if q_emb is None:
                q_emb = await asyncio.to_thread(
                    self.engine.embedder.embed_query, query)
            cached = self.cache.get(scope, q_emb)
            if cached is not None:
                METRICS.incr("cache_hits")
                await self._persist(chat_id, query, cached)
                yield cached
                return

        # --- prompt assembly (reference main.py:2894-2940) --------------------
        context = build_context(result.hits)
        hist_text = "\n".join(f"{m['role']}: {m['content']}" for m in history)
        prompt_parts = []
        if hist_text:
            prompt_parts.append(f"Chat history:\n{hist_text}")
        if context:
            prompt_parts.append(f"EHR context:\n{context}")
        else:
            prompt_parts.append("EHR context: (no matching records found)")
        prompt_parts.append(f"User question: {query}")
        prompt = "\n\n".join(prompt_parts)

        pieces: list[str] = []
        with stage("generate"):
            try:
                async for chunk in self.llm.generate_stream(prompt, SYSTEM_PROMPT):
                    pieces.append(chunk)
                    yield chunk
            except Exception as e:  # degrade like the reference's clients do
                METRICS.incr("llm_failures")
                log.error("generation backend failed: %s", e)
                msg = "I could not generate an answer (generation backend error)."
                pieces = [msg]
                yield msg
        answer = "".join(pieces) or "I could not generate an answer."

        if (self.cache is not None and answer and context
                and "[ERROR]" not in answer):
            # only cache answers grounded in retrieved context — caching
            # "no records found" poisons later queries that would match.
            # substring (not prefix) check: a stream can fail mid-answer,
            # yielding "partial text…[ERROR] …" that must not be cached
            self.cache.put(scope, q_emb, answer)
        await self._persist(chat_id, query, answer)
        log.info("ask done %s", trace.summary())

    def _fetch_documents(self, result) -> str:
        """DOCUMENT_FETCH: return raw files, capped (reference main.py:2804-2856)."""
        if not result.patient_ids and not result.hits:
            return "No patient specified or no documents found."
        files: list[str] = []
        seen: set[str] = set()
        for doc, _ in result.hits:
            path = doc.get("file_path")
            if not path or path in seen:
                continue
            seen.add(path)
            if len(files) >= self.config.max_files_per_patient:
                break
            from rassengine_tpu.utils.files import retrieve_ehr_document

            # file_path metadata is data, not a trusted filesystem reference:
            # only read it if it resolves inside a configured ingest root
            content = None
            for root in (self.config.upload_dir, self.config.emb_dir):
                if root:
                    content = retrieve_ehr_document(path, upload_root=root)
                    if content is not None:
                        break
            if content is not None:
                files.append(f"=== {os.path.basename(path)} ===\n{content}")
        if not files:
            # no raw files on disk; fall back to indexed doc bodies
            for doc, _ in result.hits[: self.config.max_files_per_patient]:
                body = doc.get("unstructuredText") or render_structured(doc)
                files.append(f"=== {doc.get('doc_id')} ===\n{body}")
        return "\n\n".join(files) if files else "No documents found."

    async def _persist(self, chat_id: str, query: str, answer: str) -> None:
        with stage("persist"):
            await self.db.a_add_messages(
                chat_id, [("user", query), ("assistant", answer)]
            )
