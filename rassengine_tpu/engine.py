"""RassEngine — the in-process TPU engine facade.

One object owns what the reference spreads across external services:

- per-user multitenant indexes (reference ``get_index_name(user_id)``
  per-user OpenSearch index, app/main.py:346) → ``Tenant`` registry,
- the on-TPU embedder (replaces the Ollama HTTP client),
- NLU (intent classifier + NER + patient resolution),
- the 12 retrieval strategies with intent dispatch (the core of ``ask()``'s
  retrieval half, main.py:2804-2892),
- ingestion: parsed docs → embed → vector + lexical + filter-column stores
  (replaces ``store_fhir_docs_in_opensearch``, main.py:1211-1282).

The LLM generation, chat persistence, and HTTP surface live in serve/.
"""

from __future__ import annotations

import logging
import os
import threading
from dataclasses import dataclass, field

import numpy as np

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.schema import EMBEDDING_INTENTS, QueryIntent
from rassengine_tpu.core.tracing import stage
from rassengine_tpu.fusion.strategies import Retriever
from rassengine_tpu.index.store import TenantIndex, replace_rows
from rassengine_tpu.lexical.bm25 import LexicalIndex
from rassengine_tpu.models.embedder import Embedder
from rassengine_tpu.nlu.intent import IntentClassifier
from rassengine_tpu.nlu.ner import NerPipeline, entities_to_filter
from rassengine_tpu.nlu.patient import resolve_patient_ids_from_name

log = logging.getLogger("rassengine.engine")


@dataclass
class Tenant:
    name: str
    index: TenantIndex
    lexical: LexicalIndex
    retriever: Retriever
    # coarse mutation lock: retrieval may run in worker threads (serve/batching)
    # while uploads mutate the host arrays — safety by construction (SURVEY §5)
    lock: "threading.RLock" = field(default_factory=lambda: threading.RLock())


@dataclass
class RetrievalResult:
    intent: QueryIntent
    hits: list[tuple[dict, float]] = field(default_factory=list)
    aggregations: dict | None = None
    entities: list[dict] = field(default_factory=list)
    patient_name: str | None = None
    patient_ids: list[str] = field(default_factory=list)
    # the query embedding used for retrieval (embedding intents) — carried so
    # downstream consumers (serve/ask.py's semantic answer cache) never pay a
    # second embed forward + tunnel round-trip per request
    query_emb: "np.ndarray | None" = None


class RassEngine:
    def __init__(self, config: EngineConfig | None = None, embedder: Embedder | None = None,
                 bert_cfg=None, use_pallas: bool | None = None):
        self.config = config or EngineConfig.from_env()
        self.embedder = embedder or Embedder(self.config, bert_cfg=bert_cfg)
        self.intent_classifier = IntentClassifier(self.config)
        self.ner = NerPipeline(self.config)
        self._tenants: dict[str, Tenant] = {}
        self._tenants_lock = threading.Lock()
        if use_pallas is None:
            import jax

            use_pallas = jax.devices()[0].platform not in ("cpu",)
        self.use_pallas = use_pallas
        # SHARD_COUNT > 1 → serve row-sharded over a ("shard",) mesh
        # (reference shard distribution, main.py:89-90 / _routing main.py:1230)
        self.mesh = None
        self.router = None
        if self.config.shard_count > 1 or self.config.replica_count > 1:
            import jax

            from rassengine_tpu.core.meshes import (replica_shard_mesh,
                                                    shard_mesh)
            from rassengine_tpu.parallel.topk_merge import ShardRouter

            n = max(self.config.shard_count, 1)
            r = max(self.config.replica_count, 1)
            if len(jax.devices()) >= n * r:
                # REPLICA_COUNT > 1 → (replica, shard) mesh: corpus sharded
                # within each replica group and replicated across groups;
                # query batches split over replicas (reference REPLICA_COUNT
                # is an OpenSearch availability setting, main.py:90 — here it
                # buys aggregate scan bandwidth, i.e. QPS)
                self.mesh = (replica_shard_mesh(r, n) if r > 1
                             else shard_mesh(n))
                if n > 1:
                    self.router = ShardRouter(n)
                # use_pallas stays platform-based: the shard_map local scans
                # run the fused Pallas kernels per shard on TPU (VERDICT r2
                # weak #2 — sharded serving no longer abandons the kernels)
            else:
                log.warning(
                    "SHARD_COUNT=%d × REPLICA_COUNT=%d but only %d devices; "
                    "single-chip", n, r, len(jax.devices()))

    # --- tenancy --------------------------------------------------------------

    def index_name(self, user_id: str) -> str:
        """Reference get_index_name (main.py:346)."""
        return f"{self.config.index_prefix}-{user_id}"

    def tenant(self, user_id: str) -> Tenant:
        name = self.index_name(user_id)
        t = self._tenants.get(name)
        if t is None:
            # first-touch is racy across worker threads (concurrent first
            # /upload_data + /ask): without the lock, two Tenant instances
            # get built and the one registered last silently orphans the
            # other's ingested rows
            with self._tenants_lock:
                t = self._tenants.get(name)
                if t is not None:
                    return t
                index = TenantIndex(name, self.config.embed_dim,
                                    capacity=self.config.index_capacity,
                                    block_rows=self.config.index_block_rows,
                                    mesh=self.mesh)
                lexical = LexicalIndex()
                t = Tenant(name, index, lexical,
                           Retriever(index, lexical, self.config,
                                     self.use_pallas,
                                     mesh=self.mesh, router=self.router))
                # sharded-region grows move rows; postings must follow
                # (late-bound so compaction's lexical replacement stays
                # hooked)
                index.remap_hooks.append(
                    lambda mv, _t=t: _t.lexical.shift_rows(mv))
                self._tenants[name] = t
        return t

    def reload_nlu(self) -> dict:
        """Hot-swap the intent/NER checkpoints from their configured paths.

        The reference loads NLU models once at module import (app/main.py:
        109-134) and a retrain requires a service restart; here a freshly
        written checkpoint directory (train/intent_train.py, train/ner_train.py
        write atomically into ``final/``) can be picked up live. New model
        objects are built first and swapped in one reference assignment each,
        so in-flight requests keep a coherent pipeline.
        """
        intent = IntentClassifier(self.config)
        ner = NerPipeline(self.config)
        self.intent_classifier = intent
        self.ner = ner
        return {"intent_model": intent.model is not None,
                "ner_model": ner.model is not None}

    def reshard(self, shard_count: int, replica_count: int = 1,
                devices=None) -> dict:
        """Live topology change — rebuild every tenant under a new
        (replica, shard) mesh without a restart or a checkpoint.

        The failure-degradation path for sharded fleets (reference
        counterpart: OpenSearch shard reallocation on node loss,
        SHARD_COUNT/REPLICA_COUNT main.py:89-90): when devices drop out,
        re-form the mesh from the survivors and re-place every live doc into
        its patient's shard region under the NEW shard count (the same
        re-placement path checkpoint restore uses, index/checkpoint.py).
        Rows come from the host-canonical arrays, so no device state is
        needed from the lost shards. Per-tenant swap happens under the
        mutation lock; in-flight retrievals finish on the old index.

        ``devices``: explicit survivor list (parallel/health.py passes the
        healthy subset after a device loss — the failed chip may be any
        position, not a suffix); defaults to ``jax.devices()``.

        → {tenant: docs_moved}; raises ValueError if the requested topology
        exceeds the visible devices.
        """
        import jax

        from rassengine_tpu.core.meshes import replica_shard_mesh, shard_mesh
        from rassengine_tpu.parallel.topk_merge import ShardRouter

        pool = list(devices) if devices is not None else jax.devices()
        n, r = max(shard_count, 1), max(replica_count, 1)
        if n * r > len(pool):
            raise ValueError(
                f"reshard({n}×{r}) exceeds {len(pool)} devices")
        mesh = router = None
        if n * r > 1:
            mesh = (replica_shard_mesh(r, n, devices=pool) if r > 1
                    else shard_mesh(n, devices=pool[:n]))
            if n > 1:
                router = ShardRouter(n)
        moved: dict[str, int] = {}
        for name, t in list(self._tenants.items()):
            with t.lock:
                old = t.index
                index = TenantIndex(name, self.config.embed_dim,
                                    capacity=old.capacity,
                                    block_rows=old.block_rows, mesh=mesh)
                lexical = LexicalIndex()
                index.remap_hooks.append(
                    lambda mv, _l=lexical: _l.shift_rows(mv))
                n_moved = replace_rows(index, lexical, old.iter_live())
                t.index = index
                t.lexical = lexical
                t.retriever = Retriever(index, lexical, self.config,
                                        self.use_pallas, mesh=mesh,
                                        router=router)
                # rebind like checkpoint.load_engine: compaction may replace
                # t.lexical later, so the hook must follow the tenant
                index.remap_hooks.clear()
                index.remap_hooks.append(
                    lambda mv, _t=t: _t.lexical.shift_rows(mv))
                moved[name] = n_moved
        self.mesh, self.router = mesh, router
        log.info("resharded %d tenants onto shard=%d replica=%d",
                 len(moved), n, r)
        return moved

    # --- ingestion ------------------------------------------------------------

    # chunks per pipelined ingest slab: large enough that the device stays
    # busy across a slab's host indexing, small enough to bound the queue
    # (2 slabs × 1024 × dim f32 ≈ 8 MB at 1024-d)
    _INGEST_SLAB = 1024

    def ingest_docs(self, user_id: str, structured: list[dict],
                    unstructured: list[dict]) -> int:
        """Embed + index parsed docs (reference store_fhir_docs_in_opensearch).

        The embed stage runs on device while the host indexes the PREVIOUS
        slab (VERDICT r4 #4): a producer thread streams
        ``embed_texts_in_batches`` slabs through a depth-2 queue — device
        compute and host upsert+postings overlap, so large-request wall
        clock approaches max(embed, index) instead of their sum. Each slab
        applies under the tenant lock (queries between slabs see a
        consistent partial ingest; no torn doc)."""
        t = self.tenant(user_id)
        with stage("ingest"):
            n = 0
            # a sharded re-upsert that moves shard regions tombstones the old
            # row; its postings must go too or they inflate BM25 stats
            evict = t.lexical.remove_doc

            def apply(docs: list[dict], embs) -> None:
                # one batched postings build per slab — the per-doc path is
                # 75% tiny-ndarray/dict overhead (bm25.py index_docs)
                with t.lock:
                    rows = [t.index.upsert(
                        d, embs[i] if embs is not None else None,
                        on_move=evict) for i, d in enumerate(docs)]
                    t.lexical.index_docs(rows, docs)

            if structured:
                apply(structured, None)
                n += len(structured)
            if unstructured:
                texts = [d.get("unstructuredText", "") for d in unstructured]
                slab = self._INGEST_SLAB
                # bulk path: larger forwards than the per-query default
                # (config.ingest_embed_batch) amortize dispatch + tunnel
                ibs = self.config.ingest_embed_batch or None
                if len(unstructured) <= slab:
                    apply(unstructured, self.embedder.embed_texts_in_batches(
                        texts, batch_size=ibs))
                else:
                    import queue
                    import threading

                    q: queue.Queue = queue.Queue(maxsize=2)

                    def produce() -> None:
                        try:
                            for s in range(0, len(texts), slab):
                                q.put((s, self.embedder.embed_texts_in_batches(
                                    texts[s : s + slab], batch_size=ibs)))
                            q.put(None)
                        except BaseException as e:  # noqa: BLE001 — re-raised
                            q.put(e)

                    th = threading.Thread(target=produce, daemon=True,
                                          name="ingest-embed")
                    th.start()
                    try:
                        while True:
                            item = q.get()
                            if item is None:
                                break
                            if isinstance(item, BaseException):
                                raise item
                            s, embs = item
                            apply(unstructured[s : s + slab], embs)
                    finally:
                        th.join(timeout=60.0)
                n += len(unstructured)
            with t.lock:
                # shard-region moves on re-upsert leave tombstones too
                self._maybe_compact(t)
        log.info("indexed %d docs into %s (total %d)", n, t.name, t.index.count)
        return n

    def delete_docs(self, user_id: str, doc_ids: list[str]) -> int:
        """Delete documents by id (the reference delegates this to OpenSearch;
        here rows tombstone immediately and compact once a quarter of the
        tenant is dead). → number actually deleted."""
        t = self.tenant(user_id)
        n = 0
        with t.lock:
            for did in doc_ids:
                row = t.index._id_to_row.get(str(did))
                if row is None:
                    continue
                t.lexical.remove_doc(row)
                if t.index.delete(str(did)):
                    n += 1
            self._maybe_compact(t)
        log.info("deleted %d docs from %s (%d tombstones pending)",
                 n, t.name, t.index.deleted_count)
        return n

    def _maybe_compact(self, t: Tenant) -> None:
        idx = t.index
        if idx.deleted_count and idx.deleted_count >= max(256, idx.count // 4):
            self.compact_tenant(t)

    def compact_tenant(self, t: Tenant) -> int:
        """Rewrite the tenant without tombstoned rows; postings rebuild from
        the surviving sources so row ids stay consistent everywhere."""
        with t.lock:
            kept = t.index.compact()
            lexical = LexicalIndex()
            live = [(int(row), t.index.docs[int(row)])
                    for row in np.nonzero(t.index._allocated)[0]
                    if t.index.docs[int(row)] is not None]
            lexical.index_docs([r for r, _ in live], [d for _, d in live])
            t.lexical = lexical
            t.retriever.lexical = lexical
            t.retriever._device_lexical = None
            t.retriever._ivf_cache = None  # row ids changed
        log.info("compacted %s → %d rows", t.name, t.index.count)
        return int(kept.size)

    def ingest_file(self, user_id: str, path: str, chunk_size: int | None = None) -> int:
        """Parse + ingest one .json/.md/.txt file (reference ingest paths)."""
        import json

        from rassengine_tpu.ingest.fhir import parse_fhir_bundle_with_path
        from rassengine_tpu.ingest.textfile import parse_markdown_file, parse_text_file

        cs = chunk_size or self.config.chunk_size
        ck = {"adaptive": self.config.adaptive_chunking,
              "overlap": self.config.chunk_overlap}
        ext = os.path.splitext(path)[1].lower()
        if ext == ".json":
            with open(path, encoding="utf-8") as f:
                bundle = json.load(f)
            s, u = parse_fhir_bundle_with_path(bundle, path, cs, **ck)
        elif ext == ".md":
            s, u = [], parse_markdown_file(path, cs, **ck)
        elif ext == ".txt":
            s, u = [], parse_text_file(path, cs, **ck)
        else:
            raise ValueError(f"unsupported extension: {ext}")
        return self.ingest_docs(user_id, s, u)

    def ingest_directory(self, user_id: str, root: str) -> int:
        """Reference ingest_fhir_directory (main.py:1285-1321)."""
        n = 0
        for dirpath, _dirs, files in os.walk(root):
            for fname in sorted(files):
                if os.path.splitext(fname)[1].lower() in (".json", ".md", ".txt"):
                    try:
                        n += self.ingest_file(user_id, os.path.join(dirpath, fname))
                    except Exception as e:  # skip unparseable, keep ingesting
                        log.warning("skipping %s: %s", fname, e)
        return n

    # --- retrieval ------------------------------------------------------------

    def retrieve(self, user_id: str, query: str, top_k: int | None = None,
                 intent: QueryIntent | None = None,
                 patient_id: str | None = None,
                 entities: list[dict] | None = None,
                 query_emb: np.ndarray | None = None) -> RetrievalResult:
        """NLU → intent dispatch → strategy (reference ask() retrieval half).

        ``entities`` lets the caller inject externally-extracted entities
        (e.g. the opt-in LLM NER path, serve/ask.py); ``query_emb`` a
        precomputed query embedding (retrieve_batch embeds every
        embedding-intent query of a batch in ONE forward and passes them
        down here, so non-batchable intents still skip the per-query
        embed round-trip).
        """
        t = self.tenant(user_id)
        k = top_k or self.config.top_k

        if entities is None:
            with stage("ner"):
                entities = self.ner.extract(query)
        with stage("intent"):
            if intent is None:
                intent, _conf = self.intent_classifier.classify(query)
        spec, text_match = entities_to_filter(entities)

        pname, pids = (None, [])
        if patient_id is None:
            with stage("patient_resolution"), t.lock:
                pname, pids = resolve_patient_ids_from_name(query, t.retriever, self.ner)
            if len(pids) == 1:
                patient_id = pids[0]

        result = RetrievalResult(intent=intent, entities=entities,
                                 patient_name=pname, patient_ids=pids)

        if intent == QueryIntent.AGGREGATE:
            with stage("retrieve"), t.lock:
                result.aggregations = t.retriever.aggregate_search(
                    query, filter_clause=spec, patient_id=patient_id)
            return result

        r = t.retriever
        strategies = {
            QueryIntent.SEMANTIC: r.semantic_search,
            QueryIntent.KEYWORD: r.exact_match_search,
            QueryIntent.HYBRID: r.hybrid_search,
            QueryIntent.STRUCTURED: r.structured_search,
            QueryIntent.HYBRID_STRUCTURED: r.hybrid_structured_search,
            QueryIntent.COMPARISON: r.comparison_search,
            QueryIntent.TEMPORAL: r.temporal_search,
            QueryIntent.EXPLANATORY: r.explanatory_search,
            QueryIntent.MULTI_INTENT: r.multi_intent_search,
            QueryIntent.ENTITY_SPECIFIC: r.entity_specific_search,
            QueryIntent.DOCUMENT_FETCH: r.document_fetch_search,
        }
        method = strategies[intent]
        over_k = 4 * k if text_match else k
        with stage("retrieve"):
            if intent in EMBEDDING_INTENTS:
                hits = None
                fused_kinds = {QueryIntent.SEMANTIC: "semantic",
                               QueryIntent.HYBRID: "hybrid",
                               QueryIntent.MULTI_INTENT: "multi_intent"}
                if query_emb is None and intent in fused_kinds:
                    # lone-ask latency path: encoder forward + corpus scan in
                    # ONE dispatch, one device round-trip (ROADMAP #4; the
                    # micro-batcher covers concurrent asks, this covers the
                    # ask between windows). None → ineligible, multi-stage.
                    kind = fused_kinds[intent]
                    with t.lock:
                        fused = t.retriever.fused_encode_search(
                            self.embedder, query, kind, k=over_k,
                            filter_clause=spec, patient_id=patient_id)
                    if fused is not None:
                        hits, query_emb = fused
                if hits is None:
                    if query_emb is None:
                        with stage("embed_query"):
                            query_emb = self.embedder.embed_query(query)
                    with t.lock:
                        hits = method(query, query_emb, k=over_k,
                                      filter_clause=spec,
                                      patient_id=patient_id)
                result.query_emb = query_emb
            else:
                with t.lock:
                    hits = method(query, k=over_k, filter_clause=spec,
                                  patient_id=patient_id)
        if text_match:
            hits = _apply_text_match(hits, text_match)[:k] or hits[:k]
        pid_eff = patient_id or spec.patient_id
        if pid_eff:
            # device filters compare 31-bit patient hashes — at hospital
            # scale (~46k patients → ~50% chance of one colliding pair) a
            # hash twin's documents would pass the mask; exact-match the
            # string here so isolation never rests on the hash alone
            hits = [(src, s) for src, s in hits
                    if str(src.get("patientId") or "") == pid_eff]
        result.hits = hits[:k]
        return result


def _batchable(result_spec) -> bool:
    # text_match is a HOST post-filter (_apply_text_match) — batchable with a
    # widened per-query candidate list; device-side spec filters (their
    # add-masks are per query), patient routing, and patient-identifying
    # entities force the single path. PERSON/PATIENT_ID queries must go
    # single: only that path runs resolve_patient_ids_from_name, which routes
    # retrieval to the patient AND scopes the serve-path answer cache to
    # `user:<patient>` instead of `user:*`.
    spec, _text_match, patient_id, entities = result_spec
    if any(e.get("label") in ("PERSON", "PATIENT_ID") for e in entities or ()):
        return False
    return (patient_id is None
            and not spec.keyword_terms and not spec.date_ranges
            and spec.patient_id is None)


def _retrieve_batch(self, user_id: str, queries: list[str],
                    top_k: int | None = None) -> list[RetrievalResult]:
    """Batched retrieval: one embed forward + one scan for the batch's
    SEMANTIC/HYBRID queries — the serving shape where the corpus read
    amortizes across the batch. Entity text-match constraints post-filter a
    4k-deep candidate list per query on host (same as the single path).
    Device-filtered specs / patient routing / the other ten intents fall back
    to the single-query path, but with their embeds precomputed here (one
    forward for the whole batch), so no fallback pays a per-query
    embed round-trip."""
    t = self.tenant(user_id)
    k = top_k or self.config.top_k
    # batched NLU: one NER forward + one intent forward for every query
    # (per-query forwards would each pay a device round-trip)
    with stage("ner"):
        ents_list = self.ner.extract_batch(queries)
    with stage("intent"):
        intents = self.intent_classifier.classify_batch(queries)
    plans = []
    for q, entities, (intent, _conf) in zip(queries, ents_list, intents):
        spec, text_match = entities_to_filter(entities)
        plans.append((q, intent, entities, spec, text_match))

    # ONE forward embeds every embedding-intent query — batched AND fallback
    emb_idx = [i for i, (_q, intent, *_r) in enumerate(plans)
               if intent in EMBEDDING_INTENTS]
    embs_by_i: dict[int, np.ndarray] = {}
    if emb_idx:
        with stage("embed_batch"):
            embs = self.embedder.embed_texts_in_batches(
                [plans[i][0] for i in emb_idx])
        # [1, dim] slices — the shape embed_query returns, so every
        # downstream consumer (retrieve, serve/ask.py's cache) sees one shape
        embs_by_i = {i: embs[j: j + 1] for j, i in enumerate(emb_idx)}

    results: list[RetrievalResult | None] = [None] * len(queries)
    batch_idx = [i for i, (_q, intent, ents, spec, tm) in enumerate(plans)
                 if intent in (QueryIntent.SEMANTIC, QueryIntent.HYBRID)
                 and _batchable((spec, tm, None, ents))]
    if len(batch_idx) >= 2:
        sem_ids = [i for i in batch_idx if plans[i][1] == QueryIntent.SEMANTIC]
        hyb_ids = [i for i in batch_idx if plans[i][1] == QueryIntent.HYBRID]
        # one candidate depth for the group: 4k covers any text-match query
        over_k = 4 * k if any(plans[i][4] for i in batch_idx) else k
        for ids, method in ((sem_ids, t.retriever.semantic_search_batch),
                            (hyb_ids, t.retriever.hybrid_search_batch)):
            if not ids:
                continue
            sub_embs = np.concatenate([embs_by_i[i] for i in ids])
            with t.lock:
                hit_lists = method([plans[i][0] for i in ids], sub_embs,
                                   k=over_k)
            for i, hits in zip(ids, hit_lists):
                q, intent, entities, _s, tm = plans[i]
                if tm:
                    hits = _apply_text_match(hits, tm)[:k] or hits[:k]
                results[i] = RetrievalResult(intent=intent, hits=hits[:k],
                                             entities=entities,
                                             query_emb=embs_by_i[i])
    for i, (q, intent, entities, _s, _tm) in enumerate(plans):
        if results[i] is None:
            results[i] = self.retrieve(user_id, q, top_k=k, intent=intent,
                                       entities=entities,
                                       query_emb=embs_by_i.get(i))
    return results  # type: ignore[return-value]


RassEngine.retrieve_batch = _retrieve_batch


def _apply_text_match(hits, text_match: dict[str, list[str]]):
    """Host post-filter for entity terms mapped to analyzed text fields."""
    out = []
    for src, score in hits:
        ok = True
        for fname, terms in text_match.items():
            hay = str(src.get(fname) or "").lower()
            alt = str(src.get("unstructuredText") or "").lower()
            if not any(term.lower() in hay or term.lower() in alt for term in terms):
                ok = False
                break
        if ok:
            out.append((src, score))
    return out
