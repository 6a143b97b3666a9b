"""End-to-end ingestion benchmark: parse → chunk → embed → index → flush.

VERDICT r3 #3: the serving path was benchmarked to death while ingestion —
"the second half of the north-star replacement" (SURVEY §3.3) — had no
end-to-end docs/s number. The reference's ingest bottleneck is architectural:
ONE HTTP /api/embeddings call per chunk (reference embedding_gen.py:152-192,
1097-1132), so even a 10 ms round-trip caps it at ~100 chunks/s/process and
real deployments see far less. Here chunks embed in device batches, so the
bound moves to the encoder forward (MXU) and the host-side Python of
upsert + postings.

Phases measured (each isolated, device phases synced via host copies):

- ``parse``    : FHIR bundle extraction (ingest/fhir.py) + text chunking
- ``embed``    : Embedder.embed_texts_in_batches over every chunk
- ``index``    : TenantIndex.upsert + LexicalIndex.index_doc (host Python)
- ``flush``    : device view builds — semantic columns + BM25 CSR push
- ``query``    : one hybrid retrieval after ingest (freshness check)
- ``upload``   : POST /upload_data of a multi-MB FHIR bundle through the
                 real HTTP server (wire → parse → embed → index wall-clock)

Run: ``python -m rassengine_tpu.bench.ingest_bench --docs 10000 [--tpu]``
(CPU smoke: ``--docs 2000``; add ``--json`` for machine-readable output).
"""

from __future__ import annotations

import argparse
import json
import random
import time

import numpy as np

REFERENCE_CHUNK_HTTP_MS = 10.0  # one /api/embeddings round-trip per chunk,
# generously assuming a warm local Ollama (reference embedding_gen.py:152)


def gen_fhir_bundle(n_entries: int, rng: random.Random,
                    patient_pool: int = 64) -> dict:
    """Synthetic FHIR bundle across the resource types ingest/fhir.py parses,
    with multi-sentence narratives so the chunker has real work."""
    from rassengine_tpu.train.corpus import clinical_sentence

    types = ["Condition", "Observation", "MedicationRequest", "Procedure",
             "AllergyIntolerance", "Encounter"]
    entries = [{"resource": {
        "resourceType": "Patient", "id": f"p{rng.randrange(patient_pool)}",
        "name": [{"given": ["Alex"], "family": f"Fam{rng.randrange(999)}"}],
        "gender": rng.choice(["male", "female"]),
        "birthDate": "1960-01-01"}}]
    for i in range(n_entries - 1):
        rt = types[i % len(types)]
        narrative = " ".join(clinical_sentence(rng)
                             for _ in range(rng.randint(2, 6)))
        res = {"resourceType": rt, "id": f"{rt[:3].lower()}{i}",
               "subject": {"reference": f"Patient/p{rng.randrange(patient_pool)}"},
               "text": {"div": f"<div>{narrative}</div>"}}
        if rt == "Condition":
            res["code"] = {"text": "essential hypertension"}
        elif rt == "Observation":
            res["code"] = {"text": "hemoglobin a1c"}
            res["valueQuantity"] = {"value": 7.2, "unit": "%"}
        elif rt == "MedicationRequest":
            res["medicationCodeableConcept"] = {"text": "metformin"}
            res["dosageInstruction"] = [{"text": "500 mg twice daily"}]
        elif rt == "Procedure":
            res["code"] = {"text": "colonoscopy"}
        elif rt == "AllergyIntolerance":
            res["code"] = {"text": "penicillin"}
            res["patient"] = res.pop("subject")
        entries.append({"resource": res})
    return {"entry": entries}


def gen_text_doc(rng: random.Random, words: int = 600) -> str:
    from rassengine_tpu.train.corpus import clinical_sentence

    out, n = [], 0
    while n < words:
        s = clinical_sentence(rng)
        out.append(s)
        n += len(s.split())
    return " ".join(out)


def _resolve_encoder(use_tpu: bool, encoder_weights: str | None) -> str:
    """TPU runs default to the SERVING-DEFAULT encoder, not the weightless
    tiny one. Round-5 postmortem: ``EngineConfig(**kw)`` without
    ``encoder_weights_path`` silently fell into the embedder's weightless
    tiny mode, so rows labeled \"24L\" in earlier BENCH revisions had
    actually measured a random-init 2-layer model. Resolve explicitly and
    RECORD the resolved encoder in the result so a mislabel can't recur.
    Pass ``encoder_weights=""`` for a deliberate tiny-encoder row."""
    import os

    if not use_tpu or encoder_weights is not None:
        return encoder_weights or ""
    w = os.getenv("ENCODER_WEIGHTS_PATH", "./encoder_model_prod24")
    return w if os.path.isdir(w) else ""


def run(n_docs: int = 10_000, batch: int = 256, dim: int | None = None,
        use_tpu: bool = False, seed: int = 0, upload_mb: float = 4.0,
        encoder_weights: str | None = None) -> dict:
    """→ phase timings + docs/s + chunks/s. ``n_docs`` counts FHIR entries
    plus text files (70/30 mix, reference directory-ingest shape)."""
    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")

    from rassengine_tpu.core.config import EngineConfig
    from rassengine_tpu.engine import RassEngine
    from rassengine_tpu.ingest.chunker import chunk_text
    from rassengine_tpu.ingest.fhir import parse_fhir_bundle
    from rassengine_tpu.models.bert import BertConfig

    rng = random.Random(seed)
    res = {"n_docs": n_docs}

    # --- corpus (not timed) -------------------------------------------------
    n_fhir = int(n_docs * 0.7)
    n_txt = n_docs - n_fhir
    bundles = [gen_fhir_bundle(min(256, n_fhir - i), rng)
               for i in range(0, n_fhir, 256)]
    texts_raw = [gen_text_doc(rng) for _ in range(n_txt)]

    kw = dict(index_capacity=1 << 10, index_block_rows=1 << 10,
              database_path=":memory:", llm_backend="echo",
              intent_model_path="/nonexistent",
              ner_model_path="/nonexistent", embed_batch_size=batch)
    enc = _resolve_encoder(use_tpu, encoder_weights)
    if enc:
        kw["encoder_weights_path"] = enc
    bert_cfg = None if use_tpu else BertConfig.tiny()
    if bert_cfg is not None and not enc:
        kw["embed_dim"] = 64
    cfg = EngineConfig(**kw)
    engine = RassEngine(cfg, bert_cfg=None if enc else bert_cfg,
                        use_pallas=use_tpu)
    res["encoder"] = {
        "weights": enc or "weightless-tiny-random",
        "layers": engine.embedder.bert_cfg.num_layers,
        "hidden": engine.embedder.bert_cfg.hidden_size,
    }

    # --- parse + chunk --------------------------------------------------------
    t0 = time.perf_counter()
    structured, unstructured = [], []
    for b in bundles:
        s, u = parse_fhir_bundle(b, cfg.chunk_size)
        structured.extend(s)
        unstructured.extend(u)
    for i, txt in enumerate(texts_raw):
        for ci, ch in enumerate(chunk_text(txt, cfg.chunk_size)):
            unstructured.append({"doc_id": f"txt-{i}-{ci}",
                                 "doc_type": "unstructured",
                                 "patientId": f"p{rng.randrange(64)}",
                                 "unstructuredText": ch})
    res["parse_s"] = round(time.perf_counter() - t0, 3)
    res["n_structured"] = len(structured)
    res["n_chunks"] = len(unstructured)

    # --- embed (device; embed_texts_in_batches returns host arrays = synced) --
    chunks = [d["unstructuredText"] for d in unstructured]
    engine.embedder.embed_texts_in_batches(chunks[:batch])  # compile warmup
    t0 = time.perf_counter()
    embs = engine.embedder.embed_texts_in_batches(chunks)
    res["embed_s"] = round(time.perf_counter() - t0, 3)

    # --- index (host python: upsert + postings) -------------------------------
    t = engine.tenant("bench-user")
    evict = t.lexical.remove_doc
    t0 = time.perf_counter()
    with t.lock:
        rows = [t.index.upsert(d, None, on_move=evict) for d in structured]
        rows += [t.index.upsert(d, embs[i], on_move=evict)
                 for i, d in enumerate(unstructured)]
        t.lexical.index_docs(rows, structured + unstructured)
    res["index_s"] = round(time.perf_counter() - t0, 3)

    # --- flush (device views: semantic columns + BM25 CSR push + compiles) ----
    # the first retrieval forces every device view the serving path uses;
    # a second one right after gives the steady-state query cost
    t0 = time.perf_counter()
    cols = t.index.device_columns()
    _ = np.asarray(cols["vecs"][:1, :1])  # sync
    out = engine.retrieve("bench-user", "metformin for type 2 diabetes",
                          top_k=5)
    res["flush_s"] = round(time.perf_counter() - t0, 3)

    # --- steady-state freshness query ------------------------------------------
    t0 = time.perf_counter()
    out = engine.retrieve("bench-user", "colonoscopy screening history",
                          top_k=5)
    res["query_s"] = round(time.perf_counter() - t0, 3)
    res["query_hits"] = len(out.hits)

    total_docs = len(structured) + len(unstructured)
    pipeline_s = res["parse_s"] + res["embed_s"] + res["index_s"] + res["flush_s"]
    res["pipeline_s"] = round(pipeline_s, 3)
    res["docs_per_s"] = round(total_docs / pipeline_s, 1)
    res["chunks_per_s"] = round(len(unstructured) / pipeline_s, 1)
    res["embed_chunks_per_s"] = round(len(unstructured) / res["embed_s"], 1)
    ref_ceiling = 1000.0 / REFERENCE_CHUNK_HTTP_MS
    res["vs_reference_per_chunk_http"] = round(
        res["chunks_per_s"] / ref_ceiling, 2)

    # the PRODUCTION path: engine.ingest_docs overlaps device embedding
    # with host indexing (engine.py pipelined slabs), so its wall clock
    # beats the sum of the isolated stages above; min-of-2 defends the
    # number against minute-scale tunnel drift
    eng_s = []
    for rep in range(2):
        tname = f"bench-pipe{rep}"
        t0 = time.perf_counter()
        engine.ingest_docs(tname, structured, unstructured)
        eng_s.append(time.perf_counter() - t0)
    res["engine_s"] = round(min(eng_s), 3)
    res["engine_s_reps"] = [round(x, 3) for x in eng_s]
    e_total = res["engine_s"] + res["parse_s"] + res["flush_s"]
    res["engine_docs_per_s"] = round(total_docs / e_total, 1)
    res["engine_chunks_per_s"] = round(len(unstructured) / e_total, 1)
    res["engine_vs_reference_per_chunk_http"] = round(
        res["engine_chunks_per_s"] / ref_ceiling, 2)
    return res


def run_upload(use_tpu: bool = False, upload_mb: float = 4.0,
               seed: int = 1, encoder_weights: str | None = None) -> dict:
    """POST /upload_data wall-clock through the real HTTP server."""
    import asyncio

    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")

    from rassengine_tpu.core.config import EngineConfig
    from rassengine_tpu.engine import RassEngine
    from rassengine_tpu.models.bert import BertConfig
    from rassengine_tpu.serve.app import build_upload_app

    rng = random.Random(seed)
    # grow the bundle until its JSON is ~upload_mb
    n = 64
    while True:
        bundle = gen_fhir_bundle(n, rng)
        payload = json.dumps(bundle).encode()
        if len(payload) >= upload_mb * 1e6 or n >= 1 << 16:
            break
        n *= 2

    async def main() -> dict:
        kw = dict(index_capacity=1 << 10, index_block_rows=1 << 10,
                  database_path=":memory:", llm_backend="echo",
                  intent_model_path="/nonexistent",
                  ner_model_path="/nonexistent",
                  # the serving default (EngineConfig.from_env): bulk
                  # ingestion embeds at 256 regardless of the query batch
                  ingest_embed_batch=256)
        enc = _resolve_encoder(use_tpu, encoder_weights)
        if enc:
            kw["encoder_weights_path"] = enc
        if not use_tpu and not enc:
            kw["embed_dim"] = 64
        from rassengine_tpu.serve.ask import AskService

        engine = RassEngine(
            EngineConfig(**kw),
            bert_cfg=None if (use_tpu or enc) else BertConfig.tiny(),
            use_pallas=use_tpu)
        service = AskService(engine)
        service.db.create_user("bench-user")
        app = build_upload_app(engine, service=service)
        server = await app.start("127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        boundary = "benchboundary"
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="user_id"\r\n\r\nbench-user\r\n'
                f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="files"; filename="bundle.json"\r\n'
                f"Content-Type: application/json\r\n\r\n").encode() \
            + payload + f"\r\n--{boundary}--\r\n".encode()

        def post() -> tuple[float, int, bytes]:
            import http.client

            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            t0 = time.perf_counter()
            conn.request(
                "POST", "/upload_data", body,
                {"Content-Type": f"multipart/form-data; boundary={boundary}"})
            resp = conn.getresponse()
            data = resp.read()
            return time.perf_counter() - t0, resp.status, data

        dt, status, data = await asyncio.to_thread(post)
        server.close()
        await server.wait_closed()
        return {"upload_mb": round(len(payload) / 1e6, 2),
                "upload_s": round(dt, 3), "status": status,
                "upload_mb_per_s": round(len(payload) / 1e6 / dt, 2),
                "entries": n, "resp": data[:120].decode(errors="replace"),
                "encoder": {
                    "weights": enc or "weightless-tiny-random",
                    "layers": engine.embedder.bert_cfg.num_layers,
                    "hidden": engine.embedder.bert_cfg.hidden_size}}

    return asyncio.run(main())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=10_000)
    p.add_argument("--tpu", action="store_true")
    p.add_argument("--upload-mb", type=float, default=4.0)
    p.add_argument("--json", action="store_true")
    a = p.parse_args()
    out = run(a.docs, use_tpu=a.tpu)
    out["upload"] = run_upload(use_tpu=a.tpu, upload_mb=a.upload_mb)
    print(json.dumps(out, indent=None if a.json else 2))
