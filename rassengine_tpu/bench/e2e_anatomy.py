"""End-to-end /ask latency anatomy + micro-batcher bench (VERDICT r2 #7).

Separates the e2e RAG number into its parts so environmental cost (this dev
image's 1-core host + ~30 ms tunnel round-trips per device↔host sync) is
distinguishable from architectural cost:

- per-stage latency table (NER, intent, embed, scan, fusion, persist,
  generate) from the tracing metrics over sequential batch-1 asks,
- a device-sync probe (tiny op + host fetch) — the tunnel constant every
  device-touching stage pays on this host and a locally-attached TPU-VM
  does not,
- the same queries pushed CONCURRENTLY through serve/batching.MicroBatcher
  at 16 and 64 in flight, where one embed forward + one scan serves the
  whole window.

Run: ``python -m rassengine_tpu.bench.e2e_anatomy [--docs N] [--queries N]``
→ markdown table + one JSON line.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import numpy as np


def run(n_docs: int = 4096, n_queries: int = 48, seed: int = 0,
        encoder: str = "") -> dict:
    """``encoder`` selects a weights dir (e.g. ``encoder_model_prod24``) so
    the anatomy measures the PRODUCTION serving default instead of the tiny
    encoder (VERDICT r4 next #2)."""
    import jax
    import jax.numpy as jnp

    from rassengine_tpu.core.config import EngineConfig
    from rassengine_tpu.core.tracing import METRICS
    from rassengine_tpu.engine import RassEngine
    from rassengine_tpu.serve.ask import AskService

    rng = np.random.default_rng(seed)
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    kw = dict(index_capacity=max(8192, n_docs), index_block_rows=2048,
              database_path=":memory:", llm_backend="echo",
              intent_model_path="/none", ner_model_path="/none",
              micro_batching=False)
    if encoder:
        kw.update(embed_dim=1024, embed_batch_size=64,
                  encoder_weights_path=encoder)
    else:
        kw.update(embed_dim=256, embed_batch_size=64)
    cfg = EngineConfig(**kw)
    from rassengine_tpu.models.bert import BertConfig

    engine = RassEngine(cfg, bert_cfg=None if encoder else BertConfig.tiny(),
                        use_pallas=on_tpu)
    # single-stream baseline: no batcher (its collect window would tax every
    # sequential ask); concurrent phases: window sized to the device-sync
    # constant — on a tunneled chip arrivals stagger by whole sync periods
    # (GIL + to_thread hops), so a 4 ms window catches ~2-3 requests while a
    # sync-scale window catches the whole burst
    service = AskService(engine)

    vocab = [f"term{i}" for i in range(2000)]
    conds = ["hypertension", "diabetes", "asthma", "bronchitis", "anemia"]
    docs = [{"doc_id": f"n{i}", "doc_type": "unstructured",
             "patientId": f"p{i % 64}",
             "unstructuredText": f"note {i} about {conds[i % 5]} "
             + " ".join(rng.choice(vocab, 16))}
            for i in range(n_docs)]
    t0 = time.perf_counter()
    # ingest into the ASKING user's tenant ("u" below) — a mismatched tenant
    # scans an empty index of the same capacity (identical device cost, so
    # earlier rounds' timings stand) but feeds empty hits to the RAG stages
    engine.ingest_docs("u", [], docs)
    ingest_s = time.perf_counter() - t0
    queries = [f"tell me about {conds[i % 5]} treatment {vocab[i % 1999]}"
               for i in range(n_queries)]

    # --- tunnel/device-sync probe -------------------------------------------
    x = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    np.asarray(f(x))  # warm
    syncs = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f(x))
        syncs.append(time.perf_counter() - t0)
    sync_ms = float(np.median(syncs) * 1e3)

    async def seq():
        # warm every compile first so the anatomy measures steady state
        await service.ask(queries[0], "u", "c0")
        METRICS.counters.clear()
        METRICS.latencies.clear()
        t0 = time.perf_counter()
        for i, q in enumerate(queries):
            await service.ask(q, "u", f"c{i % 4}")
        return (time.perf_counter() - t0) / len(queries)

    win_ms = max(8.0, 1.2 * sync_ms)
    b_cfg = cfg.replace(micro_batching=True, micro_batch_window_ms=win_ms,
                        micro_batch_max=64)
    engine.config = b_cfg
    batched_service = AskService(engine)

    def _mb_stat():
        st = METRICS.snapshot()["latency"].get("microbatch_size", {})
        return st.get("count", 0), st.get("mean_ms", 0.0)

    async def concurrent(n_inflight: int):
        # warm the BATCHED shapes too: the first window of each in-flight
        # level compiles batch-bucketed NLU/embed/scan programs (tens of
        # seconds through a tunneled compile); production serves warm
        await asyncio.gather(*[
            batched_service.ask(q, "u", f"w{j % 8}")
            for j, q in enumerate(queries[:n_inflight])])
        c0, m0 = _mb_stat()  # exclude warmup windows from the phase's mean
        t0 = time.perf_counter()
        done = 0
        while done < len(queries):
            grab = queries[done: done + n_inflight]
            await asyncio.gather(*[
                batched_service.ask(q, "u", f"b{j % 8}")
                for j, q in enumerate(grab)])
            done += len(grab)
        dt = (time.perf_counter() - t0) / len(queries)
        c1, m1 = _mb_stat()
        mean = ((m1 * c1 - m0 * c0) / max(1, c1 - c0)) / 1e3
        mb_means[n_inflight] = round(mean, 1)
        return dt

    per_q_seq = asyncio.run(seq())
    stages = METRICS.snapshot()["latency"]
    mb_means: dict = {}  # per-phase microbatch mean (warmup excluded)
    per_q_16 = asyncio.run(concurrent(16))
    per_q_64 = asyncio.run(concurrent(64))
    snap = METRICS.snapshot()

    stage_rows = sorted(
        ((name, st["p50_ms"], st["mean_ms"], st["count"])
         for name, st in stages.items()), key=lambda r: -r[2])
    accounted = sum(st["mean_ms"] * st["count"] for st in stages.values()) \
        / max(len(queries), 1)
    result = {
        "metric": "e2e_anatomy",
        "device_sync_probe_ms": round(sync_ms, 2),
        "sequential_ms_per_query": round(per_q_seq * 1e3, 2),
        "concurrent16_ms_per_query": round(per_q_16 * 1e3, 2),
        "concurrent64_ms_per_query": round(per_q_64 * 1e3, 2),
        "batched_speedup_vs_sequential": round(per_q_seq / min(per_q_16,
                                                               per_q_64), 2),
        "microbatch_window_ms": round(win_ms, 1),
        "stage_ms_accounted_per_query": round(accounted, 2),
        # per-phase means, warmup windows excluded — a single lifetime mean
        # mixed warmup bursts with both in-flight levels and supported no
        # per-level claim
        "microbatch_mean_size": mb_means,
        "ingest_docs_per_sec": round(n_docs / ingest_s, 1),
        "stages": {name: {"p50_ms": p50, "mean_ms": mean, "count": cnt}
                   for name, p50, mean, cnt in stage_rows},
    }
    lines = ["| stage | p50 ms | mean ms | calls |", "|---|---|---|---|"]
    for name, p50, mean, cnt in stage_rows:
        lines.append(f"| {name} | {p50} | {mean} | {cnt} |")
    result["table"] = "\n".join(lines)
    return result


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=4096)
    p.add_argument("--queries", type=int, default=48)
    p.add_argument("--encoder", default="",
                   help="weights dir for the production encoder")
    a = p.parse_args()
    r = run(a.docs, a.queries, encoder=a.encoder)
    print(r.pop("table"))
    print(json.dumps(r))


if __name__ == "__main__":
    main()
