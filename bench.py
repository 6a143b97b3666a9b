"""Headline benchmark: exact k-NN QPS/chip at 1M×1024-d, serving batch 256, k=5.

The scan is HBM-bandwidth-bound (the whole bf16 corpus is read once per
batch), so per-chip QPS scales with the serving batch until the MXU becomes
the limit (~B=512 at 1024-d). Batch 256 is the balanced point on v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); its retrieval engine is
OpenSearch's nmslib HNSW. The baseline constant below (5,000 QPS/chip-
equivalent) is a *generous* single-node OpenSearch HNSW throughput for
1M×1024-d float vectors at k=5 (nmslib/hnswlib ann-benchmarks-class numbers at
recall≈0.95, one big node) — the BASELINE.json target is ≥10× that at matched
recall. This bench runs the Pallas fused scan, which is EXACT (recall 1.0 by
construction, verified against the XLA path inline), so recall is matched
trivially.

Timing uses data-dependent chaining so dispatch can't overlap across
iterations, then one final host fetch.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_OPENSEARCH_QPS = 5000.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rassengine_tpu.index.exact import exact_topk_direct
    from rassengine_tpu.ops.fused_topk import fused_topk_pooled as fused_topk

    cap, d, b, k = 1_048_576, 1024, 256, 5
    block_rows = 2048

    key = jax.random.PRNGKey(0)
    vecs = jax.random.normal(key, (cap, d), jnp.bfloat16)
    vecs = (vecs.astype(jnp.float32)
            / jnp.linalg.norm(vecs.astype(jnp.float32), axis=1, keepdims=True)
            ).astype(jnp.bfloat16)
    queries = (vecs[:b].astype(jnp.float32)
               + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (b, d)))
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    mask = jnp.zeros((cap,), jnp.float32)
    jax.block_until_ready(vecs)

    # correctness gate: fused kernel vs XLA top-k on the same corpus
    s_f, i_f = fused_topk(vecs, queries, mask, k, block_rows)
    s_x, i_x = exact_topk_direct(vecs, queries, mask, k)
    i_f, i_x = np.asarray(i_f), np.asarray(i_x)
    overlap = np.mean([len(set(i_f[q]) & set(i_x[q])) / k for q in range(b)])
    if overlap < 0.99:
        print(json.dumps({"metric": "exact_knn_qps_per_chip", "value": 0.0,
                          "unit": "qps", "vs_baseline": 0.0,
                          "error": f"recall gate failed: {overlap:.3f}"}))
        sys.exit(1)

    # timed: chained batches (each depends on the previous result); slope of
    # two chain lengths with a real host-fetch sync (block_until_ready does
    # not reliably block on the axon tunnel platform)
    def chain(n):
        q = queries
        s = None
        for _ in range(n):
            s, i = fused_topk(vecs, q, mask, k, block_rows)
            q = queries + 1e-12 * s[:, :1]
        return np.asarray(s)

    chain(2)  # warm
    n_iter = 40
    t0 = time.perf_counter()
    chain(5)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain(n_iter + 5)
    t_large = time.perf_counter() - t0
    dt = (t_large - t_small) / n_iter
    qps = b / dt

    print(json.dumps({
        "metric": f"exact_knn_qps_per_chip_1Mx1024_b{b}_k5",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_OPENSEARCH_QPS, 2),
        "latency_ms_batch": round(dt * 1e3, 3),
        "recall_vs_exact": round(float(overlap), 4),
    }))


if __name__ == "__main__":
    main()
