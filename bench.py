"""Headline benchmark: HYBRID (BM25+ANN additive fusion) QPS/chip at
1M×1024-d, serving batch 256, k=5 — BASELINE.json's north-star config.

The whole batch runs as ONE device dispatch (lexical/device_bm25.py):
Pallas pooled corpus scan + chunked device BM25 postings + exact additive
fusion ``2·cos + 1.5·bm25_text + 1.0·bm25_keyword`` (the reference's
should-clause boosts, app/main.py:1562-1615). Correctness is gated inline:
recall@5 against an exact fused oracle (f32 corpus scan with the dense
host-BM25 additive vector) must be ≥ 0.99.

Two serving paths are measured — the bf16 corpus scan and the int8-only
hybrid (block-scale codes, half the HBM read, all-integer selection
epilogue) — each against the SAME oracle gate; the headline is the fastest
path that passes, with both paths' numbers reported in ``per_path``.

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

# headline config (module-level so smoke tests can shrink it)
CAP, DIM, BATCH, TOPK = 1_048_576, 1024, 256, 5


def sample_until_stable(reps, sample_round, floors, *, enforce_floor,
                        budget_s=600.0, now=time.perf_counter):
    """Keep adding interleaved timing rounds until the best path's min is
    both STABLE and SANE (or the budget expires). Returns per-path mins.

    Drift on this platform is one-sided — the tunnel only ever ADDS latency —
    so min-of-N converges to true device time from above. Two guards:

    1. stability: the best path's two smallest samples agree within 5%
       (observed: back-to-back runs 62.4k vs 54.5k when a 74%-spread round
       stopped at 4 reps);
    2. sanity: the best min is within 4x that path's static HBM-roofline
       floor (corpus bytes / 819 GB/s on v5e). A fresh-attach tunnel
       pathology was observed holding EVERY sample ~11x high for a full
       12-minute run — stable but wrong; agreement between drifted samples
       is not a measurement, so keep sampling until the regime passes or
       the budget expires (the caller reports sanity in its JSON line).

    On a locally-attached TPU both guards pass within the first rounds;
    only the drift-prone tunnel pays extra sampling.
    """
    t0 = now()
    while True:
        dts = {name: min(r) for name, r in reps.items()}
        best = min(dts, key=dts.get)
        s2 = sorted(reps[best])
        stable = s2[1] / s2[0] - 1.0 <= 0.05
        sane = (not enforce_floor) or dts[best] <= 4.0 * floors[best]
        if (stable and sane) or now() - t0 > budget_s:
            return dts
        for name in reps:
            reps[name].append(sample_round(name))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rassengine_tpu.lexical.bm25 import LexicalIndex
    from rassengine_tpu.lexical.device_bm25 import DeviceLexical, hybrid_topk_batch

    cap, d, b, k = CAP, DIM, BATCH, TOPK
    rng = np.random.default_rng(0)
    v = rng.normal(size=(cap, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    def upload_chunked(arr, dtype, rows=131072):
        # one multi-GB H2D transfer can wedge this image's tunnel relay;
        # ~256 MB slices transfer identically on real PCIe hosts
        parts = [jax.device_put(jnp.asarray(arr[i : i + rows], dtype))
                 for i in range(0, arr.shape[0], rows)]
        out = jnp.concatenate(parts, axis=0)
        out.block_until_ready()
        return out

    vd = upload_chunked(v, jnp.bfloat16)
    mask = jnp.zeros((cap,), jnp.float32)
    on_tpu = jax.default_backend() not in ("cpu",)

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

    # serving parity: strategies._hybrid_batch_device never overrides
    # top_m_lex, so the bench measures the same default (128) production
    # fuses; on CPU (smoke) the Pallas kernel has no lowering — pick the
    # XLA mode the serving path would
    scan = "pallas" if on_tpu else (
        "xla_direct" if cap <= 65536 else "xla_scan")

    def hybrid(qq, ci, vw, w):
        return hybrid_topk_batch(vd, mask, qq, vw.tables, ci, w,
                                 2.0, k, scan_mode=scan)

    # candidate fast path: the whole hybrid from block-scale int8 codes
    # (vecs=None — half the HBM read, all-integer selection epilogue). This
    # is the serving path for HYBRID_SELECT=int8only (strategies
    # ._hybrid_batch_device int8_only mode) — production-reachable at this
    # config by explicit opt-in. Used for the headline ONLY if it passes
    # the same oracle recall gate as the bf16 path below
    paths = {"bf16": hybrid}
    if on_tpu:
        from rassengine_tpu.index.quant import quantize_int8_block

        codes, bscales = quantize_int8_block(v, 2048)
        cd = upload_chunked(codes, codes.dtype)
        sd = jnp.asarray(np.repeat(bscales, 2048))
        bsd = jnp.asarray(bscales)

        def hybrid_int8(qq, ci, vw, w):
            return hybrid_topk_batch(None, mask, qq, vw.tables, ci, w,
                                     2.0, k, scan_mode="pallas_int8",
                                     int8_tables=(cd, sd),
                                     int8_block_scales=bsd)

        paths["int8"] = hybrid_int8

        # narrow-epilogue candidate: top_m_lex=32 halves the fuse gather +
        # join (hybrid_ablate full_M32: ~1.4 ms faster). A doc whose BM25
        # evidence ranks below the 32nd lexical candidate loses that term —
        # production-reachable via HYBRID_TOP_M_LEX=32, used for the
        # headline ONLY if it passes the same oracle gate
        def hybrid_int8_m32(qq, ci, vw, w):
            return hybrid_topk_batch(None, mask, qq, vw.tables, ci, w,
                                     2.0, k, top_m_lex=32,
                                     scan_mode="pallas_int8",
                                     int8_tables=(cd, sd),
                                     int8_block_scales=bsd)

        paths["int8_M32"] = hybrid_int8_m32

    # correctness gate: tie-aware recall@5 vs a host f32 fused oracle — a
    # returned row counts when its true fused score reaches the oracle's k-th
    # score within 5e-3 + 2e-3·|kth| (the corpus is stored bf16: each cosine
    # carries ~2e-3 quantization shift vs the f32 oracle, so near-ties inside
    # that band flip without being retrieval errors; same methodology as the
    # round-1 exact-scan gate, tolerance scaled to hybrid score magnitudes;
    # the int8 path must clear the same bar or it is not used)
    queries0, q0, ci0, view0, wv0 = batches[0]
    q0h = np.asarray(q0, np.float32)
    n_gate = min(64, b)  # 64x k = 320 rows: a single flipped row still
    oracle = []          # resolves (0.997), unlike a 16-query sample
    for i in range(n_gate):
        add = np.zeros(cap, np.float32)
        for g, w in GW.items():
            rows, vals = lex.score_sparse(queries0[i], cap, g)
            add[rows] += w * vals
        fused = 2.0 * (v @ q0h[i]) + add
        kth = np.partition(fused, -k)[-k]
        oracle.append((fused, kth, 5e-3 + 2e-3 * abs(float(kth))))

    def gate(fn):
        top_r = np.asarray(fn(q0, ci0, view0, wv0)[1])
        return float(np.mean([np.mean(f[top_r[i]] >= kth - tol)
                              for i, (f, kth, tol) in enumerate(oracle)]))

    recalls = {name: gate(fn) for name, fn in paths.items()}
    recall = recalls["bf16"]
    if recall < 0.99:
        print(json.dumps({"metric": "hybrid_qps_per_chip", "value": 0.0,
                          "unit": "qps", "vs_baseline": 0.0,
                          "error": f"recall gate failed: {recall:.3f}"}))
        sys.exit(1)

    def chain(fn, n, replan):
        qq = batches[0][1]
        s = None
        for it in range(n):
            if replan:
                queries, _q, _ci, _vw, _w = batches[it % 4]
                ci, vw, w = dl.plan(queries, GW)
                ci = jnp.asarray(ci)
            else:
                _qs, _q, ci, vw, w = batches[it % 4]
            s, _i = fn(qq, ci, vw, w)
            qq = batches[0][1] + 1e-12 * s[:, :1].astype(jnp.float32)
        return np.asarray(s)

    def slope(fn, replan, n_iter=40):
        chain(fn, 4, replan)  # warm all batch shapes
        ns = max(4, n_iter // 8)
        t0 = time.perf_counter()
        chain(fn, ns, replan)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        chain(fn, n_iter + ns, replan)
        t_l = time.perf_counter() - t0
        return (t_l - t_s) / n_iter

    # the tunnel's throughput drifts ±3 ms on MINUTE scales (BENCH.md hybrid-
    # ablation finding), so reps are INTERLEAVED round-robin across paths —
    # consecutive same-path reps would share one drift regime and bias both
    # the A/B and the headline (VERDICT r4 #3: the round-3/4 headline moved
    # ±17% run-to-run with per-path-sequential reps). Min-of-N tracks
    # steady-state device throughput (each slope already cancels the
    # dispatch constant); the spread across reps is reported so a drifty
    # capture is visible in the JSON line itself.
    N_REPS = 4
    reps: dict[str, list[float]] = {
        name: [] for name in paths if recalls[name] >= 0.99}
    for _ in range(N_REPS):
        for name in reps:
            reps[name].append(slope(paths[name], replan=False))
    hbm_bytes = {"bf16": 2 * cap * d, "int8": cap * d, "int8_M32": cap * d}
    floors = {name: hbm_bytes.get(name, cap * d) / 819e9 for name in reps}
    dts = sample_until_stable(
        reps, lambda name: slope(paths[name], replan=False), floors,
        enforce_floor=on_tpu)
    spreads = {name: (max(r) - min(r)) / min(r) for name, r in reps.items()}
    min_stable = {name: round(sorted(r)[1] / sorted(r)[0] - 1.0, 4)
                  for name, r in reps.items()}
    best = min(dts, key=dts.get)
    dt = dts[best]
    dt_up = slope(paths[best], replan=True)
    qps = b / dt

    mstr = f"{cap // 1048576}M" if cap % 1048576 == 0 else str(cap)
    print(json.dumps({
        "metric": f"hybrid_qps_per_chip_{mstr}x{d}_b{b}_k{k}",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_OPENSEARCH_QPS, 2),
        "latency_ms_batch": round(dt * 1e3, 3),
        "path": best,
        "serving_config": {
            "int8": "HYBRID_SELECT=int8only",
            "int8_M32": "HYBRID_SELECT=int8only HYBRID_TOP_M_LEX=32",
        }.get(best, "default"),
        "recall_vs_fused_oracle": round(recalls[best], 4),
        "per_path": {n_: {"ms": round(t_ * 1e3, 3),
                          "recall": round(recalls[n_], 4),
                          "rep_spread_pct": round(100 * spreads[n_], 1),
                          "min_gap_pct": round(100 * min_stable[n_], 1)}
                     for n_, t_ in dts.items()},
        "n_reps": len(next(iter(reps.values()))),
        # False means the capture never escaped a drifted-tunnel regime
        # (best min > 4x the static HBM floor) before the sampling budget
        # expired — the number is an environment artifact, not the kernel
        "sane_vs_hbm_floor": (not on_tpu) or dt <= 4.0 * floors[best],
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
