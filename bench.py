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


def corroborated_min(samples, floor, tol=0.05, need=3):
    """Smallest sample that (a) respects the physical floor and (b) is
    confirmed by ``need``-1 further samples within ``tol`` of it; None if
    no such cluster exists. Slope timing under tunnel drift errs in BOTH
    directions: a slow window during the short chain makes the slope read
    LOW (one 379-sample run captured 0.993 ms for a kernel whose HBM floor
    is 1.31 ms — physically impossible), so a bare min-of-N biases low as
    N grows. Sub-floor samples are artifacts by definition; a low cluster
    is only trusted at ``need`` agreeing samples — pairs were observed to
    false-corroborate ~20% low in heavy drift (two samples is agreement,
    three is a regime)."""
    valid = sorted(s for s in samples if s >= floor)
    for i in range(len(valid) - need + 1):
        if valid[i + need - 1] <= valid[i] * (1.0 + tol):
            return valid[i]
    return None


def sample_until_stable(reps, sample_round, floors, *, enforce_floor,
                        budget_s=600.0, max_rounds=20,
                        now=time.perf_counter):
    """Keep adding interleaved timing rounds until the best path has a
    CORROBORATED and SANE estimate (or budget/round cap expires). Returns
    {path: estimate}.

    estimate = corroborated_min (two floor-respecting samples within 5%);
    until a path corroborates, the median of its floor-respecting samples
    stands in (never a bare min — see corroborated_min on why min-of-N is
    unsafe under drift). Sanity: the best estimate must sit within 4x its
    static HBM-roofline floor (corpus bytes / 819 GB/s on v5e) — a
    fresh-attach tunnel pathology held EVERY sample ~11x high for 12
    minutes, stable-but-wrong, so agreement alone is not accepted while
    the floor test fails. The round cap bounds artifact exposure: more
    samples in a bad regime only raise the chance of two artifacts
    agreeing. On a locally-attached TPU everything converges within the
    first rounds; only the drift-prone tunnel pays extra sampling.
    """
    def estimate(name):
        fl = floors[name] if enforce_floor else 0.0
        cm = corroborated_min(reps[name], fl)
        if cm is not None:
            return cm, True
        valid = sorted(s for s in reps[name] if s >= fl) or sorted(reps[name])
        return valid[len(valid) // 2], False

    t0 = now()
    rounds = 0
    while True:
        ests = {name: estimate(name) for name in reps}
        dts = {name: e for name, (e, _c) in ests.items()}
        best = min(dts, key=dts.get)
        ok = ests[best][1] and (
            (not enforce_floor) or dts[best] <= 4.0 * floors[best])
        if ok or rounds >= max_rounds or now() - t0 > budget_s:
            return dts
        rounds += 1
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

    # each path is a spec (arrays + static widths) rather than a closure so
    # the chained timing program below can take the big arrays as jit
    # ARGUMENTS — a closed-over GB device array becomes an HLO constant and
    # ships inside the relay's remote-compile payload (BENCH.md: breaks the
    # pipe 100% of the time)
    specs = {"bf16": dict(vecs=vd, it=None, bs=None, w=128, m=64, mode=scan)}
    if on_tpu:
        from rassengine_tpu.index.quant import quantize_int8_block

        codes, bscales = quantize_int8_block(v, 2048)
        cd = upload_chunked(codes, codes.dtype)
        sd = jnp.asarray(np.repeat(bscales, 2048))
        bsd = jnp.asarray(bscales)

        # int8 fast path: the whole hybrid from block-scale int8 codes
        # (vecs=None — half the HBM read, all-integer selection epilogue),
        # the serving path for HYBRID_SELECT=int8only. Narrow-epilogue
        # variants (production-reachable via HYBRID_TOP_M_LEX /
        # HYBRID_SEM_M): a round-5 on-chip width sweep found the epilogue
        # cost is dominated by the candidate widths, not the join mode —
        # M=96 keeps the M=128 default's full 0.9969 oracle recall ~0.8 ms
        # /batch256 faster, and M=64/m=48 passes the 0.99 gate ~1.4 ms
        # faster still; M=32 (round-4 knob) drops to 0.966 on this corpus
        # and never serves the headline. A doc whose BM25 evidence ranks
        # below the M-th lexical candidate loses that term — hence the
        # per-corpus gate. Every path is used for the headline ONLY if it
        # passes the same oracle recall gate.
        def int8_spec(width, m):
            return dict(vecs=None, it=(cd, sd), bs=bsd, w=width, m=m,
                        mode="pallas_int8")

        specs["int8"] = int8_spec(128, 64)
        specs["int8_M96"] = int8_spec(96, 64)
        specs["int8_M64m48"] = int8_spec(64, 48)
        specs["int8_M32"] = int8_spec(32, 64)

    def single(sp):
        def fn(qq, ci, vw, w):
            return hybrid_topk_batch(sp["vecs"], mask, qq, vw.tables, ci, w,
                                     2.0, k, m=sp["m"], top_m_lex=sp["w"],
                                     scan_mode=sp["mode"],
                                     int8_tables=sp["it"],
                                     int8_block_scales=sp["bs"])
        return fn

    paths = {name: single(sp) for name, sp in specs.items()}

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

    # RPC amortization: K_INNER data-chained hybrids run inside ONE device
    # dispatch (lax.scan), so per-dispatch transport overhead — which on
    # this tunnel wobbles by whole milliseconds and otherwise reads as
    # kernel time for the shortest paths — divides by K_INNER. On a
    # locally-attached host this just shaves dispatch overhead. The big
    # arrays are jit ARGUMENTS via the path specs, never closures.
    K_INNER = 8
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("kk", "m", "top_m_lex", "scan_mode",
                                        "k_inner"))
    def chain_k(vecs, msk, qq, tables, ci, wvec, kk, m, top_m_lex,
                scan_mode, int8_tables, int8_block_scales, k_inner):
        def step(q, _):
            s, _i = hybrid_topk_batch(vecs, msk, q, tables, ci, wvec,
                                      2.0, kk, m=m, top_m_lex=top_m_lex,
                                      scan_mode=scan_mode,
                                      int8_tables=int8_tables,
                                      int8_block_scales=int8_block_scales)
            return qq + 1e-12 * s[:, :1].astype(jnp.float32), s[:, :1]
        _qf, ss = jax.lax.scan(step, qq, None, length=k_inner)
        return ss[-1]

    def chain(name, n, replan, k_inner=K_INNER):
        sp = specs[name]
        qq = batches[0][1]
        out = None
        for it in range(n):
            if replan:
                queries, _q, _ci, _vw, _w = batches[it % 4]
                ci, vw, w = dl.plan(queries, GW)
                ci = jnp.asarray(ci)
            else:
                _qs, _q, ci, vw, w = batches[it % 4]
            out = chain_k(sp["vecs"], mask, qq, vw.tables, ci, w, k,
                          sp["m"], sp["w"], sp["mode"], sp["it"], sp["bs"],
                          k_inner)
            qq = batches[0][1] + 1e-12 * out.astype(jnp.float32)
        return np.asarray(out)

    # n_iter sets the residual drift error per sample: the slope subtracts
    # two host-sync constants that each wobble ±tens of ms on this tunnel —
    # per-sample error ~ sync-delta / (n_iter * k_inner) kernels
    def slope(name, replan, n_iter=16, k_inner=K_INNER):
        chain(name, 4, replan, k_inner)  # warm all batch shapes
        ns = max(2, n_iter // 8)
        t0 = time.perf_counter()
        chain(name, ns, replan, k_inner)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        chain(name, n_iter + ns, replan, k_inner)
        t_l = time.perf_counter() - t0
        return (t_l - t_s) / (n_iter * k_inner)

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
            reps[name].append(slope(name, replan=False))
    hbm_bytes = {"bf16": 2 * cap * d}  # every int8 path reads cap*d codes
    floors = {name: hbm_bytes.get(name, cap * d) / 819e9 for name in reps}
    dts = sample_until_stable(
        reps, lambda name: slope(name, replan=False), floors,
        enforce_floor=on_tpu)
    corrob = {name: corroborated_min(
        reps[name], floors[name] if on_tpu else 0.0) is not None
        for name in reps}
    spreads = {name: (max(r) - min(r)) / min(r) for name, r in reps.items()}
    min_stable = {name: round(sorted(r)[1] / sorted(r)[0] - 1.0, 4)
                  for name, r in reps.items()}
    best = min(dts, key=dts.get)
    dt = dts[best]
    dt_up = slope(best, replan=True, k_inner=1)
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
            "int8_M96": "HYBRID_SELECT=int8only HYBRID_TOP_M_LEX=96",
            "int8_M64m48": "HYBRID_SELECT=int8only HYBRID_TOP_M_LEX=64 "
                           "HYBRID_SEM_M=48",
            "int8_M32": "HYBRID_SELECT=int8only HYBRID_TOP_M_LEX=32",
        }.get(best, "default"),
        "recall_vs_fused_oracle": round(recalls[best], 4),
        "per_path": {n_: {"ms": round(t_ * 1e3, 3),
                          "recall": round(recalls[n_], 4),
                          "corroborated": corrob[n_],
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
