"""Full benchmark suite — the five BASELINE.json configs, measured.

Run: ``python -m rassengine_tpu.bench.suite [--scale small|full] [--out BENCH.md]``

Configs (BASELINE.json):
1. 10k chunks, 1024-d, exact cosine top-5 — recall vs CPU NumPy oracle (parity gate)
2. 100k vectors — ANN-class recall@10 vs exact + build rate
3. 1M×1024-d hybrid — BM25 + ANN fusion QPS, single chip
4. int8-compressed large corpus + exact re-rank (+ sharded merge where chips exist)
5. end-to-end RAG: on-TPU encoder + retrieval + prompt build at batch 64

``--scale small`` shrinks row counts 16× for CI/CPU smoke runs; ``full`` is the
TPU measurement. Emits a markdown table and a JSON blob.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _chain_time(fn, q0, n_iter: int) -> float:
    """Slope-timed data-dependency chain with a real host-fetch sync.

    jax.block_until_ready does not reliably block on the axon tunnel platform,
    so the only trustworthy sync is a device→host copy; timing two chain
    lengths and taking the slope cancels the fetch constant.
    """

    def chain(n: int):
        q = q0
        s = None
        for _ in range(n):
            s, _i = fn(q)
            q = q0 + 1e-12 * s[:, :1]
        return np.asarray(s)

    chain(2)  # warm/compile
    n_small = max(3, n_iter // 8)
    t0 = time.perf_counter()
    chain(n_small)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain(n_iter + n_small)
    t_large = time.perf_counter() - t0
    return max(1e-9, (t_large - t_small) / n_iter)


def run_suite(scale: str = "small", seed: int = 0) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from rassengine_tpu.index.exact import exact_topk_direct
    from rassengine_tpu.index.ivf import IvfIndex
    from rassengine_tpu.index.quant import quantize_int8
    from rassengine_tpu.lexical.bm25 import LexicalIndex
    from rassengine_tpu.ops.fused_topk import fused_topk_int8_pooled, fused_topk_pooled

    f = 16 if scale == "small" else 1
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    results: list[dict] = []
    rng = np.random.default_rng(seed)

    def unit(n, d):
        v = rng.normal(size=(n, d)).astype(np.float32)
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    def clustered(n, d, n_clusters=128):
        """Mixture-of-gaussians corpus — the realistic regime for embedding
        vectors (pure gaussian noise is IVF's pathological worst case)."""
        centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
        assign = rng.integers(0, n_clusters, size=n)
        v = centers[assign] + 0.3 * rng.normal(size=(n, d)).astype(np.float32)
        return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)

    # --- config 1: 10k exact, oracle parity ----------------------------------
    n, d, k = 10_240 // 1, 1024 // (4 if scale == "small" else 1), 5
    v = unit(n, d)
    q = v[:64] + 0.01 * rng.normal(size=(64, d)).astype(np.float32)
    mask = jnp.zeros(n, jnp.float32)
    vd = jnp.asarray(v)
    qd = jnp.asarray(q)
    s, rows = exact_topk_direct(vd, qd, mask, k, precise=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    oracle_scores = (qn.astype(np.float64) @ v.T.astype(np.float64))
    kth = -np.sort(-oracle_scores, axis=1)[:, k - 1]
    # tie-aware recall: a returned row counts if its true score reaches the
    # oracle's k-th score (f32 matmul on MXU vs numpy differs at ~1e-6, which
    # flips genuine ties without being a retrieval error)
    rows_np = np.asarray(rows)
    hit = [
        np.mean(oracle_scores[b, rows_np[b]] >= kth[b] - 5e-4)
        for b in range(q.shape[0])
    ]
    rec = float(np.mean(hit))
    results.append({"config": "exact_10k_oracle", "metric": "recall@5",
                    "value": round(rec, 4), "target": 1.0})

    # --- config 2: 100k ANN recall + build rate ------------------------------
    n2 = 102_400 // f
    v2 = clustered(n2, d)
    t0 = time.perf_counter()
    nlist2 = max(16, n2 // 256)
    ivf = IvfIndex.build(v2, nlist=nlist2, iters=8, nprobe=8)
    build_s = time.perf_counter() - t0
    q2 = v2[:32] + 0.01 * rng.normal(size=(32, d)).astype(np.float32)
    want = np.argsort(-(q2 / np.linalg.norm(q2, axis=1, keepdims=True) @ v2.T),
                      axis=1)[:, :10]
    _s, got = ivf.search(v2, q2, 10, nprobe=max(8, nlist2 // 8))
    rec2 = np.mean([len(set(g) & set(w)) / 10 for g, w in zip(got, want)])
    results.append({"config": f"ivf_{n2 // 1000}k", "metric": "recall@10",
                    "value": round(float(rec2), 4),
                    "build_vecs_per_sec": round(n2 / build_s, 1)})

    # --- config 3: 1M hybrid QPS — ONE device dispatch (device BM25 + scan) ---
    from rassengine_tpu.lexical.device_bm25 import DeviceLexical, hybrid_topk_batch

    n3, b3 = 1_048_576 // f, 256
    v3 = unit(n3, d)
    lex = LexicalIndex()
    vocab = [f"term{i}" for i in range(2000)]
    for r in range(0, n3, max(1, n3 // 20_000)):  # sparse lexical corpus
        lex.index_doc(r, {"unstructuredText": " ".join(rng.choice(vocab, 12))})
    vd3 = jnp.asarray(v3, jnp.bfloat16)
    mask3 = jnp.zeros(n3, jnp.float32)
    q3 = jnp.asarray(unit(b3, d))
    dl = DeviceLexical(lex)
    queries3 = [" ".join(vocab[7 * i % 1996: 7 * i % 1996 + 4]) for i in range(b3)]
    gw = {"text": 1.5, "keyword": 1.0}
    chunk_ids, view, wvec = dl.plan(queries3, gw)
    ci3 = jnp.asarray(chunk_ids)
    scan_mode = "pallas" if on_tpu else ("xla_direct" if n3 <= 65536 else "xla_scan")

    def hybrid_fn(qq):
        return hybrid_topk_batch(vd3, mask3, qq, view.tables,
                                 ci3, wvec, 2.0, k, top_m_lex=64,
                                 scan_mode=scan_mode)

    dt_hyb = _chain_time(hybrid_fn, q3, 40 if on_tpu else 2)
    results.append({"config": f"hybrid_{n3 // 1000}k_b{b3}",
                    "metric": "qps_per_chip",
                    "value": round(b3 / dt_hyb, 1),
                    "ms_batch_one_dispatch": round(dt_hyb * 1e3, 3)})

    # --- config 3i: int8-SELECT + in-dispatch bf16 rescore hybrid -------------
    # Same one-dispatch hybrid, but the semantic top-m candidates come from
    # the block-scale int8 scan (all-integer epilogue, half the HBM read)
    # and are exactly re-scored from the bf16 rows inside the dispatch —
    # candidate selection is the only approximate stage, final ordering is
    # bf16-exact. Costs double residency (3 B/dim vs 2), buys scan speed.
    if on_tpu:
        from rassengine_tpu.index.quant import quantize_int8_block

        ci8, bi8 = quantize_int8_block(v3, 2048)
        cd3i = jnp.asarray(ci8)
        sd3i = jnp.asarray(np.repeat(bi8, 2048))
        bs3i = jnp.asarray(bi8)

        def hybrid_i8sel_fn(qq):
            return hybrid_topk_batch(vd3, mask3, qq, view.tables,
                                     ci3, wvec, 2.0, k, top_m_lex=64,
                                     scan_mode="pallas_int8",
                                     int8_tables=(cd3i, sd3i),
                                     int8_block_scales=bs3i)

        s3i, r3i = hybrid_i8sel_fn(q3)
        s3h, r3h = hybrid_fn(q3)
        agree_i = float(np.mean([len(set(a) & set(b)) / k for a, b in
                                 zip(np.asarray(r3i), np.asarray(r3h))]))
        dt_hi = _chain_time(hybrid_i8sel_fn, q3, 40)
        results.append({"config": f"hybrid_int8sel_{n3 // 1000}k_b{b3}",
                        "metric": "qps_per_chip",
                        "value": round(b3 / dt_hi, 1),
                        "ms_batch_one_dispatch": round(dt_hi * 1e3, 3),
                        "agreement_vs_bf16_hybrid@5": round(agree_i, 4)})
        del cd3i, sd3i

    # --- config 3s: sharded one-dispatch hybrid, per-shard cost (round 3) -----
    # One chip = one shard: the full hybrid (scan + BM25 + fusion) inside
    # shard_map + all-gather merge vs the plain dispatch — the per-shard cost
    # of meshed hybrid serving (multi-chip correctness is proven on the
    # virtual 8-device CPU mesh; per-shard throughput here).
    if on_tpu:
        from rassengine_tpu.core.meshes import shard_mesh as _shard_mesh
        from rassengine_tpu.parallel.topk_merge import sharded_hybrid_topk

        mesh1 = _shard_mesh(1)

        def hybrid_sh_fn(qq):
            return sharded_hybrid_topk(mesh1, vd3, mask3, qq, view.tables,
                                       ci3, wvec, 2.0, k, top_m_lex=64)

        s3s, r3s = hybrid_sh_fn(q3)
        s3p, r3p = hybrid_fn(q3)
        agree = float(np.mean([len(set(a) & set(b)) / k for a, b in
                               zip(np.asarray(r3s), np.asarray(r3p))]))
        dt_hs = _chain_time(hybrid_sh_fn, q3, 20)
        results.append({"config": f"sharded_hybrid_local_{n3 // 1000}k_b{b3}",
                        "metric": "qps_per_chip",
                        "value": round(b3 / dt_hs, 1),
                        "ms_batch_one_dispatch": round(dt_hs * 1e3, 3),
                        "plain_hybrid_qps": round(b3 / dt_hyb, 1),
                        "agreement_vs_plain@5": round(agree, 4),
                        "shard_map_overhead_pct":
                            round(100.0 * (dt_hs - dt_hyb) / dt_hyb, 1)})

        # int8-only sharded hybrid (vecs=None): the beyond-bf16-budget
        # meshed regime — every cosine from row-sharded int8 codes. Serving
        # parity: TenantIndex.device_columns_int8 serves BLOCK-scale codes
        # (all-integer epilogue), so the bench quantizes the same way
        from rassengine_tpu.index.quant import quantize_int8_block

        codes3s, bs3s = quantize_int8_block(v3, 2048)
        c3s = jnp.asarray(codes3s)
        sc3s = jnp.asarray(np.repeat(bs3s, 2048))
        bsd3s = jnp.asarray(bs3s)

        def hybrid_sh8_fn(qq):
            return sharded_hybrid_topk(mesh1, None, mask3, qq, view.tables,
                                       ci3, wvec, 2.0, k, top_m_lex=64,
                                       int8_tables=(c3s, sc3s),
                                       int8_block_scales=bsd3s,
                                       scale_block_rows=2048)

        s38, r38 = hybrid_sh8_fn(q3)
        agree8 = float(np.mean([len(set(a) & set(b)) / k for a, b in
                                zip(np.asarray(r38), np.asarray(r3p))]))
        dt_h8 = _chain_time(hybrid_sh8_fn, q3, 20)
        results.append({"config":
                        f"sharded_hybrid_int8only_{n3 // 1000}k_b{b3}",
                        "metric": "qps_per_chip",
                        "value": round(b3 / dt_h8, 1),
                        "ms_batch_one_dispatch": round(dt_h8 * 1e3, 3),
                        "agreement_vs_plain@5": round(agree8, 4)})
        del c3s, sc3s

    # --- config 3p: packed 4 B/posting lexical tables (ROADMAP r3) ------------
    # Same hybrid dispatch over the compressed CSR layout: half the postings
    # HBM + gather bandwidth; decode after the chunk gather on device.
    dlp = DeviceLexical(lex, packed=True)
    chunk_ids_p, view_p, wvec_p = dlp.plan(queries3, gw)
    ci3p = jnp.asarray(chunk_ids_p)

    def hybrid_packed_fn(qq):
        return hybrid_topk_batch(vd3, mask3, qq, view_p.tables,
                                 ci3p, wvec_p, 2.0, k, top_m_lex=64,
                                 scan_mode=scan_mode)

    dt_hp = _chain_time(hybrid_packed_fn, q3, 40 if on_tpu else 2)
    dense_mb = (np.asarray(view.rows2d).nbytes
                + np.asarray(view.contrib2d).nbytes) / 2**20
    packed_mb = (np.asarray(view_p.packed2d).nbytes
                 + np.asarray(view_p.base).nbytes
                 + np.asarray(view_p.step).nbytes) / 2**20
    results.append({"config": f"hybrid_packed_{n3 // 1000}k_b{b3}",
                    "metric": "qps_per_chip",
                    "value": round(b3 / dt_hp, 1),
                    "ms_batch_one_dispatch": round(dt_hp * 1e3, 3),
                    "postings_mb": round(packed_mb, 2),
                    "dense_postings_mb": round(dense_mb, 2)})

    # --- config 4: int8 + re-rank ---------------------------------------------
    codes, scales = quantize_int8(v3)
    cd = jnp.asarray(codes)
    sd = jnp.asarray(scales)
    if on_tpu:
        int8_fn = lambda qq: fused_topk_int8_pooled(cd, sd, qq, mask3, 4 * k, 2048)  # noqa: E731
    else:
        from rassengine_tpu.index.quant import int8_scan_topm

        int8_fn = lambda qq: int8_scan_topm(cd, sd, qq, mask3, 4 * k)  # noqa: E731
    dt_int8 = _chain_time(int8_fn, q3, 40 if on_tpu else 2)
    _s4, rows4 = int8_fn(q3)
    want4 = np.argsort(-(np.asarray(q3) @ v3.T), axis=1)[:, :k]
    got4 = np.asarray(rows4)
    rec4 = np.mean([len(set(g[: 4 * k]) & set(w)) / k
                    for g, w in zip(got4, want4)])
    results.append({"config": f"int8_{n3 // 1000}k_b{b3}",
                    "metric": "qps_per_chip",
                    "value": round(b3 / dt_int8, 1),
                    "candidate_recall@5": round(float(rec4), 4),
                    "ms_batch": round(dt_int8 * 1e3, 3)})

    # --- config 4b: int8 with per-BLOCK scales (all-integer epilogue) --------
    # quantize_int8_block shares one scale per 2048-row block, which lets the
    # Pallas kernel keep its whole selection epilogue in int32 (no per-element
    # astype/scale-mul) — this is what TenantIndex.device_columns_int8 serves.
    if on_tpu:
        from rassengine_tpu.index.quant import quantize_int8_block

        codes_b, bs_b = quantize_int8_block(v3, 2048)
        cdb = jnp.asarray(codes_b)
        sdb = jnp.asarray(np.repeat(bs_b, 2048))
        bsb = jnp.asarray(bs_b)
        int8b_fn = lambda qq: fused_topk_int8_pooled(  # noqa: E731
            cdb, sdb, qq, mask3, 4 * k, 2048, block_scales=bsb)
        dt_i8b = _chain_time(int8b_fn, q3, 40)
        _s4b, rows4b = int8b_fn(q3)
        got4b = np.asarray(rows4b)
        rec4b = np.mean([len(set(g[: 4 * k]) & set(w)) / k
                         for g, w in zip(got4b, want4)])
        results.append({"config": f"int8_blockscale_{n3 // 1000}k_b{b3}",
                        "metric": "qps_per_chip",
                        "value": round(b3 / dt_i8b, 1),
                        "candidate_recall@5": round(float(rec4b), 4),
                        "ms_batch": round(dt_i8b * 1e3, 3)})
        del codes_b, cdb, sdb

    # --- config 4h: int8-only one-dispatch hybrid (>bf16-budget regime) -------
    # 4M×1024-d: bf16 rows would be 8 GB > HYBRID_BF16_BUDGET (6 GB), so the
    # hybrid runs ENTIRELY from the 4 GB int8 codes — scan, lex-candidate
    # cosines, fusion — one dispatch (device_bm25.hybrid_topk_batch with
    # vecs=None). The alternative above the budget is per-query host
    # candidate-union fusion. TPU-only (the int8 scan is a Pallas kernel).
    if on_tpu and scale == "full":
        n4h = 4_194_304
        v4h = unit(n4h, d)
        # serving parity: block-scale codes, like device_columns_int8
        from rassengine_tpu.index.quant import quantize_int8_block

        c4h, bs4h = quantize_int8_block(v4h, 2048)
        cd4h = jnp.asarray(c4h)
        sd4h = jnp.asarray(np.repeat(bs4h, 2048))
        bsd4h = jnp.asarray(bs4h)
        mask4h = jnp.zeros(n4h, jnp.float32)
        lex4h = LexicalIndex()
        for r in range(0, n4h, max(1, n4h // 20_000)):
            lex4h.index_doc(r, {"unstructuredText":
                                " ".join(rng.choice(vocab, 12))})
        dl4h = DeviceLexical(lex4h)
        ci4h_raw, view4h, wvec4h = dl4h.plan(queries3, gw)
        ci4h = jnp.asarray(ci4h_raw)
        q4h = jnp.asarray(unit(b3, d))

        def hybrid_i8_fn(qq):
            return hybrid_topk_batch(None, mask4h, qq, view4h.tables,
                                     ci4h, wvec4h, 2.0, k, top_m_lex=64,
                                     scan_mode="pallas_int8",
                                     int8_tables=(cd4h, sd4h),
                                     int8_block_scales=bsd4h)

        dt_4h = _chain_time(hybrid_i8_fn, q4h, 20)
        results.append({"config": f"hybrid_int8only_{n4h // 1000}k_b{b3}",
                        "metric": "qps_per_chip",
                        "value": round(b3 / dt_4h, 1),
                        "ms_batch_one_dispatch": round(dt_4h * 1e3, 3),
                        "codes_gb": round(n4h * d / 2**30, 1)})
        del v4h, c4h, cd4h, sd4h, bsd4h, mask4h

    # --- config 4c: device IVF probe — single-query latency (VERDICT r2 #6) ---
    # The probe reads nprobe lists instead of the corpus; its win regime is
    # low batch, where the full scan still streams every row per dispatch.
    n5 = n3
    v5 = clustered(n5, d, n_clusters=max(64, n5 // 1024))
    nlist5 = max(16, n5 // 1024)
    ivf5 = IvfIndex.build(v5, nlist=nlist5, iters=8)
    vd5 = jnp.asarray(v5, jnp.bfloat16)
    mask5 = jnp.zeros(n5, jnp.float32)
    nprobe5 = max(8, nlist5 // 16)
    probe_fn = lambda qq: ivf5.probe_device(vd5, qq, mask5, k,  # noqa: E731
                                            nprobe=nprobe5)
    if on_tpu:
        exact5_fn = lambda qq: fused_topk_pooled(vd5, qq, mask5, k, 2048)  # noqa: E731
    else:
        exact5_fn = lambda qq: exact_topk_direct(vd5, qq, mask5, k)  # noqa: E731
    q5 = v5[rng.integers(0, n5, 32)] + 0.02 * rng.normal(size=(32, d)).astype(np.float32)
    q5 = jnp.asarray(q5 / np.linalg.norm(q5, axis=1, keepdims=True))
    _sp, got5 = probe_fn(q5)
    _se, want5 = exact5_fn(q5)
    got5, want5 = np.asarray(got5), np.asarray(want5)
    rec5 = float(np.mean([len(set(g) & set(w)) / k
                          for g, w in zip(got5, want5)]))
    q5_1 = q5[:1]
    it5 = 40 if on_tpu else 2
    dt_probe = _chain_time(probe_fn, q5_1, it5)
    dt_exact1 = _chain_time(exact5_fn, q5_1, it5)
    results.append({"config": f"ivf_probe_{n5 // 1000}k_b1",
                    "metric": "ms_single_query",
                    "value": round(dt_probe * 1e3, 3),
                    "full_scan_ms": round(dt_exact1 * 1e3, 3),
                    "speedup_vs_full_scan": round(dt_exact1 / dt_probe, 2),
                    "recall@5_vs_full_scan": round(rec5, 4),
                    "nprobe": nprobe5, "nlist": nlist5})

    # --- config 4c2: PQ4-source device IVF probe (ROADMAP r3) -----------------
    # Gather source = packed 4-bit codes, list structure = the PQ coarse
    # stage itself (IvfIndex.from_assignments — no extra k-means). The
    # single/low-batch path for corpora where even int8 codes bust HBM;
    # candidates are ADC-ranked (serving exact-re-ranks, tests/test_ann.py).
    from rassengine_tpu.index.pq4 import Pq4Index

    m_sub5 = Pq4Index.subvectors_for(d, 64)
    pq5 = Pq4Index.build(v5, m_sub=m_sub5)
    nprobe_pq = max(8, pq5.coarse.shape[0] // 16)
    ivfpq5 = IvfIndex.from_assignments(np.asarray(pq5.coarse),
                                       np.asarray(pq5.assign),
                                       nprobe=nprobe_pq)
    packed5 = jnp.asarray(pq5.packed)
    cb5 = jnp.asarray(pq5.codebooks)
    # serving gathers pq_oversample·k (128-512) ADC candidates then
    # exact-re-ranks (strategies._ivf_probe_pq); measure at the escalated
    # contract (512 — costs ~0.1 ms over 256, recovers hard-corpus recall)
    m_cand5 = 512
    ppq_fn = lambda qq: ivfpq5.probe_device_pq(  # noqa: E731
        packed5, cb5, qq, mask5, m_cand5, nprobe=nprobe_pq)
    _spq, gotpq = ppq_fn(q5)
    gotpq = np.asarray(gotpq)
    recpq = float(np.mean([len(set(g) & set(w)) / k
                           for g, w in zip(gotpq, want5)]))
    dt_ppq = _chain_time(ppq_fn, q5_1, it5)
    results.append({"config": f"ivf_probe_pq_{n5 // 1000}k_b1",
                    "metric": "ms_single_query",
                    "value": round(dt_ppq * 1e3, 3),
                    "speedup_vs_full_scan": round(dt_exact1 / dt_ppq, 2),
                    f"candidate_recall@5_in_{m_cand5}": round(recpq, 4),
                    "bytes_per_vec": int(pq5.packed.shape[1]) + 4,
                    "nprobe": nprobe_pq, "nlist": int(pq5.coarse.shape[0])})
    del pq5, packed5, cb5, ivfpq5
    del v5

    # --- config 4d: sharded local scan per-shard throughput (r2 #4) ----------
    # One chip = one shard: shard_map + Pallas local scan + all-gather merge
    # on a 1-device mesh measures the per-shard cost of the sharded serving
    # path against the plain single-chip kernel (multi-chip correctness is
    # proven on the virtual 8-device CPU mesh; per-shard throughput here).
    if on_tpu:
        from rassengine_tpu.core.meshes import shard_mesh
        from rassengine_tpu.parallel.topk_merge import sharded_topk

        mesh1 = shard_mesh(1)
        qb5 = jnp.asarray(unit(b3, d))
        sh_fn = lambda qq: sharded_topk(mesh1, vd5, mask5, qq, k)  # noqa: E731
        dt_sh = _chain_time(sh_fn, qb5, 20)
        dt_plain = _chain_time(exact5_fn, qb5, 20)
        results.append({"config": f"sharded_local_{n5 // 1000}k_b{b3}",
                        "metric": "qps_per_chip",
                        "value": round(b3 / dt_sh, 1),
                        "plain_kernel_qps": round(b3 / dt_plain, 1),
                        "shard_map_overhead_pct":
                            round(100.0 * (dt_sh - dt_plain) / dt_plain, 1)})
    del vd5, mask5, ivf5

    # --- config 4b: 16M×1024-d residual PQ4 — rows never touch HBM -------------
    # Corpus generated and encoded ON DEVICE (shipping 64 GB of f32 rows
    # through the axon tunnel would take hours; a real TPU-VM ingests over
    # PCIe). Candidate recall@5 is measured against an exact f32 oracle over
    # the same PRNG-regenerated blocks; the serving path's exact re-rank of
    # candidates is covered by tests/test_pq4.py.
    if scale == "full":
        from rassengine_tpu.index import pq4 as _pq4

        n6, b6, blk6 = 16_777_216, 256, 1 << 17
        # corpus: 65k clusters on a 64-d latent manifold projected to 1024-d.
        # Sentence-embedding corpora have intrinsic dimensionality ~10-100
        # (isotropic 1024-d gaussians are PQ's information-theoretic worst
        # case and match no real embedding model's output geometry).
        n_data_clusters, latent_d, nlist6, msub6 = 65_536, 64, 2048, 128
        key = jax.random.PRNGKey(7)
        centers_z = jax.random.normal(jax.random.fold_in(key, 999),
                                      (n_data_clusters, latent_d), jnp.float32)
        u_proj = jax.random.normal(jax.random.fold_in(key, 998),
                                   (latent_d, d), jnp.float32) / np.sqrt(latent_d)

        @jax.jit
        def _gen_block(i, centers, u):
            # centers as an ARGUMENT: closing over the [65k, 64] table bakes a
            # large constant into the HLO, which the axon remote-compile
            # endpoint rejects (HTTP 413)
            kb = jax.random.fold_in(key, i)
            a = jax.random.randint(kb, (blk6,), 0, n_data_clusters)
            z = centers[a] + 0.35 * jax.random.normal(
                jax.random.fold_in(kb, 1), (blk6, latent_d), jnp.float32)
            x = jnp.dot(z, u, preferred_element_type=jnp.float32)
            return x / jnp.linalg.norm(x, axis=1, keepdims=True)

        def gen_block(i):
            return _gen_block(i, centers_z, u_proj)

        # train coarse + residual codebooks on block 0
        x0 = gen_block(0)
        coarse = _pq4._kmeans_coarse(x0, x0[:nlist6], 6, nlist6)
        _a0, r0 = _pq4._assign_and_residual(x0, coarse)
        ds6 = d // msub6
        x_sub = r0.reshape(blk6, msub6, ds6).transpose(1, 0, 2)
        cent = _pq4._kmeans_all_subspaces(x_sub, x_sub[:, :16, :], 6)

        from rassengine_tpu.ops import fused_pq4 as _fpq

        @jax.jit
        def _encode_block6(i, centers, u):
            x = _gen_block(i, centers, u)
            a, r = _pq4._assign_and_residual(x, coarse)
            codes = _pq4._encode_block(r, cent)
            # split nibble layout (pq4.pack_codes): byte j = code[j] | code[h+j]<<4
            h = msub6 // 2
            packed = (codes[:, :h] | (codes[:, h:] << 4)).astype(jnp.uint8)
            aug = jnp.concatenate(
                [packed, (a & 0xFF)[:, None].astype(jnp.uint8),
                 ((a >> 8) & 0xFF)[:, None].astype(jnp.uint8)], axis=1)
            return aug, a, _pq4.decoded_residual_norms(codes, cent)

        nblocks6 = n6 // blk6
        t0 = time.perf_counter()
        parts = [_encode_block6(i, centers_z, u_proj) for i in range(nblocks6)]
        aug6 = jnp.concatenate([p for p, _a, _n in parts])
        assign6 = jnp.concatenate([a for _p, a, _n in parts])
        rnorm6 = jnp.concatenate([nn for _p, _a, nn in parts])
        np.asarray(assign6[:1])  # sync
        build_s6 = time.perf_counter() - t0
        del parts
        # cluster-sort for the fused kernel's windowed coarse path
        br6, win6 = 1024, 512
        order6, wins6 = _fpq.sort_for_window(np.asarray(assign6), br6,
                                             nlist6, win_width=win6)
        od6 = jnp.asarray(order6.astype(np.int32))
        aug6 = jnp.take(aug6, od6, axis=0)
        a_sorted6 = np.asarray(assign6)[order6]
        nb6 = n6 // br6
        win_lo6 = jnp.asarray(
            a_sorted6.reshape(nb6, br6).min(axis=1).astype(np.int32))
        block_resid6 = jnp.asarray(np.asarray(rnorm6)[order6].reshape(
            nb6, br6).max(axis=1).astype(np.float32))
        wd6 = jnp.asarray(wins6) if wins6 is not None else None

        q6 = np.asarray(gen_block(0)[:b6]) \
            + 0.02 * rng.normal(size=(b6, d)).astype(np.float32)
        q6 = (q6 / np.linalg.norm(q6, axis=1, keepdims=True)).astype(np.float32)
        q6d = jnp.asarray(q6)
        mask6 = jnp.zeros(n6, jnp.float32)
        m_cand = 512  # tie-recall@5 = 1.0 at 16M on this corpus (drive log)

        def pq_fn(qq):
            lq = _fpq.pq4_lutq(cent, coarse, qq, nlist6)
            if wd6 is not None:
                return _fpq.pq4_topk_fused(aug6, lq, mask6, m_cand,
                                           block_rows=br6, lut_dtype="int8",
                                           win_starts=wd6, win_width=win6,
                                           win_lo=win_lo6,
                                           block_resid=block_resid6)
            return _fpq.pq4_topk_fused(aug6, lq, mask6, m_cand,
                                       block_rows=br6, lut_dtype="int8")

        dt6 = _chain_time(pq_fn, q6d, 20)
        _s6, r6 = pq_fn(q6d)
        cand_sorted = np.asarray(r6)
        cand = np.where(cand_sorted >= 0,
                        order6[np.clip(cand_sorted, 0, n6 - 1)], -1)

        # exact oracle + candidate scores over regenerated blocks (on device)
        @jax.jit
        def oracle_block(i, centers, u, best_s):
            x = _gen_block(i, centers, u)
            s = jnp.dot(q6d, x.T, preferred_element_type=jnp.float32)
            top = jax.lax.top_k(jnp.concatenate([best_s, s], axis=1), k)[0]
            return top

        best = jnp.full((b6, k), -1e30, jnp.float32)
        for i in range(nblocks6):
            best = oracle_block(i, centers_z, u_proj, best)
        kth6 = np.asarray(best)[:, k - 1]

        @jax.jit
        def cand_scores_block(i, centers, u, rows, acc):
            x = _gen_block(i, centers, u)
            s = jnp.dot(q6d, x.T, preferred_element_type=jnp.float32)  # [B, blk]
            local = rows - i * blk6
            inside = (local >= 0) & (local < blk6)
            got = jnp.take_along_axis(s, jnp.clip(local, 0, blk6 - 1), axis=1)
            return jnp.where(inside, got, acc)

        rows6 = jnp.asarray(np.where(cand < 0, 0, cand))
        acc = jnp.full(cand.shape, -1e30, jnp.float32)
        for i in range(nblocks6):
            acc = cand_scores_block(i, centers_z, u_proj, rows6, acc)
        cand_exact = np.array(acc)  # copy: np.asarray of a jax array is RO
        cand_exact[cand < 0] = -1e30
        top5 = -np.sort(-cand_exact, axis=1)[:, :k]
        rec6 = float(np.mean(top5 >= (kth6[:, None] - 1e-3)))
        results.append({"config": f"pq4_{n6 // 10**6}M_b{b6}",
                        "metric": "qps_per_chip",
                        "value": round(b6 / dt6, 1),
                        "tie_recall@5_after_rerank": round(rec6, 4),
                        "bytes_per_vec": msub6 // 2 + 4,
                        "ms_batch": round(dt6 * 1e3, 2),
                        "encode_vecs_per_sec": round(n6 / build_s6, 0)})

    # --- config 5: end-to-end RAG ---------------------------------------------
    from rassengine_tpu.core.config import EngineConfig
    from rassengine_tpu.engine import RassEngine
    from rassengine_tpu.models.bert import BertConfig

    # on the chip at production dim, e2e_rag measures the SERVING DEFAULT
    # encoder (the shipped 24L checkpoint), not the tiny stand-in — VERDICT
    # r4 next #2: every e2e number must come from the model that serves
    import os as _os

    enc = ("./encoder_model_prod24"
           if on_tpu and d == 1024 and _os.path.isdir("./encoder_model_prod24")
           else "")
    cfg = EngineConfig(embed_dim=d, embed_batch_size=64, index_capacity=8192,
                       intent_model_path="/none", ner_model_path="/none",
                       encoder_weights_path=enc)
    eng = RassEngine(cfg, bert_cfg=None if enc else BertConfig.tiny(),
                     use_pallas=on_tpu)
    docs = [{"doc_id": f"n{i}", "doc_type": "unstructured",
             "patientId": f"p{i % 40}",
             "unstructuredText": f"note {i} " + " ".join(rng.choice(vocab, 24))}
            for i in range(2048 // f)]
    t0 = time.perf_counter()
    eng.ingest_docs("bench", [], docs)
    ingest_s = time.perf_counter() - t0
    queries = [f"{vocab[i]} {vocab[i+1]} treatment" for i in range(64)]
    eng.retrieve("bench", queries[0])  # warm compiles
    t0 = time.perf_counter()
    for qq in queries:
        eng.retrieve("bench", qq, top_k=3)
    e2e = (time.perf_counter() - t0) / len(queries)
    eng.retrieve_batch("bench", queries, top_k=3)  # warm the TIMED shapes
    t0 = time.perf_counter()
    eng.retrieve_batch("bench", queries, top_k=3)
    e2e_b = (time.perf_counter() - t0) / len(queries)
    results.append({"config": "e2e_rag_batch64", "metric": "queries_per_sec",
                    "value": round(1.0 / e2e_b, 1),
                    "ms_per_query_batched": round(e2e_b * 1e3, 2),
                    "ms_per_query_sequential": round(e2e * 1e3, 2),
                    "ingest_docs_per_sec": round(len(docs) / ingest_s, 1)})
    return results


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="small", choices=["small", "full"])
    p.add_argument("--out", default="")
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. cpu for smoke runs on a "
                        "TPU-attached host; JAX_PLATFORMS is not honored "
                        "when the axon plugin is installed)")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    results = run_suite(args.scale)
    lines = ["# BENCH — measured suite results", "",
             f"scale: {args.scale}", "",
             "| config | metric | value | extra |", "|---|---|---|---|"]
    for r in results:
        extra = {k: v for k, v in r.items() if k not in ("config", "metric", "value")}
        lines.append(f"| {r['config']} | {r['metric']} | {r['value']} | {extra} |")
    lines += [
        "",
        "Environment notes: single v5e chip behind the axon tunnel; the bench",
        "host has ONE CPU core, so host-side components are pessimistic —",
        "`hybrid` is bound by sequential per-query host BM25 (production TPU-VM",
        "hosts run the per-query lexical scans across ~100 cores in parallel,",
        "making the device scan the limit), and `e2e_rag` per-query latency is",
        "dominated by tunnel round-trips (~30 ms per device↔host sync) that do",
        "not exist on locally-attached TPUs.",
    ]
    text = "\n".join(lines) + "\n"
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
