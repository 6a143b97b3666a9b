"""Stage ablation of the one-dispatch hybrid (VERDICT r4 work item #4).

The pure int8 block-scale scan runs 1.88 ms/batch256 at 1M×1024 while the
int8-only hybrid dispatch runs ~3.98 ms (BENCH.md §Headline). This bench
isolates where the extra ~2.1 ms goes by timing nested prefixes of the same
dispatch on the same corpus/queries (suite config-3 shape):

- ``scan``      : fused int8 block-scale scan alone (the 1.88 ms floor)
- ``lex``       : sparse BM25 stage alone (chunk gather + sort + run-sum)
- ``scan_lex``  : both, no fusion epilogue
- ``full``      : the shipping hybrid_topk_batch (scan + lex + fuse)
- ``full_M32``  : fuse with top_m_lex=32 (halves the lex-candidate gather
                  and the [B, P, m] join width)
- ``full_m32``  : semantic oversample m=32 (halves the join + rescore width)

Differences between rows attribute cost to the stage added. Run on-chip via
tools/tpu_worker.py:

    from rassengine_tpu.bench.hybrid_ablate import run
    print(run(scale="full"))
"""

from __future__ import annotations

import json
import time

import numpy as np


def run(scale: str = "full", seed: int = 0, k: int = 5,
        use_tpu: bool = True) -> dict:
    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rassengine_tpu.bench.suite import _chain_time
    from rassengine_tpu.index.quant import quantize_int8, quantize_int8_block
    from rassengine_tpu.lexical.bm25 import LexicalIndex
    from rassengine_tpu.lexical.device_bm25 import (DeviceLexical,
                                                    _lex_scores_dispatch,
                                                    hybrid_topk_batch)
    from rassengine_tpu.ops.fused_topk import fused_topk_int8_pooled

    f = {"full": 1, "small": 16, "tiny": 128}[scale]
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    rng = np.random.default_rng(seed)
    n = 1_048_576 // f
    d = {"full": 1024, "small": 256, "tiny": 64}[scale]
    b = 256 if scale != "tiny" else 32

    v = rng.normal(size=(n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    lex = LexicalIndex()
    vocab = [f"term{i}" for i in range(2000)]
    for r in range(0, n, max(1, n // 20_000)):
        lex.index_doc(r, {"unstructuredText": " ".join(rng.choice(vocab, 12))})
    codes, scales = quantize_int8(v)
    codes_b, bscales = quantize_int8_block(v, 2048)
    cd = jnp.asarray(codes_b)
    sd = jnp.asarray(scales)
    bsd = jnp.asarray(bscales)
    mask = jnp.zeros(n, jnp.float32)
    q0 = rng.normal(size=(b, d)).astype(np.float32)
    q0 /= np.linalg.norm(q0, axis=1, keepdims=True)
    q0 = jnp.asarray(q0)
    dl = DeviceLexical(lex)
    queries = [" ".join(vocab[7 * i % 1996: 7 * i % 1996 + 4])
               for i in range(b)]
    chunk_ids, view, wvec = dl.plan(queries, {"text": 1.5, "keyword": 1.0})
    ci = jnp.asarray(chunk_ids)
    block_rows = min(2048, n)
    m = min(max(4 * k, 64), 128, n)
    res: dict = {"n": n, "d": d, "b": b, "k": k, "m": m,
                 "postings_cols": int(chunk_ids.shape[1]) * 128,
                 "on_tpu": on_tpu}
    it = 40 if on_tpu else 2

    import functools

    # off-TPU the Pallas kernel runs in interpret mode — correctness-only,
    # the timings that matter come from the chip
    interp = not on_tpu

    # CRITICAL: big device arrays must be jit ARGUMENTS, never closure
    # captures. A closed-over array embeds as an HLO constant, and on this
    # image the whole constant ships inside the relay's remote-compile HTTP
    # payload — a ~1 GB codes table breaks the pipe 100% of the time (three
    # broken runs before this was found). hybrid_topk_batch and
    # fused_topk_int8_pooled are themselves jitted with array params, so
    # plain-python wrappers cost nothing.

    @functools.partial(jax.jit, static_argnames=("kk",))
    def _scan(cd_, sd_, bsd_, mask_, qq, kk):
        qn = qq / jnp.maximum(jnp.linalg.norm(qq, axis=-1, keepdims=True),
                              1e-12)
        return fused_topk_int8_pooled(cd_, sd_, qn, mask_, kk, block_rows,
                                      block_scales=bsd_, interpret=interp)

    def scan_fn(qq):
        return _scan(cd, sd, bsd, mask, qq, m)

    @jax.jit
    def _lex(tables, ci_, wvec_, qq):
        rows, scores = _lex_scores_dispatch(tables, ci_, wvec_)
        s, pos = jax.lax.top_k(scores, k)
        # chain hook: tie the output to qq so _chain_time serializes
        return s + 0.0 * qq[:, :1], jnp.take_along_axis(rows, pos, axis=1)

    def lex_fn(qq):
        return _lex(view.tables, ci, wvec, qq)

    @functools.partial(jax.jit, static_argnames=("kk",))
    def _scan_lex(cd_, sd_, bsd_, mask_, tables, ci_, wvec_, qq, kk):
        qn = qq / jnp.maximum(jnp.linalg.norm(qq, axis=-1, keepdims=True),
                              1e-12)
        ss, sr = fused_topk_int8_pooled(cd_, sd_, qn, mask_, kk, block_rows,
                                        block_scales=bsd_, interpret=interp)
        rows, scores = _lex_scores_dispatch(tables, ci_, wvec_)
        ls, pos = jax.lax.top_k(scores, k)
        return ss[:, :k] + ls, sr[:, :k]

    def scan_lex_fn(qq):
        return _scan_lex(cd, sd, bsd, mask, view.tables, ci, wvec, qq, m)

    def full_fn(top_m_lex=128, mm=None, join="all"):
        # top_m_lex=128 = the production default (strategies passes
        # hybrid_topk_batch's default) — "full" must measure what serves
        def fn(qq):
            return hybrid_topk_batch(None, mask, qq, view.tables, ci, wvec,
                                     2.0, k, m=mm or m, top_m_lex=top_m_lex,
                                     block_rows=block_rows,
                                     scan_mode="pallas_int8",
                                     int8_tables=(cd, sd),
                                     int8_block_scales=bsd,
                                     interpret=interp,
                                     sem_bm_join=join)
        return fn

    stages = [("scan", scan_fn), ("lex", lex_fn), ("scan_lex", scan_lex_fn),
              ("full", full_fn()), ("full_M32", full_fn(top_m_lex=32)),
              ("full_m32", full_fn(mm=32)),
              ("full_J", full_fn(join="topm")),
              ("full_J_M32_m32", full_fn(top_m_lex=32, mm=32, join="topm"))]
    # tunnel throughput drifts on minute scales (a sequential pass measured
    # the SAME kernel 3× apart depending on when it ran), so interleave:
    # three round-robin reps per stage, keep the per-stage MIN
    best: dict = {}
    for rep in range(3 if on_tpu else 1):
        for name, fn in stages:
            for attempt in (0, 1):
                try:
                    dt = _chain_time(fn, q0, it)
                    break
                except Exception as exc:
                    print(f"stage {name} attempt {attempt} failed: "
                          f"{exc}", flush=True)
                    if attempt:
                        dt = float("nan")
                    else:
                        time.sleep(120)
            if dt == dt:
                best[name] = min(best.get(name, dt), dt)
            print(f"rep{rep} {name} {dt * 1e3:.3f} ms", flush=True)
    for name, _fn in stages:
        dt = best.get(name, float("nan"))
        res[name + "_ms"] = round(dt * 1e3, 3)
        res[name + "_qps"] = round(b / dt, 1) if dt == dt else -1.0

    # oracle gate for the full path (same tie-aware method as the suite);
    # a 64-query subset keeps the one-core host f64 matmul to ~1-2 min
    bo = min(64, b)
    qn = np.asarray(q0, np.float64)[:bo]
    lex_rows, lex_scores = (np.asarray(x)[:bo] for x in
                            _lex_scores_dispatch(view.tables, ci, wvec))
    cos = qn @ v.T.astype(np.float64)
    fused = 2.0 * cos
    for bi in range(bo):
        ok = lex_scores[bi] > -1e30
        np.add.at(fused[bi], lex_rows[bi][ok].clip(0, n - 1),
                  lex_scores[bi][ok])
    kth = -np.sort(-fused, axis=1)[:, k - 1]

    def recall_of(fn) -> float:
        rn = np.asarray(fn(q0)[1])[:bo]
        return float(np.mean([
            np.mean(fused[bi, rn[bi]] >= kth[bi] - 2e-2) for bi in range(bo)]))

    res["full_recall_vs_f32_oracle"] = round(recall_of(full_fn()), 4)
    res["full_J_recall"] = round(recall_of(full_fn(join="topm")), 4)
    res["full_J_M32_m32_recall"] = round(
        recall_of(full_fn(top_m_lex=32, mm=32, join="topm")), 4)

    # --- recall-loss attribution (VERDICT r4 weak #5) -----------------------
    # This corpus is ADVERSARIAL for the semantic half: queries are pure
    # random (every cosine ~N(0, 1/sqrt(d)) — near-ties everywhere), unlike
    # the headline corpus whose queries sit 0.995-close to their gold row.
    # Attribute any sub-0.99 recall to a stage: the bf16 scan path (no int8
    # quantization), a wider semantic oversample, and the int8 scan measured
    # alone against the exact-cosine oracle.
    scan_xla = "pallas" if on_tpu else (
        "xla_direct" if n <= 65536 else "xla_scan")
    vd = jnp.asarray(v, jnp.bfloat16)

    def full_bf16(qq):
        return hybrid_topk_batch(vd, mask, qq, view.tables, ci, wvec,
                                 2.0, k, m=m, block_rows=block_rows,
                                 scan_mode=scan_xla, interpret=interp)

    res["full_bf16_recall"] = round(recall_of(full_bf16), 4)
    res["full_m128_recall"] = round(recall_of(full_fn(mm=min(128, n))), 4)
    res["full_M256_m128_recall"] = round(
        recall_of(full_fn(top_m_lex=256, mm=min(128, n))), 4)
    # int8 scan alone vs the exact cosine top-k (same tie tolerance scale)
    sr = np.asarray(scan_fn(q0)[1])[:bo]
    kth_sem = -np.sort(-cos, axis=1)[:, k - 1]
    res["scan_sem_recall"] = round(float(np.mean(
        [np.mean(cos[bi, sr[bi, :k]] >= kth_sem[bi] - 2e-2 / 2.0)
         for bi in range(bo)])), 4)
    res["fuse_cost_ms"] = round(res["full_ms"] - res["scan_lex_ms"], 3)
    res["lex_cost_ms"] = round(res["scan_lex_ms"] - res["scan_ms"], 3)
    return res


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="small")
    p.add_argument("--tpu", action="store_true",
                   help="attach the real chip (default: CPU interpret — "
                        "chip runs go through tools/tpu_worker.py)")
    a = p.parse_args()
    t0 = time.time()
    out = run(a.scale, use_tpu=a.tpu)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out, indent=2))
