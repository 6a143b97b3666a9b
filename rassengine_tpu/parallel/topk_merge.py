"""Multi-chip sharded index scan: per-chip top-k + all-gather merge over ICI.

The distributed equivalent of OpenSearch's shard fan-out/merge (reference
SHARD_COUNT main.py:89, _routing main.py:1230): index rows are partitioned
across the ``shard`` mesh axis, every chip scans its partition with the same
fused matmul+top-k used single-chip, and the per-chip k-lists are merged with
one ``all_gather`` (k·B floats per chip — the merge traffic is tiny, so ICI
cost is negligible vs the scan itself).

Patient routing becomes shard metadata: a patient-routed query can address the
single shard owning that patient's rows (host-side routing table), matching
OpenSearch's ``_routing`` fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rassengine_tpu.index.store import NEG_INF


def to_host(x) -> "np.ndarray":
    """Replicated device array → host numpy, multi-host-safe.

    In multi-process (DCN) mode a replicated output spans processes and is
    not fully addressable, so ``np.asarray`` raises; every process holds an
    identical copy on its own devices — read that one.
    """
    import numpy as np

    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)


def _batch_spec(mesh: Mesh) -> P:
    """Query-batch partition spec: split over ``replica`` when the mesh has
    one (core.meshes.replica_shard_mesh), replicated otherwise. Row-sharded
    data keeps P("shard") either way — unmentioned mesh axes replicate, so
    each replica group holds a full copy of the sharded corpus."""
    return P("replica") if "replica" in mesh.axis_names else P()


def _pad_to_replicas(mesh: Mesh, *batched):
    """Pad dim 0 of each array to a multiple of the replica count.

    shard_map needs the batch to split evenly over ``replica``; pad queries
    score garbage that the caller slices off. → (padded arrays, orig_B)."""
    r = dict(mesh.shape).get("replica", 1)
    b = batched[0].shape[0]
    pad = (-b) % r
    if pad == 0:
        return batched, b
    out = tuple(jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]) for x in batched)
    return out, b


def _pick_block_rows(local_rows: int, cap_br: int = 2048) -> int | None:
    """Largest power-of-two block size ≤ cap_br dividing the local partition."""
    br = cap_br
    while br >= 128:
        if local_rows % br == 0:
            return br
        br //= 2
    return None


def _use_pallas_local(k: int, local_rows: int,
                      candidate_grade: bool = False) -> bool:
    """Whether the per-shard scan can run the fused Pallas kernel (VERDICT
    r2 #4: sharded serving previously always fell back to jnp.dot+top_k,
    materializing the full [B, local_rows] score matrix per shard).

    The pooled kernel keeps the best 2 rows per 128-lane class, so it is
    statistically lossy as k grows (expected losses ~C(k,3)/128², see
    ops/fused_topk.py). For the EXACT public contract the auto-detect
    stops at k=64; candidate-generation callers that exact-re-rank
    afterwards (strategies._sharded_top_m) opt into the full pool width.
    """
    k_bound = 256 if candidate_grade else 64
    return (jax.default_backend() != "cpu" and k <= k_bound
            and _pick_block_rows(local_rows) is not None
            and local_rows >= 256)


def _local_scan(vecs, mask, queries, k: int):
    """One chip's exact scan over its row partition (bf16 matmul, f32 accum)."""
    q = queries.astype(jnp.float32)
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = (q / jnp.maximum(norm, 1e-12)).astype(jnp.bfloat16)
    scores = jnp.dot(q, vecs.astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32)
    scores = scores + mask[None, :]
    return jax.lax.top_k(scores, k)


def _local_scan_pallas(vecs, mask, queries, k: int, block_rows: int,
                       interpret: bool):
    """Per-shard fused Pallas scan (ops/fused_topk pool kernel): the [B,
    local_rows] score matrix never leaves VMEM, matching single-chip perf."""
    from rassengine_tpu.index.exact import l2_normalize
    from rassengine_tpu.ops.fused_topk import fused_topk_pooled

    qn = l2_normalize(queries.astype(jnp.float32))
    return fused_topk_pooled(vecs, qn, mask, k, block_rows,
                             interpret=interpret)


@functools.lru_cache(maxsize=64)
def _sharded_topk_fn(mesh: Mesh, k: int, local_rows: int, use_pallas: bool,
                     interpret: bool):
    """Cached shard_map program — rebuilding it per call re-traces every
    query (seconds through a remote-compile link); jax's own cache then
    handles shape specialization within the cached callable."""

    def fn(v, m, q):
        if use_pallas:
            s, i = _local_scan_pallas(v, m, q, k,
                                      _pick_block_rows(local_rows), interpret)
        else:
            s, i = _local_scan(v, m, q, k)
        i = i + jax.lax.axis_index("shard") * local_rows
        # [B, n_shards*k] on every chip after one ICI all-gather
        all_s = jax.lax.all_gather(s, "shard", axis=1, tiled=True)
        all_i = jax.lax.all_gather(i, "shard", axis=1, tiled=True)
        top_s, pos = jax.lax.top_k(all_s, k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
        return top_s, top_i

    qs = _batch_spec(mesh)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("shard"), P("shard"), qs),
        out_specs=(qs, qs),
        check_vma=False,  # outputs are replicated by the all_gather+top_k,
                          # which the varying-manual-axes checker can't infer
    ))


def sharded_topk(mesh: Mesh, vecs, mask, queries, k: int,
                 use_pallas: bool | None = None, interpret: bool = False,
                 candidate_grade: bool = False):
    """Row-sharded exact top-k with all-gather merge.

    vecs [cap, d] sharded on rows over ``shard``; mask [cap] likewise;
    queries [B, d] replicated → (scores [B, k], global row ids [B, k]),
    replicated on every chip; filter-masked slots return row -1. The local
    scan runs the fused Pallas kernel on TPU (``use_pallas=None`` →
    auto-detect), the XLA scan elsewhere. The pooled kernel is engaged only
    up to k=64 by default (beyond that its lane-class pool is statistically
    lossy); ``candidate_grade=True`` extends it to k≤256 for callers that
    exact-re-rank the returned candidates.
    """
    n_shards = mesh.shape["shard"]
    cap = vecs.shape[0]
    assert cap % n_shards == 0, (cap, n_shards)
    local = cap // n_shards
    if use_pallas is None:
        use_pallas = _use_pallas_local(k, local, candidate_grade)
    (queries,), b = _pad_to_replicas(mesh, queries)
    s, i = _sharded_topk_fn(mesh, k, local, use_pallas,
                            interpret)(vecs, mask, queries)
    return s[:b], i[:b]


def _block_scales_ok(use_pallas: bool, block_scales, local_rows: int,
                     scale_block_rows: int) -> bool:
    """Whether a shard can run the all-integer int8 epilogue: every shard
    must hold WHOLE quantization blocks (the kernel then walks blocks at the
    quantization granularity, so each kernel block has exactly one scale)."""
    return (use_pallas and block_scales is not None
            and 0 < scale_block_rows <= 2048
            and scale_block_rows % 128 == 0
            and local_rows % scale_block_rows == 0)


@functools.lru_cache(maxsize=64)
def _sharded_topk_int8_fn(mesh: Mesh, k: int, local_rows: int, use_int8: bool,
                          use_pallas: bool, interpret: bool,
                          scale_block_rows: int = 0):
    def fn(c, sc, m, q, *bs):
        if use_pallas:
            from rassengine_tpu.ops.fused_topk import fused_topk_int8_pooled

            br = scale_block_rows if bs else _pick_block_rows(local_rows)
            s_top, i = fused_topk_int8_pooled(
                c, sc, q, m, k, br,
                interpret=interpret, block_scales=bs[0] if bs else None)
        else:
            qf = q.astype(jnp.float32)
            qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True),
                                  1e-12)
            qs = jnp.max(jnp.abs(qn), axis=1, keepdims=True) / 127.0
            qc = jnp.clip(jnp.round(qn / jnp.maximum(qs, 1e-12)), -127, 127)
            if use_int8:
                acc = jax.lax.dot_general(
                    qc.astype(jnp.int8), c,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:
                acc = jnp.dot(qc, c.astype(jnp.float32).T)
            s = acc * qs * sc[None, :] + m[None, :]
            s_top, i = jax.lax.top_k(s, k)
        i = i + jax.lax.axis_index("shard") * local_rows
        all_s = jax.lax.all_gather(s_top, "shard", axis=1, tiled=True)
        all_i = jax.lax.all_gather(i, "shard", axis=1, tiled=True)
        top_s, pos = jax.lax.top_k(all_s, k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
        return top_s, top_i

    qs = _batch_spec(mesh)
    in_specs = (P("shard"), P("shard"), P("shard"), qs)
    if scale_block_rows:
        in_specs += (P("shard"),)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=(qs, qs),
        check_vma=False,
    ))


def sharded_topk_int8(mesh: Mesh, codes, scales, mask, queries, k: int,
                      use_pallas: bool | None = None,
                      interpret: bool = False, block_scales=None,
                      scale_block_rows: int = 2048):
    """Row-sharded int8 scan with all-gather merge (the beyond-bf16 sharded
    tier: 8×~13M×1024-d per v5e-8 slice at int8 residency).

    codes [cap, d] int8 + scales [cap] f32 sharded on rows; queries [B, d]
    replicated → (approx scores [B, k], global rows [B, k]) replicated.
    Pair with exact re-rank from the host-canonical rows (the int8 single-chip
    path does the same). The local scan runs the fused Pallas int8 kernel on
    TPU (``use_pallas=None`` → auto-detect).
    """
    n_shards = mesh.shape["shard"]
    cap = codes.shape[0]
    assert cap % n_shards == 0, (cap, n_shards)
    local = cap // n_shards
    # CPU (tests) has no int8 dot; TPU wants int8 MXU inputs
    use_int8 = jax.default_backend() != "cpu"
    if use_pallas is None:
        # int8 scores are approximate by contract and every serving caller
        # exact-re-ranks, so the pooled kernel's candidate-grade k bound is
        # the right auto-detect here
        use_pallas = _use_pallas_local(k, local, candidate_grade=True)
    (queries,), b = _pad_to_replicas(mesh, queries)
    if _block_scales_ok(use_pallas, block_scales, local, scale_block_rows):
        fn = _sharded_topk_int8_fn(mesh, k, local, use_int8, use_pallas,
                                   interpret, scale_block_rows)
        s, i = fn(codes, scales, mask, queries, block_scales)
    else:
        s, i = _sharded_topk_int8_fn(mesh, k, local, use_int8, use_pallas,
                                     interpret)(codes, scales, mask, queries)
    return s[:b], i[:b]


@functools.lru_cache(maxsize=64)
def _sharded_topk_pq4_fn(mesh: Mesh, m: int, local_rows: int,
                         block_rows: int, win_width: int, lut_dtype: str,
                         interpret: bool):
    from rassengine_tpu.ops.fused_pq4 import pq4_topk_fused

    def fn(aug, wins, msk, lutq):
        s, i = pq4_topk_fused(aug, lutq, msk, m, block_rows=block_rows,
                              lut_dtype=lut_dtype, win_starts=wins,
                              win_width=win_width, interpret=interpret)
        # positions are LOCAL sorted positions; lift to global sorted order
        i = jnp.where(i >= 0, i + jax.lax.axis_index("shard") * local_rows, -1)
        all_s = jax.lax.all_gather(s, "shard", axis=1, tiled=True)
        all_i = jax.lax.all_gather(i, "shard", axis=1, tiled=True)
        kk = min(m, all_s.shape[-1])
        top_s, pos = jax.lax.top_k(all_s, kk)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
        return top_s, top_i

    qs = _batch_spec(mesh)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("shard"), P("shard"), P("shard"), qs),
        out_specs=(qs, qs),
        check_vma=False,
    ))


def sharded_topk_pq4(mesh: Mesh, aug_sorted, win_starts, mask_sorted, lutq,
                     m: int, block_rows: int, win_width: int,
                     lut_dtype: str = "int8", interpret: bool = False):
    """Row-sharded fused PQ4 ADC scan + all-gather merge — the >HBM sharded
    tier (VERDICT r2 #4/missing #4: sharded corpora past 8× the int8 budget
    previously had no serving path).

    aug_sorted [cap, h+2] uint8 (per-REGION cluster-sorted so the row-shard
    partitioning is preserved), win_starts [cap/block_rows] int32 (per-region
    window starts; pass a zeros array + win_width=0 for the full-width
    coarse path), mask_sorted [cap] f32 in sorted order — all row-sharded;
    lutq [B, D] replicated (ops/fused_pq4.pq4_lutq) → (scores [B, ≤m],
    GLOBAL SORTED positions [B, ≤m]) replicated; map positions back through
    the store's sort permutation.
    """
    n_shards = mesh.shape["shard"]
    cap = aug_sorted.shape[0]
    assert cap % n_shards == 0, (cap, n_shards)
    local = cap // n_shards
    assert local % block_rows == 0, (local, block_rows)
    (lutq,), b = _pad_to_replicas(mesh, lutq)
    s, i = _sharded_topk_pq4_fn(mesh, m, local, block_rows, win_width,
                                lut_dtype, interpret)(
        aug_sorted, win_starts, mask_sorted, lutq)
    return s[:b], i[:b]


def _local_scan_int8(codes, scales, mask, qn, k: int, use_pallas: bool,
                     use_int8_dot: bool, local_rows: int, interpret: bool,
                     block_scales=None, scale_block_rows: int = 0):
    """One chip's int8 scan over its row partition (scores ≈ cosine + mask,
    ~0.5% bounded quantization noise — the vecs=None hybrid regime)."""
    if use_pallas:
        from rassengine_tpu.ops.fused_topk import fused_topk_int8_pooled

        br = (scale_block_rows if block_scales is not None
              else _pick_block_rows(local_rows))
        return fused_topk_int8_pooled(codes, scales, qn, mask, k, br,
                                      interpret=interpret,
                                      block_scales=block_scales)
    qs = jnp.max(jnp.abs(qn), axis=1, keepdims=True) / 127.0
    qc = jnp.clip(jnp.round(qn / jnp.maximum(qs, 1e-12)), -127, 127)
    if use_int8_dot:
        acc = jax.lax.dot_general(
            qc.astype(jnp.int8), codes,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    else:  # CPU tests: no int8 dot lowering
        acc = jnp.dot(qc, codes.astype(jnp.float32).T)
    s = acc * qs * scales[None, :] + mask[None, :]
    return jax.lax.top_k(s, k)


@functools.lru_cache(maxsize=64)
def _sharded_hybrid_fn(mesh: Mesh, k: int, m: int, top_m_lex: int,
                       local_rows: int, use_pallas: bool, n_tables: int,
                       sem_weight: float, interpret: bool,
                       int8: bool = False, scale_block_rows: int = 0,
                       sem_bm_join: str = "all"):
    from rassengine_tpu.index.exact import l2_normalize
    from rassengine_tpu.lexical.device_bm25 import (_fuse_body,
                                                    _lex_scores_dispatch)

    use_int8_dot = jax.default_backend() != "cpu"

    def fn(*args):
        bsl, v = None, None
        if int8 == "select":
            # int8 SELECT + bf16 re-score: both forms row-sharded; the int8
            # scan picks top-m per shard, the shard's own bf16 rows re-score
            # them exactly (mirrors hybrid_topk_batch's vecs-present mode)
            if scale_block_rows:
                v, codes, scales, bsl, msk, q, chunk_ids = args[:7]
                rest = args[7:]
            else:
                v, codes, scales, msk, q, chunk_ids = args[:6]
                rest = args[6:]
            vec_source = (v,)
        elif int8 and scale_block_rows:
            codes, scales, bsl, msk, q, chunk_ids = args[:6]
            rest = args[6:]
            vec_source = (codes, scales)
        elif int8:
            codes, scales, msk, q, chunk_ids = args[:5]
            rest = args[5:]
            vec_source = (codes, scales)
        else:
            v, msk, q, chunk_ids = args[:4]
            rest = args[4:]
            vec_source = (v,)
        tables, wvec = rest[:n_tables], rest[n_tables]
        qn = l2_normalize(q.astype(jnp.float32))
        if int8:
            sem_s, sem_r = _local_scan_int8(codes, scales, msk, qn, m,
                                            use_pallas, use_int8_dot,
                                            local_rows, interpret,
                                            block_scales=bsl,
                                            scale_block_rows=scale_block_rows)
            if int8 == "select":
                from rassengine_tpu.lexical.device_bm25 import _gather_cos

                safe = jnp.where((sem_r >= 0) & (sem_r < local_rows),
                                 sem_r, 0)
                cos = _gather_cos((v,), safe, qn)
                ok = (sem_r >= 0) & (sem_s > NEG_INF / 2)
                sem_s = jnp.where(ok, cos + msk[safe], NEG_INF)
        elif use_pallas:
            sem_s, sem_r = _local_scan_pallas(
                v, msk, qn, m, _pick_block_rows(local_rows), interpret)
        else:
            sem_s, sem_r = _local_scan(v, msk, qn, m)
        # the sparse BM25 stage runs on replicated postings, identically on
        # every shard; each shard keeps only the candidates it OWNS (row in
        # its partition), so the fusion's row gather stays shard-local and
        # per-shard coverage (lex top-M per shard) is a superset of the
        # single-chip global top-M
        lex_rows, lex_scores = _lex_scores_dispatch(tables, chunk_ids, wvec)
        off = jax.lax.axis_index("shard") * local_rows
        ll = lex_rows - off
        mine = (ll >= 0) & (ll < local_rows)
        ll = jnp.where(mine, ll, local_rows)   # >= cap → dropped by _fuse_body
        lex_s = jnp.where(mine, lex_scores, NEG_INF)
        # "topm" joins per-shard: each shard's lex top-M is over the
        # candidates it owns, a superset of the global top-M's coverage
        s, r = _fuse_body(vec_source, msk, qn, ll, lex_s, sem_r, sem_s,
                          jnp.float32(sem_weight), k=k, top_m_lex=top_m_lex,
                          sem_bm_join=sem_bm_join)
        r = jnp.where((r >= 0) & (s > NEG_INF / 2), r + off, -1)
        all_s = jax.lax.all_gather(s, "shard", axis=1, tiled=True)
        all_r = jax.lax.all_gather(r, "shard", axis=1, tiled=True)
        top_s, pos = jax.lax.top_k(all_s, k)
        top_r = jnp.take_along_axis(all_r, pos, axis=1)
        return top_s, jnp.where(top_s > NEG_INF / 2, top_r, -1)

    qs = _batch_spec(mesh)
    # row-sharded operands: (vecs,)? + (codes, scales)? + (block_scales,)? + mask
    if int8 == "select":
        n_sharded = 4 + bool(scale_block_rows)
    elif int8:
        n_sharded = 3 + bool(scale_block_rows)
    else:
        n_sharded = 2
    in_specs = (P("shard"),) * n_sharded + (qs, qs) + (P(),) * (n_tables + 1)
    return jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=(qs, qs), check_vma=False))


def sharded_hybrid_topk(mesh: Mesh, vecs, mask, queries, lex_tables,
                        chunk_ids, wvec, sem_weight, k: int, m: int = 64,
                        top_m_lex: int = 128, use_pallas: bool | None = None,
                        interpret: bool = False, int8_tables=None,
                        int8_block_scales=None, scale_block_rows: int = 2048,
                        sem_bm_join: str = "all"):
    """Row-sharded ONE-dISPATCH hybrid: per-shard (Pallas scan + sparse BM25
    + exact additive fusion) + all-gather top-k merge.

    The sharded analogue of device_bm25.hybrid_topk_batch — previously a
    meshed corpus fell back to per-query host candidate-union fusion. vecs
    [cap, d] + mask [cap] row-sharded; queries [B, d] raw (normalized here)
    and chunk_ids [B, S] split over ``replica`` when the mesh has one;
    postings tables + wvec replicated (they are MBs — the rows are the GBs).
    → (scores [B, k], global rows [B, k]) replicated; masked slots row -1.
    Fused scores are exact: every candidate's cosine is re-gathered from its
    owner shard's bf16 rows, BM25 totals come from the full postings.

    ``vecs=None`` + ``int8_tables=(codes, scales)`` (row-sharded) is the
    beyond-bf16-budget regime: every cosine — scan and lexical candidates —
    comes from the int8 codes (~0.5% bounded noise), exactly like
    hybrid_topk_batch's vecs=None form. 8 shards of int8 serve ~6× more
    rows per chip than the bf16 sharded hybrid with no host stage.

    ``vecs`` AND ``int8_tables`` together select the in-budget speed mode
    (config.hybrid_select): each shard's int8 scan picks the semantic top-m
    (half the HBM read; all-integer epilogue when ``int8_block_scales``
    aligns) and its own bf16 rows re-score candidates exactly — fused
    ordering stays bf16-exact, mirroring hybrid_topk_batch's vecs-present
    pallas_int8 mode.
    """
    n_shards = mesh.shape["shard"]
    cap = (vecs if vecs is not None else int8_tables[0]).shape[0]
    assert cap % n_shards == 0, (cap, n_shards)
    local = cap // n_shards
    mm = min(m, local)
    if use_pallas is None:
        # the semantic top-m inside the fused hybrid is candidate
        # selection (final fused top-k is small and oracle-gated in bench)
        use_pallas = _use_pallas_local(max(k, mm), local,
                                       candidate_grade=True)
    if int8_tables is None:
        int8_mode = False        # plain bf16 per-shard scan
    elif vecs is None:
        int8_mode = True         # beyond-bf16-budget: every cosine from codes
    else:
        int8_mode = "select"     # int8 SELECT + per-shard bf16 re-score
    use_bs = (int8_mode and _block_scales_ok(
        use_pallas, int8_block_scales, local, scale_block_rows))
    (queries, chunk_ids), b = _pad_to_replicas(mesh, queries, chunk_ids)
    fn = _sharded_hybrid_fn(mesh, k, mm, top_m_lex, local, use_pallas,
                            len(lex_tables), float(sem_weight), interpret,
                            int8=int8_mode,
                            scale_block_rows=scale_block_rows if use_bs else 0,
                            sem_bm_join=sem_bm_join)
    sharded_cols = (vecs,) if vecs is not None else ()
    if int8_tables is not None:
        sharded_cols += tuple(int8_tables)
        if use_bs:
            sharded_cols += (int8_block_scales,)
    s, r = fn(*sharded_cols, mask, queries, chunk_ids, *lex_tables, wvec)
    return s[:b], r[:b]


def shard_index_to_mesh(mesh: Mesh, cols: dict) -> dict:
    """Place a TenantIndex's device columns row-sharded on the mesh."""
    row = NamedSharding(mesh, P("shard"))
    out = {}
    for name, arr in cols.items():
        out[name] = jax.device_put(arr, row)
    return out


class ShardRouter:
    """patientId → shard routing metadata (reference _routing, main.py:1230).

    Rows are assigned round-robin by patient hash at ingest; a routed query
    only needs its patient's shard scanned. Host-side bookkeeping only — the
    scan itself stays a mesh-wide SPMD program with non-owner shards masked.
    """

    def __init__(self, n_shards: int):
        self.n_shards = n_shards

    def shard_of(self, patient_id: str | None) -> int | None:
        if not patient_id:
            return None
        from rassengine_tpu.index.store import stable_hash32

        return stable_hash32(patient_id) % self.n_shards

    def routed_mask(self, mask, patient_id: str | None, cap: int):
        """Mask out all shards except the patient's owner shard."""
        if patient_id is None:
            return mask
        shard = self.shard_of(patient_id)
        rows_per_shard = cap // self.n_shards
        row_ids = jnp.arange(cap) // rows_per_shard
        return jnp.where(row_ids == shard, mask, NEG_INF)
