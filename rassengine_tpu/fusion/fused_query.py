"""Single-ask latency path: encoder forward + corpus scan in ONE dispatch.

A lone /ask between micro-batch windows pays one device round-trip per
device stage: embed forward, then the retrieval scan. On a tunneled chip
each sync costs ~28 ms while the actual device work is ~1.5 ms (BENCH.md
e2e anatomy); even over PCIe the second dispatch+fetch is pure overhead.
Here tokenization stays on host and the encoder forward, the additive-BM25
scatter, and the corpus scan compile into one XLA program — ONE dispatch,
ONE device→host fetch returning (embedding, scores, rows). The embedding
rides back with the result so the serve-path semantic cache never
re-embeds.

Reference counterpart: embed_query is an HTTP hop to Ollama and the
retrieval is a second network hop to OpenSearch (app/main.py:266-274,
1562-1615) — two serialized round-trips per ask, unfusable by
construction. A compiler-scheduled program has no seam between the stages.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp

from rassengine_tpu.index.exact import exact_topk, exact_topk_direct
from rassengine_tpu.ops.fused_topk import fused_topk_pooled


@partial(jax.jit, static_argnames=("embed_fn", "k", "block_rows", "mode",
                                   "interpret"))
def encode_scan_topk(embed_fn, params, proj, ids, tok_mask, vecs, add_mask,
                     scatter_rows, scatter_vals, inv_sem_weight,
                     k: int, block_rows: int, mode: str = "pallas",
                     interpret: bool = False, int8_codes=None,
                     int8_scales=None, int8_block_scales=None):
    """Encoder forward → (optional) additive scatter → corpus top-k.

    ``embed_fn`` (static): pure (params, ids, tok_mask, proj) → [B, dim]
    unit-norm f32 embeddings (Embedder._embed_fn — the same function the
    two-dispatch path jits, so fused == unfused bit-for-bit per stage).
    ``scatter_rows/vals`` (or None): sparse BM25 contributions added to the
    filter mask on device, pre-scaled by ``inv_sem_weight`` exactly like
    strategies._additive_hybrid — the scan then yields
    ``cos + add/sem_weight`` and the caller re-scales by sem_weight.
    → (emb [B, dim], scores [B, k], rows [B, k]).

    ``mode="pallas_int8"`` (``vecs=None``, codes+scales given) extends the
    fused lone ask past the bf16 HBM budget: every cosine comes from the
    int8 codes, like hybrid_topk_batch's vecs=None regime (~0.5% bounded
    noise). The int8 pool kernel folds its additive mask BEFORE the final
    per-query requantization rescale (ops/fused_topk.py:_pool_int8_kernel:
    ``intdot·scale + mask`` then ``·qs``), so the additive vector is
    pre-divided by the kernel's own query scale — selection weighting and
    output scores come out exact: ``cos8 + add``. B must be 1 (the lone
    ask); batches take strategies._hybrid_batch_device.
    """
    from rassengine_tpu.fusion.strategies import _scatter_scale

    emb = embed_fn(params, ids, tok_mask, proj)
    if scatter_rows is not None:
        add = _scatter_scale(add_mask, scatter_rows, scatter_vals,
                             jnp.float32(inv_sem_weight))
    else:
        add = add_mask * jnp.float32(inv_sem_weight)
    if mode == "pallas_int8":
        from rassengine_tpu.ops.fused_topk import fused_topk_int8_pooled

        assert emb.shape[0] == 1, "int8 fused lone ask is single-query"
        if int8_block_scales is not None:
            # block-scale contract: mask and scores in true units already
            s, r = fused_topk_int8_pooled(int8_codes, int8_scales, emb,
                                          add, k, block_rows,
                                          interpret=interpret,
                                          block_scales=int8_block_scales)
        else:
            # replicate the kernel's qs = max|qn|/127 bit-for-bit so add/qs
            # round-trips exactly through its final ·qs rescale
            q32 = emb.astype(jnp.float32)
            qn = q32 / jnp.maximum(
                jnp.linalg.norm(q32, axis=-1, keepdims=True), 1e-12)
            qs = jnp.max(jnp.abs(qn), axis=1)[0] / 127.0
            s, r = fused_topk_int8_pooled(int8_codes, int8_scales, emb,
                                          add / jnp.maximum(qs, 1e-12), k,
                                          block_rows, interpret=interpret)
    elif mode == "pallas":
        s, r = fused_topk_pooled(vecs, emb, add, k, block_rows,
                                 interpret=interpret)
    elif mode == "xla_direct":
        s, r = exact_topk_direct(vecs, emb, add, k)
    else:
        s, r = exact_topk(vecs, emb, add, k, block_rows)
    return emb, s, r


@functools.lru_cache(maxsize=64)
def _encode_sharded_fn(mesh, embed_fn, k: int, local_rows: int,
                       use_pallas: bool, interpret: bool):
    """jit(encoder forward → additive scatter → shard_map scan + all-gather
    merge): the meshed lone ask as ONE program. The shard_map inner fn is
    the same cached program sharded_topk uses, so fused == unfused per
    stage; the scatter runs before the shard_map boundary and XLA reshards
    the [cap] additive vector onto the rows' P("shard") layout."""
    from rassengine_tpu.parallel.topk_merge import _sharded_topk_fn

    inner = _sharded_topk_fn(mesh, k, local_rows, use_pallas, interpret)

    def fn(params, proj, ids, tok_mask, vecs, add_mask, scatter_rows,
           scatter_vals, inv_sem_weight):
        from rassengine_tpu.fusion.strategies import _scatter_scale

        emb = embed_fn(params, ids, tok_mask, proj)
        if scatter_rows is not None:
            add = _scatter_scale(add_mask, scatter_rows, scatter_vals,
                                 inv_sem_weight)
        else:
            add = add_mask * inv_sem_weight
        s, r = inner(vecs, add, emb)
        return emb, s, r

    return jax.jit(fn)


def encode_scan_topk_sharded(mesh, embed_fn, params, proj, ids, tok_mask,
                             vecs, add_mask, scatter_rows, scatter_vals,
                             inv_sem_weight, k: int,
                             use_pallas: bool | None = None,
                             interpret: bool = False):
    """Meshed lone-ask fused path: encode + scatter + sharded scan in one
    dispatch (the sharded analogue of encode_scan_topk; same additive math
    as strategies._additive_hybrid over topk_merge.sharded_topk).

    vecs [cap, d] + the base mask row-sharded over ``shard``; ids/tok_mask
    [1, L] host token batches (padded here when the mesh has a ``replica``
    axis). → (emb [1, dim], scores [1, k], global rows [1, k]) replicated.
    """
    from rassengine_tpu.parallel.topk_merge import (_pad_to_replicas,
                                                    _use_pallas_local)

    n_shards = mesh.shape["shard"]
    cap = vecs.shape[0]
    assert cap % n_shards == 0, (cap, n_shards)
    local = cap // n_shards
    k = min(k, local)
    if use_pallas is None:
        use_pallas = _use_pallas_local(k, local)
    (ids, tok_mask), b = _pad_to_replicas(mesh, jnp.asarray(ids),
                                          jnp.asarray(tok_mask))
    fn = _encode_sharded_fn(mesh, embed_fn, k, local, use_pallas, interpret)
    emb, s, r = fn(params, proj, ids, tok_mask, vecs, add_mask, scatter_rows,
                   scatter_vals, jnp.float32(inv_sem_weight))
    return emb[:b], s[:b], r[:b]
