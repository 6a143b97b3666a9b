"""Exact (brute-force) cosine top-k on TPU.

The correctness ground truth for every ANN/kernel path (BASELINE.json config 1)
and the production scan for corpora below ``EngineConfig.ann_threshold`` — on
TPU a tiled bf16 matmul over ≤200k rows beats graph traversal.

Two jit paths:
- ``exact_topk_direct``: one [B, cap] matmul + ``lax.top_k`` (small corpora),
- ``exact_topk``: ``lax.scan`` over row blocks with a running top-k carry, so
  the full score matrix never materializes (10M-row friendly; SURVEY §7 hard
  part 3).

Scores are cosine similarities: vectors are unit-normalized on write
(store.py), queries are normalized here (reference normalizes both sides,
main.py:1250-1251 and main.py:1536-1537).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rassengine_tpu.core.meshes import ACCUM_DTYPE, COMPUTE_DTYPE
from rassengine_tpu.index.store import NEG_INF


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


@partial(jax.jit, static_argnames=("k", "precise"))
def exact_topk_direct(vecs, queries, add_mask, k: int, precise: bool = False):
    """queries [B, d] × vecs [cap, d] → (scores [B, k], rows [B, k]).

    ``precise=True`` keeps the matmul inputs in f32 (no bf16 rounding) — the
    oracle-parity mode (BASELINE config 1 targets recall exactly 1.0).
    """
    dt = jnp.float32 if precise else COMPUTE_DTYPE
    q = l2_normalize(queries.astype(jnp.float32)).astype(dt)
    scores = jnp.dot(q, vecs.astype(dt).T, preferred_element_type=ACCUM_DTYPE)
    scores = scores + add_mask[None, :]
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i


@partial(jax.jit, static_argnames=("k", "block_rows"))
def exact_topk(vecs, queries, add_mask, k: int, block_rows: int = 8192):
    """Streaming blockwise scan with a running top-k carry.

    vecs: [cap, d] (cap a multiple of block_rows), queries: [B, d],
    add_mask: [cap] additive f32 (0 pass / -inf fail, from build_filter_mask).
    """
    cap, d = vecs.shape
    assert cap % block_rows == 0, (cap, block_rows)
    n_blocks = cap // block_rows
    q = l2_normalize(queries.astype(jnp.float32)).astype(COMPUTE_DTYPE)
    b = q.shape[0]

    v_blocks = vecs.reshape(n_blocks, block_rows, d)
    m_blocks = add_mask.reshape(n_blocks, block_rows)
    starts = (jnp.arange(n_blocks, dtype=jnp.int32) * block_rows).reshape(n_blocks, 1)

    init = (
        jnp.full((b, k), NEG_INF, dtype=ACCUM_DTYPE),
        jnp.full((b, k), -1, dtype=jnp.int32),
    )

    def body(carry, xs):
        best_s, best_i = carry
        v, m, start = xs
        s = jnp.dot(q, v.astype(COMPUTE_DTYPE).T, preferred_element_type=ACCUM_DTYPE)
        s = s + m[None, :]
        rows = start[0] + jax.lax.broadcasted_iota(jnp.int32, (b, block_rows), 1)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate([best_i, rows], axis=1)
        top_s, pos = jax.lax.top_k(cat_s, k)
        top_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (top_s, top_i), None

    (top_s, top_i), _ = jax.lax.scan(body, init, (v_blocks, m_blocks, starts))
    return top_s, top_i


def search(index, queries, k: int, spec=None, block_rows: int | None = None):
    """Convenience host wrapper: TenantIndex → ([(source, score)] per query)."""
    import numpy as np

    cols = index.device_columns()
    mask = index.filter_mask(spec)
    q = jnp.atleast_2d(jnp.asarray(queries))
    br = block_rows or index.block_rows
    if index.capacity <= 65536:
        top_s, top_i = exact_topk_direct(cols["vecs"], q, mask, k)
    else:
        top_s, top_i = exact_topk(cols["vecs"], q, mask, k, br)
    top_s = np.asarray(top_s)
    top_i = np.asarray(top_i)
    out = []
    for bi in range(top_s.shape[0]):
        hits = []
        for s, r in zip(top_s[bi], top_i[bi]):
            if r < 0 or s <= NEG_INF / 2:
                continue
            src = index.docs[int(r)]
            if src is not None:
                hits.append((src, float(s)))
        out.append(hits)
    return out
