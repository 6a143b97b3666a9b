"""Pallas TPU kernel: fused cosine-distance matmul + streaming top-k.

Replaces the score-materialize-then-sort pattern: the [B, cap] score matrix
never leaves VMEM. The grid walks row blocks of the corpus sequentially (TPU
grid order), Pallas double-buffers the HBM→VMEM block DMA, and scratch carries
the running per-query top-k across iterations.

Selection strategy (``lax.top_k`` has no Mosaic lowering): a *threshold gate*.
The scratch holds each query's current k-th-best score; per block the kernel
does matmul + mask + one compare + an any() reduce — all MXU/VPU-cheap — and
only when some query sees a score above its threshold does it run the unrolled
k-round max-extraction merge (expected O(k·log(cap)/block) merges total, so the
steady-state cost is the matmul itself). This mirrors the exhaustive-search
design of TPU-KNN (Chern et al., 2022, arXiv:2206.14286) with an exact merge
instead of approximate partial-reduce, so results match the NumPy oracle
bit-for-bit at f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _fused_kernel(q_ref, v_ref, m_ref, out_s_ref, out_i_ref, best_s, best_i,
                  *, k: int, block_rows: int):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    b = q_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        best_s[:] = jnp.full(best_s.shape, NEG_INF, best_s.dtype)
        best_i[:] = jnp.full(best_i.shape, -1, jnp.int32)

    # [B, BR] block scores on the MXU, f32 accumulation.
    s = jax.lax.dot_general(
        q_ref[:], v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + m_ref[0]  # additive filter mask row-slice, [1, BR] broadcast

    thresh = best_s[:, k - 1 : k]  # current k-th best per query, [B, 1]
    has_new = jnp.any(s > thresh)

    @pl.when(has_new)
    def _merge():
        base = i * block_rows
        col = base + jax.lax.broadcasted_iota(jnp.int32, (b, block_rows), 1)
        cat_s = jnp.concatenate([best_s[:], s], axis=1)          # [B, k+BR]
        cat_i = jnp.concatenate([best_i[:], col], axis=1)
        width = cat_s.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
        picked_s = []
        picked_i = []
        for _ in range(k):  # k is static — unrolled max-extraction rounds
            m = jnp.max(cat_s, axis=1, keepdims=True)            # [B, 1]
            is_max = cat_s == m
            # first occurrence only (stable tie-break by lowest index)
            first = jnp.min(jnp.where(is_max, lane, width), axis=1, keepdims=True)
            sel = lane == first
            idx = jnp.max(jnp.where(sel, cat_i, -1), axis=1, keepdims=True)
            picked_s.append(m)
            picked_i.append(idx)
            cat_s = jnp.where(sel, NEG_INF, cat_s)
        best_s[:] = jnp.concatenate(picked_s, axis=1)
        best_i[:] = jnp.concatenate(picked_i, axis=1)

    @pl.when(i == nb - 1)
    def _finish():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


def _fused_int8_kernel(q_ref, v_ref, sc_ref, m_ref, out_s_ref, out_i_ref,
                       best_s, best_i, *, k: int, block_rows: int):
    """int8×int8 MXU scan: scores = (q_i8 · v_i8) * row_scale + mask.

    The per-query quantization scale is a positive scalar per row of the score
    matrix — it cannot change each query's top-k order, so it is applied
    outside the kernel. Row (corpus) scales differ per document and are folded
    in here before selection.
    """
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    b = q_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        best_s[:] = jnp.full(best_s.shape, NEG_INF, best_s.dtype)
        best_i[:] = jnp.full(best_i.shape, -1, jnp.int32)

    acc = jax.lax.dot_general(
        q_ref[:], v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = acc.astype(jnp.float32) * sc_ref[0] + m_ref[0]

    thresh = best_s[:, k - 1 : k]
    has_new = jnp.any(s > thresh)

    @pl.when(has_new)
    def _merge():
        base = i * block_rows
        col = base + jax.lax.broadcasted_iota(jnp.int32, (b, block_rows), 1)
        cat_s = jnp.concatenate([best_s[:], s], axis=1)
        cat_i = jnp.concatenate([best_i[:], col], axis=1)
        width = cat_s.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
        picked_s = []
        picked_i = []
        for _ in range(k):
            m = jnp.max(cat_s, axis=1, keepdims=True)
            is_max = cat_s == m
            first = jnp.min(jnp.where(is_max, lane, width), axis=1, keepdims=True)
            sel = lane == first
            idx = jnp.max(jnp.where(sel, cat_i, -1), axis=1, keepdims=True)
            picked_s.append(m)
            picked_i.append(idx)
            cat_s = jnp.where(sel, NEG_INF, cat_s)
        best_s[:] = jnp.concatenate(picked_s, axis=1)
        best_i[:] = jnp.concatenate(picked_i, axis=1)

    @pl.when(i == nb - 1)
    def _finish():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def fused_topk_int8(codes, scales, queries, add_mask, k: int,
                    block_rows: int = 2048, interpret: bool = False):
    """int8 corpus scan: codes [cap, d] int8, scales [cap] f32 (per-row),
    queries [B, d] float (unit-norm) → (approx cosine scores [B,k], rows).

    Halves HBM traffic vs bf16 (the scan is bandwidth-bound) and runs the MXU
    at int8 rate. Scores are exact up to int8 quantization of both sides; use
    exact re-rank on the selected rows when final ordering matters
    (index/quant.py:int8_topk_rerank).
    """
    cap, d = codes.shape
    assert cap % block_rows == 0, (cap, block_rows)
    nb = cap // block_rows
    b0 = queries.shape[0]
    b = max(32, ((b0 + 31) // 32) * 32)  # int8 sublane tile is 32
    if b != b0:
        queries = jnp.pad(queries, ((0, b - b0), (0, 0)))
    q = queries.astype(jnp.float32)
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    qs = jnp.max(jnp.abs(qn), axis=1, keepdims=True) / 127.0
    qcodes = jnp.clip(jnp.round(qn / jnp.maximum(qs, 1e-12)), -127, 127).astype(jnp.int8)

    sc2 = scales.astype(jnp.float32).reshape(nb, 1, block_rows)
    m2 = add_mask.astype(jnp.float32).reshape(nb, 1, block_rows)

    kernel = functools.partial(_fused_int8_kernel, k=k, block_rows=block_rows)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_rows), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_rows), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cap * d,
            bytes_accessed=cap * d + b * d + cap * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qcodes, codes, sc2, m2)
    # fold the per-query scale back so scores approximate cosines; keep
    # masked rows at NEG_INF (scaling would shrink them past -1e29 checks)
    scaled = jnp.where(out_s <= NEG_INF / 2, NEG_INF, out_s * qs)
    return scaled[:b0], out_i[:b0]


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def fused_topk(vecs, queries, add_mask, k: int, block_rows: int = 1024,
               interpret: bool = False):
    """queries [B, d] × vecs [cap, d] (+ additive mask [cap]) → top-k (scores, rows).

    Queries must be pre-normalized if cosine scores are desired. B is padded to
    the f32 sublane (8); cap must be a multiple of block_rows (store pads).
    """
    cap, d = vecs.shape
    assert cap % block_rows == 0, (cap, block_rows)
    nb = cap // block_rows
    b0 = queries.shape[0]
    b = max(8, ((b0 + 7) // 8) * 8)
    if b != b0:
        queries = jnp.pad(queries, ((0, b - b0), (0, 0)))
    q = queries.astype(jnp.bfloat16)
    v = vecs.astype(jnp.bfloat16)
    # (nb, 1, BR) so the block's trailing dims equal the array dims (tiling rule)
    m2 = add_mask.astype(jnp.float32).reshape(nb, 1, block_rows)

    kernel = functools.partial(_fused_kernel, k=k, block_rows=block_rows)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_rows), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cap * d,
            bytes_accessed=cap * d * 2 + b * d * 2 + cap * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, v, m2)
    return out_s[:b0], out_i[:b0]
