"""Int8 quantized scan with exact re-rank.

Memory path for corpora near HBM capacity (10M×1024-d bf16 = 20 GB doesn't fit
a v5e; int8 = 10 GB does — BASELINE config 4). Vectors are quantized with a
per-vector symmetric scale; the scan is an int8×int8 MXU matmul (int32
accumulation) over the whole corpus, and the top candidates are re-scored
against the f32 host-canonical vectors (or bf16 rows) so final ordering is
exact — quantization only has to keep the true top-k inside the candidate set
(oversample factor handles the tail).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def quantize_int8(vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[N, d] float → (int8 codes [N, d], scales [N]) with per-vector scale."""
    v = np.asarray(vecs, np.float32)
    scales = np.abs(v).max(axis=1) / 127.0
    scales = np.where(scales > 0, scales, 1.0)
    codes = np.clip(np.round(v / scales[:, None]), -127, 127).astype(np.int8)
    return codes, scales.astype(np.float32)


def quantize_int8_block(vecs: np.ndarray, block_rows: int
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Per-BLOCK symmetric scale: one scale shared by ``block_rows`` rows.

    Within a block, integer dot products are directly comparable across rows,
    which lets the Pallas scan keep its whole selection epilogue in int32
    (ops/fused_topk.py: add + packed fold — no astype/scale-mul per element).
    Rows are L2-normalized at ingest, so per-row max components cluster and
    the block max costs ≲1 bit of code range vs per-row scales — candidate
    recall is gated in tests/test_ops.py and the bench suite.

    → (codes [N, d] int8, block_scales [N/block_rows] f32).
    """
    v = np.asarray(vecs, np.float32)
    n, d = v.shape
    assert n % block_rows == 0, (n, block_rows)
    nb = n // block_rows
    bs = np.abs(v).reshape(nb, block_rows * d).max(axis=1) / 127.0
    bs = np.where(bs > 0, bs, 1.0).astype(np.float32)
    per_row = np.repeat(bs, block_rows)[:, None]
    codes = np.clip(np.round(v / per_row), -127, 127).astype(np.int8)
    return codes, bs


@partial(jax.jit, static_argnames=("m",))
def int8_scan_topm(codes, scales, queries, add_mask, m: int):
    """Quantized candidate generation.

    codes [cap, d] int8 (unit-norm vectors pre-quantization), scales [cap],
    queries [B, d] float (unit-norm) → (approx scores [B, m], rows [B, m]).
    """
    q = queries.astype(jnp.float32)
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # eps guard like every sibling int8 path: an all-zero query gives qs=0
    # and 0/0=NaN codes otherwise
    qs = jnp.maximum(jnp.abs(qn).max(axis=1) / 127.0, 1e-12)
    qcodes = jnp.clip(jnp.round(qn / qs[:, None]), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qcodes, codes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, cap] int32
    scores = acc.astype(jnp.float32) * (qs[:, None] * scales[None, :])
    scores = scores + add_mask[None, :]
    return jax.lax.top_k(scores, m)


def int8_topk_rerank(codes, scales, vecs_f32_host: np.ndarray, queries, add_mask,
                     k: int, oversample: int = 8):
    """int8 scan → top (k·oversample) candidates → exact f32 re-rank → top-k."""
    m = min(k * oversample, codes.shape[0])
    s, rows = int8_scan_topm(codes, scales, queries, add_mask, m)
    s, rows = np.asarray(s), np.asarray(rows)
    q = np.asarray(queries, np.float32)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    out_s = np.full((q.shape[0], k), -1.0e30, np.float32)
    out_i = np.full((q.shape[0], k), -1, np.int64)
    for b in range(q.shape[0]):
        # drop filter-masked candidates BEFORE the exact re-rank: when the
        # in-filter population is smaller than m, masked rows (scan score
        # ~NEG_INF) pad the candidate tail, and re-ranking them by raw
        # cosine would resurrect other patients' docs into the top-k
        rb = rows[b][s[b] > -5.0e29]
        if rb.size == 0:
            continue
        cand = vecs_f32_host[rb]
        norms = np.linalg.norm(cand, axis=1)
        exact = (cand @ q[b]) / np.maximum(norms, 1e-12)
        order = np.argsort(-exact)[:k]
        out_s[b, : order.size] = exact[order]
        out_i[b, : order.size] = rb[order]
    return out_s, out_i
