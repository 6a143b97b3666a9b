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
                     interpret: bool = False):
    """Encoder forward → (optional) additive scatter → corpus top-k.

    ``embed_fn`` (static): pure (params, ids, tok_mask, proj) → [B, dim]
    unit-norm f32 embeddings (Embedder._embed_fn — the same function the
    two-dispatch path jits, so fused == unfused bit-for-bit per stage).
    ``scatter_rows/vals`` (or None): sparse BM25 contributions added to the
    filter mask on device, pre-scaled by ``inv_sem_weight`` exactly like
    strategies._additive_hybrid — the scan then yields
    ``cos + add/sem_weight`` and the caller re-scales by sem_weight.
    → (emb [B, dim], scores [B, k], rows [B, k]).
    """
    emb = embed_fn(params, ids, tok_mask, proj)
    add = add_mask
    if scatter_rows is not None:
        add = add_mask + jnp.zeros_like(add_mask).at[scatter_rows].add(
            scatter_vals)
    add = add * jnp.float32(inv_sem_weight)
    if mode == "pallas":
        s, r = fused_topk_pooled(vecs, emb, add, k, block_rows,
                                 interpret=interpret)
    elif mode == "xla_direct":
        s, r = exact_topk_direct(vecs, emb, add, k)
    else:
        s, r = exact_topk(vecs, emb, add, k, block_rows)
    return emb, s, r
