"""IVF (inverted-file) ANN index: on-TPU k-means build + list-probe search.

The reference's ANN structure is OpenSearch nmslib HNSW (m=48,
ef_construction=400, app/main.py:563-572). Graph traversal is pointer-chasing
and maps poorly onto XLA's static-shape model (SURVEY §7 hard part 1), so the
ANN structure here is IVF: centroids trained with Lloyd iterations as batched
MXU matmuls, lists stored as a row permutation + offsets (CSR), queries probe
the nprobe nearest lists and exactly re-rank the gathered candidates.

Regime notes (measured, see bench/): with the corpus resident in HBM, the
*batched* exact scan reads the corpus once per batch and beats per-query list
gathers from batch ≈ 8 up — IVF is the single-query latency path and the
recall-controlled candidate generator for corpora larger than HBM, not the
default batch-serving path.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("rassengine.ivf")

NEG_INF = -1.0e30  # matches index.store.NEG_INF (additive filter masks)


@partial(jax.jit,
         static_argnames=("k", "nprobe", "budget", "quantized", "slab"))
def _probe_kernel(vecs, scales, chunk_rows, chunk_offsets, centroids, q,
                  add_mask, *, k: int, nprobe: int, budget: int,
                  quantized: bool, slab: int):
    """One-dispatch device IVF probe (VERDICT r2 #6).

    Replaces the per-query host loop (the reference's counterpart is the
    OpenSearch HNSW traversal, app/main.py:563-572): pick the ``nprobe``
    nearest coarse lists with one small matmul + ``lax.top_k``, assemble the
    probed lists' chunk ids into a static ``budget``-chunk table with cumsum
    segment math (no data-dependent shapes), row-gather only those candidates
    from HBM, score them with one batched dot, and select top-k. The HBM read
    is ``budget*chunk`` rows instead of the whole corpus — the win over the
    full fused scan for single/low-batch queries.

    ``chunk_rows``: [n_chunks, CHUNK] int32 row ids (-1 padding), lists laid
    out contiguously; ``chunk_offsets``: [nlist+1] int32 in chunk units.
    ``add_mask``: additive f32 [cap] filter mask (0 pass / -inf fail).
    ``quantized``: vecs are int8 codes with per-row ``scales``.
    """
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    sims = jnp.dot(qn.astype(jnp.float32), centroids.T,
                   preferred_element_type=jnp.float32)          # [B, nlist]
    _, lists = jax.lax.top_k(sims, nprobe)                      # [B, P] desc
    starts = chunk_offsets[lists]                               # [B, P]
    counts = chunk_offsets[lists + 1] - starts                  # [B, P]
    cum = jnp.cumsum(counts, axis=1)                            # [B, P]
    pos = jnp.arange(budget, dtype=jnp.int32)                   # [T]
    # seg[b, t] = which probed list chunk-slot t falls in (= #lists whose
    # cumulative chunk count is <= t); slots past the total are invalid —
    # truncation drops the LAST (least-similar) lists first by construction
    seg = jnp.sum(cum[:, None, :] <= pos[None, :, None], axis=2)  # [B, T]
    valid = seg < nprobe
    seg_c = jnp.clip(seg, 0, nprobe - 1)
    prev = jnp.where(seg_c > 0,
                     jnp.take_along_axis(cum, jnp.maximum(seg_c - 1, 0),
                                         axis=1), 0)
    chunk_id = (jnp.take_along_axis(starts, seg_c, axis=1)
                + pos[None, :] - prev)
    chunk_id = jnp.where(valid, chunk_id, 0)
    b = q.shape[0]
    qb = qn.astype(jnp.bfloat16)
    # slab the candidate gather+score with a scan carrying a running top-k:
    # the working set is b·slab·CHUNK·d instead of b·budget·CHUNK·d, which at
    # corpus scale (nprobe·avg_list rows/query) otherwise exceeds HBM (an
    # 18 GB gather at 5M×1024-d, batch 16, nprobe 64)
    n_slabs = -(-budget // slab)
    pad = n_slabs * slab - budget
    chunk_id = jnp.pad(chunk_id, ((0, 0), (0, pad)))
    valid = jnp.pad(valid, ((0, 0), (0, pad)))
    cid_s = chunk_id.reshape(b, n_slabs, slab).transpose(1, 0, 2)
    val_s = valid.reshape(b, n_slabs, slab).transpose(1, 0, 2)

    def body(carry, xs):
        top_s, top_i = carry
        cid, val = xs                                           # [B, slab]
        rows = chunk_rows[cid]                                  # [B, s, CHUNK]
        rows = jnp.where(val[:, :, None], rows, -1).reshape(b, -1)
        safe = jnp.maximum(rows, 0)
        cand = vecs[safe]                                       # row gather
        scores = jnp.einsum("bcd,bd->bc", cand.astype(jnp.bfloat16), qb,
                            preferred_element_type=jnp.float32)
        if quantized:
            scores = scores * scales[safe]
        scores = scores + add_mask[safe]
        scores = jnp.where(rows >= 0, scores, NEG_INF)
        cat_s = jnp.concatenate([top_s, scores], axis=1)
        cat_i = jnp.concatenate([top_i, rows], axis=1)
        s, pos2 = jax.lax.top_k(cat_s, k)
        i = jnp.take_along_axis(cat_i, pos2, axis=1)
        return (s, i), None

    init = (jnp.full((b, k), NEG_INF, jnp.float32),
            jnp.full((b, k), -1, jnp.int32))
    (s, r), _ = jax.lax.scan(body, init, (cid_s, val_s))
    return s, jnp.where(s <= NEG_INF / 2, -1, r)


@partial(jax.jit,
         static_argnames=("k", "nprobe", "budget", "slab", "precise_lut"))
def _probe_kernel_pq(packed, chunk_rows, chunk_offsets, coarse, cent, q,
                     add_mask, *, k: int, nprobe: int, budget: int,
                     slab: int, precise_lut: bool = True):
    """PQ4-source device IVF probe (ROADMAP r3 #3).

    Same list-selection + segment math as :func:`_probe_kernel`, but the
    gather source is the packed 4-bit PQ codes (index/pq4.py) instead of
    bf16/int8 rows — the single/low-batch latency path for corpora where
    even int8 codes bust the HBM budget (16M+×1024-d). The PQ coarse stage
    doubles as the IVF structure (lists = coarse clusters), so scoring is
    pure ADC:

    - candidates score as ``one_hot(codes) @ lut_b`` — one batched MXU
      matmul per slab ([B, sC, m_sub·16] × [B, m_sub·16, 1]); no per-lane
      gathers (no Mosaic lowering for those).
    - the coarse term ``q·c(list)`` is constant per chunk (chunk-aligned
      lists belong to exactly one cluster), so it reuses the list-selection
      sims — no [.., nlist] one-hot.

    Scores are ADC approximations: callers must exact-re-rank the returned
    candidate rows (fusion/strategies._rerank_exact), so ``k`` here is the
    oversampled candidate count, not the serving k.
    """
    b = q.shape[0]
    qn = (q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
          ).astype(jnp.float32)
    sims = jnp.dot(qn, coarse.T, preferred_element_type=jnp.float32)
    top_sims, lists = jax.lax.top_k(sims, nprobe)               # [B, P] desc
    m_sub, _, ds = cent.shape
    # f32 ADC is free at probe budgets (~1k chunks: 6.1 ms f32 vs 6.2 ms
    # bf16 at 1M×1024-d on v5e, recall within noise) — default True so LUT
    # rounding never compounds the PQ distortion; candidate-recall loss on
    # near-duplicate corpora is the 4-bit quantization itself, recovered by
    # widening m (0.75@m256 → 0.87@m512 measured) and the caller's sticky
    # oversample escalation (fusion/strategies._pq_escalated)
    dot_dt = (jnp.float32 if precise_lut or jax.default_backend() == "cpu"
              else jnp.bfloat16)
    qs = qn.reshape(b, m_sub, ds)
    luts = jnp.einsum("bmd,mcd->bmc", qs, cent,
                      preferred_element_type=jnp.float32)       # [B, m, 16]
    luts_col = luts.reshape(b, m_sub * 16, 1).astype(dot_dt)
    starts = chunk_offsets[lists]
    counts = chunk_offsets[lists + 1] - starts
    cum = jnp.cumsum(counts, axis=1)
    pos = jnp.arange(budget, dtype=jnp.int32)
    seg = jnp.sum(cum[:, None, :] <= pos[None, :, None], axis=2)  # [B, T]
    valid = seg < nprobe
    seg_c = jnp.clip(seg, 0, nprobe - 1)
    prev = jnp.where(seg_c > 0,
                     jnp.take_along_axis(cum, jnp.maximum(seg_c - 1, 0),
                                         axis=1), 0)
    chunk_id = (jnp.take_along_axis(starts, seg_c, axis=1)
                + pos[None, :] - prev)
    chunk_id = jnp.where(valid, chunk_id, 0)
    csc = jnp.take_along_axis(top_sims, seg_c, axis=1)          # [B, T]
    n_slabs = -(-budget // slab)
    pad = n_slabs * slab - budget
    chunk_id = jnp.pad(chunk_id, ((0, 0), (0, pad)))
    valid = jnp.pad(valid, ((0, 0), (0, pad)))
    csc = jnp.pad(csc, ((0, 0), (0, pad)))
    cid_s = chunk_id.reshape(b, n_slabs, slab).transpose(1, 0, 2)
    val_s = valid.reshape(b, n_slabs, slab).transpose(1, 0, 2)
    csc_s = csc.reshape(b, n_slabs, slab).transpose(1, 0, 2)
    chunk = chunk_rows.shape[1]
    iota16 = jnp.arange(16, dtype=jnp.int32)

    def body(carry, xs):
        top_s, top_i = carry
        cid, val, cs = xs                                       # [B, slab]
        rows = chunk_rows[cid]                                  # [B, s, CHUNK]
        rows = jnp.where(val[:, :, None], rows, -1).reshape(b, -1)
        safe = jnp.maximum(rows, 0)
        pb = packed[safe]                                       # [B, sC, h]
        codes = jnp.concatenate([(pb & 0xF), (pb >> 4)],
                                axis=2).astype(jnp.int32)       # split layout
        oh = (codes[:, :, :, None] == iota16).astype(dot_dt)
        oh = oh.reshape(b, rows.shape[1], m_sub * 16)
        adc = jnp.matmul(oh, luts_col,
                         preferred_element_type=jnp.float32)[..., 0]
        scores = adc + jnp.repeat(cs, chunk, axis=1) + add_mask[safe]
        scores = jnp.where(rows >= 0, scores, NEG_INF)
        cat_s = jnp.concatenate([top_s, scores], axis=1)
        cat_i = jnp.concatenate([top_i, rows], axis=1)
        s, pos2 = jax.lax.top_k(cat_s, k)
        i = jnp.take_along_axis(cat_i, pos2, axis=1)
        return (s, i), None

    init = (jnp.full((b, k), NEG_INF, jnp.float32),
            jnp.full((b, k), -1, jnp.int32))
    (s, r), _ = jax.lax.scan(body, init, (cid_s, val_s, csc_s))
    return s, jnp.where(s <= NEG_INF / 2, -1, r)


@partial(jax.jit, static_argnames=("nlist",), donate_argnums=(1,))
def _assign_and_update(vecs, centroids, nlist: int):
    """One Lloyd iteration: assign rows to nearest centroid, recompute means."""
    sims = jnp.dot(vecs, centroids.T, preferred_element_type=jnp.float32)
    assign = jnp.argmax(sims, axis=1)                      # [N]
    onehot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32)  # [N, nlist]
    sums = jnp.dot(onehot.T, vecs.astype(jnp.float32),
                   preferred_element_type=jnp.float32)     # [nlist, d]
    counts = onehot.sum(axis=0)[:, None]
    new_c = sums / jnp.maximum(counts, 1.0)
    # keep empty centroids where they were
    new_c = jnp.where(counts > 0, new_c, centroids.astype(jnp.float32))
    norms = jnp.linalg.norm(new_c, axis=1, keepdims=True)
    new_c = new_c / jnp.maximum(norms, 1e-12)
    return new_c.astype(vecs.dtype), assign


@dataclass
class IvfIndex:
    centroids: np.ndarray      # [nlist, d]
    order: np.ndarray          # [N] row ids sorted by list
    offsets: np.ndarray        # [nlist + 1]
    nprobe: int = 8
    _dev: tuple | None = field(default=None, repr=False, compare=False)

    @staticmethod
    def build(vecs: np.ndarray, nlist: int, iters: int = 10, nprobe: int = 8,
              sample: int = 262_144, seed: int = 0) -> "IvfIndex":
        """k-means on device (optionally over a subsample), then full assign."""
        n, d = vecs.shape
        rng = np.random.default_rng(seed)
        nlist = min(nlist, max(1, n // 4))
        init_rows = rng.choice(n, size=nlist, replace=False)
        centroids = jnp.asarray(vecs[init_rows], jnp.float32)
        train = vecs if n <= sample else vecs[rng.choice(n, sample, replace=False)]
        train_dev = jnp.asarray(train, jnp.float32)
        for _ in range(iters):
            centroids, _ = _assign_and_update(train_dev, centroids, nlist)
        # final full assignment (blockwise to bound memory)
        assigns = []
        step = 1 << 18
        for start in range(0, n, step):
            block = jnp.asarray(vecs[start : start + step], jnp.float32)
            sims = jnp.dot(block, centroids.T, preferred_element_type=jnp.float32)
            assigns.append(np.asarray(jnp.argmax(sims, axis=1)))
        assign = np.concatenate(assigns)
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=nlist)
        offsets = np.zeros(nlist + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        log.info("ivf built: nlist=%d avg_list=%.1f max_list=%d",
                 nlist, n / nlist, counts.max() if n else 0)
        return IvfIndex(np.asarray(centroids, np.float32), order, offsets, nprobe)

    @staticmethod
    def from_assignments(centroids: np.ndarray, assign: np.ndarray,
                         nprobe: int = 8) -> "IvfIndex":
        """IVF structure from precomputed assignments — no k-means.

        The PQ4 coarse stage (index/pq4.py) already clusters every row; its
        (coarse centroids, assignment) pair IS an inverted file. Building
        from it costs one argsort instead of Lloyd iterations, and the probe
        lists agree exactly with the quantizer's own geometry.
        """
        nlist = centroids.shape[0]
        assign = np.asarray(assign)
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=nlist)
        offsets = np.zeros(nlist + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        return IvfIndex(np.asarray(centroids, np.float32), order, offsets,
                        nprobe)

    def device_tables(self, chunk: int = 128) -> dict:
        """Chunk-padded device list tables for :func:`_probe_kernel`.

        Each list is padded to a whole number of ``chunk``-row chunks (pad
        row id -1); lists occupy contiguous chunk ranges, so a list is
        addressed by ``chunk_offsets[l]:chunk_offsets[l+1]``. Built once per
        IVF build (the index rebuilds the IvfIndex object itself on growth).
        """
        if self._dev is not None and self._dev[0] == chunk:
            return self._dev[1]
        nlist = len(self.offsets) - 1
        counts = np.diff(self.offsets)
        chunks_per = (counts + chunk - 1) // chunk
        chunk_offsets = np.zeros(nlist + 1, np.int32)
        np.cumsum(chunks_per, out=chunk_offsets[1:])
        n_chunks = int(chunk_offsets[-1])
        chunk_rows = np.full((max(n_chunks, 1) * chunk,), -1, np.int32)
        for l in range(nlist):
            rows = self.order[self.offsets[l]: self.offsets[l + 1]]
            base = int(chunk_offsets[l]) * chunk
            chunk_rows[base: base + rows.size] = rows
        chunk_rows = chunk_rows.reshape(max(n_chunks, 1), chunk)
        tables = {
            "chunk_rows": jnp.asarray(chunk_rows),
            "chunk_offsets": jnp.asarray(chunk_offsets),
            "centroids": jnp.asarray(self.centroids, jnp.float32),
            "n_chunks": n_chunks,
            "avg_chunks": float(chunks_per.mean()) if nlist else 1.0,
            "max_chunks": int(chunks_per.max()) if nlist else 1,
            "chunk": chunk,
        }
        self._dev = (chunk, tables)
        return tables

    def probe_device(self, vecs_dev, q, add_mask, k: int,
                     nprobe: int | None = None, chunk: int = 128,
                     scales=None, budget_factor: float = 2.0):
        """Batched one-dispatch probe on device arrays → (scores, rows) jax.

        ``vecs_dev``: [cap, d] bf16 rows, or int8 codes with ``scales``
        [cap] (the >HBM-for-bf16 regime). The per-query chunk budget is
        ``nprobe * avg_chunks * budget_factor`` (clamped to the probe-order
        lossless bound ``nprobe * max_chunks``): oversized lists truncate
        least-similar-first, bounded recall cost reported by the bench.
        """
        nprobe = min(nprobe or self.nprobe, len(self.offsets) - 1)
        t = self.device_tables(chunk)
        budget = int(min(
            t["n_chunks"],
            nprobe * t["max_chunks"],
            max(int(np.ceil(nprobe * t["avg_chunks"] * budget_factor)),
                nprobe),
        ))
        q = jnp.atleast_2d(q)
        # cap the per-scan-step gather at ~256 MB of bf16 candidates
        per_chunk = q.shape[0] * chunk * vecs_dev.shape[1] * 2
        slab = int(min(max(1, (256 << 20) // max(per_chunk, 1)),
                       max(budget, 1)))
        return _probe_kernel(
            vecs_dev,
            scales if scales is not None else jnp.zeros((1,), jnp.float32),
            t["chunk_rows"], t["chunk_offsets"], t["centroids"], q, add_mask,
            k=k, nprobe=nprobe, budget=max(budget, 1),
            quantized=scales is not None, slab=slab)

    def probe_device_pq(self, packed_dev, codebooks, q, add_mask, m: int,
                        nprobe: int | None = None, chunk: int = 128,
                        budget_factor: float = 2.0,
                        precise_lut: bool = True):
        """PQ4-source batched probe → (adc_scores, rows) jax (ROADMAP r3 #3).

        ``packed_dev``: [cap, m_sub/2] uint8 packed codes in ROW order (the
        ``packed`` column of store.device_columns_pq4); ``codebooks``:
        [m_sub, 16, ds]. ``self.centroids`` must be the PQ coarse centroids
        (build via :meth:`from_assignments` on the Pq4Index). Returned rows
        are ADC-ranked candidates — exact-re-rank before serving.
        """
        nprobe = min(nprobe or self.nprobe, len(self.offsets) - 1)
        t = self.device_tables(chunk)
        budget = int(min(
            t["n_chunks"],
            nprobe * t["max_chunks"],
            max(int(np.ceil(nprobe * t["avg_chunks"] * budget_factor)),
                nprobe),
        ))
        q = jnp.atleast_2d(q)
        m_sub = codebooks.shape[0]
        # the one-hot is the big intermediate: b·CHUNK·(m_sub·16) per chunk
        el = 4 if precise_lut or jax.default_backend() == "cpu" else 2
        per_chunk = q.shape[0] * chunk * m_sub * 16 * el
        slab = int(min(max(1, (128 << 20) // max(per_chunk, 1)),
                       max(budget, 1)))
        return _probe_kernel_pq(
            packed_dev, t["chunk_rows"], t["chunk_offsets"], t["centroids"],
            codebooks, q, add_mask, k=min(m, budget * chunk),
            nprobe=nprobe, budget=max(budget, 1), slab=slab,
            precise_lut=precise_lut)

    def search(self, vecs: np.ndarray, query: np.ndarray, k: int,
               nprobe: int | None = None,
               host_mask: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Single/low-batch query path: probe lists, exact re-rank on host.

        vecs: the host-canonical f32 row store; query [B, d].
        """
        nprobe = nprobe or self.nprobe
        q = np.atleast_2d(np.asarray(query, np.float32))
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        c_sims = q @ self.centroids.T                      # [B, nlist]
        probe = np.argsort(-c_sims, axis=1)[:, :nprobe]
        out_s = np.full((q.shape[0], k), -np.inf, np.float32)
        out_i = np.full((q.shape[0], k), -1, np.int64)
        for b in range(q.shape[0]):
            rows = np.concatenate([
                self.order[self.offsets[l]: self.offsets[l + 1]] for l in probe[b]
            ]) if nprobe else np.zeros(0, np.int64)
            if host_mask is not None and rows.size:
                rows = rows[host_mask[rows]]
            if rows.size == 0:
                continue
            cand = vecs[rows]
            norms = np.linalg.norm(cand, axis=1)
            scores = (cand @ q[b]) / np.maximum(norms, 1e-12)
            top = np.argsort(-scores)[:k]
            out_s[b, : top.size] = scores[top]
            out_i[b, : top.size] = rows[top]
        return out_s, out_i
