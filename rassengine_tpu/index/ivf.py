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
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("rassengine.ivf")


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
