"""Product quantization (PQ): 16× smaller codes than int8 for >HBM corpora.

BASELINE.json's north star names an "int8/PQ code scan"; int8 (index/quant.py)
is the HBM-resident path (1 B/dim → 10M×1024-d on one v5e). PQ compresses to
``m_sub`` bytes/vector (64 B at m_sub=64): 100M×1024-d fits in ~6.4 GB.

Build: per-subspace k-means (256 centroids each), Lloyd iterations as batched
MXU matmuls — the same device k-means as IVF. Query: ADC (asymmetric distance
computation) — one [m_sub, 256] look-up table of query-subvector · centroid
partial dot products, then a gather-sum over the codes. The gather is XLA's
(TPU gathers are not MXU-shaped — see ROADMAP for the packed-matmul kernel
plan); candidates are exactly re-ranked against f32 rows, so PQ only has to
keep the true top-k inside the oversampled candidate set.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("rassengine.pq")

N_CENTROIDS = 256


@partial(jax.jit, static_argnames=("n_centroids",))
def _kmeans_step(x, centroids, n_centroids: int):
    """One Lloyd iteration in a subspace (x [N, ds], centroids [256, ds])."""
    # nearest by L2: argmax(2·x·c − |c|²)
    dots = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
    c2 = jnp.sum(centroids * centroids, axis=1)
    assign = jnp.argmax(2.0 * dots - c2[None, :], axis=1)
    onehot = jax.nn.one_hot(assign, n_centroids, dtype=jnp.float32)
    sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
    counts = onehot.sum(axis=0)[:, None]
    new_c = sums / jnp.maximum(counts, 1.0)
    return jnp.where(counts > 0, new_c, centroids), assign


@dataclass
class PqIndex:
    codebooks: np.ndarray   # [m_sub, 256, ds]
    codes: np.ndarray       # [N, m_sub] uint8
    m_sub: int
    ds: int

    @staticmethod
    def build(vecs: np.ndarray, m_sub: int = 64, iters: int = 8,
              sample: int = 131_072, seed: int = 0) -> "PqIndex":
        n, d = vecs.shape
        assert d % m_sub == 0, (d, m_sub)
        ds = d // m_sub
        rng = np.random.default_rng(seed)
        train = vecs if n <= sample else vecs[rng.choice(n, sample, replace=False)]
        codebooks = np.zeros((m_sub, N_CENTROIDS, ds), np.float32)
        codes = np.zeros((n, m_sub), np.uint8)
        for j in range(m_sub):
            sub = jnp.asarray(train[:, j * ds : (j + 1) * ds], jnp.float32)
            init_rows = rng.choice(train.shape[0], N_CENTROIDS,
                                   replace=train.shape[0] < N_CENTROIDS)
            c = jnp.asarray(train[init_rows, j * ds : (j + 1) * ds], jnp.float32)
            for _ in range(iters):
                c, _a = _kmeans_step(sub, c, N_CENTROIDS)
            codebooks[j] = np.asarray(c)
            # encode the full corpus for this subspace (blockwise)
            full = vecs[:, j * ds : (j + 1) * ds]
            step = 1 << 18
            for start in range(0, n, step):
                block = jnp.asarray(full[start : start + step], jnp.float32)
                _c, assign = _kmeans_step(block, c, N_CENTROIDS)
                codes[start : start + step, j] = np.asarray(assign, np.uint8)
        log.info("pq built: m_sub=%d ds=%d bytes/vec=%d", m_sub, ds, m_sub)
        return PqIndex(codebooks, codes, m_sub, ds)

    def encode_query_luts(self, queries: np.ndarray) -> np.ndarray:
        """[B, d] → ADC LUTs [B, m_sub, 256] (query·centroid partial dots)."""
        q = np.atleast_2d(np.asarray(queries, np.float32))
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        b = q.shape[0]
        luts = np.zeros((b, self.m_sub, N_CENTROIDS), np.float32)
        for j in range(self.m_sub):
            qs = q[:, j * self.ds : (j + 1) * self.ds]        # [B, ds]
            luts[:, j, :] = qs @ self.codebooks[j].T          # [B, 256]
        return luts

    def search(self, queries: np.ndarray, k: int, vecs_f32: np.ndarray | None = None,
               oversample: int = 8,
               host_mask: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
        """ADC candidate generation (+ exact re-rank when vecs_f32 given)."""
        luts = self.encode_query_luts(queries)
        b = luts.shape[0]
        n = self.codes.shape[0]
        m = min(max(k * oversample, k), n)
        out_s = np.full((b, k), -np.inf, np.float32)
        out_i = np.full((b, k), -1, np.int64)
        j_idx = np.arange(self.m_sub)
        for qi in range(b):
            approx = luts[qi][j_idx[None, :], self.codes].sum(axis=1)  # [N]
            if host_mask is not None:
                approx = np.where(host_mask, approx, -np.inf)
            cand = np.argpartition(-approx, m - 1)[:m]
            if vecs_f32 is not None:
                qn = np.asarray(queries, np.float32).reshape(b, -1)[qi]
                qn = qn / max(float(np.linalg.norm(qn)), 1e-12)
                rows = vecs_f32[cand]
                norms = np.maximum(np.linalg.norm(rows, axis=1), 1e-12)
                exact = rows @ qn / norms
                order = np.argsort(-exact)[:k]
                out_s[qi, : order.size] = exact[order]
                out_i[qi, : order.size] = cand[order]
            else:
                order = np.argsort(-approx[cand])[:k]
                out_s[qi, : order.size] = approx[cand][order]
                out_i[qi, : order.size] = cand[order]
        return out_s, out_i

    @property
    def bytes_per_vector(self) -> int:
        return self.m_sub
