"""Product-quantization build/encode/search tests."""

import numpy as np

from rassengine_tpu.index.pq import PqIndex


def clustered(rng, n=4096, d=128, n_clusters=32):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    v = centers[rng.integers(0, n_clusters, n)] + 0.25 * rng.normal(size=(n, d)).astype(np.float32)
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def oracle(v, q, k):
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return np.argsort(-(qn @ v.T), axis=1)[:, :k]


class TestPq:
    def test_compression_ratio(self, rng):
        v = clustered(rng, n=1024)
        pq = PqIndex.build(v, m_sub=16, iters=4)
        assert pq.codes.shape == (1024, 16)
        assert pq.bytes_per_vector == 16      # vs 512 bytes f32 → 32×
        assert pq.codebooks.shape == (16, 256, 8)

    def test_reconstruction_reasonable(self, rng):
        v = clustered(rng, n=2048)
        pq = PqIndex.build(v, m_sub=16, iters=6)
        recon = np.concatenate(
            [pq.codebooks[j][pq.codes[:, j]] for j in range(pq.m_sub)], axis=1)
        err = np.linalg.norm(recon - v, axis=1).mean()
        assert err < 0.6  # unit vectors; quantization error well below norm

    def test_search_recall_with_rerank(self, rng):
        v = clustered(rng, n=4096)
        pq = PqIndex.build(v, m_sub=16, iters=6)
        q = v[:16] + 0.02 * rng.normal(size=(16, 128)).astype(np.float32)
        want = oracle(v, q, 5)
        _s, got = pq.search(q, 5, vecs_f32=v, oversample=32)
        rec = np.mean([len(set(g) & set(w)) / 5 for g, w in zip(got, want)])
        assert rec >= 0.9
        # re-ranked scores are exact cosines, descending
        s, _ = pq.search(q, 5, vecs_f32=v, oversample=32)
        assert np.all(np.diff(s, axis=1) <= 1e-6)

    def test_search_without_rerank_and_mask(self, rng):
        v = clustered(rng, n=1024)
        pq = PqIndex.build(v, m_sub=16, iters=4)
        mask = np.zeros(1024, bool)
        mask[512:] = True
        _s, rows = pq.search(v[7:8], 5, host_mask=mask)
        live = rows[rows >= 0]
        assert live.size and np.all(live >= 512)
