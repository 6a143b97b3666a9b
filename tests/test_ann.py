"""ANN paths: int8 scan + re-rank, IVF build/search — recall vs exact oracle."""

import numpy as np
import jax.numpy as jnp

from rassengine_tpu.index.ivf import IvfIndex
from rassengine_tpu.index.quant import int8_scan_topm, int8_topk_rerank, quantize_int8


def corpus(rng, n=4096, d=64):
    v = rng.normal(size=(n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def oracle_topk(v, q, k):
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return np.argsort(-(qn @ v.T), axis=1)[:, :k]


def recall(got, want):
    return np.mean([len(set(g) & set(w)) / len(w) for g, w in zip(got, want)])


class TestInt8:
    def test_quantize_roundtrip_error_small(self, rng):
        v = corpus(rng, 128)
        codes, scales = quantize_int8(v)
        recon = codes.astype(np.float32) * scales[:, None]
        err = np.abs(recon - v).max()
        assert err <= 1.0 / 127.0 + 1e-6

    def test_scan_recall(self, rng):
        v = corpus(rng, 2048)
        codes, scales = quantize_int8(v)
        q = v[:8] + 0.02 * rng.normal(size=(8, 64)).astype(np.float32)
        mask = jnp.zeros(2048, jnp.float32)
        _s, rows = int8_scan_topm(jnp.asarray(codes), jnp.asarray(scales),
                                  jnp.asarray(q), mask, 10)
        want = oracle_topk(v, q, 10)
        assert recall(np.asarray(rows), want) >= 0.9

    def test_rerank_recall_at_k(self, rng):
        v = corpus(rng, 2048)
        codes, scales = quantize_int8(v)
        q = v[:8] + 0.02 * rng.normal(size=(8, 64)).astype(np.float32)
        mask = jnp.zeros(2048, jnp.float32)
        s, rows = int8_topk_rerank(jnp.asarray(codes), jnp.asarray(scales), v,
                                   jnp.asarray(q), mask, k=5, oversample=8)
        want = oracle_topk(v, q, 5)
        assert recall(rows, want) >= 0.97
        # re-ranked scores are exact cosines, descending
        assert np.all(np.diff(s, axis=1) <= 1e-6)

    def test_mask_respected(self, rng):
        v = corpus(rng, 512)
        codes, scales = quantize_int8(v)
        mask = np.zeros(512, np.float32)
        mask[: 256] = -1e30  # first half filtered
        q = v[10:11]
        _s, rows = int8_scan_topm(jnp.asarray(codes), jnp.asarray(scales),
                                  jnp.asarray(q), jnp.asarray(mask), 10)
        assert np.all(np.asarray(rows) >= 256)


class TestIvf:
    def test_build_partitions_all_rows(self, rng):
        v = corpus(rng, 4096)
        ivf = IvfIndex.build(v, nlist=64, iters=5)
        assert sorted(ivf.order.tolist()) == list(range(4096))
        assert ivf.offsets[-1] == 4096

    def test_search_recall_vs_nprobe(self, rng):
        v = corpus(rng, 4096)
        ivf = IvfIndex.build(v, nlist=64, iters=8)
        q = v[:16] + 0.02 * rng.normal(size=(16, 64)).astype(np.float32)
        want = oracle_topk(v, q, 10)
        _s, rows_lo = ivf.search(v, q, 10, nprobe=2)
        _s, rows_hi = ivf.search(v, q, 10, nprobe=32)
        _s, rows_all = ivf.search(v, q, 10, nprobe=64)
        r_lo, r_hi = recall(rows_lo, want), recall(rows_hi, want)
        assert r_hi >= r_lo
        # unclustered gaussian data is IVF's worst case; half the lists still
        # recovers most of the true top-10, and probing all lists is exact
        assert r_hi >= 0.8
        assert recall(rows_all, want) == 1.0

    def test_self_query_found(self, rng):
        v = corpus(rng, 1024)
        ivf = IvfIndex.build(v, nlist=32, iters=5)
        _s, rows = ivf.search(v, v[123:124], 1, nprobe=1)
        assert rows[0, 0] == 123

    def test_host_mask(self, rng):
        v = corpus(rng, 1024)
        ivf = IvfIndex.build(v, nlist=16, iters=3)
        mask = np.zeros(1024, bool)
        mask[500:] = True
        _s, rows = ivf.search(v, v[10:11], 5, nprobe=16, host_mask=mask)
        live = rows[rows >= 0]
        assert live.size and np.all(live >= 500)


class TestIvfDeviceProbe:
    """One-dispatch device probe (index/ivf.py:_probe_kernel, VERDICT r2 #6)."""

    def test_full_probe_is_exact(self, rng):
        v = corpus(rng, 2048)
        ivf = IvfIndex.build(v, nlist=32, iters=5)
        q = v[:8] + 0.02 * rng.normal(size=(8, 64)).astype(np.float32)
        mask = jnp.zeros(2048, jnp.float32)
        _s, r = ivf.probe_device(jnp.asarray(v, jnp.bfloat16),
                                 jnp.asarray(q), mask, 10, nprobe=32)
        want = oracle_topk(v, q, 10)
        # probing every list reads every row; bf16 scoring can flip near-ties
        assert recall(np.asarray(r), want) >= 0.95

    def test_parity_with_host_search(self, rng):
        v = corpus(rng, 2048)
        ivf = IvfIndex.build(v, nlist=32, iters=5)
        q = v[:16] + 0.02 * rng.normal(size=(16, 64)).astype(np.float32)
        mask = jnp.zeros(2048, jnp.float32)
        _s, r_dev = ivf.probe_device(jnp.asarray(v, jnp.bfloat16),
                                     jnp.asarray(q), mask, 10, nprobe=8)
        _s, r_host = ivf.search(v, q, 10, nprobe=8)
        # same lists probed, same candidates -> same top-10 sets (mod bf16 ties)
        agree = recall(np.asarray(r_dev), r_host)
        assert agree >= 0.95

    def test_additive_mask_respected(self, rng):
        v = corpus(rng, 1024)
        ivf = IvfIndex.build(v, nlist=16, iters=4)
        mask = np.zeros(1024, np.float32)
        mask[:600] = -1e30
        _s, r = ivf.probe_device(jnp.asarray(v, jnp.bfloat16),
                                 jnp.asarray(v[10:11]), jnp.asarray(mask),
                                 5, nprobe=16)
        live = np.asarray(r)[np.asarray(r) >= 0]
        assert live.size and np.all(live >= 600)

    def test_all_masked_returns_minus_one(self, rng):
        v = corpus(rng, 512)
        ivf = IvfIndex.build(v, nlist=8, iters=3)
        mask = np.full(512, -1e30, np.float32)
        _s, r = ivf.probe_device(jnp.asarray(v, jnp.bfloat16),
                                 jnp.asarray(v[:2]), jnp.asarray(mask),
                                 5, nprobe=8)
        assert np.all(np.asarray(r) == -1)

    def test_int8_gather_source(self, rng):
        from rassengine_tpu.index.quant import quantize_int8
        v = corpus(rng, 2048)
        ivf = IvfIndex.build(v, nlist=32, iters=5)
        codes, scales = quantize_int8(v)
        q = v[:8] + 0.02 * rng.normal(size=(8, 64)).astype(np.float32)
        mask = jnp.zeros(2048, jnp.float32)
        _s, r = ivf.probe_device(jnp.asarray(codes), jnp.asarray(q), mask,
                                 10, nprobe=32, scales=jnp.asarray(scales))
        want = oracle_topk(v, q, 10)
        assert recall(np.asarray(r), want) >= 0.9

    def test_budget_truncation_degrades_gracefully(self, rng):
        v = corpus(rng, 2048)
        ivf = IvfIndex.build(v, nlist=16, iters=4)
        q = v[:8] + 0.02 * rng.normal(size=(8, 64)).astype(np.float32)
        mask = jnp.zeros(2048, jnp.float32)
        want = oracle_topk(v, q, 10)
        _s, r_tight = ivf.probe_device(jnp.asarray(v, jnp.bfloat16),
                                       jnp.asarray(q), mask, 10, nprobe=8,
                                       budget_factor=0.5)
        _s, r_wide = ivf.probe_device(jnp.asarray(v, jnp.bfloat16),
                                      jnp.asarray(q), mask, 10, nprobe=8,
                                      budget_factor=4.0)
        # tight budget still returns valid rows; wider budget never hurts
        assert np.all(np.asarray(r_tight)[:, 0] >= 0)
        assert recall(np.asarray(r_wide), want) >= recall(
            np.asarray(r_tight), want) - 1e-9

    def test_self_query_found_device(self, rng):
        v = corpus(rng, 1024)
        ivf = IvfIndex.build(v, nlist=32, iters=5)
        mask = jnp.zeros(1024, jnp.float32)
        _s, r = ivf.probe_device(jnp.asarray(v, jnp.bfloat16),
                                 jnp.asarray(v[123:124]), mask, 1, nprobe=1)
        assert np.asarray(r)[0, 0] == 123


def clustered(rng, n, d, n_clusters=32):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    v = centers[rng.integers(0, n_clusters, size=n)] \
        + 0.25 * rng.normal(size=(n, d)).astype(np.float32)
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


class TestIvfPqProbe:
    """PQ4-source device probe (index/ivf.py:_probe_kernel_pq, ROADMAP r3 #3):
    the gather source is packed 4-bit codes, scored by ADC — the single-query
    path for corpora where even int8 codes bust HBM."""

    def _build(self, rng, n=2048, d=64, m_sub=16):
        from rassengine_tpu.index.pq4 import Pq4Index

        v = clustered(rng, n, d)
        pq = Pq4Index.build(v, m_sub, nlist=32)
        ivf = IvfIndex.from_assignments(pq.coarse, pq.assign)
        return v, pq, ivf

    def _rerank(self, v, q, rows, k):
        out = np.full((rows.shape[0], k), -1, np.int64)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        for b in range(rows.shape[0]):
            rb = rows[b][rows[b] >= 0]
            s = v[rb] @ qn[b]
            out[b, : min(k, rb.size)] = rb[np.argsort(-s)[:k]]
        return out

    def test_from_assignments_partitions_all_rows(self, rng):
        _v, pq, ivf = self._build(rng)
        assert sorted(ivf.order.tolist()) == list(range(2048))
        assert ivf.offsets[-1] == 2048
        # lists agree with the quantizer's own assignment
        for lst in (0, 7, 31):
            rows = ivf.order[ivf.offsets[lst]: ivf.offsets[lst + 1]]
            assert np.all(pq.assign[rows] == lst)

    def test_full_probe_rerank_recall(self, rng):
        v, pq, ivf = self._build(rng)
        q = v[:8] + 0.02 * rng.normal(size=(8, 64)).astype(np.float32)
        mask = jnp.zeros(2048, jnp.float32)
        _s, r = ivf.probe_device_pq(jnp.asarray(pq.packed),
                                    jnp.asarray(pq.codebooks),
                                    jnp.asarray(q), mask, 256, nprobe=32)
        got = self._rerank(v, q, np.asarray(r), 10)
        want = oracle_topk(v, q, 10)
        # all lists probed + wide candidate set + exact re-rank ≈ exact
        assert recall(got, want) >= 0.95

    def test_narrow_probe_still_finds_self(self, rng):
        v, pq, ivf = self._build(rng)
        mask = jnp.zeros(2048, jnp.float32)
        _s, r = ivf.probe_device_pq(jnp.asarray(pq.packed),
                                    jnp.asarray(pq.codebooks),
                                    jnp.asarray(v[123:124]), mask, 64,
                                    nprobe=2)
        assert 123 in np.asarray(r)[0].tolist()

    def test_additive_mask_respected(self, rng):
        v, pq, ivf = self._build(rng, n=1024)
        mask = np.zeros(1024, np.float32)
        mask[:600] = -1e30
        _s, r = ivf.probe_device_pq(jnp.asarray(pq.packed),
                                    jnp.asarray(pq.codebooks),
                                    jnp.asarray(v[10:11]),
                                    jnp.asarray(mask), 32, nprobe=32)
        live = np.asarray(r)[np.asarray(r) >= 0]
        assert live.size and np.all(live >= 600)

    def test_adc_scores_match_numpy_oracle(self, rng):
        """Probe at nprobe=all is an EXACT top-k over the ADC scores: compare
        against a numpy decode-and-dot oracle (q·c(aᵢ) + Σⱼ lut[j, codeᵢⱼ])."""
        from rassengine_tpu.index.pq4 import unpack_codes

        v, pq, ivf = self._build(rng, n=1024)
        q = v[:4]
        mask = jnp.zeros(1024, jnp.float32)
        s_probe, _r = ivf.probe_device_pq(
            jnp.asarray(pq.packed), jnp.asarray(pq.codebooks),
            jnp.asarray(q), mask, 16, nprobe=32)
        codes = unpack_codes(pq.packed)                       # [N, m_sub]
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        m_sub, _, ds = pq.codebooks.shape
        luts = np.einsum("bmd,mcd->bmc",
                         qn.reshape(4, m_sub, ds), pq.codebooks)  # [B, m, 16]
        adc = np.stack([luts[b, np.arange(m_sub), codes].sum(axis=1)
                        for b in range(4)])                    # [B, N]
        coarse = (qn @ pq.coarse.T)[np.arange(4)[:, None],
                                    pq.assign[None, :]]        # [B, N]
        oracle = np.sort(adc + coarse, axis=1)[:, ::-1][:, :16]
        np.testing.assert_allclose(np.asarray(s_probe), oracle, atol=2e-3)


class TestInt8RerankMask:
    def test_masked_rows_not_resurrected(self, rng):
        """Filter leaves fewer rows than the candidate width: masked rows pad
        the scan's candidate tail and the exact re-rank must NOT re-rank
        them back in by raw cosine."""
        v = corpus(rng, 512)
        codes, scales = quantize_int8(v)
        mask = np.full(512, -1.0e30, np.float32)
        mask[:8] = 0.0  # only 8 in-filter rows; k*oversample = 40 > 8
        s, rows = int8_topk_rerank(jnp.asarray(codes), jnp.asarray(scales), v,
                                   jnp.asarray(v[:2]), jnp.asarray(mask),
                                   k=5, oversample=8)
        rows = np.asarray(rows)
        assert np.all((rows < 8) | (rows == -1)), rows
        assert rows[0, 0] == 0 and rows[1, 0] == 1  # self-match survives

    def test_zero_query_no_nan(self, rng):
        v = corpus(rng, 256)
        codes, scales = quantize_int8(v)
        s, rows = int8_scan_topm(jnp.asarray(codes), jnp.asarray(scales),
                                 jnp.zeros((1, 64)), jnp.zeros(256), 5)
        assert np.isfinite(np.asarray(s)).all()
