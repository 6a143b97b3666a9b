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
