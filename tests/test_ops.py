"""Pallas kernel tests in interpreter mode (CPU suite; compiled-mode parity is
exercised on the real chip by bench.py's correctness gate)."""

import numpy as np
import jax.numpy as jnp

from rassengine_tpu.index.quant import quantize_int8
from rassengine_tpu.ops.fused_topk import fused_topk, fused_topk_int8


def corpus(rng, n=512, d=128):
    v = rng.normal(size=(n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def oracle(v, q, k):
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return np.argsort(-(qn @ v.T), axis=1)[:, :k]


class TestFusedTopk:
    def test_matches_oracle(self, rng):
        v = corpus(rng)
        q = v[:4] + 0.01 * rng.normal(size=(4, 128)).astype(np.float32)
        mask = jnp.zeros(512, jnp.float32)
        s, rows = fused_topk(jnp.asarray(v, jnp.bfloat16), jnp.asarray(q), mask,
                             5, block_rows=128, interpret=True)
        want = oracle(v, q, 5)
        got = np.asarray(rows)
        hit = np.mean([len(set(g) & set(w)) / 5 for g, w in zip(got, want)])
        assert hit >= 0.95  # bf16 ties only
        assert np.all(np.diff(np.asarray(s), axis=1) <= 1e-6)

    def test_mask_excludes_rows(self, rng):
        v = corpus(rng)
        q = v[7:8]
        mask = np.zeros(512, np.float32)
        mask[:256] = -1e30
        _s, rows = fused_topk(jnp.asarray(v, jnp.bfloat16), jnp.asarray(q),
                              jnp.asarray(mask), 5, block_rows=128, interpret=True)
        assert np.all(np.asarray(rows) >= 256)

    def test_k_larger_than_one_block(self, rng):
        v = corpus(rng, n=256)
        q = v[:2]
        mask = jnp.zeros(256, jnp.float32)
        s, rows = fused_topk(jnp.asarray(v, jnp.bfloat16), jnp.asarray(q), mask,
                             17, block_rows=128, interpret=True)
        assert rows.shape == (2, 17)
        assert len(set(np.asarray(rows)[0].tolist())) == 17  # no duplicates


class TestFusedTopkInt8:
    def test_matches_oracle_after_scale(self, rng):
        v = corpus(rng)
        codes, scales = quantize_int8(v)
        q = v[:4] + 0.01 * rng.normal(size=(4, 128)).astype(np.float32)
        mask = jnp.zeros(512, jnp.float32)
        s, rows = fused_topk_int8(jnp.asarray(codes), jnp.asarray(scales),
                                  jnp.asarray(q), mask, 5, block_rows=128,
                                  interpret=True)
        want = oracle(v, q, 5)
        got = np.asarray(rows)
        hit = np.mean([len(set(g) & set(w)) / 5 for g, w in zip(got, want)])
        assert hit >= 0.9  # int8 quantization tail
        # scores approximate true cosines
        s = np.asarray(s)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        for b in range(4):
            true = qn[b] @ v[got[b][0]]
            assert abs(s[b, 0] - true) < 0.03

    def test_masked_rows_stay_neg_inf(self, rng):
        v = corpus(rng, n=128)
        codes, scales = quantize_int8(v)
        mask = np.full(128, -1e30, np.float32)  # everything filtered
        s, rows = fused_topk_int8(jnp.asarray(codes), jnp.asarray(scales),
                                  jnp.asarray(v[:1]), jnp.asarray(mask), 3,
                                  block_rows=128, interpret=True)
        assert np.all(np.asarray(s) <= -1e29)


class TestPooledVariants:
    def test_pooled_matches_oracle(self, rng):
        from rassengine_tpu.ops.fused_topk import fused_topk_pooled

        v = corpus(rng)
        q = v[:4] + 0.01 * rng.normal(size=(4, 128)).astype(np.float32)
        mask = jnp.zeros(512, jnp.float32)
        s, rows = fused_topk_pooled(jnp.asarray(v, jnp.bfloat16), jnp.asarray(q),
                                    mask, 5, block_rows=128, interpret=True)
        want = oracle(v, q, 5)
        got = np.asarray(rows)
        hit = np.mean([len(set(g) & set(w)) / 5 for g, w in zip(got, want)])
        assert hit >= 0.9  # lane-class top-2 pool; ties/collisions possible

    def test_pooled_int8_candidates(self, rng):
        from rassengine_tpu.ops.fused_topk import fused_topk_int8_pooled

        v = corpus(rng)
        codes, scales = quantize_int8(v)
        q = v[:4] + 0.01 * rng.normal(size=(4, 128)).astype(np.float32)
        mask = jnp.zeros(512, jnp.float32)
        s, rows = fused_topk_int8_pooled(jnp.asarray(codes), jnp.asarray(scales),
                                         jnp.asarray(q), mask, 20,
                                         block_rows=128, interpret=True)
        assert rows.shape == (4, 20)
        want = oracle(v, q, 5)
        got = np.asarray(rows)
        hit = np.mean([len(set(g) & set(w)) / 5 for g, w in zip(got, want)])
        assert hit >= 0.9  # top-5 members inside the 20 candidates

    def test_pooled_mask(self, rng):
        from rassengine_tpu.ops.fused_topk import fused_topk_pooled

        v = corpus(rng)
        mask = np.zeros(512, np.float32)
        mask[:256] = -1e30
        _s, rows = fused_topk_pooled(jnp.asarray(v, jnp.bfloat16),
                                     jnp.asarray(v[7:8]), jnp.asarray(mask), 5,
                                     block_rows=128, interpret=True)
        assert np.all(np.asarray(rows) >= 256)


class TestPackedPoolFold:
    """Packed (score-bits | row) int32 fold — the nb >= PACKED_MIN_BLOCKS fast
    path. Forced on via monkeypatch so small interpret-mode corpora cover it;
    the jit cache keys on the traced branch through the module global, so
    each test calls with a distinct (shape, k) to avoid stale-cache hits."""

    def _force_packed(self, monkeypatch):
        import importlib

        ft = importlib.import_module("rassengine_tpu.ops.fused_topk")
        monkeypatch.setattr(ft, "PACKED_MIN_BLOCKS", 1)
        # distinct jit cache: the wrapper branches on the global at trace
        # time, so clear to avoid reusing an unpacked trace for these shapes
        ft.fused_topk_pooled.clear_cache()
        ft.fused_topk_int8_pooled.clear_cache()
        return ft

    def test_packed_matches_unpacked_rows(self, rng, monkeypatch):
        import importlib

        ft = importlib.import_module("rassengine_tpu.ops.fused_topk")

        v = corpus(rng, n=1024)
        q = v[:4] + 0.01 * rng.normal(size=(4, 128)).astype(np.float32)
        mask = jnp.zeros(1024, jnp.float32)
        ft.fused_topk_pooled.clear_cache()
        s0, r0 = ft.fused_topk_pooled(jnp.asarray(v, jnp.bfloat16),
                                      jnp.asarray(q), mask, 5,
                                      block_rows=128, interpret=True)
        s0, r0 = np.asarray(s0), np.asarray(r0)
        ftp = self._force_packed(monkeypatch)
        s1, r1 = ftp.fused_topk_pooled(jnp.asarray(v, jnp.bfloat16),
                                       jnp.asarray(q), mask, 5,
                                       block_rows=128, interpret=True)
        s1, r1 = np.asarray(s1), np.asarray(r1)
        ftp.fused_topk_pooled.clear_cache()
        # row sets agree (score truncation can only swap inside the tie band)
        hit = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(r0, r1)])
        assert hit >= 0.9
        # unpacked-bias scores approximate the exact fold's scores
        assert np.max(np.abs(s1 - s0)) < 5e-3

    def test_packed_mask_excludes_rows(self, rng, monkeypatch):
        ft = self._force_packed(monkeypatch)
        v = corpus(rng)
        mask = np.zeros(512, np.float32)
        mask[:256] = -1e30
        s, rows = ft.fused_topk_pooled(jnp.asarray(v, jnp.bfloat16),
                                       jnp.asarray(v[7:8]), jnp.asarray(mask),
                                       7, block_rows=128, interpret=True)
        assert np.all(np.asarray(rows) >= 256)
        assert np.all(np.asarray(s) > -1.0e29)  # valid scores, bias removed
        ft.fused_topk_pooled.clear_cache()

    def test_packed_all_filtered_stays_neg(self, rng, monkeypatch):
        ft = self._force_packed(monkeypatch)
        v = corpus(rng, n=256)
        mask = np.full(256, -1e30, np.float32)
        s, _rows = ft.fused_topk_pooled(jnp.asarray(v, jnp.bfloat16),
                                        jnp.asarray(v[:1]), jnp.asarray(mask),
                                        3, block_rows=128, interpret=True)
        assert np.all(np.asarray(s) <= ft.NEG_INF / 2)
        ft.fused_topk_pooled.clear_cache()

    def test_packed_int8_matches_oracle(self, rng, monkeypatch):
        from rassengine_tpu.index.quant import quantize_int8

        ft = self._force_packed(monkeypatch)
        v = corpus(rng, n=1024)
        codes, scales = quantize_int8(v)
        q = v[:4] + 0.01 * rng.normal(size=(4, 128)).astype(np.float32)
        mask = jnp.zeros(1024, jnp.float32)
        s, rows = ft.fused_topk_int8_pooled(jnp.asarray(codes),
                                            jnp.asarray(scales),
                                            jnp.asarray(q), mask, 5,
                                            block_rows=128, interpret=True)
        want = oracle(v, q, 5)
        got = np.asarray(rows)
        hit = np.mean([len(set(g) & set(w)) / 5 for g, w in zip(got, want)])
        assert hit >= 0.9
        # scores come back in cosine units (per-query bias fully removed)
        s = np.asarray(s)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        for b in range(4):
            true = qn[b] @ v[got[b][0]]
            assert abs(s[b, 0] - true) < 0.03
        ft.fused_topk_int8_pooled.clear_cache()

    def test_packed_additive_mask_boost_wins(self, rng, monkeypatch):
        # a large positive additive term (BM25-style) must dominate in the
        # packed representation exactly as in the exact fold
        ft = self._force_packed(monkeypatch)
        v = corpus(rng)
        mask = np.zeros(512, np.float32)
        mask[300] = 10.0
        _s, rows = ft.fused_topk_pooled(jnp.asarray(v, jnp.bfloat16),
                                        jnp.asarray(v[7:8]), jnp.asarray(mask),
                                        1, block_rows=128, interpret=True)
        assert np.asarray(rows)[0, 0] == 300
        ft.fused_topk_pooled.clear_cache()


class TestIntEpiloguePoolFold:
    """All-integer int8 epilogue: codes quantized per BLOCK
    (quantize_int8_block), additive mask pre-quantized to integer score
    units, selection fold entirely in int32, scores returned in TRUE units
    (cosine + mask) with filtered rows at NEG_INF."""

    def _force_packed(self, monkeypatch):
        import importlib

        ft = importlib.import_module("rassengine_tpu.ops.fused_topk")
        monkeypatch.setattr(ft, "PACKED_MIN_BLOCKS", 1)
        ft.fused_topk_int8_pooled.clear_cache()
        return ft

    def _blk(self, v, block_rows):
        from rassengine_tpu.index.quant import quantize_int8_block

        codes, bs = quantize_int8_block(v, block_rows)
        scales = np.repeat(bs, block_rows).astype(np.float32)
        return (jnp.asarray(codes), jnp.asarray(scales), jnp.asarray(bs))

    def test_int_matches_oracle_true_units(self, rng, monkeypatch):
        ft = self._force_packed(monkeypatch)
        v = corpus(rng, n=1024)
        codes, scales, bs = self._blk(v, 128)
        q = v[:4] + 0.01 * rng.normal(size=(4, 128)).astype(np.float32)
        mask = jnp.zeros(1024, jnp.float32)
        s, rows = ft.fused_topk_int8_pooled(codes, scales, jnp.asarray(q),
                                            mask, 5, block_rows=128,
                                            interpret=True,
                                            block_scales=bs)
        want = oracle(v, q, 5)
        got = np.asarray(rows)
        hit = np.mean([len(set(g) & set(w)) / 5 for g, w in zip(got, want)])
        assert hit >= 0.9
        # true-unit scores: top-1 ≈ exact cosine of the returned row
        s = np.asarray(s)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        for b in range(4):
            true = qn[b] @ v[got[b][0]]
            assert abs(s[b, 0] - true) < 0.03
        ft.fused_topk_int8_pooled.clear_cache()

    def test_int_mask_excludes_and_neg_inf(self, rng, monkeypatch):
        ft = self._force_packed(monkeypatch)
        v = corpus(rng)
        codes, scales, bs = self._blk(v, 128)
        mask = np.zeros(512, np.float32)
        mask[:256] = ft.NEG_INF
        s, rows = ft.fused_topk_int8_pooled(codes, scales,
                                            jnp.asarray(v[7:8]),
                                            jnp.asarray(mask), 7,
                                            block_rows=128, interpret=True,
                                            block_scales=bs)
        assert np.all(np.asarray(rows) >= 256)
        assert np.all(np.asarray(s) > -1.5)  # valid true-unit scores
        ft.fused_topk_int8_pooled.clear_cache()

    def test_int_all_filtered_neg_inf(self, rng, monkeypatch):
        ft = self._force_packed(monkeypatch)
        v = corpus(rng, n=256)
        codes, scales, bs = self._blk(v, 128)
        mask = np.full(256, ft.NEG_INF, np.float32)
        s, _rows = ft.fused_topk_int8_pooled(codes, scales,
                                             jnp.asarray(v[:1]),
                                             jnp.asarray(mask), 3,
                                             block_rows=128, interpret=True,
                                             block_scales=bs)
        assert np.all(np.asarray(s) <= ft.NEG_INF / 2)
        ft.fused_topk_int8_pooled.clear_cache()

    def test_int_additive_boost_true_units(self, rng, monkeypatch):
        # the mask is in TRUE units under the block-scale contract: a +10
        # boost must dominate, and the returned score must include it
        ft = self._force_packed(monkeypatch)
        v = corpus(rng)
        codes, scales, bs = self._blk(v, 128)
        mask = np.zeros(512, np.float32)
        mask[300] = 10.0
        s, rows = ft.fused_topk_int8_pooled(codes, scales,
                                            jnp.asarray(v[7:8]),
                                            jnp.asarray(mask), 1,
                                            block_rows=128, interpret=True,
                                            block_scales=bs)
        assert np.asarray(rows)[0, 0] == 300
        assert 9.0 < float(np.asarray(s)[0, 0]) < 11.5
        ft.fused_topk_int8_pooled.clear_cache()

    def test_small_corpus_fallback_same_contract(self, rng):
        # nb < PACKED_MIN_BLOCKS with block_scales → f32 per-row kernel
        # under the SAME true-unit mask/score contract
        import importlib

        ft = importlib.import_module("rassengine_tpu.ops.fused_topk")
        assert ft.PACKED_MIN_BLOCKS > 4  # this corpus stays under it
        v = corpus(rng)
        codes, scales, bs = self._blk(v, 128)
        mask = np.zeros(512, np.float32)
        mask[300] = 10.0
        mask[:128] = ft.NEG_INF
        ft.fused_topk_int8_pooled.clear_cache()
        s, rows = ft.fused_topk_int8_pooled(codes, scales,
                                            jnp.asarray(v[7:8]),
                                            jnp.asarray(mask), 2,
                                            block_rows=128, interpret=True,
                                            block_scales=bs)
        s, rows = np.asarray(s), np.asarray(rows)
        assert rows[0, 0] == 300 and 9.0 < s[0, 0] < 11.5
        assert np.all(rows >= 128)
        ft.fused_topk_int8_pooled.clear_cache()

    def test_block_quant_candidate_recall(self, rng):
        # per-block scales cost ≲1 bit on unit-norm rows: top-5-in-20
        # candidate recall vs the f32 oracle must hold
        from rassengine_tpu.index.quant import quantize_int8_block

        v = corpus(rng, n=2048)
        codes, bs = quantize_int8_block(v, 256)
        deq = codes.astype(np.float32) * np.repeat(bs, 256)[:, None]
        q = v[:16] + 0.02 * rng.normal(size=(16, 128)).astype(np.float32)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        want = oracle(v, q, 5)
        approx = np.argsort(-(qn @ deq.T), axis=1)[:, :20]
        hit = np.mean([len(set(w) & set(a)) / 5 for w, a in zip(want, approx)])
        assert hit >= 0.95


class TestUnfilledSlots:
    def test_multiblock_merge_pads_minus_one(self, rng):
        """< k rows survive the mask, spread over multiple merging blocks:
        unfilled slots must return -1, not a duplicate of the top-1 row."""
        from rassengine_tpu.ops.fused_topk import fused_topk

        cap, d, k = 512, 64, 10
        v = rng.normal(size=(cap, d)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        mask = np.full(cap, -1.0e30, np.float32)
        for r in (3, 130, 260, 390):  # one survivor per 128-block
            mask[r] = 0.0
        q = v[:2]
        s, rows = fused_topk(jnp.asarray(v, jnp.bfloat16), jnp.asarray(q),
                             jnp.asarray(mask), k, block_rows=128,
                             interpret=True)
        rows = np.asarray(rows)
        for b in range(2):
            live = rows[b][rows[b] >= 0]
            assert len(set(live.tolist())) == len(live), rows[b]
            assert set(live.tolist()) <= {3, 130, 260, 390}
            assert np.all(rows[b][4:] == -1), rows[b]
