"""Fused Pallas PQ4 kernel: interpret-mode parity vs the XLA ADC scan."""

import jax.numpy as jnp
import numpy as np
import pytest

from rassengine_tpu.index.pq4 import (Pq4Index, pq4_luts, pq4_topk,
                                      unpack_codes)
from rassengine_tpu.ops.fused_pq4 import (augment_packed, pq4_lutq,
                                          pq4_topk_fused, sort_for_window)


def clustered(rng, n, d, n_clusters=32):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    v = centers[rng.integers(0, n_clusters, size=n)] \
        + 0.25 * rng.normal(size=(n, d)).astype(np.float32)
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(11)
    n, d = 512, 64
    m_sub = Pq4Index.subvectors_for(d, 16)  # 32 subspaces
    v = clustered(rng, n, d)
    pq = Pq4Index.build(v, m_sub, iters=4, seed=2, nlist=16)
    q = clustered(rng, 3, d)
    return pq, v, q, n


def run_fused(pq, q, mask, m, block_rows=128):
    nlist_pad = ((pq.coarse.shape[0] + 127) // 128) * 128
    lutq = pq4_lutq(jnp.asarray(pq.codebooks), jnp.asarray(pq.coarse),
                    jnp.asarray(q), nlist_pad)
    aug = augment_packed(pq.packed, pq.assign)
    return pq4_topk_fused(jnp.asarray(aug), lutq, mask, m,
                          block_rows=block_rows, interpret=True)


class TestFusedPq4:
    def test_scores_match_numpy_adc(self, built):
        pq, v, q, n = built
        s, r = run_fused(pq, q, jnp.zeros(n, jnp.float32), m=8)
        s, r = np.asarray(s), np.asarray(r)
        codes = unpack_codes(pq.packed)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        ref = (qn @ pq.coarse.T)[:, pq.assign]
        for j in range(pq.m_sub):
            lut_j = qn[:, j * pq.ds:(j + 1) * pq.ds] @ pq.codebooks[j].T
            ref += lut_j[:, codes[:, j]]
        for b in range(q.shape[0]):
            want = np.sort(ref[b])[::-1][:8]
            np.testing.assert_allclose(np.sort(s[b])[::-1], want,
                                       rtol=2e-2, atol=2e-2)

    def test_matches_xla_scan(self, built):
        """Same pool recipe and fold order as pq4_topk → same candidates."""
        pq, v, q, n = built
        mask = jnp.zeros(n, jnp.float32)
        s_f, r_f = run_fused(pq, q, mask, m=16)
        luts, clut = pq4_luts(jnp.asarray(pq.codebooks),
                              jnp.asarray(pq.coarse), jnp.asarray(q))
        s_x, r_x = pq4_topk(jnp.asarray(pq.packed), jnp.asarray(pq.assign),
                            luts, clut, mask, m=16, block_rows=128)
        s_f, r_f = np.asarray(s_f), np.asarray(r_f)
        s_x, r_x = np.asarray(s_x), np.asarray(r_x)
        np.testing.assert_allclose(s_f, s_x, rtol=1e-4, atol=1e-4)
        # identical fold order → identical rows except float-assoc near-ties
        for b in range(q.shape[0]):
            same = np.mean(r_f[b] == r_x[b])
            assert same >= 0.9, (b, r_f[b], r_x[b])

    def test_mask_excludes_rows(self, built):
        pq, v, q, n = built
        mask = np.zeros(n, np.float32)
        mask[: n // 2] = -1e30  # exclude the first half
        s, r = run_fused(pq, q, jnp.asarray(mask), m=8)
        r = np.asarray(r)
        assert (r[r >= 0] >= n // 2).all()

    def test_pool_overflow_larger_m(self, built):
        pq, v, q, n = built
        s, r = run_fused(pq, q, jnp.zeros(n, jnp.float32), m=256)
        r = np.asarray(r)
        # 512 rows, pool 4 deep × 128 lanes ≥ 2m → all top-256 distinct
        for b in range(q.shape[0]):
            good = r[b][r[b] >= 0]
            assert len(set(good.tolist())) == good.size

    def test_windowed_sorted_matches_unwindowed(self, built):
        """Cluster-sorted rows + windowed coarse must return the same hits
        (as original row ids) as the unsorted full-width path."""
        pq, v, q, n = built
        nlist_pad = 128
        lutq = pq4_lutq(jnp.asarray(pq.codebooks), jnp.asarray(pq.coarse),
                        jnp.asarray(q), nlist_pad)
        mask = np.zeros(n, np.float32)
        mask[7] = -1e30  # exercise mask permutation too
        s_u, r_u = pq4_topk_fused(jnp.asarray(augment_packed(pq.packed,
                                                             pq.assign)),
                                  lutq, jnp.asarray(mask), 16,
                                  block_rows=128, interpret=True)
        order, wins = sort_for_window(pq.assign, 128, nlist_pad,
                                      win_width=128)
        assert wins is not None
        aug_s = augment_packed(pq.packed[order], pq.assign[order])
        s_w, r_w = pq4_topk_fused(jnp.asarray(aug_s), lutq,
                                  jnp.asarray(mask[order]), 16,
                                  block_rows=128, win_starts=jnp.asarray(wins),
                                  win_width=128, interpret=True)
        r_w = np.asarray(r_w)
        # map sorted positions back to original rows
        r_w_orig = np.where(r_w >= 0, order[np.clip(r_w, 0, n - 1)], -1)
        np.testing.assert_allclose(np.asarray(s_w), np.asarray(s_u),
                                   rtol=1e-4, atol=1e-4)
        for b in range(q.shape[0]):
            assert set(r_w_orig[b].tolist()) == set(np.asarray(r_u)[b].tolist())
        assert not (r_w_orig == 7).any()

    def test_store_sorted_view_consistent(self):
        """device_columns_pq4's fused-kernel layout must permute codes and
        assignments together and produce valid window starts."""
        from rassengine_tpu.index.store import TenantIndex

        rng = np.random.default_rng(3)
        n, d = 512, 64
        idx = TenantIndex("pqv", d, capacity=n, block_rows=128)
        v = clustered(rng, n, d, n_clusters=8)
        for i in range(n):
            idx.upsert({"doc_id": f"d{i}", "doc_type": "unstructured",
                        "unstructuredText": "x"}, v[i])
        cols = idx.device_columns_pq4(16)
        order = np.asarray(cols["order"])
        a = np.asarray(cols["assign"])
        aug = np.asarray(cols["aug_sorted"])
        # sorted assignments are nondecreasing and match the embedded bytes
        a_sorted = a[order]
        assert (np.diff(a_sorted) >= 0).all()
        back = aug[:, -2].astype(np.int64) | (aug[:, -1].astype(np.int64) << 8)
        np.testing.assert_array_equal(back, a_sorted)
        packed = np.asarray(cols["packed"])
        np.testing.assert_array_equal(aug[:, :-2], packed[order])
        if cols["win_starts"] is not None:
            w = np.asarray(cols["win_starts"])
            br = cols["block_rows"]
            nb = n // br
            amin = a_sorted.reshape(nb, br).min(1)
            amax = a_sorted.reshape(nb, br).max(1)
            assert (w <= amin).all()
            assert (amax - w < cols["win_width"]).all()
            assert (w % 128 == 0).all()

    def test_adaptive_oversample_escalates_on_hard_corpus(self):
        """VERDICT r2 #8: low ADC/exact rank agreement must escalate the
        oversample; benign corpora must not escalate."""
        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.fusion.strategies import Retriever
        from rassengine_tpu.index.store import FilterSpec, TenantIndex
        from rassengine_tpu.lexical.bm25 import LexicalIndex

        rng = np.random.default_rng(9)
        n, d = 4096, 64

        def mk(v, sub):
            idx = TenantIndex("ad", d, capacity=n, block_rows=512)
            for i in range(n):
                idx.upsert({"doc_id": f"d{i}", "doc_type": "unstructured",
                            "unstructuredText": "x"}, v[i])
            cfg = EngineConfig(ann_mode="pq", pq_subvectors=sub,
                               pq_oversample=1)
            return Retriever(idx, LexicalIndex(), cfg, use_pallas=False)

        # adversarial: thousands of near-duplicates per cluster — exact
        # scores are near-ties the quantized codes cannot order (the BENCH
        # round-2 adversarial PQ regime)
        centers = rng.normal(size=(4, d)).astype(np.float32)
        v_hard = centers[rng.integers(0, 4, size=n)] \
            + 0.01 * rng.normal(size=(n, d)).astype(np.float32)
        v_hard /= np.linalg.norm(v_hard, axis=1, keepdims=True)
        r = mk(v_hard, 8)
        r._sem_top_m_batch(v_hard[:4], FilterSpec(), 5)
        assert r._pq_escalated, "hard corpus must trigger escalation"

        # benign: well-separated clusters, 16-byte codes → no escalation
        v_easy = clustered(rng, n, d, n_clusters=16)
        r2 = mk(v_easy, 16)
        rows, _ = r2._sem_top_m_batch(v_easy[:4], FilterSpec(), 5)
        assert not r2._pq_escalated
        assert (rows[np.arange(4), 0] == np.arange(4)).all()  # self-hits

    def test_escalation_decays_on_benign_corpus(self):
        """VERDICT r3 weak #4: escalation must DECAY — a freak batch may
        escalate a benign tenant, but the periodic agreement re-probe must
        drop it back to the base configuration; a genuinely hard corpus must
        stay escalated; recall gates hold in both states."""
        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.fusion.strategies import Retriever
        from rassengine_tpu.index.store import FilterSpec, TenantIndex
        from rassengine_tpu.lexical.bm25 import LexicalIndex

        rng = np.random.default_rng(11)
        n, d = 4096, 64

        def mk(v, sub):
            idx = TenantIndex("dc", d, capacity=n, block_rows=512)
            for i in range(n):
                idx.upsert({"doc_id": f"d{i}", "doc_type": "unstructured",
                            "unstructuredText": "x"}, v[i])
            cfg = EngineConfig(ann_mode="pq", pq_subvectors=sub,
                               pq_oversample=1)
            return Retriever(idx, LexicalIndex(), cfg, use_pallas=False)

        # benign corpus escalated by fiat (the "freak batch" scenario):
        # the re-probe must de-escalate within one re-probe period
        v_easy = clustered(rng, n, d, n_clusters=16)
        r = mk(v_easy, 16)
        r._pq_esc.active = True
        r._pq_esc.reprobe_every = 4
        for b in range(4):
            rows, _ = r._sem_top_m_batch(v_easy[4 * b: 4 * b + 4],
                                         FilterSpec(), 5)
            # recall gate holds while escalated and after the flip
            assert (rows[np.arange(4), 0] == 4 * b + np.arange(4)).all()
        assert not r._pq_escalated, "benign corpus must de-escalate"
        assert r._pq_esc.flips == 1
        rows, _ = r._sem_top_m_batch(v_easy[:4], FilterSpec(), 5)
        assert (rows[np.arange(4), 0] == np.arange(4)).all()

        # hard corpus: stays escalated through many re-probe periods
        centers = rng.normal(size=(4, d)).astype(np.float32)
        v_hard = centers[rng.integers(0, 4, size=n)] \
            + 0.01 * rng.normal(size=(n, d)).astype(np.float32)
        v_hard /= np.linalg.norm(v_hard, axis=1, keepdims=True)
        rh = mk(v_hard, 8)
        rh._pq_esc.reprobe_every = 2
        rh._sem_top_m_batch(v_hard[:4], FilterSpec(), 5)
        assert rh._pq_escalated
        for b in range(6):
            rh._sem_top_m_batch(v_hard[4 * b: 4 * b + 4], FilterSpec(), 5)
        assert rh._pq_escalated, "hard corpus must stay escalated"

    def test_order_by_bound_matches_sequential(self, built):
        """Best-bound-first block ordering (the device IVF probe, VERDICT r2
        #6) must return the same candidates as sequential order — pruning is
        lossless branch-and-bound, not nprobe truncation."""
        pq, v, q, n = built
        nlist_pad = 128
        lutq = pq4_lutq(jnp.asarray(pq.codebooks), jnp.asarray(pq.coarse),
                        jnp.asarray(q[:1]), nlist_pad)
        order, wins = sort_for_window(pq.assign, 128, nlist_pad, 128)
        aug_s = jnp.asarray(augment_packed(pq.packed[order], pq.assign[order]))
        mask = jnp.zeros(n, jnp.float32)
        kw = dict(block_rows=128, win_starts=jnp.asarray(wins), win_width=128,
                  interpret=True)
        s_seq, r_seq = pq4_topk_fused(aug_s, lutq, mask, 16, **kw)
        s_ord, r_ord = pq4_topk_fused(aug_s, lutq, mask, 16,
                                      order_by_bound=True, **kw)
        np.testing.assert_allclose(np.asarray(s_ord), np.asarray(s_seq),
                                   rtol=1e-5, atol=1e-5)
        assert set(np.asarray(r_ord)[0].tolist()) == \
            set(np.asarray(r_seq)[0].tolist())

    def test_augment_roundtrip(self, built):
        pq, v, q, n = built
        aug = augment_packed(pq.packed, pq.assign)
        assert aug.shape == (n, pq.m_sub // 2 + 2)
        back = aug[:, -2].astype(np.int64) | (aug[:, -1].astype(np.int64) << 8)
        np.testing.assert_array_equal(back, pq.assign)
        np.testing.assert_array_equal(aug[:, :-2], pq.packed)


class TestWideCoarseFallback:
    """coarse_cols > 512 and not a multiple of 512 (nlist_pad 640/768/896
    arises for ~33k-65k-row corpora via nlist = n//64): the full-width
    coarse loop's last chunk is narrower than 512 — regression for a
    trace-time crash where the LUT slice clamped but the iota did not."""

    def test_nlist_pad_640_scores_match_numpy(self):
        rng = np.random.default_rng(5)
        n, d = 2048, 64
        m_sub = Pq4Index.subvectors_for(d, 16)
        v = clustered(rng, n, d, n_clusters=64)
        pq = Pq4Index.build(v, m_sub, iters=2, seed=3, nlist=640)
        q = clustered(rng, 2, d, n_clusters=64)
        nlist_pad = ((pq.coarse.shape[0] + 127) // 128) * 128
        assert nlist_pad == 640  # the regression regime
        s, r = run_fused(pq, q, jnp.zeros(n, jnp.float32), m=8)
        s, r = np.asarray(s), np.asarray(r)
        codes = unpack_codes(pq.packed)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        ref = (qn @ pq.coarse.T)[:, pq.assign]
        for j in range(pq.m_sub):
            lut_j = qn[:, j * pq.ds:(j + 1) * pq.ds] @ pq.codebooks[j].T
            ref += lut_j[:, codes[:, j]]
        for b in range(q.shape[0]):
            want = np.sort(ref[b])[::-1][:8]
            np.testing.assert_allclose(np.sort(s[b])[::-1], want,
                                       rtol=2e-2, atol=2e-2)
