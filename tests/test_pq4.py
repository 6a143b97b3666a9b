"""4-bit PQ: ADC parity with numpy, serving auto-select, staleness regression."""

import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.fusion.strategies import Retriever
from rassengine_tpu.index.pq4 import (Pq4Index, pack_codes, pq4_luts,
                                      pq4_topk, unpack_codes)
from rassengine_tpu.index.store import FilterSpec, TenantIndex
from rassengine_tpu.lexical.bm25 import LexicalIndex


def clustered(rng, n, d, n_clusters=32):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    v = centers[rng.integers(0, n_clusters, size=n)] \
        + 0.25 * rng.normal(size=(n, d)).astype(np.float32)
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


class TestPq4Core:
    def test_subvectors_for(self):
        assert Pq4Index.subvectors_for(1024, 64) == 128
        assert Pq4Index.subvectors_for(1024, 32) == 64
        m = Pq4Index.subvectors_for(64, 16)
        assert 64 % m == 0 and m % 16 == 0

    def test_pack_roundtrip(self):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 16, size=(7, 32)).astype(np.uint8)
        packed = pack_codes(codes)
        np.testing.assert_array_equal(unpack_codes(packed), codes)

    def test_adc_matches_numpy_reference(self):
        """pq4_topk scores must equal the brute-force residual-ADC sum."""
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        n, d = 256, 64
        m_sub = Pq4Index.subvectors_for(d, 16)  # 32 subspaces, ds=2
        v = clustered(rng, n, d)
        pq = Pq4Index.build(v, m_sub, iters=4, seed=1, nlist=16)
        q = clustered(rng, 3, d)
        luts, clut = pq4_luts(jnp.asarray(pq.codebooks), jnp.asarray(pq.coarse),
                              jnp.asarray(q))
        mask = jnp.zeros(n, jnp.float32)
        s, r = pq4_topk(jnp.asarray(pq.packed), jnp.asarray(pq.assign),
                        luts, clut, mask, m=8, block_rows=128)
        s, r = np.asarray(s), np.asarray(r)
        # numpy reference: coarse term + residual ADC
        ds = pq.ds
        codes = unpack_codes(pq.packed)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        ref = (qn @ pq.coarse.T)[:, pq.assign]                    # [B, n]
        for j in range(m_sub):
            lut_j = qn[:, j * ds:(j + 1) * ds] @ pq.codebooks[j].T  # [B, 16]
            ref += lut_j[:, codes[:, j]]
        for b in range(3):
            want = np.sort(ref[b])[::-1][:8]
            np.testing.assert_allclose(np.sort(s[b])[::-1], want,
                                       rtol=2e-2, atol=2e-2)

    def test_residual_reconstruction_close(self):
        """coarse[assign] + decoded residual ≈ the original vector."""
        rng = np.random.default_rng(4)
        n, d = 512, 64
        v = clustered(rng, n, d, n_clusters=8)
        pq = Pq4Index.build(v, 32, iters=6, seed=4, nlist=8)
        codes = unpack_codes(pq.packed)
        recon = pq.coarse[pq.assign].copy()
        for j in range(32):
            recon[:, j * pq.ds:(j + 1) * pq.ds] += pq.codebooks[j][codes[:, j]]
        err = np.linalg.norm(recon - v, axis=1)
        assert float(err.mean()) < 0.35  # residual PQ beats raw-PQ distortion

    def test_recall_after_rerank(self):
        rng = np.random.default_rng(2)
        n, d, k = 4096, 64, 5
        v = clustered(rng, n, d)
        q = v[:16] + 0.02 * rng.normal(size=(16, d)).astype(np.float32)
        idx = TenantIndex("pq", d, capacity=n, block_rows=512)
        for i in range(n):
            idx.upsert({"doc_id": f"d{i}", "doc_type": "unstructured",
                        "unstructuredText": "x"}, v[i])
        cfg = EngineConfig(ann_mode="pq", pq_subvectors=16, pq_oversample=32)
        r = Retriever(idx, LexicalIndex(), cfg, use_pallas=False)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        want = np.argsort(-(qn @ v.T), axis=1)[:, :k]
        rows, scores = r._sem_top_m_batch(q, FilterSpec(), k)
        rec = np.mean([len(set(rows[b].tolist()) & set(want[b].tolist())) / k
                       for b in range(q.shape[0])])
        assert rec >= 0.95, rec


class TestServingAutoSelect:
    def _mk(self, rng, n=512, d=32, **cfg_kw):
        v = clustered(rng, n, d)
        idx = TenantIndex("t", d, capacity=n, block_rows=256)
        lex = LexicalIndex()
        for i in range(n):
            doc = {"doc_id": f"d{i}", "doc_type": "unstructured",
                   "patientId": f"p{i % 5}",
                   "unstructuredText": f"note number {i}"}
            row = idx.upsert(doc, v[i])
            lex.index_doc(row, doc)
        cfg = EngineConfig(**cfg_kw)
        return Retriever(idx, lex, cfg, use_pallas=False), v

    def test_tier_selection_by_budget(self, rng):
        r, _ = self._mk(rng, ann_threshold=100,
                        int8_hbm_budget_bytes=1)  # force beyond-int8
        assert r._scan_tier() == "pq"
        r2, _ = self._mk(rng, ann_threshold=10**9)
        assert r2._scan_tier() == "exact"
        r3, _ = self._mk(rng, ann_mode="ivf")
        assert r3._scan_tier() == "ivf"

    def test_pq_serving_finds_self_match(self, rng):
        r, v = self._mk(rng, ann_mode="pq", pq_subvectors=8, pq_oversample=16)
        hits = r.semantic_search("q", v[7], k=3)
        assert hits and hits[0][0]["doc_id"] == "d7"
        assert hits[0][1] > 0.99  # exact re-rank restores the true cosine

    def test_pq_respects_patient_filter(self, rng):
        r, v = self._mk(rng, ann_mode="pq", pq_subvectors=8, pq_oversample=16)
        hits = r.semantic_search("q", v[7], k=5, patient_id="p1")
        assert hits and all(h[0]["patientId"] == "p1" for h in hits)

    def test_ivf_serving_and_fresh_tail(self, rng):
        r, v = self._mk(rng, ann_mode="ivf", ivf_nlist=16, ivf_nprobe=8)
        hits = r.semantic_search("q", v[3], k=3)
        assert hits and hits[0][0]["doc_id"] == "d3"
        built0 = r._ivf_cache[0]
        # ingest a few more rows: must be findable WITHOUT an IVF rebuild
        rng2 = np.random.default_rng(99)
        nv = clustered(rng2, 1, r.index.dim)[0]
        row = r.index.upsert({"doc_id": "fresh", "doc_type": "unstructured",
                              "patientId": "p9", "unstructuredText": "fresh"},
                             nv)
        hits = r.semantic_search("q", nv, k=3)
        assert hits[0][0]["doc_id"] == "fresh"
        assert r._ivf_cache[0] == built0  # tail-merged, not rebuilt

    def test_ivf_pq_source_serving(self, rng):
        """ann_mode=ivf on a >int8-budget corpus routes to the PQ4-source
        probe (strategies._ivf_probe_pq, ROADMAP r3 #3) — recall survives,
        scores are exact re-ranked cosines."""
        r, v = self._mk(rng, ann_mode="ivf", int8_hbm_budget_bytes=1,
                        pq_subvectors=8, pq_oversample=16, ivf_nprobe=8)
        hits = r.semantic_search("q", v[7], k=3)
        assert hits and hits[0][0]["doc_id"] == "d7"
        assert hits[0][1] > 0.99
        assert r._ivf_pq_cache is not None        # PQ path, not k-means IVF
        assert r._ivf_cache is None

    def test_ivf_pq_source_respects_filter(self, rng):
        r, v = self._mk(rng, ann_mode="ivf", int8_hbm_budget_bytes=1,
                        pq_subvectors=8, pq_oversample=16, ivf_nprobe=16)
        hits = r.semantic_search("q", v[7], k=5, patient_id="p1")
        assert hits and all(h[0]["patientId"] == "p1" for h in hits)

    def test_ivf_pq_source_fresh_after_upsert(self, rng):
        """PQ codes re-encode per generation: a row upserted after the first
        probe must be findable (no stale inverted file)."""
        r, v = self._mk(rng, ann_mode="ivf", int8_hbm_budget_bytes=1,
                        pq_subvectors=8, pq_oversample=16, ivf_nprobe=16)
        r.semantic_search("q", v[0], k=1)
        rng2 = np.random.default_rng(321)
        nv = clustered(rng2, 1, r.index.dim)[0]
        r.index.upsert({"doc_id": "fresh-pq", "doc_type": "unstructured",
                        "patientId": "p9", "unstructuredText": "fresh"}, nv)
        hits = r.semantic_search("q", nv, k=1)
        assert hits and hits[0][0]["doc_id"] == "fresh-pq"

    def test_pq_view_not_stale_after_upsert(self, rng):
        """Generation-tracked device views: a filter_mask() call between a
        mutation and the quantized-view fetch must not mark codes fresh."""
        r, v = self._mk(rng, ann_mode="pq", pq_subvectors=8, pq_oversample=16)
        from rassengine_tpu.index.store import FilterSpec

        r.semantic_search("q", v[0], k=1)           # builds the PQ view
        rng2 = np.random.default_rng(123)
        nv = clustered(rng2, 1, r.index.dim)[0]
        r.index.upsert({"doc_id": "late", "doc_type": "unstructured",
                        "unstructuredText": "late"}, nv)
        r.index.filter_mask(FilterSpec())           # refreshes cols only
        hits = r.semantic_search("q", nv, k=1)
        assert hits and hits[0][0]["doc_id"] == "late"

    def test_int8_view_not_stale_after_upsert(self, rng):
        r, v = self._mk(rng, ann_threshold=100)  # int8 tier on pallas only
        idx = r.index
        idx.device_columns_int8()
        rng2 = np.random.default_rng(7)
        nv = clustered(rng2, 1, idx.dim)[0]
        idx.upsert({"doc_id": "late8", "doc_type": "unstructured",
                    "unstructuredText": "x"}, nv)
        from rassengine_tpu.index.store import FilterSpec

        idx.filter_mask(FilterSpec())  # must NOT mark the int8 view fresh
        q = idx.device_columns_int8()
        row = idx._id_to_row["late8"]
        codes = np.asarray(q["codes"][row], np.float32)
        scale = float(np.asarray(q["scales"][row]))
        np.testing.assert_allclose(codes * scale, nv, atol=0.02)
