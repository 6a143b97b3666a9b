"""Device-resident BM25 postings + fused hybrid parity vs the host oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from rassengine_tpu.fusion.strategies import Retriever
from rassengine_tpu.index.store import FilterSpec, TenantIndex
from rassengine_tpu.lexical.bm25 import LexicalIndex
from rassengine_tpu.lexical.device_bm25 import (
    NEG_INF, SENTINEL, DeviceLexical, lexical_sparse_scores)

DIM = 64
VOCAB = [f"w{i:03d}" for i in range(40)]


@pytest.fixture
def small_corpus(rng):
    idx = TenantIndex("t", DIM, capacity=256, block_rows=256)
    lex = LexicalIndex()
    for i in range(120):
        words = " ".join(rng.choice(VOCAB, 10))
        doc = {"doc_id": f"d{i}", "doc_type": "unstructured",
               "patientId": f"p{i % 7}", "unstructuredText": words}
        if i % 3 == 0:
            doc["conditionCodeText"] = " ".join(rng.choice(VOCAB, 2))
        v = rng.normal(size=(DIM,)).astype(np.float32)
        row = idx.upsert(doc, v / np.linalg.norm(v))
        lex.index_doc(row, doc)
    return idx, lex


def _device_scores_dense(lex, queries, group_weights, cap):
    dl = DeviceLexical(lex)
    chunk_ids, view, wvec = dl.plan(queries, group_weights)
    rows, scores = lexical_sparse_scores(
        view.rows2d, view.contrib2d, jnp.asarray(chunk_ids), wvec)
    rows, scores = np.asarray(rows), np.asarray(scores)
    dense = np.zeros((len(queries), cap), np.float32)
    for b in range(len(queries)):
        ok = (rows[b] < SENTINEL) & (scores[b] > NEG_INF / 2)
        dense[b, rows[b][ok]] = scores[b][ok]
    return dense


def test_sparse_scores_match_host_oracle(small_corpus):
    idx, lex = small_corpus
    queries = [" ".join(VOCAB[i : i + 3]) for i in range(0, 12, 3)]
    gw = {"text": 1.5, "keyword": 1.0}
    got = _device_scores_dense(lex, queries, gw, idx.capacity)
    for b, q in enumerate(queries):
        want = np.zeros(idx.capacity, np.float32)
        for g, w in gw.items():
            rows, vals = lex.score_sparse(q, idx.capacity, g)
            want[rows] += w * vals
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def test_sparse_scores_unknown_terms_empty(small_corpus):
    idx, lex = small_corpus
    got = _device_scores_dense(lex, ["zzz qqq", ""], {"text": 1.0}, idx.capacity)
    assert not got.any()


def test_view_invalidated_on_mutation(small_corpus):
    idx, lex = small_corpus
    dl = DeviceLexical(lex)
    v1 = dl.view(("text",))
    assert dl.view(("text",)) is v1  # cached while generation unchanged
    row = idx.upsert({"doc_id": "new", "doc_type": "unstructured",
                      "unstructuredText": "w000 w001"}, None)
    lex.index_doc(row, {"unstructuredText": "w000 w001"})
    v2 = dl.view(("text",))
    assert v2 is not v1 and v2.generation == lex.generation


def test_hybrid_batch_matches_single_additive(small_corpus, rng):
    """The batched device path must reproduce the corpus-exact additive
    hybrid (same docs, same fused scores) when M/m exceed the matched set."""
    idx, lex = small_corpus
    r = Retriever(idx, lex, use_pallas=False)
    queries = [" ".join(VOCAB[i : i + 3]) for i in range(0, 20, 4)]
    embs = rng.normal(size=(len(queries), DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    batch = r._hybrid_batch_device(queries, embs, 5, FilterSpec())
    for b, q in enumerate(queries):
        single = r._additive_hybrid(q, embs[b], 5, FilterSpec(),
                                    {"text": 1.5, "keyword": 1.0}, 2.0)
        got = [(h[0]["doc_id"], round(h[1], 3)) for h in batch[b]]
        want = [(h[0]["doc_id"], round(h[1], 3)) for h in single]
        assert got == want


def test_hybrid_batch_respects_filters(small_corpus, rng):
    idx, lex = small_corpus
    r = Retriever(idx, lex, use_pallas=False)
    emb = rng.normal(size=(1, DIM)).astype(np.float32)
    hits = r._hybrid_batch_device([" ".join(VOCAB[:4])], emb, 8,
                                  FilterSpec(patient_id="p3"))
    assert hits[0]
    assert all(h[0]["patientId"] == "p3" for h in hits[0])


def test_hybrid_batch_lexical_only_doc_found(rng):
    """A doc with zero semantic score but strong BM25 must surface (the
    corpus-wide additive semantics candidate-union fusion can miss)."""
    idx = TenantIndex("t", DIM, capacity=256, block_rows=256)
    lex = LexicalIndex()
    for i in range(50):
        doc = {"doc_id": f"d{i}", "doc_type": "unstructured",
               "unstructuredText": " ".join(rng.choice(VOCAB[10:], 8))}
        v = rng.normal(size=(DIM,)).astype(np.float32)
        row = idx.upsert(doc, v / np.linalg.norm(v))
        lex.index_doc(row, doc)
    special = {"doc_id": "lexonly", "doc_type": "structured",
               "conditionCodeText": "uniquetoken uniquetoken"}
    row = idx.upsert(special, None)  # no embedding at all
    lex.index_doc(row, special)
    r = Retriever(idx, lex, use_pallas=False)
    emb = rng.normal(size=(1, DIM)).astype(np.float32)
    hits = r._hybrid_batch_device(["uniquetoken"], emb, 3, FilterSpec())
    assert hits[0][0][0]["doc_id"] == "lexonly"


def test_fused_scores_are_additive(small_corpus, rng):
    """Fused score of the winner equals 2·cos + Σ w·bm25 recomputed by hand."""
    idx, lex = small_corpus
    r = Retriever(idx, lex, use_pallas=False)
    q = " ".join(VOCAB[0:3])
    emb = rng.normal(size=(DIM,)).astype(np.float32)
    emb /= np.linalg.norm(emb)
    hits = r._hybrid_batch_device([q], emb[None], 3, FilterSpec())[0]
    assert hits
    doc, score = hits[0]
    row = idx._id_to_row[doc["doc_id"]]
    bm = 0.0
    for g, w in (("text", 1.5), ("keyword", 1.0)):
        rows, vals = lex.score_sparse(q, idx.capacity, g)
        pos = np.nonzero(rows == row)[0]
        if pos.size:
            bm += w * float(vals[pos[0]])
    cos = float(idx._vecs[row] @ emb)
    assert score == pytest.approx(2.0 * cos + bm, rel=2e-2, abs=2e-2)


def test_truncation_keeps_highest_impact(rng):
    """Impact-ordered slices: when a term's postings are truncated, the kept
    ones are the highest-contribution docs."""
    lex = LexicalIndex()
    # one very common term with varying tf
    for i in range(200):
        lex.index_doc(i, {"unstructuredText": "common " * (1 + i % 5)})
    dl = DeviceLexical(lex)
    view = dl.view(("text",))
    (start_chunk, ln), = view.terms[("text", "common")]
    flat = np.asarray(view.contrib2d).reshape(-1)
    contrib = flat[start_chunk * 128 : start_chunk * 128 + ln]
    assert (np.diff(contrib) <= 1e-6).all()  # descending


class TestDeltaFlush:
    """Append-only incremental flush (ROADMAP #4, device_bm25._flush_delta)."""

    def _mk(self, rng, n=60):
        lex = LexicalIndex()
        for i in range(n):
            lex.index_doc(i, {"doc_id": f"d{i}", "doc_type": "unstructured",
                              "unstructuredText":
                                  " ".join(rng.choice(VOCAB, 10))})
        return lex

    def _spy(self, dl, monkeypatch):
        calls = {"full": 0, "delta": 0}
        full, delta = dl._flush, dl._flush_delta
        monkeypatch.setattr(dl, "_flush", lambda g: (
            calls.__setitem__("full", calls["full"] + 1) or full(g)))
        monkeypatch.setattr(dl, "_flush_delta", lambda g, v: (
            calls.__setitem__("delta", calls["delta"] + 1) or delta(g, v)))
        return calls

    def _dense(self, dl, lex, queries, gw, cap):
        chunk_ids, view, wvec = dl.plan(queries, gw)
        rows, scores = lexical_sparse_scores(
            view.rows2d, view.contrib2d, jnp.asarray(chunk_ids), wvec)
        rows, scores = np.asarray(rows), np.asarray(scores)
        dense = np.zeros((len(queries), cap), np.float32)
        for b in range(len(queries)):
            ok = (rows[b] < SENTINEL) & (scores[b] > NEG_INF / 2)
            dense[b, rows[b][ok]] = scores[b][ok]
        return dense

    def test_append_uses_delta_and_matches_full_rebuild(self, rng, monkeypatch):
        lex = self._mk(rng)
        dl = DeviceLexical(lex)
        gw = {"text": 1.0}
        dl.plan(["w000"], gw)                      # initial full flush
        calls = self._spy(dl, monkeypatch)
        for i in range(60, 63):                    # append-only: fresh rows
            lex.index_doc(i, {"doc_id": f"d{i}", "doc_type": "unstructured",
                              "unstructuredText":
                                  " ".join(rng.choice(VOCAB, 10))})
        queries = ["w000 w001 w002", "w010 w011"]
        got = self._dense(dl, lex, queries, gw, 128)
        assert calls == {"full": 0, "delta": 1}
        fresh = self._dense(DeviceLexical(lex), lex, queries, gw, 128)
        # new chunks use current stats; old chunks keep flush-time stats —
        # identical here up to the tiny idf/avgdl motion of 3 appended docs
        np.testing.assert_allclose(got, fresh, rtol=0.05, atol=1e-3)
        # appended rows are retrievable through the new segments
        view = dl.view(("text",))
        assert any(len(segs) > 1 for segs in view.terms.values())

    def test_delete_forces_full_rebuild(self, rng, monkeypatch):
        lex = self._mk(rng)
        dl = DeviceLexical(lex)
        dl.plan(["w000"], {"text": 1.0})
        calls = self._spy(dl, monkeypatch)
        lex.remove_doc(5)
        got = self._dense(dl, lex, ["w000 w001"], {"text": 1.0}, 128)
        assert calls["full"] == 1 and calls["delta"] == 0
        want = self._dense(DeviceLexical(lex), lex, ["w000 w001"],
                           {"text": 1.0}, 128)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_large_growth_forces_full_rebuild(self, rng, monkeypatch):
        lex = self._mk(rng, n=20)
        dl = DeviceLexical(lex)
        dl.plan(["w000"], {"text": 1.0})
        calls = self._spy(dl, monkeypatch)
        for i in range(20, 30):                    # +50% docs: stats drifted
            lex.index_doc(i, {"doc_id": f"d{i}", "doc_type": "unstructured",
                              "unstructuredText":
                                  " ".join(rng.choice(VOCAB, 10))})
        dl.plan(["w000"], {"text": 1.0})
        assert calls["full"] == 1 and calls["delta"] == 0

    def test_exact_after_rebuild_threshold(self, rng):
        # end-to-end: many small appends stay correct, and scores agree with
        # the host oracle exactly after any full rebuild
        lex = self._mk(rng)
        dl = DeviceLexical(lex)
        gw = {"text": 1.0}
        for step in range(4):
            base = 60 + 3 * step
            for i in range(base, base + 3):
                lex.index_doc(i, {"doc_id": f"d{i}",
                                  "doc_type": "unstructured",
                                  "unstructuredText":
                                      " ".join(rng.choice(VOCAB, 10))})
            got = self._dense(dl, lex, ["w000 w001 w002"], gw, 128)
            want = np.zeros(128, np.float32)
            rows, vals = lex.score_sparse("w000 w001 w002", 128, "text")
            want[rows] += vals
            # stale chunks may carry up to STATS_DRIFT (10%) old idf/avgdl;
            # observed error stays within ~2x that bound
            np.testing.assert_allclose(got[0], want, rtol=0.2, atol=1e-3)
        # a destructive op forces the full rebuild → exact parity again
        lex.remove_doc(0)
        got = self._dense(dl, lex, ["w000 w001 w002"], gw, 128)
        want = np.zeros(128, np.float32)
        rows, vals = lex.score_sparse("w000 w001 w002", 128, "text")
        want[rows] += vals
        np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)


class TestPackedPostings:
    """4 B/posting packed CSR (ROADMAP r3 "compressed postings"):
    row (24b) | 8-bit affine contribution code, per-chunk base/step decode
    (device_bm25.GroupView docstring). Half the HBM residency and gather
    bandwidth; score error bounded by (chunk range)/510."""

    def _scores(self, lex, queries, gw, cap, packed):
        from rassengine_tpu.lexical.device_bm25 import _lex_scores_dispatch

        dl = DeviceLexical(lex, packed=packed)
        chunk_ids, view, wvec = dl.plan(queries, gw)
        rows, scores = _lex_scores_dispatch(view.tables,
                                            jnp.asarray(chunk_ids), wvec)
        rows, scores = np.asarray(rows), np.asarray(scores)
        dense = np.zeros((len(queries), cap), np.float32)
        for b in range(len(queries)):
            ok = (rows[b] < SENTINEL) & (scores[b] > NEG_INF / 2)
            dense[b, rows[b][ok]] = scores[b][ok]
        return dense

    def test_packed_matches_dense_within_quantization(self, small_corpus):
        idx, lex = small_corpus
        queries = [" ".join(VOCAB[i : i + 3]) for i in range(0, 12, 3)]
        gw = {"text": 1.5, "keyword": 1.0}
        want = self._scores(lex, queries, gw, idx.capacity, packed=False)
        got = self._scores(lex, queries, gw, idx.capacity, packed=True)
        # pads and zero-score docs must be EXACTLY zero in both
        np.testing.assert_array_equal(got == 0.0, want == 0.0)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_packed_view_halves_posting_bytes(self, small_corpus):
        _idx, lex = small_corpus
        dense_v = DeviceLexical(lex, packed=False).view(("text",))
        packed_v = DeviceLexical(lex, packed=True).view(("text",))
        assert packed_v.packed2d is not None and packed_v.rows2d is None
        dense_bytes = (np.asarray(dense_v.rows2d).nbytes
                       + np.asarray(dense_v.contrib2d).nbytes)
        packed_bytes = (np.asarray(packed_v.packed2d).nbytes
                        + np.asarray(packed_v.base).nbytes
                        + np.asarray(packed_v.step).nbytes)
        assert packed_bytes <= dense_bytes / 2 + 8 * packed_v.packed2d.shape[0]

    def test_packed_delta_flush_appends_packed(self, rng):
        lex = LexicalIndex()
        for i in range(60):
            lex.index_doc(i, {"doc_id": f"d{i}", "doc_type": "unstructured",
                              "unstructuredText":
                                  " ".join(rng.choice(VOCAB, 10))})
        dl = DeviceLexical(lex, packed=True)
        gw = {"text": 1.0}
        v1 = dl.view(("text",))
        assert v1.packed2d is not None
        for i in range(60, 63):
            lex.index_doc(i, {"doc_id": f"d{i}", "doc_type": "unstructured",
                              "unstructuredText": "w000 w001"})
        v2 = dl.view(("text",))
        assert v2.packed2d is not None
        assert v2.packed2d.shape[0] > v1.packed2d.shape[0]  # chunks appended
        got = self._scores(lex, ["w000 w001"], gw, 128, packed=True)
        want = np.zeros(128, np.float32)
        rows, vals = lex.score_sparse("w000 w001", 128, "text")
        want[rows] += vals
        # delta chunks use current stats; old chunks stale within drift bound
        np.testing.assert_allclose(got[0], want, rtol=0.2, atol=2e-2)

    def test_hybrid_batch_packed_agrees_with_dense(self, small_corpus, rng):
        """End-to-end hybrid_topk_batch on the packed tables returns the same
        top-k docs (scores within quantization tolerance)."""
        from rassengine_tpu.lexical.device_bm25 import hybrid_topk_batch

        idx, lex = small_corpus
        queries = [" ".join(VOCAB[i : i + 3]) for i in range(0, 12, 3)]
        gw = {"text": 1.5, "keyword": 1.0}
        embs = rng.normal(size=(len(queries), DIM)).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        vd = jnp.asarray(idx._vecs[: idx.capacity], jnp.bfloat16)
        mask = jnp.zeros(idx.capacity, jnp.float32)
        outs = {}
        for packed in (False, True):
            dl = DeviceLexical(lex, packed=packed)
            chunk_ids, view, wvec = dl.plan(queries, gw)
            s, r = hybrid_topk_batch(vd, mask, jnp.asarray(embs), view.tables,
                                     jnp.asarray(chunk_ids), wvec, 2.0, 5,
                                     scan_mode="xla_direct")
            outs[packed] = (np.asarray(s), np.asarray(r))
        s0, r0 = outs[False]
        s1, r1 = outs[True]
        np.testing.assert_allclose(s1, s0, rtol=2e-2, atol=3e-2)
        # membership flips only among near-ties: a doc swapped in/out must
        # score within the quantization band of the dense k-th score
        for b in range(len(queries)):
            kth = s0[b, -1]
            flip = set(r0[b].tolist()) ^ set(r1[b].tolist())
            for row in flip:
                in_dense = np.nonzero(r0[b] == row)[0]
                sc = (s0[b, in_dense[0]] if in_dense.size
                      else s1[b, np.nonzero(r1[b] == row)[0][0]])
                assert abs(sc - kth) <= 6e-2, (b, row, sc, kth)


def test_hybrid_int8_source_matches_exact(small_corpus, rng):
    """pallas_int8 scan mode: int8 codes only SELECT candidates; the
    in-dispatch exact bf16 re-score must reproduce the exact path's docs and
    scores when m covers the corpus (round-3 headline int8-source hybrid)."""
    from rassengine_tpu.index.quant import quantize_int8
    from rassengine_tpu.lexical.device_bm25 import hybrid_topk_batch

    idx, lex = small_corpus
    queries = [" ".join(VOCAB[i: i + 3]) for i in range(0, 12, 3)]
    gw = {"text": 1.5, "keyword": 1.0}
    embs = rng.normal(size=(len(queries), DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    vd = jnp.asarray(idx._vecs[: idx.capacity], jnp.bfloat16)
    mask = jnp.zeros(idx.capacity, jnp.float32)
    dl = DeviceLexical(lex)
    chunk_ids, view, wvec = dl.plan(queries, gw)
    args = (vd, mask, jnp.asarray(embs), view.tables,
            jnp.asarray(chunk_ids), wvec, 2.0, 5)
    s0, r0 = hybrid_topk_batch(*args, m=128, scan_mode="xla_direct")
    codes, scales = quantize_int8(idx._vecs[: idx.capacity])
    s1, r1 = hybrid_topk_batch(
        *args, m=128, block_rows=idx.capacity, scan_mode="pallas_int8",
        int8_tables=(jnp.asarray(codes), jnp.asarray(scales)),
        interpret=True)
    s0, r0, s1, r1 = map(np.asarray, (s0, r0, s1, r1))
    # candidates cover the whole corpus (m=128 >= live docs) and scores are
    # exact bf16 — identical docs; scores within bf16 noise
    assert (r0 == r1).all(), (r0, r1)
    np.testing.assert_allclose(s1, s0, rtol=2e-2, atol=2e-2)


def test_hybrid_sem_bm_join_topm_matches_all_when_covering(small_corpus, rng):
    """sem_bm_join="topm" joins semantic candidates' BM25 term against the
    top-M lex candidates instead of every sparse candidate (round 4: deletes
    8/9 of the fuse join work at production widths). When top_m_lex covers
    every sparse candidate the two joins are algebraically identical."""
    from rassengine_tpu.lexical.device_bm25 import hybrid_topk_batch

    idx, lex = small_corpus
    queries = [" ".join(VOCAB[i: i + 3]) for i in range(0, 12, 3)]
    gw = {"text": 1.5, "keyword": 1.0}
    embs = rng.normal(size=(len(queries), DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    vd = jnp.asarray(idx._vecs[: idx.capacity], jnp.bfloat16)
    mask = jnp.zeros(idx.capacity, jnp.float32)
    dl = DeviceLexical(lex)
    chunk_ids, view, wvec = dl.plan(queries, gw)
    args = (vd, mask, jnp.asarray(embs), view.tables,
            jnp.asarray(chunk_ids), wvec, 2.0, 5)
    # top_m_lex=128 ≥ total sparse candidates on this corpus → identical
    s0, r0 = hybrid_topk_batch(*args, m=16, top_m_lex=128,
                               scan_mode="xla_direct")
    s1, r1 = hybrid_topk_batch(*args, m=16, top_m_lex=128,
                               scan_mode="xla_direct", sem_bm_join="topm")
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-5)
    # narrow top-M: fused scores may only DROP (a sem candidate can lose
    # below-cut BM25 evidence, never gain any)
    s2, _r2 = hybrid_topk_batch(*args, m=16, top_m_lex=4,
                                scan_mode="xla_direct", sem_bm_join="topm")
    s2 = np.asarray(s2)
    assert (s2 <= np.asarray(s0) + 1e-4).all()


def test_hybrid_int8_only_close_to_exact(small_corpus, rng):
    """vecs=None (>bf16-budget regime): every cosine comes from int8 codes.
    Scores must track the exact path within the ~0.5% quantization band and
    membership may flip only among near-ties."""
    from rassengine_tpu.index.quant import quantize_int8
    from rassengine_tpu.lexical.device_bm25 import hybrid_topk_batch

    idx, lex = small_corpus
    queries = [" ".join(VOCAB[i: i + 3]) for i in range(0, 12, 3)]
    gw = {"text": 1.5, "keyword": 1.0}
    # strong-signal queries: embeddings near actual corpus rows, so top docs
    # are decisive rather than random near-ties
    embs = idx._vecs[:4].astype(np.float32) \
        + 0.05 * rng.normal(size=(4, DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    vd = jnp.asarray(idx._vecs[: idx.capacity], jnp.bfloat16)
    mask = jnp.zeros(idx.capacity, jnp.float32)
    dl = DeviceLexical(lex)
    chunk_ids, view, wvec = dl.plan(queries[:4], gw)
    args = (mask, jnp.asarray(embs), view.tables,
            jnp.asarray(chunk_ids), wvec, 2.0, 5)
    s0, r0 = hybrid_topk_batch(vd, *args, m=128, scan_mode="xla_direct")
    codes, scales = quantize_int8(idx._vecs[: idx.capacity])
    s1, r1 = hybrid_topk_batch(
        None, *args, m=128, block_rows=idx.capacity,
        scan_mode="pallas_int8",
        int8_tables=(jnp.asarray(codes), jnp.asarray(scales)),
        interpret=True)
    s0, r0, s1, r1 = map(np.asarray, (s0, r0, s1, r1))
    np.testing.assert_allclose(s1, s0, rtol=2e-2, atol=3e-2)
    for b in range(4):
        kth = s0[b, -1]
        for row in set(r0[b].tolist()) ^ set(r1[b].tolist()):
            in0 = np.nonzero(r0[b] == row)[0]
            sc = (s0[b, in0[0]] if in0.size
                  else s1[b, np.nonzero(r1[b] == row)[0][0]])
            assert abs(sc - kth) <= 6e-2, (b, row, sc, kth)


def test_hybrid_batch_device_int8_only_over_budget(small_corpus, rng,
                                                   monkeypatch):
    """_hybrid_batch_device must go int8-only (vecs=None, pallas_int8) when
    bf16 rows exceed the hybrid budget, and hits must match the in-budget
    path on strong-signal queries."""
    from rassengine_tpu.fusion import strategies as st
    from rassengine_tpu.lexical import device_bm25 as db

    idx, lex = small_corpus
    embs = idx._vecs[:2].astype(np.float32) \
        + 0.05 * rng.normal(size=(2, DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    queries = [" ".join(VOCAB[:3]), " ".join(VOCAB[3:6])]
    want = Retriever(idx, lex, use_pallas=False)._hybrid_batch_device(
        queries, embs, 5, FilterSpec())

    monkeypatch.setattr(st, "HYBRID_BF16_BUDGET_BYTES", 1)  # force over-budget
    seen = {}
    real = db.hybrid_topk_batch

    def spy(vecs, *a, **kw):
        seen["mode"] = kw.get("scan_mode")
        seen["vecs_none"] = vecs is None
        kw["interpret"] = True  # CPU test host: run Pallas interpreted
        return real(vecs, *a, **kw)

    monkeypatch.setattr(db, "hybrid_topk_batch", spy)
    r = Retriever(idx, lex, use_pallas=True)
    got = r._hybrid_batch_device(queries, embs, 5, FilterSpec())
    assert seen == {"mode": "pallas_int8", "vecs_none": True}
    assert ([[h[0]["doc_id"] for h in b] for b in got]
            == [[h[0]["doc_id"] for h in b] for b in want])


def test_hybrid_int8_block_scales_matches_exact(small_corpus, rng,
                                                monkeypatch):
    """Block-scale int8 SELECT (all-integer epilogue, forced via
    PACKED_MIN_BLOCKS=1) + in-dispatch bf16 re-score: same docs and scores
    as the exact path when m covers the corpus."""
    import importlib

    ft = importlib.import_module("rassengine_tpu.ops.fused_topk")
    monkeypatch.setattr(ft, "PACKED_MIN_BLOCKS", 1)
    ft.fused_topk_int8_pooled.clear_cache()
    from rassengine_tpu.index.quant import quantize_int8_block
    from rassengine_tpu.lexical.device_bm25 import hybrid_topk_batch

    idx, lex = small_corpus
    queries = [" ".join(VOCAB[i: i + 3]) for i in range(0, 12, 3)]
    gw = {"text": 1.5, "keyword": 1.0}
    embs = rng.normal(size=(len(queries), DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    vd = jnp.asarray(idx._vecs[: idx.capacity], jnp.bfloat16)
    mask = np.zeros(idx.capacity, np.float32)
    mask[:32] = NEG_INF  # filter interacts with the integer mask units
    dl = DeviceLexical(lex)
    chunk_ids, view, wvec = dl.plan(queries, gw)
    args = (vd, jnp.asarray(mask), jnp.asarray(embs), view.tables,
            jnp.asarray(chunk_ids), wvec, 2.0, 5)
    s0, r0 = hybrid_topk_batch(*args, m=128, scan_mode="xla_direct")
    codes, bs = quantize_int8_block(idx._vecs[: idx.capacity], 128)
    s1, r1 = hybrid_topk_batch(
        *args, m=128, block_rows=128, scan_mode="pallas_int8",
        int8_tables=(jnp.asarray(codes),
                     jnp.asarray(np.repeat(bs, 128))),
        int8_block_scales=jnp.asarray(bs), interpret=True)
    s0, r0, s1, r1 = map(np.asarray, (s0, r0, s1, r1))
    assert (r0 == r1).all(), (r0, r1)
    assert (r1[r1 >= 0] >= 32).all()
    np.testing.assert_allclose(s1, s0, rtol=2e-2, atol=2e-2)
    ft.fused_topk_int8_pooled.clear_cache()


def test_hybrid_batch_device_int8_select_policy(small_corpus, rng,
                                                monkeypatch):
    """config.hybrid_select="int8" routes the within-budget batched hybrid
    through int8 SELECT + bf16 re-score (vecs still present) and returns the
    same hits as the default path."""
    from rassengine_tpu.fusion import strategies as st
    from rassengine_tpu.lexical import device_bm25 as db

    idx, lex = small_corpus
    embs = idx._vecs[:2].astype(np.float32) \
        + 0.05 * rng.normal(size=(2, DIM)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    queries = [" ".join(VOCAB[:3]), " ".join(VOCAB[3:6])]
    want = Retriever(idx, lex, use_pallas=False)._hybrid_batch_device(
        queries, embs, 5, FilterSpec())

    seen = {}
    real = db.hybrid_topk_batch

    def spy(vecs, *a, **kw):
        seen["mode"] = kw.get("scan_mode")
        seen["vecs_none"] = vecs is None
        seen["has_bs"] = kw.get("int8_block_scales") is not None
        kw["interpret"] = True
        return real(vecs, *a, **kw)

    monkeypatch.setattr(db, "hybrid_topk_batch", spy)
    r = Retriever(idx, lex, use_pallas=True)
    r.config = type(r.config)(hybrid_select="int8")
    got = r._hybrid_batch_device(queries, embs, 5, FilterSpec())
    assert seen == {"mode": "pallas_int8", "vecs_none": False,
                    "has_bs": True}
    assert ([[h[0]["doc_id"] for h in b] for b in got]
            == [[h[0]["doc_id"] for h in b] for b in want])
