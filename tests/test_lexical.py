"""BM25 lexical index tests."""

import numpy as np

from rassengine_tpu.lexical.bm25 import LexicalIndex, analyze


def make_docs():
    return [
        {"unstructuredText": "patient reports severe chest pain radiating to left arm"},
        {"unstructuredText": "routine follow up visit no complaints"},
        {"conditionCodeText": "chest pain", "conditionNote": "worse on exertion"},
        {"patientName": "John Chest", "patientGender": "male"},
        {"unstructuredText": "chest x-ray normal heart size"},
    ]


def build():
    lx = LexicalIndex()
    for i, d in enumerate(make_docs()):
        lx.index_doc(i, d)
    return lx


class TestAnalyze:
    def test_lowercase_tokenize_stopwords(self):
        assert analyze("The Patient IS in pain!") == ["patient", "pain"]

    def test_bigrams(self):
        out = analyze("chest pain", bigrams=True)
        assert "chest_pain" in out


class TestScoring:
    def test_matching_docs_score_positive(self):
        lx = build()
        s = lx.score("chest pain", 8)
        assert s[0] > 0 and s[2] > 0
        assert s[1] == 0.0

    def test_field_boost_matters(self):
        lx = LexicalIndex()
        lx.index_doc(0, {"patientName": "fibromyalgia"})     # boost 3.0 in text group
        lx.index_doc(1, {"encounterType": "fibromyalgia"})   # boost 1.0
        s = lx.score("fibromyalgia", 2)
        assert s[0] > s[1] > 0

    def test_group_restricts_fields(self):
        lx = build()
        s_note = lx.score("exertion", 8, group="note")
        assert s_note[2] > 0
        s_entity = lx.score("exertion", 8, group="entity")
        assert np.all(s_entity == 0)

    def test_phrase_requires_all_terms(self):
        lx = build()
        s = lx.score("severe chest pain", 8, phrase=True)
        assert s[0] > 0
        assert s[2] == 0.0  # has "chest pain" but not "severe"

    def test_phrase_bigram_beats_scattered(self):
        lx = LexicalIndex()
        lx.index_doc(0, {"unstructuredText": "chest pain reported"})
        lx.index_doc(1, {"unstructuredText": "pain in the chest region chest area"})
        s = lx.score("chest pain", 2, phrase=True)
        assert s[0] > s[1] > 0  # adjacency bonus

    def test_prefix_expansion(self):
        lx = build()
        s = lx.score("radiat", 8, prefix_last=True)
        assert s[0] > 0

    def test_upsert_replaces_postings(self):
        lx = build()
        lx.index_doc(0, {"unstructuredText": "completely different topic now"})
        s = lx.score("chest pain", 8)
        assert s[0] == 0.0
        s2 = lx.score("different topic", 8)
        assert s2[0] > 0

    def test_top_m_with_mask(self):
        lx = build()
        mask = np.zeros(8, bool)
        mask[2] = True
        rows, scores = lx.top_m("chest pain", 8, 5, host_mask=mask)
        assert rows.tolist() == [2]

    def test_idf_rare_term_wins(self):
        lx = LexicalIndex()
        for i in range(10):
            lx.index_doc(i, {"unstructuredText": "common words everywhere"})
        lx.index_doc(10, {"unstructuredText": "common words plus zebra"})
        s = lx.score("zebra", 11)
        s_common = lx.score("common", 11)
        assert s[10] > s_common[0]


class TestRegressions:
    def test_expand_prefix_bisect_sorted(self):
        lex = LexicalIndex()
        lex.index_doc(0, {"unstructuredText": "alpha alphabet alpine beta betamax"})
        assert lex.expand_prefix("alp") == ["alpha", "alphabet", "alpine"]
        assert lex.expand_prefix("beta", limit=1) == ["beta"]
        assert lex.expand_prefix("zzz") == []
        # cache invalidates on mutation
        lex.index_doc(1, {"unstructuredText": "alpaca"})
        assert lex.expand_prefix("alp") == ["alpaca", "alpha", "alphabet", "alpine"]

    def test_same_field_date_ranges_intersect(self):
        from rassengine_tpu.index.store import FilterSpec

        a = FilterSpec(date_ranges={"conditionOnsetDateTime": (100, 500)})
        b = FilterSpec(date_ranges={"conditionOnsetDateTime": (300, 900),
                                    "observationEffectiveDateTime": (1, 2)})
        m = a.merged_with(b)
        assert m.date_ranges["conditionOnsetDateTime"] == (300, 500)
        assert m.date_ranges["observationEffectiveDateTime"] == (1, 2)
        # None bounds defer to the other side's bound
        c = FilterSpec(date_ranges={"conditionOnsetDateTime": (None, 400)})
        m2 = a.merged_with(c)
        assert m2.date_ranges["conditionOnsetDateTime"] == (100, 400)


class TestFuzzy:
    def test_damerau1(self):
        from rassengine_tpu.lexical.bm25 import damerau1

        assert damerau1("jon", "john")        # insertion
        assert damerau1("johnn", "john")      # deletion
        assert damerau1("jahn", "john")       # substitution
        assert damerau1("jhon", "john")       # adjacent transposition
        assert damerau1("john", "john")
        assert not damerau1("jane", "john")   # distance 2
        assert not damerau1("jo", "john")     # distance 2

    def test_fuzzy_expand_finds_neighbors(self):
        from rassengine_tpu.lexical.bm25 import LexicalIndex

        lex = LexicalIndex()
        lex.index_doc(0, {"unstructuredText": "john carter has hypertension"})
        lex.index_doc(1, {"unstructuredText": "metformin prescribed daily"})
        assert "john" in lex.fuzzy_expand("jon")
        assert "metformin" in lex.fuzzy_expand("metfromin")  # transposition
        assert lex.fuzzy_expand("xx") == []                  # too short
        assert lex.fuzzy_expand("zzzzzz") == []              # nothing near

    def test_fuzzy_scoring_matches_typo(self):
        from rassengine_tpu.lexical.bm25 import LexicalIndex

        lex = LexicalIndex()
        lex.index_doc(0, {"unstructuredText": "hypertension followup visit"})
        lex.index_doc(1, {"unstructuredText": "no relevant complaints"})
        rows, scores = lex.score_sparse("hypertenson followup", 16, "text",
                                        fuzzy=True)
        assert 0 in rows.tolist()
        r_exact, _ = lex.score_sparse("hypertenson followup", 16, "text")
        # without fuzzy, only "followup" matches doc 0 — fuzzy must score higher
        d = dict(zip(rows.tolist(), scores.tolist()))
        r2, s2 = lex.score_sparse("hypertension followup", 16, "text")
        exact_d = dict(zip(r2.tolist(), s2.tolist()))
        assert d[0] > 0
        assert d[0] <= exact_d[0] + 1e-5  # typo never beats the exact query

    def test_in_vocab_terms_not_expanded(self):
        from rassengine_tpu.lexical.bm25 import LexicalIndex

        lex = LexicalIndex()
        lex.index_doc(0, {"unstructuredText": "cart services"})
        lex.index_doc(1, {"unstructuredText": "care services"})
        # "cart" is in-vocab: fuzzy must not bleed into "care"
        rows, _ = lex.score_sparse("cart", 16, "text", fuzzy=True)
        assert rows.tolist() == [0]


class TestBatchedIndexing:
    """index_docs must produce byte-identical state to sequential index_doc
    (same postings (row, wtf) pairs, doc lengths, n_docs, scores) — it is the
    ingest hot path (engine.ingest_docs batches one call per request)."""

    def _rich_docs(self):
        docs = make_docs() * 3
        docs += [
            {},  # no indexable fields
            {"unstructuredText": ""},  # empty value
            {"patientName": "Ada Lovelace", "conditionCodeText": "chest pain",
             "unstructuredText": "chest pain pain chest stable on therapy"},
        ]
        return docs

    def _assert_same(self, a, b):
        assert a._n_docs == b._n_docs
        assert set(a._postings) == set(b._postings)
        for t, pa in a._postings.items():
            pb = b._postings[t]
            # per-term entries must match as (row, wtf) SETS with identical
            # values; batch order within a term may differ from doc order
            ea = sorted((r, tuple(w.tolist())) for r, w in zip(pa.rows, pa.wtf))
            eb = sorted((r, tuple(w.tolist())) for r, w in zip(pb.rows, pb.wtf))
            assert ea == eb, t
        n = max(a._doc_len.shape[0], b._doc_len.shape[0])
        za = np.zeros((n, a._doc_len.shape[1]), np.float32)
        zb = za.copy()
        za[: a._doc_len.shape[0]] = a._doc_len
        zb[: b._doc_len.shape[0]] = b._doc_len
        np.testing.assert_array_equal(za, zb)
        assert {r for r, ts in a._row_terms.items() if ts} == \
               {r for r, ts in b._row_terms.items() if ts}
        for r in a._row_terms:
            assert sorted(a._row_terms.get(r, [])) == sorted(b._row_terms.get(r, []))

    def test_parity_fresh(self):
        docs = self._rich_docs()
        seq, bat = LexicalIndex(), LexicalIndex()
        for i, d in enumerate(docs):
            seq.index_doc(i, d)
        bat.index_docs(list(range(len(docs))), docs)
        self._assert_same(seq, bat)
        for q in ("chest pain", "routine visit", "ada lovelace"):
            rs, ss = seq.score_sparse(q, len(docs), "text")
            rb, sb = bat.score_sparse(q, len(docs), "text")
            np.testing.assert_array_equal(rs, rb)
            np.testing.assert_allclose(ss, sb, rtol=1e-6)

    def test_parity_reupsert_over_existing(self):
        docs = self._rich_docs()
        seq, bat = LexicalIndex(), LexicalIndex()
        for lx in (seq, bat):
            for i, d in enumerate(docs[:5]):
                lx.index_doc(i, d)
        new = [{"unstructuredText": "replaced content entirely"},
               {"conditionNote": "new note"}] + docs[7:9]
        rows = [1, 3, 10, 11]
        for r, d in zip(rows, new):
            seq.index_doc(r, d)
        bat.index_docs(rows, new)
        self._assert_same(seq, bat)

    def test_duplicate_rows_keep_last(self):
        seq, bat = LexicalIndex(), LexicalIndex()
        a = {"unstructuredText": "first version alpha"}
        b = {"unstructuredText": "second version beta"}
        seq.index_doc(0, a)
        seq.index_doc(0, b)
        bat.index_docs([0, 0], [a, b])
        self._assert_same(seq, bat)
        rows, _ = bat.score_sparse("beta", 4, "text")
        assert rows.tolist() == [0]
        assert bat.score_sparse("alpha", 4, "text")[0].size == 0

    def test_removal_after_batch(self):
        docs = self._rich_docs()
        bat = LexicalIndex()
        bat.index_docs(list(range(len(docs))), docs)
        n0 = bat._n_docs
        bat.remove_doc(0)
        assert bat._n_docs == n0 - 1
        rows, _ = bat.score_sparse("severe chest pain", len(docs), "text")
        assert 0 not in rows.tolist()

    def test_empty_batch(self):
        bat = LexicalIndex()
        bat.index_docs([], [])
        assert bat._n_docs == 0


class TestNativeBatchAnalyze:
    """The C++ batch analyzer must match python analyze() token-for-token
    (the index must be identical whether or not the native lane loaded)."""

    def test_fuzz_parity(self):
        import random

        import pytest

        from rassengine_tpu.lexical.native.loader import batch_analyze

        rng = random.Random(7)
        words = ["the", "patient", "Hypertension", "on", "lisinopril-10mg",
                 "BP", "142/88", "stable", "a", "an", "And", "their", "café",
                 "naïve", "Ödem", "x", "", "follow-up", "2024-05-01", "QRS",
                 "micro²", "ＡＢＣ", "İstanbul", "ß", "with", "wills"]
        texts = [" ".join(rng.choice(words)
                          for _ in range(rng.randint(0, 12)))
                 for _ in range(300)]
        texts += ["", "   ", "a an and the with", "zebra", "\t\n", "!!!",
                  "é" * 5, "such that there these they this to was will"]
        res = batch_analyze(texts)
        if res is None:
            pytest.skip("native lane unavailable (no compiler)")
        tid, tix, nu, terms = res
        per = [[] for _ in texts]
        for t, i in zip(tid.tolist(), tix.tolist()):
            per[i].append(terms[t])
        for i, txt in enumerate(texts):
            py = analyze(txt, bigrams=True)
            assert per[i] == py, (i, txt)
            assert nu[i] == sum(1 for t in py if "_" not in t)

    def test_index_docs_same_with_and_without_native(self, monkeypatch):
        import rassengine_tpu.lexical.bm25 as bm25_mod

        docs = [{"unstructuredText": "chest pain and fever", "patientName":
                 "Ada B"}, {"conditionNote": "the pain is stable"}]
        nat = LexicalIndex()
        nat.index_docs([0, 1], docs)
        monkeypatch.setattr(bm25_mod, "_native_batch_analyze", lambda _t: None)
        py = LexicalIndex()
        py.index_docs([0, 1], docs)
        assert set(nat._postings) == set(py._postings)
        for t in nat._postings:
            np.testing.assert_array_equal(nat._postings[t].rows,
                                          py._postings[t].rows)
            np.testing.assert_array_equal(nat._postings[t].wtf,
                                          py._postings[t].wtf)
        np.testing.assert_array_equal(
            nat._doc_len[:2], py._doc_len[:2])
