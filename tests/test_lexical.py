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
