"""The 12 intent-strategy retrieval tests over a small corpus."""

import datetime

import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.schema import DOC_TYPE
from rassengine_tpu.fusion.strategies import Retriever
from rassengine_tpu.index.store import FilterSpec, TenantIndex
from rassengine_tpu.lexical.bm25 import LexicalIndex

DIM = 32
RECENT = (datetime.date.today() - datetime.timedelta(days=30)).isoformat()
OLD = "2015-06-01"


def embed(rng, seedrow=None):
    v = rng.normal(size=(DIM,)).astype(np.float32)
    return v / np.linalg.norm(v)


@pytest.fixture
def corpus(rng):
    idx = TenantIndex("t", DIM, capacity=256, block_rows=256)
    lex = LexicalIndex()
    vecs = {}

    def add(doc, with_emb=True):
        emb = embed(rng) if with_emb and doc["doc_type"] == "unstructured" else None
        row = idx.upsert(doc, emb)
        lex.index_doc(row, doc)
        if emb is not None:
            vecs[doc["doc_id"]] = emb
        return row

    add({"doc_id": "u1", "doc_type": "unstructured", "patientId": "p1",
         "resourceType": "Condition", "unstructuredText":
         "patient reports severe chest pain radiating to the left arm"})
    add({"doc_id": "u2", "doc_type": "unstructured", "patientId": "p2",
         "resourceType": "Observation", "unstructuredText":
         "routine annual physical no acute complaints"})
    add({"doc_id": "u3", "doc_type": "unstructured", "patientId": "p1",
         "resourceType": "Encounter", "file_path": "/data/patient_1_visit.txt",
         "unstructuredText": "followup for hypertension medication adjustment"})
    add({"doc_id": "s1", "doc_type": "structured", "patientId": "p1",
         "resourceType": "Condition", "conditionCodeText": "Essential hypertension",
         "conditionClinicalStatus": "active", "conditionOnsetDateTime": RECENT,
         "conditionNote": "blood pressure remains elevated despite therapy"})
    add({"doc_id": "s2", "doc_type": "structured", "patientId": "p2",
         "resourceType": "Condition", "conditionCodeText": "Type 2 diabetes mellitus",
         "conditionOnsetDateTime": OLD,
         "conditionNote": "glucose control worsening"})
    add({"doc_id": "s3", "doc_type": "structured", "patientId": "p1",
         "resourceType": "Patient", "patientName": "Jane Doe",
         "patientGender": "female"})
    add({"doc_id": "s4", "doc_type": "structured", "patientId": "p2",
         "resourceType": "MedicationRequest",
         "medRequestMedicationDisplay": "Metformin 500mg",
         "medRequestStatus": "active", "medRequestAuthoredOn": RECENT})
    r = Retriever(idx, lex, EngineConfig(top_k=3), use_pallas=False)
    return r, vecs


class TestStrategies:
    def test_exact_match(self, corpus):
        r, _ = corpus
        hits = r.exact_match_search("severe chest pain", k=3)
        assert hits and hits[0][0]["doc_id"] == "u1"

    def test_semantic(self, corpus, rng):
        r, vecs = corpus
        q = vecs["u3"] + 0.01 * rng.normal(size=DIM).astype(np.float32)
        hits = r.semantic_search("anything", q, k=2)
        assert hits[0][0]["doc_id"] == "u3"

    def test_semantic_empty_emb(self, corpus):
        r, _ = corpus
        assert r.semantic_search("q", np.zeros((0,)), k=3) == []

    def test_hybrid_combines(self, corpus, rng):
        r, vecs = corpus
        q = vecs["u1"]
        hits = r.hybrid_search("chest pain", q, k=3)
        assert hits[0][0]["doc_id"] == "u1"
        # hybrid score should exceed pure-lexical score for u1
        lex_hits = dict((h["doc_id"], s) for h, s in r.exact_match_search("chest pain", k=5))
        hyb = dict((h["doc_id"], s) for h, s in hits)
        assert hyb["u1"] > lex_hits.get("u1", 0)

    def test_structured(self, corpus):
        r, _ = corpus
        hits = r.structured_search("hypertension", k=3)
        assert hits and all(h["doc_type"] == "structured" for h, _ in hits)
        assert hits[0][0]["doc_id"] == "s1"

    def test_hybrid_structured_prefix(self, corpus):
        r, _ = corpus
        hits = r.hybrid_structured_search("metfor", None, k=3)
        assert hits and hits[0][0]["doc_id"] == "s4"
        assert all(h["doc_type"] == "structured" for h, _ in hits)

    def test_aggregate(self, corpus):
        r, _ = corpus
        aggs = r.aggregate_search("")
        conds = {b["key"]: b["doc_count"] for b in aggs["by_condition"]["buckets"]}
        assert conds == {"Essential hypertension": 1, "Type 2 diabetes mellitus": 1}
        pats = {b["key"]: b["doc_count"] for b in aggs["by_patient"]["buckets"]}
        assert pats["p1"] == 4 and pats["p2"] == 3
        aggs_p1 = r.aggregate_search("", patient_id="p1")
        assert {b["key"] for b in aggs_p1["by_patient"]["buckets"]} == {"p1"}

    def test_comparison(self, corpus):
        r, _ = corpus
        hits = r.comparison_search("metformin diabetes", k=3)
        ids = [h["doc_id"] for h, _ in hits]
        assert "s2" in ids and "s4" in ids

    def test_temporal_recency_sort(self, corpus):
        r, _ = corpus
        hits = r.temporal_search("hypertension metformin active", k=3)
        ids = [h["doc_id"] for h, _ in hits]
        assert "s1" in ids            # recent onset passes the 1y window
        assert "s2" not in ids        # 2015 onset filtered out

    def test_explanatory_notes(self, corpus):
        r, _ = corpus
        hits = r.explanatory_search("glucose control", k=3)
        assert hits and hits[0][0]["doc_id"] == "s2"

    def test_multi_intent(self, corpus, rng):
        r, vecs = corpus
        q = vecs["u1"]
        hits = r.multi_intent_search("chest pain", q, k=3)
        assert hits and hits[0][0]["doc_id"] == "u1"

    def test_entity_specific_and_fallback(self, corpus):
        r, _ = corpus
        hits = r.entity_specific_search("Jane Doe", k=3)
        assert hits and hits[0][0]["doc_id"] == "s3"
        # NL query with non-entity words → strict AND fails, OR fallback fires
        hits2 = r.entity_specific_search("what about Jane exactly", k=3)
        assert hits2 and hits2[0][0]["doc_id"] == "s3"

    def test_document_fetch(self, corpus):
        r, _ = corpus
        hits = r.document_fetch_search("", k=5, patient_id="p1")
        assert hits
        assert all(h["patientId"] == "p1" for h, _ in hits)
        assert r.document_fetch_search("", k=5, patient_id=None) == []

    def test_patient_filter_everywhere(self, corpus, rng):
        r, vecs = corpus
        hits = r.hybrid_search("chest pain hypertension", vecs["u1"], k=5,
                               patient_id="p2")
        assert all(h["patientId"] == "p2" for h, _ in hits)

    def test_filter_clause_merges(self, corpus):
        r, _ = corpus
        spec = FilterSpec(keyword_terms={"conditionClinicalStatus": ["active"]})
        hits = r.structured_search("hypertension diabetes", k=5, filter_clause=spec)
        assert [h["doc_id"] for h, _ in hits] == ["s1"]


class TestVectorizedAggregations:
    def test_agg_buckets_match_doc_loop(self, corpus):
        """The bincount aggregation must equal a brute-force dict count."""
        r, _ = corpus
        aggs = r.aggregate_search("")
        expect = {}
        for row in range(r.index.count):
            doc = r.index.docs[row]
            if doc and doc.get("conditionCodeText"):
                c = doc["conditionCodeText"]
                expect[c] = expect.get(c, 0) + 1
        got = {b["key"]: b["doc_count"] for b in aggs["by_condition"]["buckets"]}
        assert got == expect
        # patient filter narrows counts
        p1 = r.aggregate_search("", patient_id="p1")
        assert all(b["key"] == "Essential hypertension"
                   for b in p1["by_condition"]["buckets"])

    def test_document_fetch_distinct_collapse(self, corpus):
        r, _ = corpus
        hits = r.document_fetch_search("", k=10, patient_id="p1")
        keys = [h[0].get("file_path") or h[0].get("doc_id") for h in hits]
        assert len(keys) == len(set(keys))
        assert any(h[0].get("file_path") for h in hits)

    def test_agg_columns_survive_growth(self, rng):
        from rassengine_tpu.index.store import TenantIndex

        idx = TenantIndex("g", DIM, capacity=256, block_rows=256)
        for i in range(300):  # forces _grow
            idx.upsert({"doc_id": f"d{i}", "doc_type": "structured",
                        "patientId": f"p{i % 7}",
                        "conditionCodeText": f"cond{i % 3}"})
        mask = np.zeros(idx.capacity, bool)
        mask[: idx.count] = True
        b = idx.agg_buckets("condition", mask)
        assert sum(x["doc_count"] for x in b["buckets"]) == 300
        assert {x["key"] for x in b["buckets"]} == {"cond0", "cond1", "cond2"}


class TestFuzzyRetrieval:
    def test_hybrid_typo_still_matches(self, corpus, rng):
        r, vecs = corpus
        hits = r.hybrid_search("hypertenson folowup", None, k=3)
        assert any(h[0]["doc_id"] == "u3" for h in hits)

    def test_entity_fallback_fuzzy_name(self, corpus):
        r, _ = corpus
        hits = r.entity_specific_search("Jane Doee", k=5)
        assert any(h[0].get("patientName") == "Jane Doe" for h in hits)


class TestInt8SelectPolicy:
    """config.hybrid_select boundaries for the in-budget hybrid semantic
    stage (int8 SELECT + bf16 re-score vs plain bf16 scan)."""

    def _retr(self, cap, dim, block_rows=2048, mode="auto", pallas=True):
        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.fusion.strategies import Retriever
        from rassengine_tpu.index.store import TenantIndex
        from rassengine_tpu.lexical.bm25 import LexicalIndex

        idx = TenantIndex.__new__(TenantIndex)  # policy reads shape only
        idx.capacity, idx.dim, idx.block_rows = cap, dim, block_rows
        r = Retriever.__new__(Retriever)
        r.index, r.use_pallas, r.mesh = idx, pallas, None
        r.config = EngineConfig(hybrid_select=mode)
        return r

    def test_explicit_modes(self):
        assert self._retr(1024, 64, mode="int8")._int8_select()
        assert not self._retr(1 << 20, 1024, mode="bf16")._int8_select()

    def test_auto_needs_packed_regime(self):
        # below 64 blocks the integer kernel never engages -> no win
        assert not self._retr(63 * 2048, 1024)._int8_select()
        assert self._retr(64 * 2048, 1024)._int8_select()

    def test_auto_respects_residency_budget(self):
        from rassengine_tpu.fusion.strategies import HYBRID_BF16_BUDGET_BYTES

        cap = 64 * 2048
        dim_over = (HYBRID_BF16_BUDGET_BYTES // (2 * cap)) + 1
        assert not self._retr(cap, dim_over)._int8_select()
