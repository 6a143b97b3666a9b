"""End-to-end retrieval quality over the shipped sample_dataset.

Drives the FULL pipeline (directory ingest → NLU → intent dispatch → strategy
→ fusion) with natural-language queries whose correct answers are known.
"""

import os

import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.schema import QueryIntent
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig

DATASET = os.path.join(os.path.dirname(__file__), "..", "sample_dataset")


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig(embed_dim=64, embed_batch_size=8, index_capacity=512,
                       intent_model_path="/none", ner_model_path="/none")
    eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
    n = eng.ingest_directory("demo", DATASET)
    assert n >= 12  # 3 bundles of structured+narrative + txt + md
    return eng


def doc_ids(res):
    return [h["doc_id"] for h, _ in res.hits]


class TestQuality:
    def test_keyword_finds_the_note(self, engine):
        res = engine.retrieve("demo", '"hydrochlorothiazide"', top_k=3)
        assert res.intent == QueryIntent.KEYWORD
        assert any("patient_1_visit_note" in d for d in doc_ids(res))

    def test_hybrid_finds_diabetes_med_note(self, engine):
        res = engine.retrieve("demo", "metformin GI upset", top_k=3,
                              intent=QueryIntent.HYBRID)
        top = res.hits[0][0]
        assert top["patientId"] == "p2"

    def test_aggregate_counts_conditions(self, engine):
        res = engine.retrieve("demo", "how many patients have each condition?")
        conds = {b["key"] for b in res.aggregations["by_condition"]["buckets"]}
        assert {"Essential hypertension", "Type 2 diabetes mellitus", "Asthma"} <= conds

    def test_gender_filter_from_nlu(self, engine):
        # gender lives on the Patient resource (FHIR), so the NLU's
        # patientGender term filter restricts hits to female Patient docs —
        # same semantics as the reference's OpenSearch term filter
        res = engine.retrieve("demo", "female patients with diabetes", top_k=5,
                              intent=QueryIntent.HYBRID_STRUCTURED)
        assert res.hits
        for h, _ in res.hits:
            assert h.get("patientGender") == "female"
        assert {h["patientId"] for h, _ in res.hits} <= {"p2", "p3"}

    def test_patient_resolution_document_fetch(self, engine):
        res = engine.retrieve("demo", "fetch the medical records for John Carter")
        assert res.intent == QueryIntent.DOCUMENT_FETCH
        assert res.patient_ids == ["p1"]
        assert res.hits and all(h["patientId"] == "p1" for h, _ in res.hits)
        paths = {h.get("file_path") for h, _ in res.hits}
        assert len(paths) == len(res.hits)  # collapsed to distinct files

    def test_date_entity_filter(self, engine):
        # DATE entity "2021" → date-range filter over the mapped date fields;
        # only the diabetes condition has a 2021 onset
        res = engine.retrieve("demo", "active conditions in 2021", top_k=5,
                              intent=QueryIntent.STRUCTURED)
        assert res.hits and all(h["patientId"] == "p2" for h, _ in res.hits)

    def test_explanatory_reads_notes(self, engine):
        res = engine.retrieve("demo", "why was the blood pressure still elevated, explain",
                              top_k=3)
        assert res.intent == QueryIntent.EXPLANATORY
        assert res.hits and res.hits[0][0]["patientId"] == "p1"

    def test_entity_specific_practitioner(self, engine):
        res = engine.retrieve("demo", "Did Dr. Reid see anyone?", top_k=3)
        assert res.intent == QueryIntent.ENTITY_SPECIFIC
        assert res.hits
        assert any("Reid" in (h.get("practitionerName") or "") for h, _ in res.hits)

    def test_markdown_content_indexed(self, engine):
        res = engine.retrieve("demo", "HbA1c goal under 7 percent", top_k=3,
                              intent=QueryIntent.KEYWORD)
        assert any("markdown-patient_2_summary" in d for d in doc_ids(res))


class TestFuzzyQuality:
    def test_typo_name_resolves_patient(self, engine):
        """'Jon Carter' (typo) must resolve to John Carter's patient id —
        reference "fuzziness": "AUTO" on the patientName lookup
        (main.py:2709-2731)."""
        res = engine.retrieve("demo", "fetch the medical records for Jon Carter")
        assert res.patient_ids == ["p1"]
        assert res.hits and all(h["patientId"] == "p1" for h, _ in res.hits)
