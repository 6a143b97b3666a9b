"""RassEngine facade tests: tenancy, ingestion, intent dispatch."""

import json

import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.schema import QueryIntent
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=512,
                       intent_model_path="/none", ner_model_path="/none")
    eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
    bundle = {"entry": [
        {"resource": {"resourceType": "Patient", "id": "p1",
                      "name": [{"given": ["Maria"], "family": "Gonzalez"}],
                      "gender": "female"}},
        {"resource": {"resourceType": "Condition", "id": "c1",
                      "subject": {"reference": "Patient/p1"},
                      "code": {"text": "Asthma"}, "onsetDateTime": "2023-01-01",
                      "note": [{"text": "Wheezing worse at night with exercise."}]}},
        {"resource": {"resourceType": "MedicationRequest", "id": "m1",
                      "subject": {"reference": "Patient/p1"},
                      "medicationCodeableConcept": {"text": "Albuterol inhaler"},
                      "status": "active"}},
    ]}
    from rassengine_tpu.ingest.fhir import parse_fhir_bundle

    s, u = parse_fhir_bundle(bundle)
    eng.ingest_docs("alice", s, u)
    return eng


class TestTenancy:
    def test_index_name_parity(self, engine):
        assert engine.index_name("alice") == "rass-index-alice"

    def test_tenants_isolated(self, engine):
        engine.ingest_docs("bob", [], [{"doc_id": "b1", "doc_type": "unstructured",
                                        "unstructuredText": "bob private note"}])
        res_alice = engine.retrieve("alice", "bob private note",
                                    intent=QueryIntent.KEYWORD)
        assert all(h["doc_id"] != "b1" for h, _ in res_alice.hits)
        res_bob = engine.retrieve("bob", "bob private note",
                                  intent=QueryIntent.KEYWORD)
        assert any(h["doc_id"] == "b1" for h, _ in res_bob.hits)


class TestRetrieve:
    def test_intent_override_and_dispatch(self, engine):
        res = engine.retrieve("alice", "asthma wheezing",
                              intent=QueryIntent.KEYWORD)
        assert res.intent == QueryIntent.KEYWORD
        assert res.hits and "Wheezing" in (res.hits[0][0].get("unstructuredText") or
                                           res.hits[0][0].get("conditionNote") or "")

    def test_aggregate_result(self, engine):
        res = engine.retrieve("alice", "how many patients have asthma?")
        assert res.intent == QueryIntent.AGGREGATE
        assert res.aggregations is not None
        conds = {b["key"] for b in res.aggregations["by_condition"]["buckets"]}
        assert "Asthma" in conds

    def test_entities_flow_into_filters(self, engine):
        # "female" entity → patientGender keyword filter restricts structured hits
        res = engine.retrieve("alice", "female patient records",
                              intent=QueryIntent.STRUCTURED)
        for h, _ in res.hits:
            assert h.get("patientGender") in (None, "female")

    def test_injected_entities(self, engine):
        res = engine.retrieve("alice", "whatever", intent=QueryIntent.KEYWORD,
                              entities=[{"text": "asthma", "label": "CONDITION",
                                         "confidence": 1.0}])
        assert res.entities[0]["text"] == "asthma"

    def test_semantic_roundtrip(self, engine):
        res = engine.retrieve("alice", "wheezing at night",
                              intent=QueryIntent.SEMANTIC, top_k=2)
        assert len(res.hits) <= 2
        assert all(h["doc_type"] == "unstructured" for h, _ in res.hits)

    def test_patient_resolution_from_name(self, engine):
        res = engine.retrieve("alice", "fetch the records for Maria Gonzalez",
                              intent=QueryIntent.DOCUMENT_FETCH)
        assert res.patient_name is not None
        assert res.patient_ids == ["p1"]
        assert res.hits and all(h["patientId"] == "p1" for h, _ in res.hits)


class TestIngestFiles:
    def test_ingest_directory(self, engine, tmp_path):
        (tmp_path / "patient_5_note.txt").write_text("chronic migraine episodes")
        bundle = {"entry": [{"resource": {"resourceType": "Condition", "id": "z1",
                                          "subject": {"reference": "Patient/p5"},
                                          "code": {"text": "Migraine"}}}]}
        (tmp_path / "bundle.json").write_text(json.dumps(bundle))
        (tmp_path / "ignore.bin").write_bytes(b"\x00")
        n = engine.ingest_directory("carol", str(tmp_path))
        assert n >= 2
        t = engine.tenant("carol")
        assert t.index.count >= 2


class TestRetrieveBatch:
    def test_person_queries_fall_to_single_path(self, engine):
        """A patient-name query must NOT batch: only the single path runs
        resolve_patient_ids_from_name (patient routing + per-patient cache
        scope). Regression for the round-3 _batchable widening."""
        queries = ["what does Maria Gonzalez take for asthma",
                   "asthma treatment options"]
        batch = engine.retrieve_batch("alice", queries, top_k=3)
        single = engine.retrieve("alice", queries[0], top_k=3)
        assert batch[0].patient_ids == single.patient_ids
        assert batch[0].patient_name == single.patient_name
        assert [h["doc_id"] for h, _ in batch[0].hits] == \
               [h["doc_id"] for h, _ in single.hits]
        assert single.patient_ids == ["p1"]  # the fixture's Maria Gonzalez

    def test_batch_matches_single(self, engine):
        queries = ["wheezing at night exercise", "albuterol inhaler usage",
                   "asthma condition summary"]
        batch = engine.retrieve_batch("alice", queries, top_k=2)
        assert len(batch) == 3
        for q, res in zip(queries, batch):
            single = engine.retrieve("alice", q, top_k=2, intent=res.intent)
            assert [h["doc_id"] for h, _ in res.hits] == \
                   [h["doc_id"] for h, _ in single.hits], q

    def test_batch_mixed_intents_fall_back(self, engine):
        queries = ["how many patients have asthma?",           # AGGREGATE
                   "wheezing at night",                         # batchable
                   "asthma treatment options"]                  # batchable
        batch = engine.retrieve_batch("alice", queries, top_k=2)
        assert batch[0].aggregations is not None
        assert batch[1].hits or batch[2].hits

    def test_batch_text_match_queries_batch_and_match_single(self, engine):
        """Entity text-match constraints no longer force the single path:
        the batch scans once at 4k depth and post-filters per query on host
        (engine._retrieve_batch), with results identical to the single path."""
        queries = ["asthma wheezing exercise history",
                   "albuterol inhaler for asthma patient"]
        batch = engine.retrieve_batch("alice", queries, top_k=2)
        for q, res in zip(queries, batch):
            single = engine.retrieve("alice", q, top_k=2, intent=res.intent,
                                     entities=res.entities)
            assert [h["doc_id"] for h, _ in res.hits] == \
                   [h["doc_id"] for h, _ in single.hits], q

    def test_batch_carries_query_emb(self, engine):
        """RetrievalResult.query_emb rides along so serve/ask.py's cache
        never re-embeds (a second forward + device round-trip per request)."""
        res = engine.retrieve("alice", "asthma treatment options", top_k=2)
        assert res.query_emb is not None
        batch = engine.retrieve_batch(
            "alice", ["asthma treatment options", "wheezing at night"],
            top_k=2)
        for r in batch:
            assert r.query_emb is not None
            np.testing.assert_allclose(
                r.query_emb,
                engine.embedder.embed_query(
                    "asthma treatment options" if r is batch[0]
                    else "wheezing at night"), atol=1e-5)

    def test_nlu_batch_matches_single(self, engine):
        queries = ["how many patients have asthma?",
                   "compare asthma and bronchitis",
                   "asthma treatment options", ""]
        ib = engine.intent_classifier.classify_batch(queries)
        for q, got in zip(queries, ib):
            assert got == engine.intent_classifier.classify(q), q
        eb = engine.ner.extract_batch(queries)
        for q, got in zip(queries, eb):
            assert got == engine.ner.extract(q), q
