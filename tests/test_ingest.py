"""Chunker / FHIR / text parsing unit tests (reference behavior parity)."""

import json

from rassengine_tpu.ingest.chunker import chunk_text
from rassengine_tpu.ingest.fhir import extract_code_text, parse_fhir_bundle
from rassengine_tpu.ingest.textfile import (
    infer_patient_id_from_filename,
    parse_markdown_file,
    parse_text_file,
)


class TestChunker:
    def test_short_text_single_chunk(self):
        assert chunk_text("one two three", 512) == ["one two three"]

    def test_exact_split_no_overlap(self):
        words = [f"w{i}" for i in range(1000)]
        chunks = chunk_text(" ".join(words), 512)
        assert len(chunks) == 2
        assert chunks[0].split() == words[:512]
        assert chunks[1].split() == words[512:]

    def test_empty(self):
        assert chunk_text("", 512) == []
        assert chunk_text("   ", 512) == []

    def test_overlap(self):
        words = [f"w{i}" for i in range(100)]
        chunks = chunk_text(" ".join(words), 40, overlap=10)
        assert chunks[1].split()[0] == "w30"

    def test_adaptive_merges_tiny_tail(self):
        words = [f"w{i}" for i in range(530)]
        chunks = chunk_text(" ".join(words), 512, adaptive=True)
        assert len(chunks) == 1 + 0  # 18-word tail merged
        assert len(chunks[0].split()) == 530


class TestFhirParser:
    def make_bundle(self):
        return {
            "entry": [
                {"resource": {"resourceType": "Patient", "id": "p1",
                              "name": [{"given": ["Ana", "Maria"], "family": "Silva"}],
                              "gender": "female", "birthDate": "1975-03-14",
                              "address": [{"line": ["1 Main St"], "city": "Springfield"}],
                              "telecom": [{"value": "555-0101"}],
                              "maritalStatus": {"text": "Married"},
                              "communication": [{"language": {"text": "English"}}]}},
                {"resource": {"resourceType": "Condition", "id": "c1",
                              "subject": {"reference": "Patient/p1"},
                              "code": {"text": "Essential hypertension"},
                              "clinicalStatus": {"coding": [{"code": "active"}]},
                              "onsetDateTime": "2020-02-02",
                              "severity": {"text": "moderate"},
                              "note": [{"text": "BP consistently above 150/95."}],
                              "text": {"div": "<div>Hypertension note <b>severe</b></div>"}}},
                {"resource": {"resourceType": "Observation", "id": "o1",
                              "subject": {"reference": "Patient/p1"},
                              "code": {"text": "Systolic BP"},
                              "valueQuantity": {"value": 152, "unit": "mmHg"},
                              "referenceRange": [{"low": {"value": 90}, "high": {"value": 120}}]}},
                {"resource": {"resourceType": "Encounter", "id": "e1",
                              "subject": {"reference": "Patient/p1"}, "status": "finished",
                              "class": {"code": "AMB"},
                              "period": {"start": "2021-01-01", "end": "2021-01-02"}}},
                {"resource": {"resourceType": "MedicationRequest", "id": "m1",
                              "subject": {"reference": "Patient/p1"},
                              "medicationCodeableConcept": {"text": "Lisinopril 10mg"},
                              "authoredOn": "2021-01-02", "status": "active",
                              "dosageInstruction": [{"text": "once daily"}]}},
                {"resource": {"resourceType": "Procedure", "id": "pr1",
                              "subject": {"reference": "Patient/p1"},
                              "code": {"text": "Blood pressure panel"},
                              "performedDateTime": "2021-01-01"}},
                {"resource": {"resourceType": "AllergyIntolerance", "id": "a1",
                              "patient": {"reference": "Patient/p1"},
                              "code": {"text": "Penicillin"}, "criticality": "high"}},
                {"resource": {"resourceType": "Practitioner", "id": "dr1",
                              "name": [{"given": ["Gregory"], "family": "House"}],
                              "gender": "male"}},
                {"resource": {"resourceType": "Organization", "id": "org1",
                              "name": "Springfield General"}},
            ]
        }

    def test_nine_resource_types(self):
        s, u = parse_fhir_bundle(self.make_bundle())
        assert len(s) == 9
        types = {d["resourceType"] for d in s}
        assert len(types) == 9
        assert all(d["doc_type"] == "structured" for d in s)
        assert all(d["doc_id"].endswith("-structured") for d in s)

    def test_field_extraction(self):
        s, _ = parse_fhir_bundle(self.make_bundle())
        by_type = {d["resourceType"]: d for d in s}
        assert by_type["Patient"]["patientName"] == "Ana Maria Silva"
        assert by_type["Patient"]["patientLanguage"] == "English"
        assert by_type["Condition"]["conditionCodeText"] == "Essential hypertension"
        assert by_type["Condition"]["conditionClinicalStatus"] == "active"
        assert by_type["Observation"]["observationValue"] == "152"
        assert by_type["Observation"]["observationUnit"] == "mmHg"
        assert by_type["Observation"]["observationReferenceRange"] == "90 - 120"
        assert by_type["Encounter"]["encounterClass"] == "AMB"
        assert by_type["MedicationRequest"]["medRequestMedicationDisplay"] == "Lisinopril 10mg"
        assert by_type["Procedure"]["procedureCodeText"] == "Blood pressure panel"
        assert by_type["AllergyIntolerance"]["allergyCodeText"] == "Penicillin"
        assert by_type["Practitioner"]["practitionerName"] == "Gregory House"
        assert by_type["Organization"]["organizationName"] == "Springfield General"

    def test_patient_id_resolution(self):
        s, u = parse_fhir_bundle(self.make_bundle())
        for d in s:
            if d["resourceType"] in ("Practitioner", "Organization"):
                continue
            assert d["patientId"] == "p1", d["doc_id"]

    def test_narrative_chunks_strip_html(self):
        _, u = parse_fhir_bundle(self.make_bundle())
        cond = [d for d in u if d["doc_id"].startswith("Condition-c1")]
        assert cond
        assert "<b>" not in cond[0]["unstructuredText"]
        assert "Hypertension note" in cond[0]["unstructuredText"]
        assert cond[0]["doc_id"] == "Condition-c1-unstructured-0"

    def test_unknown_resource_skipped(self):
        s, u = parse_fhir_bundle({"entry": [{"resource": {"resourceType": "CarePlan"}}, {}]})
        assert s == [] and u == []

    def test_extract_code_text_fallbacks(self):
        assert extract_code_text({"text": "A"}) == "A"
        assert extract_code_text({"coding": [{"display": "B"}]}) == "B"
        assert extract_code_text({"coding": [{"code": "C"}]}) == "C"
        assert extract_code_text({}) is None


class TestTextFiles:
    def test_patient_id_from_filename(self):
        assert infer_patient_id_from_filename("/x/patient_42_notes.txt") == "42"
        assert infer_patient_id_from_filename("notes.txt") is None

    def test_parse_text_file(self, tmp_path):
        p = tmp_path / "patient_7_visit.txt"
        p.write_text("fever and chills " * 300)
        docs = parse_text_file(str(p), chunk_size=512)
        assert len(docs) == 2
        assert docs[0]["doc_id"] == "text-patient_7_visit-0"
        assert docs[0]["patientId"] == "7"
        assert docs[0]["doc_type"] == "unstructured"

    def test_latin1_fallback(self, tmp_path):
        p = tmp_path / "legacy.txt"
        p.write_bytes("caf\xe9 au lait spots".encode("latin-1"))
        docs = parse_text_file(str(p))
        assert "caf" in docs[0]["unstructuredText"]

    def test_markdown_strips_formatting(self, tmp_path):
        p = tmp_path / "patient_3_summary.md"
        p.write_text("# Summary\n\n**Diabetes** managed with _metformin_.\n")
        docs = parse_markdown_file(str(p))
        assert docs[0]["file_type"] == "markdown"
        assert "**" not in docs[0]["unstructuredText"]
        assert "Diabetes" in docs[0]["unstructuredText"]


class TestFhirEdgeCases:
    def test_multi_patient_bundle(self):
        bundle = {"entry": [
            {"resource": {"resourceType": "Patient", "id": "a",
                          "name": [{"given": ["Ann"], "family": "A"}]}},
            {"resource": {"resourceType": "Patient", "id": "b",
                          "name": [{"given": ["Bob"], "family": "B"}]}},
            {"resource": {"resourceType": "Condition", "id": "c",
                          "subject": {"reference": "Patient/b"},
                          "code": {"text": "Flu"}}},
        ]}
        s, _ = parse_fhir_bundle(bundle)
        by_id = {d["doc_id"]: d for d in s}
        assert by_id["Patient-a-structured"]["patientId"] == "a"
        assert by_id["Condition-c-structured"]["patientId"] == "b"

    def test_missing_resource_id_gets_entry_index(self):
        bundle = {"entry": [{"resource": {"resourceType": "Condition",
                                          "code": {"text": "X"}}}]}
        s, _ = parse_fhir_bundle(bundle)
        assert s[0]["doc_id"] == "Condition-entry0-structured"

    def test_urn_uuid_reference(self):
        bundle = {"entry": [{"resource": {"resourceType": "Observation", "id": "o",
                  "subject": {"reference": "urn:uuid:abc-123"},
                  "code": {"text": "HR"}, "valueQuantity": {"value": 70}}}]}
        s, _ = parse_fhir_bundle(bundle)
        assert s[0]["patientId"] == "abc-123"

    def test_malformed_entries_skipped(self):
        bundle = {"entry": [None, {"resource": None}, {"no_resource": 1},
                            {"resource": {"resourceType": "Patient", "id": "ok"}}]}
        s, u = parse_fhir_bundle(bundle)
        assert len(s) == 1 and s[0]["patientId"] == "ok"

    def test_long_narrative_chunks(self):
        text = "very long note " * 600  # 1800 words
        bundle = {"entry": [{"resource": {"resourceType": "Condition", "id": "c",
                  "subject": {"reference": "Patient/p"},
                  "note": [{"text": text}]}}]}
        _, u = parse_fhir_bundle(bundle, chunk_size=512)
        assert len(u) == 4  # ceil(1800+words/512)
        assert u[0]["doc_id"] == "Condition-c-unstructured-0"
        assert u[3]["doc_id"] == "Condition-c-unstructured-3"


class TestFhirFuzz:
    """Structural fuzz: random junk in any field of any resource type must
    never crash the parser (the reference swallows per-entry errors and
    keeps indexing, main.py:1112-1130 loop semantics); outputs must stay
    well-formed for the indexer (str doc_id, str-or-None patientId)."""

    def test_random_structures_never_crash(self):
        import random

        from rassengine_tpu.ingest.fhir import _EXTRACTORS

        rng = random.Random(0)
        junk_pool = [None, 0, -1, 3.5, True, "", "x", [], {}, [None], [{}],
                     {"text": None}, {"coding": "oops"}, {"coding": [None]},
                     {"coding": [{"display": 7}]}, {"reference": 9},
                     {"reference": ""}, [{"text": 1}], "Patient/", 10**18,
                     {"value": "NaN"}, [{"period": {"start": []}}]]
        field_pool = ["id", "subject", "patient", "code", "note", "text",
                      "status", "clinicalStatus", "onsetDateTime", "name",
                      "valueQuantity", "effectiveDateTime", "medication",
                      "medicationCodeableConcept", "performedPeriod",
                      "reasonCode", "dosageInstruction", "category",
                      "encounter", "participant", "address", "telecom",
                      "gender", "birthDate", "class", "type", "period"]
        entries = []
        for i in range(300):
            rtype = rng.choice(list(_EXTRACTORS) + ["Unknown", "", None])
            res = {"resourceType": rtype}
            for f in rng.sample(field_pool, rng.randint(0, 8)):
                res[f] = rng.choice(junk_pool)
            entries.append({"resource": res})
        s, u = parse_fhir_bundle({"entry": entries})
        for d in s + u:
            assert isinstance(d["doc_id"], str) and d["doc_id"]
            pid = d.get("patientId")
            assert pid is None or isinstance(pid, str)
        # junk fields are dropped or the single entry skipped, never fatal:
        # the well-typed majority must land (deterministic with this seed)
        assert len(s) >= 150


class TestAdaptiveChunkingPropagates:
    def test_engine_config_reaches_chunker(self, tmp_path):
        """ADAPTIVE_CHUNKING was documented as 'implemented for real here'
        but never propagated past the config object — a tiny tail chunk
        must merge into its predecessor when the flag is on."""
        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.engine import RassEngine
        from rassengine_tpu.models.bert import BertConfig

        text = " ".join(f"w{i}" for i in range(21))  # 20 + tail of 1
        p = tmp_path / "patient_7_note.txt"
        p.write_text(text)

        def mk(adaptive):
            cfg = EngineConfig(embed_dim=16, embed_batch_size=4,
                               index_capacity=256, index_block_rows=256,
                               chunk_size=10, adaptive_chunking=adaptive,
                               database_path=":memory:", llm_backend="echo",
                               intent_model_path="/none",
                               ner_model_path="/none")
            return RassEngine(cfg, bert_cfg=BertConfig.tiny(),
                              use_pallas=False)

        n_adaptive = mk(True).ingest_file("u", str(p))
        n_plain = mk(False).ingest_file("u", str(p))
        assert n_plain == 3 and n_adaptive == 2, (n_plain, n_adaptive)


class TestIngestBenchEncoderResolution:
    """Round-5 postmortem guard: ingest_bench must never silently measure
    the weightless tiny encoder while claiming a weights dir (the round-4/5
    '24L' rows did exactly that), and every result must carry the stamp."""

    def test_tiny_fallback_is_explicit_and_stamped(self):
        from rassengine_tpu.bench.ingest_bench import _resolve_encoder, run

        # CPU runs without an override stay tiny — and say so in the result
        assert _resolve_encoder(False, None) == ""
        r = run(80, use_tpu=False)
        assert r["encoder"]["weights"] == "weightless-tiny-random"
        assert r["encoder"]["layers"] == 2

    def test_tpu_default_resolves_serving_default(self, monkeypatch):
        from rassengine_tpu.bench.ingest_bench import _resolve_encoder

        monkeypatch.delenv("ENCODER_WEIGHTS_PATH", raising=False)
        import os
        expect = ("./encoder_model_prod24"
                  if os.path.isdir("./encoder_model_prod24") else "")
        assert _resolve_encoder(True, None) == expect
        # an explicit empty override always wins (deliberate tiny row)
        assert _resolve_encoder(True, "") == ""
        assert _resolve_encoder(True, "./x") == "./x"
