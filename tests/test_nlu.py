"""NLU tests: intent rules, rule NER, entity→filter lowering."""

import datetime

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.schema import NO_DATE, QueryIntent
from rassengine_tpu.nlu.intent import IntentClassifier, RuleIntentClassifier
from rassengine_tpu.nlu.ner import RuleNER, entities_to_filter


class TestIntentRules:
    CASES = [
        ("How many patients have diabetes?", QueryIntent.AGGREGATE),
        ("Compare blood pressure between visits", QueryIntent.COMPARISON),
        ("When was her last visit?", QueryIntent.TEMPORAL),
        ("Why does metformin cause nausea, explain", QueryIntent.EXPLANATORY),
        ("Fetch the medical records for patient 7", QueryIntent.DOCUMENT_FETCH),
        ("What is his marital status", QueryIntent.STRUCTURED),
        ("Did Dr. House see anyone today?", QueryIntent.ENTITY_SPECIFIC),
        ("Patients with a condition of asthma", QueryIntent.HYBRID_STRUCTURED),
        ('"essential hypertension"', QueryIntent.KEYWORD),
        ("What meds is she on? Any allergies on file?", QueryIntent.MULTI_INTENT),
    ]

    def test_rule_cases(self):
        clf = RuleIntentClassifier()
        for q, want in self.CASES:
            got, conf = clf.classify(q)
            assert got == want, (q, got)

    def test_default_semantic(self):
        clf = RuleIntentClassifier()
        got, _ = clf.classify("tell me about this patient's overall health trends")
        assert got in (QueryIntent.SEMANTIC, QueryIntent.HYBRID)

    def test_classifier_without_model_uses_rules(self, tmp_path):
        cfg = EngineConfig(intent_model_path=str(tmp_path / "none"),
                           ner_model_path=str(tmp_path / "none"))
        clf = IntentClassifier(cfg)
        assert clf.model is None
        assert clf.classify("how many encounters total?")[0] == QueryIntent.AGGREGATE


class TestRuleNER:
    def ents(self, q):
        return {(e["label"], e["text"]) for e in RuleNER().extract(q)}

    def test_codes(self):
        e = self.ents("Does she have E11.9 or procedure 99213 with lab 4548-4?")
        assert ("ICD10_CODE", "E11.9") in e
        assert ("CPT_CODE", "99213") in e
        assert ("LOINC_CODE", "4548-4") in e

    def test_person_and_doctor(self):
        e = self.ents("Did Dr. House treat Jane Doe for asthma?")
        assert ("DOCTOR", "House") in e
        assert ("PERSON", "Jane Doe") in e
        assert ("CONDITION", "asthma") in e

    def test_sentence_starter_not_person(self):
        e = self.ents("Show Records for the clinic")
        assert not any(lbl == "PERSON" for lbl, _ in e)

    def test_demographics_and_values(self):
        e = self.ents("female patient, BP 140 mmHg, phone 555-123-4567, a@b.com")
        labels = {lbl for lbl, _ in e}
        assert {"GENDER", "OBS_VALUE", "PHONE", "EMAIL"} <= labels

    def test_dates(self):
        e = self.ents("diagnosed on 2020-03-01 and again last year")
        texts = {t for lbl, t in e if lbl == "DATE"}
        assert "2020-03-01" in texts and "last year" in texts

    def test_medication_and_severity(self):
        e = self.ents("severe reaction to penicillin")
        assert ("SEVERITY", "severe") in e


class TestEntityFilter:
    def test_gender_to_keyword_terms(self):
        spec, text = entities_to_filter([{"text": "female", "label": "GENDER"}])
        assert spec.keyword_terms == {"patientGender": ["female"]}

    def test_gender_normalization(self):
        spec, _ = entities_to_filter([{"text": "Woman", "label": "GENDER"}])
        assert spec.keyword_terms == {"patientGender": ["female"]}

    def test_date_to_ranges(self):
        spec, _ = entities_to_filter([{"text": "2020-05-10", "label": "DATE"}])
        d = (datetime.date(2020, 5, 10) - datetime.date(1970, 1, 1)).days
        assert spec.date_ranges["conditionOnsetDateTime"] == (d, d)
        assert spec.date_ranges["encounterStart"] == (d, d)

    def test_year_becomes_range(self):
        spec, _ = entities_to_filter([{"text": "2019", "label": "DATE"}])
        lo, hi = spec.date_ranges["conditionOnsetDateTime"]
        assert hi - lo == 364

    def test_condition_is_text_match(self):
        spec, text = entities_to_filter([{"text": "diabetes", "label": "CONDITION"}])
        assert spec.keyword_terms == {}
        assert text == {"conditionCodeText": ["diabetes"]}

    def test_severity_keyword(self):
        spec, _ = entities_to_filter([{"text": "severe", "label": "SEVERITY"}])
        assert spec.keyword_terms == {"conditionSeverity": ["severe"]}


class TestLlmNer:
    def test_parse_clean_json(self):
        from rassengine_tpu.nlu.ner import parse_llm_entities

        raw = '[{"text": "diabetes", "label": "CONDITION"}]'
        ents = parse_llm_entities(raw)
        assert ents == [{"text": "diabetes", "label": "CONDITION", "confidence": 0.9}]

    def test_parse_fenced_json(self):
        from rassengine_tpu.nlu.ner import parse_llm_entities

        raw = '```json\n[{"text": "metformin", "label": "MEDICATION"}]\n```'
        assert parse_llm_entities(raw)[0]["label"] == "MEDICATION"

    def test_parse_with_prose_bracket_slicing(self):
        from rassengine_tpu.nlu.ner import parse_llm_entities

        raw = 'Sure! Here you go: [{"text": "Jane", "label": "PERSON"}] hope it helps'
        assert parse_llm_entities(raw)[0]["text"] == "Jane"

    def test_parse_none_and_garbage(self):
        from rassengine_tpu.nlu.ner import parse_llm_entities

        assert parse_llm_entities(None) == []
        assert parse_llm_entities("not json at all") == []
        assert parse_llm_entities('{"text": "x"}') == []  # not a list

    def test_unknown_labels_dropped(self):
        from rassengine_tpu.nlu.ner import parse_llm_entities

        raw = '[{"text": "x", "label": "NOT_A_LABEL"}, {"text": "y", "label": "GENDER"}]'
        ents = parse_llm_entities(raw)
        assert [e["label"] for e in ents] == ["GENDER"]

    def test_async_extract_with_fake_llm(self):
        import asyncio

        from rassengine_tpu.nlu.ner import llm_ner_extract
        from rassengine_tpu.serve.llm import LlmClient

        class FakeLlm(LlmClient):
            async def generate(self, prompt, system_msg=""):
                return '[{"text": "severe", "label": "SEVERITY"}]'

        ents = asyncio.run(llm_ner_extract("severe pain", FakeLlm()))
        assert ents[0]["label"] == "SEVERITY"


class TestCueEvidenceGate:
    """VERDICT r2 #2: the production intent path gates the model on trained
    discriminative cue words so it never loses to its own rule fallback on
    unseen cue vocabularies."""

    def test_cue_words_saved_and_gate_routes(self, tmp_path):
        from rassengine_tpu.train.intent_train import save_cue_words

        train = [("compare the lipid panel against last visit", 6),
                 ("compare cholesterol with prior result", 6),
                 ("compare blood pressure readings", 6),
                 ("how many patients have asthma", 5),
                 ("how many encounters this year", 5),
                 ("how many prescriptions exist", 5)]
        path = save_cue_words(train, str(tmp_path))
        import json

        from rassengine_tpu.core.schema import ALL_INTENTS

        blob = json.load(open(path))
        assert blob["cues"].get("compare") == ALL_INTENTS[6]  # word gate
        assert blob["stem_cues"].get("compar") == ALL_INTENTS[6]  # vote table
        # slot-like words spread across intents must not qualify (either table)
        train2 = train + [("asthma note", 0), ("asthma history", 7),
                          ("asthma meds", 4)]
        blob2 = json.load(open(save_cue_words(train2, str(tmp_path / "b"))))
        assert "asthma" not in blob2["cues"]
        assert "asthma" not in blob2["stem_cues"]

    def test_stem_generalizes_morphological_variants(self):
        from rassengine_tpu.nlu.intent import stem

        assert stem("exactly") == stem("exact")
        assert stem("comparison") == stem("compare")
        assert stem("summarize") == stem("summary")
        assert stem("counting") == stem("counts") == stem("count")

    def test_classifier_routes_to_rules_without_evidence(self, tmp_path):
        import json

        from rassengine_tpu.nlu.intent import (IntentClassifier,
                                               ModelIntentClassifier)

        class FakeModel:
            cue_intent = {"compare": "SEMANTIC", "versus": "COMPARISON"}
            stem_cues = {}
            trained_words = frozenset()
            supported_intents = ModelIntentClassifier.supported_intents
            cue_votes = ModelIntentClassifier.cue_votes

            def classify(self, q):
                return QueryIntent.SEMANTIC, 0.99  # confidently wrong

        cfg = EngineConfig(intent_model_path="/none", ner_model_path="/none")
        clf = IntentClassifier(cfg)
        clf.model = FakeModel()
        # a cue supporting the model's prediction → model wins
        assert clf.classify("compare the results")[0] == QueryIntent.SEMANTIC
        # cue present but for a DIFFERENT intent → unsupported → rules
        assert clf.classify("alpha versus beta readings")[0] == \
            QueryIntent.COMPARISON
        # no trained cue at all → rules decide (AGGREGATE pattern)
        assert clf.classify("number of admissions recorded")[0] == \
            QueryIntent.AGGREGATE

    def test_cue_vote_channel_beats_rule_default(self):
        """No precise rule matches and the model is unsupported — an
        unambiguous stem-cue vote decides before the rules' length-based
        default (an unseen morphological variant 'exactly' carries its
        trained stem's intent)."""
        from rassengine_tpu.nlu.intent import (IntentClassifier,
                                               ModelIntentClassifier)

        class FakeModel:
            cue_intent = {"exact": "KEYWORD"}
            stem_cues = {"exact": "KEYWORD"}
            trained_words = frozenset()
            supported_intents = ModelIntentClassifier.supported_intents
            cue_votes = ModelIntentClassifier.cue_votes

            def classify(self, q):
                return QueryIntent.SEMANTIC, 0.2  # below threshold

        cfg = EngineConfig(intent_model_path="/none", ner_model_path="/none")
        clf = IntentClassifier(cfg)
        clf.model = FakeModel()
        q = "match the charted phrase exactly please"
        assert clf.rules.classify(q)[0] == QueryIntent.SEMANTIC  # default
        assert clf.classify(q)[0] == QueryIntent.KEYWORD  # vote wins
        # precise rule patterns still outrank the vote channel
        assert clf.classify("how many exact matches")[0] == \
            QueryIntent.AGGREGATE

    def test_base_form_collision_vote_blocked(self):
        """Round 4: suffix-stripping collisions land on bare base forms —
        trained "higher" puts stem "high" in the vote table, but "high blood
        pressure" must not vote COMPARISON (the vote disagrees with the
        model's raw prediction, so it's a collision, not corroboration)."""
        from rassengine_tpu.nlu.intent import (IntentClassifier,
                                               ModelIntentClassifier)

        class FakeModel:
            cue_intent = {"higher": "COMPARISON"}
            stem_cues = {"high": "COMPARISON"}
            trained_words = frozenset({"higher"})
            supported_intents = ModelIntentClassifier.supported_intents
            cue_votes = ModelIntentClassifier.cue_votes

            def classify(self, q):
                return QueryIntent.SEMANTIC, 0.4  # below threshold

        cfg = EngineConfig(intent_model_path="/none", ner_model_path="/none")
        clf = IntentClassifier(cfg)
        clf.model = FakeModel()
        q = "does the patient have high blood pressure"
        assert clf.classify(q)[0] != QueryIntent.COMPARISON
        # the SAME base form IS admitted when it corroborates the model
        clf.model.classify = lambda q: (QueryIntent.COMPARISON, 0.4)
        assert clf.classify(q)[0] == QueryIntent.COMPARISON
        # and a true inflected variant votes unconditionally
        clf.model.classify = lambda q: (QueryIntent.SEMANTIC, 0.4)
        assert clf.classify("are readings higher than before")[0] == \
            QueryIntent.COMPARISON

    def test_seen_but_impure_word_never_votes(self):
        """Round 4: a word the training set contained but occurrence purity
        rejected from the exact-cue table must not re-enter via its stem."""
        from rassengine_tpu.nlu.intent import (IntentClassifier,
                                               ModelIntentClassifier)

        class FakeModel:
            cue_intent = {}
            stem_cues = {"work": "COMPARISON"}
            trained_words = frozenset({"working"})
            supported_intents = ModelIntentClassifier.supported_intents
            cue_votes = ModelIntentClassifier.cue_votes

            def classify(self, q):
                return QueryIntent.SEMANTIC, 0.4

        cfg = EngineConfig(intent_model_path="/none", ner_model_path="/none")
        clf = IntentClassifier(cfg)
        clf.model = FakeModel()
        assert clf.classify("is the medication working")[0] != \
            QueryIntent.COMPARISON

    def test_trained_words_emitted_and_loaded(self, tmp_path):
        from rassengine_tpu.train.intent_train import save_cue_words

        train = [("compare the lipid panel", 6),
                 ("compare cholesterol readings", 6),
                 ("compare blood pressures", 6)]
        path = save_cue_words(train, str(tmp_path))
        import json

        blob = json.load(open(path))
        assert "lipid" in blob["trained_words"]
        assert "compare" in blob["trained_words"]

    def test_oov_conf_trusts_calibrated_model_without_cue(self):
        """A pretrained-backbone checkpoint ships a calibrated oov_conf:
        unsupported predictions at confidence ≥ tau win; below tau (or with
        no oov_conf, the round-3 default) the old gate semantics hold."""
        from rassengine_tpu.nlu.intent import (IntentClassifier,
                                               ModelIntentClassifier)

        class FakeModel:
            cue_intent = {"compare": "COMPARISON"}  # query has NO cue
            stem_cues = {}
            trained_words = frozenset()
            supported_intents = ModelIntentClassifier.supported_intents
            cue_votes = ModelIntentClassifier.cue_votes
            conf = 0.92

            def classify_batch(self, qs):
                return [(QueryIntent.EXPLANATORY, self.conf) for _ in qs]

        cfg = EngineConfig(intent_model_path="/none", ner_model_path="/none")
        clf = IntentClassifier(cfg)
        clf.model = FakeModel()
        q = "clarify the situation for me"  # no trained cue word
        rules_pick = clf.rules.classify(q)[0]
        # no oov_conf attribute → unsupported → rules decide (round-3 gate)
        assert clf.classify(q)[0] == rules_pick
        # calibrated bound below the model's confidence → model trusted
        clf.model.oov_conf = 0.9
        assert clf.classify(q)[0] == QueryIntent.EXPLANATORY
        # confidence under the bound → gate again
        clf.model.conf = 0.7
        assert clf.classify(q)[0] == rules_pick


class TestReviewFixesNlu:
    def test_gazetteer_finds_bounded_later_occurrence(self):
        from rassengine_tpu.nlu.ner import RuleNER

        ents = RuleNER().extract("patients with prediabetes and diabetes")
        texts = {(e["label"], e["text"].lower()) for e in ents}
        assert ("CONDITION", "prediabetes") in texts
        assert ("CONDITION", "diabetes") in texts, texts

    def test_multiple_dates_union_not_overwrite(self):
        from rassengine_tpu.core.schema import date_to_epoch_days
        from rassengine_tpu.nlu.ner import entities_to_filter

        ents = [{"label": "DATE", "text": "2019", "confidence": 0.9},
                {"label": "DATE", "text": "2021", "confidence": 0.9}]
        spec, _tm = entities_to_filter(ents)
        assert spec.date_ranges
        lo, hi = next(iter(spec.date_ranges.values()))
        assert lo <= date_to_epoch_days("2019-06-01")
        assert hi >= date_to_epoch_days("2021-06-01"), (lo, hi)

    def test_model_nlu_uses_trained_seq_len(self):
        """Inference must bucket to the length training truncated to (64) —
        longer buckets feed untrained position embeddings."""
        from rassengine_tpu.nlu.intent import ModelIntentClassifier
        from rassengine_tpu.nlu.ner import ModelNER

        for cls, path in ((ModelIntentClassifier, "./intent_model/final"),
                          (ModelNER, "./ner_model/final")):
            import os

            if not os.path.exists(os.path.join(path, "params.msgpack")):
                continue
            m = cls(path)
            assert m.max_len == 64, (cls.__name__, m.max_len)
