"""Training harness smoke tests: loss falls, checkpoints load into the NLU."""

import numpy as np

from rassengine_tpu.core.config import EngineConfig


class TestIntentTraining:
    def test_train_eval_save_load(self, tmp_path):
        from rassengine_tpu.train import intent_train

        out = str(tmp_path / "intent")
        result = intent_train.main(samples=96, epochs=2, size="tiny", out=out,
                                   batch_size=16)
        hist = result["history"]
        assert hist[-1]["loss"] < hist[0]["loss"] * 1.5  # training is sane
        assert "accuracy" in hist[-1] and "f1" in hist[-1]

        # the trained checkpoint loads into the serving classifier
        from rassengine_tpu.nlu.intent import ModelIntentClassifier

        clf = ModelIntentClassifier(result["final_path"])
        intent, conf = clf.classify("how many patients have diabetes")
        assert 0.0 <= conf <= 1.0
        assert intent.value in __import__(
            "rassengine_tpu.core.schema", fromlist=["ALL_INTENTS"]).ALL_INTENTS

    def test_engine_uses_trained_model_when_confident(self, tmp_path):
        from rassengine_tpu.train import intent_train
        from rassengine_tpu.nlu.intent import IntentClassifier

        out = str(tmp_path / "intent2")
        result = intent_train.main(samples=64, epochs=1, size="tiny", out=out,
                                   batch_size=16)
        cfg = EngineConfig(intent_model_path=result["final_path"],
                           intent_threshold=0.0)  # always trust the model
        clf = IntentClassifier(cfg)
        assert clf.model is not None
        intent, conf = clf.classify("count of encounters")
        assert conf >= 0.0


class TestNerTraining:
    def test_train_and_decode(self, tmp_path):
        from rassengine_tpu.train import ner_train

        out = str(tmp_path / "ner")
        result = ner_train.main(samples=128, epochs=2, size="tiny", out=out,
                                batch_size=16)
        hist = result["history"]
        assert hist[-1]["loss"] < hist[0]["loss"] * 1.5
        assert "f1" in hist[-1]

        from rassengine_tpu.nlu.ner import ModelNER

        ner = ModelNER(result["final_path"], threshold=0.0)
        ents = ner.extract("does John Smith take metformin")
        assert isinstance(ents, list)  # decodes without error

    def test_bio_alignment(self):
        from rassengine_tpu.train.data import generate_ner_data
        from rassengine_tpu.nlu.ner import BIO_LABELS

        data = generate_ner_data(50, seed=3)
        for words, labels in data:
            assert len(words) == len(labels)
            prev = "O"
            for lbl_id in labels:
                lbl = BIO_LABELS[lbl_id]
                if lbl.startswith("I-"):
                    # I- must continue a same-type B-/I-
                    assert prev != "O" and prev.split("-", 1)[1] == lbl.split("-", 1)[1]
                prev = lbl
