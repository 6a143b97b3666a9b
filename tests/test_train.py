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


class TestAdviceRegressions:
    def test_padded_rows_excluded_from_loss(self):
        """batch_iterator zero-pads tail batches; padded rows (label 0) must
        not contribute to sequence loss or eval (ADVICE round 1)."""
        import jax.numpy as jnp
        from rassengine_tpu.train.trainer import batch_iterator, sequence_loss

        ids = np.ones((5, 8), np.int32)
        mask = np.ones((5, 8), np.int32)
        labels = np.arange(5, dtype=np.int32) + 1
        batches = batch_iterator(ids, mask, labels, batch_size=4)
        assert [int(b["valid"].sum()) for b in batches] == [4, 1]

        # loss over the padded batch must equal loss over the single real row
        logits = jnp.asarray(np.random.RandomState(0).randn(4, 12).astype(np.float32))
        tail = batches[1]
        masked = float(sequence_loss(logits, tail["labels"], tail["valid"]))
        alone = float(sequence_loss(logits[:1], tail["labels"][:1]))
        assert abs(masked - alone) < 1e-5

    def test_ner_inference_tokenizes_like_training(self, tmp_path):
        """Punctuated queries must hash whole whitespace words, the exact
        training-time scheme (ADVICE round 1: _WORD_RE splitting shifted the
        position->word alignment and fed the model unseen ids)."""
        from rassengine_tpu.train import ner_train
        from rassengine_tpu.nlu.ner import ModelNER
        from rassengine_tpu.train.ner_train import encode_ner

        out = str(tmp_path / "ner_tok")
        result = ner_train.main(samples=64, epochs=1, size="tiny", out=out,
                                batch_size=16)
        ner = ModelNER(result["final_path"], threshold=0.0)
        words = "does Jane Doe have diabetes?".split()
        ids, mask = ner._encode_words(words)
        ref_ids, ref_mask, _ = encode_ner([(words, [0] * len(words))],
                                          ner.tokenizer)
        n = len(words) + 2
        assert ids[0, :n].tolist() == ref_ids[0, :n].tolist()
        assert int(mask.sum()) == n  # one token per word + CLS/SEP
        ents = ner.extract("does Jane Doe have diabetes?")
        assert isinstance(ents, list)
