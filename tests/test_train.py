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
        """Inference must tokenize exactly like training (ADVICE round 1:
        mismatched schemes shifted the position->word alignment). Both now go
        through tokenizer.encode_words."""
        from rassengine_tpu.train import ner_train
        from rassengine_tpu.nlu.ner import ModelNER
        from rassengine_tpu.train.ner_train import encode_ner

        out = str(tmp_path / "ner_tok")
        result = ner_train.main(samples=64, epochs=1, size="tiny", out=out,
                                batch_size=16)
        ner = ModelNER(result["final_path"], threshold=0.0)
        assert type(ner.tokenizer).__name__ == "WordPieceTokenizer"
        words = "does Jane Doe have diabetes?".split()
        ids, mask, wid = ner.tokenizer.encode_words(words, 64)
        ref_ids, ref_mask, _lab = encode_ner([(words, [0] * len(words))],
                                             ner.tokenizer)
        n = int(mask.sum())
        assert ids[0, :n].tolist() == ref_ids[0, :n].tolist()
        # every word reachable through a first-subtoken position
        seen = {int(w) for w in wid[0] if w >= 0}
        assert seen == set(range(len(words)))
        ents = ner.extract("does Jane Doe have diabetes?")
        assert isinstance(ents, list)

    def test_continuation_labels(self):
        from rassengine_tpu.train.ner_train import _continuation
        from rassengine_tpu.nlu.ner import BIO_LABELS

        b_cond = BIO_LABELS.index("B-CONDITION")
        i_cond = BIO_LABELS.index("I-CONDITION")
        assert _continuation(b_cond) == i_cond
        assert _continuation(i_cond) == i_cond
        assert _continuation(0) == 0

    def test_family_split_disjoint(self):
        from rassengine_tpu.train.data import (NER_FAMILY_TEMPLATES,
                                               ner_families_for)

        tr, ev = ner_families_for("train"), ner_families_for("eval")
        assert tr.isdisjoint(ev)
        assert len(NER_FAMILY_TEMPLATES) >= 350  # ~400 templates like the ref
        # intent halves disjoint too
        from rassengine_tpu.train.data import INTENT_TEMPLATES, generate_intent_data

        assert all(len(v) >= 10 for v in INTENT_TEMPLATES.values())
        tr_txt = {t for t, _ in generate_intent_data(300, 0, "train")}
        ev_txt = {t for t, _ in generate_intent_data(300, 1, "eval")}
        assert not (tr_txt & ev_txt)


class TestEncoderTraining:
    def test_contrastive_beats_random_and_enables_cache(self, tmp_path):
        """VERDICT round-1 #3: trained-vs-random retrieval eval + the
        trusted-semantics cache path going live."""
        from rassengine_tpu.train import encoder_train

        out = str(tmp_path / "enc")
        r = encoder_train.main(steps=40, batch_size=32, out=out, size="tiny",
                               n_pairs=800, n_eval=128)
        assert r["trained"]["recall@5"] > r["random_init"]["recall@5"]

        from rassengine_tpu.models.embedder import Embedder

        cfg = EngineConfig(encoder_weights_path=out, embed_dim=64,
                           database_path=":memory:", llm_backend="echo",
                           intent_model_path="/none", ner_model_path="/none")
        emb = Embedder(cfg)
        assert emb.trusted_semantics
        assert emb.bert_cfg.hidden_size == 64  # config read from checkpoint meta
        v = emb.embed_query("does the patient take metformin")
        assert v.shape == (1, 64) and abs(float(np.linalg.norm(v)) - 1.0) < 1e-3

        from rassengine_tpu.engine import RassEngine
        from rassengine_tpu.serve.ask import AskService
        from rassengine_tpu.serve.db import ChatStore

        eng = RassEngine(cfg, use_pallas=False)
        svc = AskService(eng, db=ChatStore(":memory:"))
        assert svc.cache is not None  # semantic cache live with trusted encoder

    def test_pair_generator_uses_synonyms(self):
        from rassengine_tpu.train.encoder_train import SYNONYMS, generate_pairs

        pairs = generate_pairs(200, seed=1)
        # queries must NOT contain the chunk's canonical condition term
        leaks = 0
        for q, c in pairs:
            for cond in SYNONYMS:
                if cond in c.lower() and cond in q.lower():
                    leaks += 1
        assert leaks == 0
