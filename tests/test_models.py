"""Encoder/NLU model tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.models.bert import (
    BertConfig,
    BertEncoder,
    BertForSequenceClassification,
    BertForTokenClassification,
)
from rassengine_tpu.models.embedder import Embedder
from rassengine_tpu.models.tokenizer import HashTokenizer


def test_encoder_forward_shapes():
    cfg = BertConfig.tiny()
    model = BertEncoder(cfg)
    ids = jnp.ones((2, 16), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    hidden = model.apply(params, ids, mask)
    assert hidden.shape == (2, 16, cfg.hidden_size)
    emb = model.pool(hidden, mask)
    assert emb.shape == (2, cfg.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-4)


def test_padding_does_not_change_embedding():
    cfg = BertConfig.tiny()
    model = BertEncoder(cfg)
    ids = jnp.asarray([[1, 7, 8, 9, 2, 0, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    e1 = model.pool(model.apply(params, ids, mask), mask)
    ids2 = jnp.pad(ids, ((0, 0), (0, 8)))
    mask2 = jnp.pad(mask, ((0, 0), (0, 8)))
    e2 = model.pool(model.apply(params, ids2, mask2), mask2)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=2e-2)


def test_classification_heads():
    cfg = BertConfig.tiny()
    ids = jnp.ones((2, 12), jnp.int32)
    mask = jnp.ones_like(ids)
    seq = BertForSequenceClassification(cfg, num_labels=12)
    p = seq.init(jax.random.PRNGKey(0), ids, mask)
    assert seq.apply(p, ids, mask).shape == (2, 12)
    tok = BertForTokenClassification(cfg, num_labels=39)
    p = tok.init(jax.random.PRNGKey(0), ids, mask)
    assert tok.apply(p, ids, mask).shape == (2, 12, 39)


def test_hash_tokenizer_deterministic_and_bucketed():
    tok = HashTokenizer(vocab_size=1024, max_len=128)
    ids1, m1 = tok.encode_batch(["diabetes mellitus type 2"])
    ids2, m2 = tok.encode_batch(["diabetes mellitus type 2"])
    np.testing.assert_array_equal(ids1, ids2)
    assert ids1.shape[1] in (32, 64, 128)
    assert m1.sum() == 6  # CLS + 4 words + SEP


class TestEmbedder:
    def test_api_parity(self):
        cfg = EngineConfig(embed_dim=64, embed_batch_size=4)
        emb = Embedder(cfg, bert_cfg=BertConfig.tiny())
        texts = ["patient has hypertension", "", "  ", "aspirin 81mg daily"]
        out = emb.embed_texts_in_batches(texts)
        assert out.shape == (4, 64) and out.dtype == np.float32
        # empty texts → zero vectors (reference main.py:225-228)
        assert np.all(out[1] == 0) and np.all(out[2] == 0)
        np.testing.assert_allclose(np.linalg.norm(out[0]), 1.0, rtol=1e-4)
        q = emb.embed_query("hypertension treatment")
        assert q.shape == (1, 64)

    def test_embedding_similarity_sanity(self):
        cfg = EngineConfig(embed_dim=64, embed_batch_size=4)
        emb = Embedder(cfg, bert_cfg=BertConfig.tiny())
        e = emb.embed_texts_in_batches(
            ["patient has diabetes", "patient has diabetes", "unrelated zebra text"]
        )
        same = float(e[0] @ e[1])
        diff = float(e[0] @ e[2])
        assert same > 0.999 and same > diff
