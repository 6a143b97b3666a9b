"""HF→Flax weight conversion and WordPiece tokenizer tests."""

import numpy as np
import pytest

from rassengine_tpu.models.bert import BertConfig, BertEncoder
from rassengine_tpu.models.weights import convert_hf_bert


def make_hf_state_dict(cfg: BertConfig, rng):
    """Random tensors in the HF BertModel layout/shapes."""
    h, i = cfg.hidden_size, cfg.intermediate_size
    sd = {
        "embeddings.word_embeddings.weight": rng.normal(size=(cfg.vocab_size, h)),
        "embeddings.position_embeddings.weight": rng.normal(size=(cfg.max_position, h)),
        "embeddings.token_type_embeddings.weight": rng.normal(size=(cfg.type_vocab_size, h)),
        "embeddings.LayerNorm.weight": np.ones(h),
        "embeddings.LayerNorm.bias": np.zeros(h),
    }
    for L in range(cfg.num_layers):
        p = f"encoder.layer.{L}."
        for name in ("query", "key", "value"):
            sd[p + f"attention.self.{name}.weight"] = rng.normal(size=(h, h))
            sd[p + f"attention.self.{name}.bias"] = rng.normal(size=(h,))
        sd[p + "attention.output.dense.weight"] = rng.normal(size=(h, h))
        sd[p + "attention.output.dense.bias"] = rng.normal(size=(h,))
        sd[p + "attention.output.LayerNorm.weight"] = np.ones(h)
        sd[p + "attention.output.LayerNorm.bias"] = np.zeros(h)
        sd[p + "intermediate.dense.weight"] = rng.normal(size=(i, h))
        sd[p + "intermediate.dense.bias"] = rng.normal(size=(i,))
        sd[p + "output.dense.weight"] = rng.normal(size=(h, i))
        sd[p + "output.dense.bias"] = rng.normal(size=(h,))
        sd[p + "output.LayerNorm.weight"] = np.ones(h)
        sd[p + "output.LayerNorm.bias"] = np.zeros(h)
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


class TestHfConversion:
    def test_converted_tree_runs_and_matches_manual(self, rng):
        import jax
        import jax.numpy as jnp

        cfg = BertConfig.tiny()
        sd = make_hf_state_dict(cfg, rng)
        params = {"params": convert_hf_bert(sd, cfg)}
        model = BertEncoder(cfg)
        ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
        mask = jnp.ones_like(ids)
        hidden = model.apply(params, ids, mask)
        assert hidden.shape == (1, 4, cfg.hidden_size)
        assert np.isfinite(np.asarray(hidden)).all()

        # attention QKV kernel layout: torch [out, in] → flax [in, heads, hd]
        ref = sd["encoder.layer.0.attention.self.query.weight"]
        got = np.asarray(params["params"]["layer_0"]["attention"]["query"]["kernel"])
        np.testing.assert_allclose(
            got.reshape(cfg.hidden_size, cfg.hidden_size), ref.T, rtol=1e-6)

        # param tree accepted by init-structure (same keys)
        init = model.init(jax.random.PRNGKey(0), ids, mask)
        k1 = jax.tree_util.tree_structure(init)
        k2 = jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray, params))
        assert k1 == k2

    def test_bert_prefix_stripped(self, rng):
        cfg = BertConfig.tiny()
        sd = {("bert." + k): v for k, v in make_hf_state_dict(cfg, rng).items()}
        params = convert_hf_bert(sd, cfg)
        assert "token_embed" in params


class TestWordPiece:
    def test_vocab_txt_tokenizer(self, tmp_path):
        pytest.importorskip("tokenizers")
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "the", "patient", "has", "hyper", "##tension", "asthma"]
        (tmp_path / "vocab.txt").write_text("\n".join(vocab))
        from rassengine_tpu.models.tokenizer import WordPieceTokenizer

        tok = WordPieceTokenizer(str(tmp_path), max_len=32)
        ids, mask = tok.encode_batch(["The patient has hypertension"])
        assert ids.shape[0] == 1 and mask[0].sum() >= 6
        # CLS ... SEP framing
        assert ids[0][0] == vocab.index("[CLS]")
        assert ids[0][mask[0].sum() - 1] == vocab.index("[SEP]")
        # wordpiece split of hypertension
        assert vocab.index("##tension") in ids[0].tolist()
