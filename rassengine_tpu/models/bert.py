"""Flax BERT-family encoder — the on-TPU replacement for every HF/torch model
the reference calls out of process:

- the mxbai-embed-large bi-encoder behind Ollama /embeddings
  (reference app/main.py:225-274) → ``BertEncoder`` + pooling head,
- the intent sequence classifier (main.py:162-189, train_intent.py)
  → ``BertForSequenceClassification``,
- the BioBERT NER token classifier (main.py:128-160, train_ner.py)
  → ``BertForTokenClassification``.

Written for the MXU: bf16 activations with f32 LayerNorm/softmax accumulation,
static shapes, and einsum contractions whose named dims XLA shards cleanly when
params carry ``heads``/``mlp`` tensor-parallel PartitionSpecs (see
parallel/sharding.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 1024          # mxbai-embed-large / BERT-large class
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: str = "bfloat16"
    pooling: str = "cls"             # "cls" (mxbai) | "mean"
    remat: bool = False              # rematerialize layers (training only:
    #   trades recompute FLOPs for activation HBM so 24L fits a v5e with
    #   optimizer state resident; inference never takes grads, so shipped
    #   checkpoints save remat=False)
    pre_ln: bool = False             # pre-LayerNorm residual blocks. Post-LN
    #   (the HF BERT layout, default — convert_hf_bert requires it) does not
    #   TRAIN from scratch at 24L: measured round 4, 3000 steps at
    #   24L/1024h left the encoder context-blind (hidden states identical
    #   across inputs, MLM loss pinned at the unigram entropy). Pre-LN keeps
    #   every submodule name (checkpoints stay loadable by the same code;
    #   the flag rides model_meta.json) and adds the standard final_norm +
    #   1/sqrt(2L)-scaled residual out-projections.

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @staticmethod
    def tiny(vocab_size: int = 1024) -> "BertConfig":
        """Small config for tests and CI."""
        return BertConfig(
            vocab_size=vocab_size, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position=128,
        )

    @staticmethod
    def small(vocab_size: int = 4096) -> "BertConfig":
        """Shipped-NLU size: big enough to host domain-MLM semantics, small
        enough to train on this image in minutes."""
        return BertConfig(
            vocab_size=vocab_size, hidden_size=128, num_layers=4, num_heads=4,
            intermediate_size=512, max_position=128,
        )

    @staticmethod
    def production(vocab_size: int = 8192) -> "BertConfig":
        """The shipped bi-encoder shape: native 1024-d hidden (the index
        dimension — no projection head), BERT-base-class depth. Sized so the
        checkpoint trains in-framework on one v5e in minutes and ships in
        the repo as bf16 (~220 MB) while keeping mxbai-embed-large's
        embedding width (reference app/main.py:67, EMBED_DIM=1024)."""
        return BertConfig(vocab_size=vocab_size, hidden_size=1024,
                          num_layers=8, num_heads=16, intermediate_size=4096,
                          max_position=128)

    @staticmethod
    def production_large(vocab_size: int = 16384) -> "BertConfig":
        """The round-4 shipped bi-encoder: mxbai-embed-large DEPTH class
        (24L/1024h/16 heads/4096 mlp — reference app/main.py:67) with a
        WordPiece vocabulary trained in-framework on the wide corpus
        (train/corpus.py: mined real-English prose + clinical narratives).
        max_position=128 matches the serving bucket the embedder feeds
        (chunker emits ~512-word chunks; the first 128 subword tokens are
        what the encoder sees, same truncation class as the reference's
        512-token cap on much longer chunks)."""
        return BertConfig(vocab_size=vocab_size, hidden_size=1024,
                          num_layers=24, num_heads=16,
                          intermediate_size=4096, max_position=128)

    @staticmethod
    def large() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def base() -> "BertConfig":
        return BertConfig(hidden_size=768, num_layers=12, num_heads=12,
                          intermediate_size=3072)


class _SelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, attention_mask):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (cfg.num_heads, cfg.head_dim), dtype=dt, name=name
        )
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(cfg.head_dim))
        neg = jnp.finfo(jnp.float32).min
        scores = scores + jnp.where(attention_mask[:, None, None, :], 0.0, neg)
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(dt)
        out = nn.DenseGeneral(cfg.hidden_size, axis=(-2, -1), dtype=dt,
                              kernel_init=_resid_init(cfg), name="out")(ctx)
        return out


def _resid_init(cfg: BertConfig):
    """Residual-branch out-projection initializer: BERT's 0.02 truncated
    normal, scaled 1/sqrt(2·num_layers) in pre-LN mode (GPT-2 recipe) so the
    residual stream's variance stays O(1) at 24 layers. Post-LN keeps flax
    defaults — shipped round-3 checkpoints reproduce bit-for-bit."""
    if not cfg.pre_ln:
        return nn.initializers.lecun_normal()  # flax Dense default
    import numpy as _np

    return nn.initializers.truncated_normal(
        0.02 / _np.sqrt(2.0 * cfg.num_layers))


class _Layer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, attention_mask):
        cfg = self.cfg
        dt = cfg.compute_dtype
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name=name)
        if cfg.pre_ln:
            # pre-LN: normalize the BRANCH input, leave the residual stream
            # unnormalized (trains at depth; see BertConfig.pre_ln)
            a = _SelfAttention(cfg, name="attention")(
                ln("attention_norm")(x).astype(dt), attention_mask)
            x = x + a
            h = ln("mlp_norm")(x).astype(dt)
            h = nn.Dense(cfg.intermediate_size, dtype=dt, name="mlp_in")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(cfg.hidden_size, dtype=dt,
                         kernel_init=_resid_init(cfg), name="mlp_out")(h)
            return x + h
        attn = _SelfAttention(cfg, name="attention")(x, attention_mask)
        x = ln("attention_norm")(x + attn).astype(dt)
        h = nn.Dense(cfg.intermediate_size, dtype=dt, name="mlp_in")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=dt, name="mlp_out")(h)
        x = ln("mlp_norm")(x + h).astype(dt)
        return x


class BertEncoder(nn.Module):
    """Backbone: (input_ids, attention_mask[, token_type_ids]) → hidden states."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        b, l = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=dt,
                       name="token_embed")(input_ids)
        pos = nn.Embed(cfg.max_position, cfg.hidden_size, dtype=dt,
                       name="position_embed")(jnp.arange(l)[None, :])
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=dt,
                       name="type_embed")(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="embed_norm")(tok + pos + typ).astype(dt)
        mask = attention_mask.astype(bool)
        layer_cls = nn.remat(_Layer) if cfg.remat else _Layer
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, name=f"layer_{i}")(x, mask)
        if cfg.pre_ln:  # pre-LN's unnormalized stream needs a final norm
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="final_norm")(x).astype(cfg.compute_dtype)
        return x  # [B, L, H]

    def pool(self, hidden, attention_mask):
        """Sentence embedding: CLS (mxbai) or masked mean, then L2-normalize."""
        if self.cfg.pooling == "cls":
            emb = hidden[:, 0, :]
        else:
            m = attention_mask[:, :, None].astype(jnp.float32)
            emb = (hidden.astype(jnp.float32) * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        emb = emb.astype(jnp.float32)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb / jnp.maximum(norm, 1e-12)


class BertForSequenceClassification(nn.Module):
    """Intent classifier head (reference: 12-label bert fine-tune, train_intent.py)."""

    cfg: BertConfig
    num_labels: int = 12

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        hidden = BertEncoder(self.cfg, name="encoder")(input_ids, attention_mask)
        cls = hidden[:, 0, :].astype(jnp.float32)
        cls = nn.tanh(nn.Dense(self.cfg.hidden_size, dtype=jnp.float32,
                               name="pooler")(cls))
        return nn.Dense(self.num_labels, dtype=jnp.float32, name="classifier")(cls)


class BertForMaskedLM(nn.Module):
    """Domain-MLM pretraining head (train/pretrain.py).

    The reference's NLU quality rides on web-scale-pretrained checkpoints
    (bart-large-mnli, BioBERT — main.py:128-189); in a zero-egress image the
    achievable analog is masked-LM pretraining on the synthetic clinical
    corpus, whose encoder then initializes the intent/NER fine-tunes.
    """

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        hidden = BertEncoder(self.cfg, name="encoder")(input_ids, attention_mask)
        x = nn.Dense(self.cfg.hidden_size, dtype=jnp.float32,
                     name="mlm_dense")(hidden.astype(jnp.float32))
        x = nn.gelu(x)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="mlm_norm")(x)
        return nn.Dense(self.cfg.vocab_size, dtype=jnp.float32,
                        name="mlm_head")(x)


class BertForMaskedLMIndexed(nn.Module):
    """MLM head applied only at the masked positions (train/pretrain_wide.py).

    Full [B, L, V] logits at 24L/16k-vocab/seq-128 scale cost >1 GB of
    activation HBM plus the same again in the backward pass — the classic
    fix is to gather the ~15% masked hidden states before the vocab
    projection, cutting the head's HBM and FLOPs by ~6×. Submodule names
    match BertForMaskedLM exactly ("encoder", "mlm_dense", "mlm_norm",
    "mlm_head"), so checkpoints are interchangeable and
    trainer.load_pretrained reads either.
    """

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, positions):
        hidden = BertEncoder(self.cfg, name="encoder")(input_ids, attention_mask)
        h = jnp.take_along_axis(
            hidden, positions[..., None].astype(jnp.int32), axis=1)
        x = nn.Dense(self.cfg.hidden_size, dtype=jnp.float32,
                     name="mlm_dense")(h.astype(jnp.float32))
        x = nn.gelu(x)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="mlm_norm")(x)
        return nn.Dense(self.cfg.vocab_size, dtype=jnp.float32,
                        name="mlm_head")(x)  # [B, P, V]


class BertForTokenClassification(nn.Module):
    """NER head: BIO tags per token (reference: BioBERT token classifier, train_ner.py)."""

    cfg: BertConfig
    num_labels: int = 39  # 19 entity types × B/I + O

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        hidden = BertEncoder(self.cfg, name="encoder")(input_ids, attention_mask)
        return nn.Dense(self.num_labels, dtype=jnp.float32,
                        name="classifier")(hidden.astype(jnp.float32))
