"""TPU training loop shared by the intent and NER fine-tunes.

Replaces the reference's HF ``Trainer`` usage (train_intent.py:157-215,
train_ner.py:894-938) with an optax/jit loop written for the mesh: params are
tensor-parallel-sharded, the batch is data-parallel-sharded, and one jitted
``train_step`` carries loss + grads + optimizer update. Checkpointing matches
the reference policies: intent overwrites a single checkpoint every N steps
(CustomIntentTrainer, train_intent.py:157-168); NER keeps the best-by-F1
with save_total_limit=2 (train_ner.py:920-924).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import shutil
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rassengine_tpu.models.weights import save_params
from rassengine_tpu.parallel.sharding import batch_sharding, param_shardings
from rassengine_tpu.train.serialization import save_model_meta

log = logging.getLogger("rassengine.train")


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 5
    batch_size: int = 64
    learning_rate: float = 2e-5
    weight_decay: float = 0.01
    max_seq_len: int = 128
    checkpoint_every: int = 25      # intent policy: overwrite single ckpt
    save_total_limit: int = 2       # ner policy: keep best N
    eval_fraction: float = 0.2
    seed: int = 0


def make_optimizer(cfg: TrainConfig):
    return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)


def sequence_loss(logits, labels, valid=None):
    """Cross-entropy for sequence classification. logits [B, C], labels [B],
    valid [B] (1 = real example; batch_iterator zero-pads tail batches and a
    padded row must not train the model toward label 0)."""
    logp = jax.nn.log_softmax(logits)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if valid is None:
        return -jnp.mean(ll)
    v = valid.astype(jnp.float32)
    return -(ll * v).sum() / jnp.maximum(v.sum(), 1.0)


def token_loss(logits, labels, mask):
    """Cross-entropy for token classification with padding mask.

    logits [B, L, C], labels [B, L], mask [B, L] (1 = real token).
    """
    logp = jax.nn.log_softmax(logits)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    return -(ll * m).sum() / jnp.maximum(m.sum(), 1.0)


def make_train_step(model, optimizer, token_level: bool):
    def loss_fn(params, batch):
        logits = model.apply(params, batch["ids"], batch["mask"])
        if token_level:
            # padded rows have an all-zero mask, so they drop out of token_loss
            return token_loss(logits, batch["labels"], batch["mask"])
        return sequence_loss(logits, batch["labels"], batch.get("valid"))

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_sharded_train_step(model, optimizer, mesh: Mesh, token_level: bool):
    """Training step jitted over a (dp, tp) mesh: TP params, DP batch."""

    def loss_fn(params, batch):
        logits = model.apply(params, batch["ids"], batch["mask"])
        if token_level:
            return token_loss(logits, batch["labels"], batch["mask"])
        return sequence_loss(logits, batch["labels"], batch.get("valid"))

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def place_for_mesh(params, opt_state, batch, mesh: Mesh):
    """Shard params/optimizer TP-wise and the batch DP-wise on the mesh."""
    p_sh = param_shardings(params, mesh)
    params = jax.device_put(params, p_sh)
    opt_state = jax.device_put(
        opt_state,
        jax.tree_util.tree_map(
            lambda x: NamedSharding(mesh, P()) if not hasattr(x, "ndim") or x.ndim == 0
            else _match_sharding(x, params, p_sh, mesh),
            opt_state,
            is_leaf=lambda x: hasattr(x, "ndim"),
        ),
    )
    b_sh = batch_sharding(mesh)
    batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
    return params, opt_state, batch


def _match_sharding(leaf, params, p_sh, mesh):
    """Optimizer moments mirror their param's sharding by shape match."""
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(p_sh)
    for p, s in zip(flat_p, flat_s):
        if p.shape == leaf.shape:
            return s
    return NamedSharding(mesh, P())


class Trainer:
    def __init__(self, model, cfg: TrainConfig, token_level: bool, out_dir: str,
                 bert_config, tokenizer=None, extra_files: list[str] | None = None,
                 init_params=None, meta_extra: dict | None = None):
        self.model = model
        self.cfg = cfg
        self.token_level = token_level
        self.out_dir = out_dir
        self.bert_config = bert_config
        self.extra_files = extra_files or []  # e.g. vocab.txt → every ckpt dir
        # recorded into model_meta.json (e.g. max_seq_len: inference must
        # bucket to the TRAINED length — longer buckets feed position
        # embeddings training never touched)
        self.meta_extra = meta_extra or {}
        self.init_override = init_params      # e.g. MLM-pretrained encoder
        self.optimizer = make_optimizer(cfg)
        self.train_step = make_train_step(model, self.optimizer, token_level)

    def init_params(self):
        if self.init_override is not None:
            return self.init_override
        dummy = jnp.zeros((1, 8), jnp.int32)
        return self.model.init(jax.random.PRNGKey(self.cfg.seed), dummy,
                               jnp.ones_like(dummy))

    def fit(self, batches: list[dict], eval_batches: list[dict],
            eval_fn=None) -> dict:
        params = self.init_params()
        opt_state = self.optimizer.init(params)
        step = 0
        best_metric = -1.0
        saved: list[str] = []
        history = []
        t0 = time.time()
        for epoch in range(self.cfg.epochs):
            losses = []
            for batch in batches:
                params, opt_state, loss = self.train_step(params, opt_state, batch)
                losses.append(float(loss))
                step += 1
                if self.cfg.checkpoint_every and step % self.cfg.checkpoint_every == 0:
                    self._save(params, os.path.join(self.out_dir, "checkpoint"))
            metrics = {"epoch": epoch, "loss": float(np.mean(losses)),
                       "elapsed_s": round(time.time() - t0, 1)}
            if eval_fn is not None and eval_batches:
                metrics.update(eval_fn(params, eval_batches))
                key = metrics.get("f1", metrics.get("accuracy", 0.0))
                if key > best_metric:
                    best_metric = key
                    path = os.path.join(self.out_dir, f"best-{epoch}")
                    self._save(params, path)
                    saved.append(path)
                    while len(saved) > self.cfg.save_total_limit:
                        shutil.rmtree(saved.pop(0), ignore_errors=True)
            log.info("epoch %s", metrics)
            history.append(metrics)
        final = os.path.join(self.out_dir, "final")
        self._save(params, final)
        return {"history": history, "params": params, "final_path": final}

    def _save(self, params, path: str) -> None:
        save_params(path, params)
        save_model_meta(path, self.bert_config, extra=self.meta_extra or None)
        for f in self.extra_files:
            if os.path.exists(f):
                shutil.copy(f, path)


def load_pretrained(init_from: str):
    """Load an MLM-pretrained encoder (train/pretrain.py output).

    → (BertConfig, encoder_param_subtree, vocab_path-or-None). Fine-tune
    scripts build their head model with this config, init it, and graft the
    encoder subtree in (the head stays fresh).
    """
    from rassengine_tpu.models.bert import BertConfig, BertForMaskedLM
    from rassengine_tpu.models.weights import load_params
    from rassengine_tpu.train.serialization import load_model_meta

    meta = load_model_meta(init_from)
    cfg = BertConfig(**meta["bert_config"])
    mlm = BertForMaskedLM(cfg)
    dummy = jnp.zeros((1, 8), jnp.int32)
    template = mlm.init(jax.random.PRNGKey(0), dummy, jnp.ones_like(dummy))
    mlm_params = load_params(init_from, template)
    if mlm_params is None:
        raise FileNotFoundError(init_from)
    vocab = os.path.join(init_from, "vocab.txt")
    return (cfg, mlm_params["params"]["encoder"],
            vocab if os.path.exists(vocab) else None)


def copy_vocab(pre_vocab: str, out: str) -> str:
    """Reuse the pretrained embedding's vocab in a fine-tune output dir."""
    os.makedirs(out, exist_ok=True)
    dst = os.path.join(out, "vocab.txt")
    shutil.copy(pre_vocab, dst)
    return dst


def graft_encoder(model, encoder_params, seed: int = 0):
    """Init ``model`` and replace its encoder subtree with pretrained params."""
    dummy = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), dummy, jnp.ones_like(dummy))
    params = jax.tree_util.tree_map(lambda x: x, params)  # plain-dict copy
    params["params"]["encoder"] = encoder_params
    return params


def batch_iterator(ids, mask, labels, batch_size: int) -> list[dict]:
    """Fixed-shape batches (pad the tail) → list of device-ready dicts.

    Each batch carries a ``valid`` [B] flag (0 for zero-padded tail rows) so
    padded examples stay out of the loss and eval metrics.
    """
    n = ids.shape[0]
    batches = []
    for start in range(0, n, batch_size):
        sl = slice(start, start + batch_size)
        b_ids, b_mask, b_labels = ids[sl], mask[sl], labels[sl]
        n_real = b_ids.shape[0]
        pad = batch_size - n_real
        valid = np.ones(batch_size, np.int32)
        if pad:
            b_ids = np.pad(b_ids, ((0, pad),) + ((0, 0),) * (b_ids.ndim - 1))
            b_mask = np.pad(b_mask, ((0, pad),) + ((0, 0),) * (b_mask.ndim - 1))
            b_labels = np.pad(b_labels, ((0, pad),) + ((0, 0),) * (b_labels.ndim - 1))
            valid[n_real:] = 0
        batches.append({"ids": jnp.asarray(b_ids), "mask": jnp.asarray(b_mask),
                        "labels": jnp.asarray(b_labels),
                        "valid": jnp.asarray(valid)})
    return batches
