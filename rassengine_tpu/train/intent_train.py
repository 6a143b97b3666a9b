"""Intent-classifier fine-tune (reference train_intent.py parity, TPU-native).

Reference: bert-base-uncased, 12 labels, 2k synthetic samples, 5 epochs,
lr 2e-5, batch 64, accuracy + weighted-F1 eval, single overwritten checkpoint
every 25 steps, saved to ./intent_model/final (train_intent.py:172-218).

Run: ``python -m rassengine_tpu.train.intent_train [--samples N] [--epochs N]
[--size tiny|base|large] [--out DIR]``
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from rassengine_tpu.core.schema import ALL_INTENTS
from rassengine_tpu.models.bert import BertConfig, BertForSequenceClassification
from rassengine_tpu.models.tokenizer import HashTokenizer
from rassengine_tpu.train.data import generate_intent_data
from rassengine_tpu.train.trainer import TrainConfig, Trainer, batch_iterator

log = logging.getLogger("rassengine.train.intent")


def evaluate(model, tokenizer):
    import jax

    def eval_fn(params, eval_batches):
        from sklearn.metrics import accuracy_score, f1_score

        preds, golds = [], []
        fwd = jax.jit(model.apply)
        for b in eval_batches:
            logits = np.asarray(fwd(params, b["ids"], b["mask"]))
            p = np.argmax(logits, axis=-1)
            v = np.asarray(b["valid"]) == 1  # drop zero-padded tail rows
            preds.extend(p[v].tolist())
            golds.extend(np.asarray(b["labels"])[v].tolist())
        return {
            "accuracy": float(accuracy_score(golds, preds)),
            "f1": float(f1_score(golds, preds, average="weighted",
                                 zero_division=0)),
        }

    return eval_fn


def main(samples: int = 2000, epochs: int = 5, size: str = "tiny",
         out: str = "./intent_model", batch_size: int = 64,
         learning_rate: float = 2e-5, seed: int = 0) -> dict:
    cfg = {"tiny": BertConfig.tiny, "base": BertConfig.base,
           "large": BertConfig.large}[size]()
    model = BertForSequenceClassification(cfg, num_labels=len(ALL_INTENTS))
    tokenizer = HashTokenizer(cfg.vocab_size, 128)

    data = generate_intent_data(samples, seed)
    texts = [t for t, _ in data]
    labels = np.asarray([l for _, l in data], np.int32)
    ids, mask = tokenizer.encode_batch(texts, 128)

    n_eval = max(1, int(len(data) * 0.2))
    tr = slice(0, len(data) - n_eval)
    ev = slice(len(data) - n_eval, None)
    tcfg = TrainConfig(epochs=epochs, batch_size=batch_size,
                       learning_rate=learning_rate, seed=seed)
    trainer = Trainer(model, tcfg, token_level=False, out_dir=out, bert_config=cfg)
    result = trainer.fit(
        batch_iterator(ids[tr], mask[tr], labels[tr], batch_size),
        batch_iterator(ids[ev], mask[ev], labels[ev], batch_size),
        evaluate(model, tokenizer),
    )
    log.info("intent training done → %s", result["final_path"])
    return result


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=2000)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--size", default="tiny", choices=["tiny", "base", "large"])
    p.add_argument("--out", default="./intent_model")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-5)
    a = p.parse_args()
    main(a.samples, a.epochs, a.size, a.out, a.batch_size, a.lr)
