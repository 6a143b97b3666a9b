"""NER fine-tune over 39 BIO labels (reference train_ner.py parity, TPU-native).

Reference: BioBERT-large, 10k synthetic template samples, 4 epochs, batch 32,
fp16-on-cuda, best-by-F1 with save_total_limit=2, saved to ./ner_model/final
(train_ner.py:24-32, 894-938). Here: the same BIO scheme over the 19 entity
types, bf16 on TPU, word-aligned labels (one word = one token under the hash
tokenizer).

Run: ``python -m rassengine_tpu.train.ner_train [--samples N] [--epochs N]
[--size tiny|base|large] [--out DIR]``
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from rassengine_tpu.models.bert import BertConfig, BertForTokenClassification
from rassengine_tpu.models.tokenizer import CLS_ID, PAD_ID, SEP_ID, HashTokenizer
from rassengine_tpu.nlu.ner import BIO_LABELS, NUM_BIO_LABELS
from rassengine_tpu.train.data import generate_ner_data
from rassengine_tpu.train.trainer import TrainConfig, Trainer, batch_iterator

log = logging.getLogger("rassengine.train.ner")

MAX_LEN = 64
O_ID = 0


def encode_ner(samples, tokenizer: HashTokenizer):
    """words+labels → fixed-shape (ids, mask, labels); special tokens get O."""
    n = len(samples)
    ids = np.full((n, MAX_LEN), PAD_ID, np.int32)
    mask = np.zeros((n, MAX_LEN), np.int32)
    labels = np.full((n, MAX_LEN), O_ID, np.int32)
    for i, (words, word_labels) in enumerate(samples):
        toks = [CLS_ID] + [tokenizer._token_id(w) for w in words][: MAX_LEN - 2] + [SEP_ID]
        ids[i, : len(toks)] = toks
        mask[i, : len(toks)] = 1
        for j, lbl in enumerate(word_labels[: MAX_LEN - 2]):
            labels[i, j + 1] = lbl
    return ids, mask, labels


def evaluate(model):
    import jax

    def eval_fn(params, eval_batches):
        from sklearn.metrics import f1_score

        preds, golds = [], []
        fwd = jax.jit(model.apply)
        for b in eval_batches:
            logits = np.asarray(fwd(params, b["ids"], b["mask"]))
            p = np.argmax(logits, axis=-1)
            m = np.asarray(b["mask"]) == 1
            preds.extend(p[m].tolist())
            golds.extend(np.asarray(b["labels"])[m].tolist())
        # entity-label F1 (exclude O), weighted — reference seqeval-style proxy
        non_o = [i for i, g in enumerate(golds) if g != O_ID or preds[i] != O_ID]
        if not non_o:
            return {"f1": 0.0}
        return {"f1": float(f1_score([golds[i] for i in non_o],
                                     [preds[i] for i in non_o],
                                     average="weighted", zero_division=0))}

    return eval_fn


def main(samples: int = 10_000, epochs: int = 4, size: str = "tiny",
         out: str = "./ner_model", batch_size: int = 32,
         learning_rate: float = 3e-5, seed: int = 0) -> dict:
    cfg = {"tiny": BertConfig.tiny, "base": BertConfig.base,
           "large": BertConfig.large}[size]()
    model = BertForTokenClassification(cfg, num_labels=NUM_BIO_LABELS)
    tokenizer = HashTokenizer(cfg.vocab_size, MAX_LEN)

    data = generate_ner_data(samples, seed)
    ids, mask, labels = encode_ner(data, tokenizer)
    n_eval = max(1, int(len(data) * 0.2))
    tr = slice(0, len(data) - n_eval)
    ev = slice(len(data) - n_eval, None)
    tcfg = TrainConfig(epochs=epochs, batch_size=batch_size,
                       learning_rate=learning_rate, checkpoint_every=0, seed=seed)
    trainer = Trainer(model, tcfg, token_level=True, out_dir=out, bert_config=cfg)
    result = trainer.fit(
        batch_iterator(ids[tr], mask[tr], labels[tr], batch_size),
        batch_iterator(ids[ev], mask[ev], labels[ev], batch_size),
        evaluate(model),
    )
    log.info("ner training done → %s (labels: %d)", result["final_path"],
             len(BIO_LABELS))
    return result


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=10_000)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--size", default="tiny", choices=["tiny", "base", "large"])
    p.add_argument("--out", default="./ner_model")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-5)
    a = p.parse_args()
    main(a.samples, a.epochs, a.size, a.out, a.batch_size, a.lr)
