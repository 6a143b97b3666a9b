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


def save_cue_words(train_data, out: str, min_count: int = 3,
                   min_purity: float = 0.6) -> str:
    """Write the discriminative cue-word table consumed by
    nlu.intent.ModelIntentClassifier.has_cue_evidence (VERDICT r2 #2).

    A word is a cue when ≥``min_purity`` of its training occurrences fall in
    one intent — the mapping word → that intent is what ships. Slot values
    (names, conditions, medications) appear across all intents by
    construction and never qualify — so a model prediction unsupported by
    any same-intent cue word in the query routes to the rules.
    """
    import json
    import os
    from collections import Counter, defaultdict

    from rassengine_tpu.nlu.intent import content_words, stem

    # Two granularities (round 3, A/B-measured): the exact-word table gates
    # the model (a stemmed gate cost 4 pts in-distribution — collision stems
    # admit wrong predictions), while a separate STEM table feeds the vote
    # channel: unseen cue surfaces are usually morphological variants of
    # trained ones ("exactly"/"exact", "comparison"/"compare"), and purity
    # filtering at stem granularity still rejects collision stems whose
    # occurrences spread over intents.
    def table(keys_of) -> dict[str, str]:
        by_key: dict[str, Counter] = defaultdict(Counter)
        for text, lbl in train_data:
            for k in keys_of(text):
                by_key[k][lbl] += 1
        return {k: ALL_INTENTS[max(c, key=c.get)]
                for k, c in sorted(by_key.items())
                if sum(c.values()) >= min_count
                and max(c.values()) / sum(c.values()) >= min_purity}

    cues = table(lambda t: set(content_words(t)))
    stem_cues = table(lambda t: {stem(w) for w in content_words(t)})
    # every content word the training set contains, cue or not: the vote
    # channel uses it to tell a genuinely UNSEEN morphological variant (the
    # case it exists for) from a word the model saw but whose occurrences
    # spread across intents — the latter voting via its stem would overrule
    # the model with evidence training already judged ambiguous
    trained_words = sorted({w for text, _ in train_data
                            for w in content_words(text)})
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "cue_words.json")
    with open(path, "w") as f:
        json.dump({"cues": cues, "stem_cues": stem_cues,
                   "trained_words": trained_words,
                   "min_count": min_count, "min_purity": min_purity}, f)
    log.info("saved %d cue words + %d cue stems → %s",
             len(cues), len(stem_cues), path)
    return path


def _set_meta_key(model_dir: str, key: str, value) -> None:
    import json
    import os

    p = os.path.join(model_dir, "model_meta.json")
    with open(p) as f:
        meta = json.load(f)
    meta[key] = value
    with open(p, "w") as f:
        json.dump(meta, f, indent=2)


def calibrate_oov_conf(model_dir: str, calib_data, intent_threshold=0.75,
                       grid=(0.98, 0.95, 0.9, 0.8, 0.7, 0.6, 0.5)) -> dict:
    """Calibrate the OOV-trust confidence bound (nlu.intent oov_conf).

    Sweeps the full production policy over held-out UNSEEN-CUE data with the
    model allowed to win unsupported predictions at confidence ≥ tau; keeps
    the highest tau that strictly beats the no-OOV-trust policy (tau=None),
    so a model whose confidence is uninformative off-vocabulary — every
    from-scratch checkpoint, VERDICT r2 #2 — calibrates to None and the
    round-3 gate semantics are untouched."""
    from rassengine_tpu.core.config import EngineConfig
    from rassengine_tpu.nlu.intent import IntentClassifier

    clf = IntentClassifier(EngineConfig(intent_model_path=model_dir,
                                        intent_threshold=intent_threshold,
                                        ner_model_path="/none"))
    texts = [t for t, _ in calib_data]
    gold = [ALL_INTENTS[lbl] for _, lbl in calib_data]

    def acc(tau) -> float:
        clf.model.oov_conf = tau
        preds = clf.classify_batch(texts)
        return float(np.mean([p.value == g for (p, _), g in zip(preds, gold)]))

    base = acc(None)
    best_tau, best = None, base
    for tau in grid:  # descending: ties resolve to the most conservative tau
        a = acc(tau)
        if a > best + 1e-9:
            best, best_tau = a, tau
    log.info("oov_conf calibration: base %.4f → %.4f at tau=%s",
             base, best, best_tau)
    return {"oov_conf": best_tau, "calib_accuracy": round(best, 4),
            "calib_accuracy_no_oov": round(base, 4)}


def eval_combined_policy(model_dir: str, eval_data, intent_threshold=0.75):
    """Accuracy of the full production path (cue gate + threshold + rules)."""
    from rassengine_tpu.core.config import EngineConfig
    from rassengine_tpu.nlu.intent import IntentClassifier

    clf = IntentClassifier(EngineConfig(intent_model_path=model_dir,
                                        intent_threshold=intent_threshold,
                                        ner_model_path="/none"))
    assert clf.model is not None, model_dir
    return float(np.mean([clf.classify(t)[0].value == ALL_INTENTS[lbl]
                          for t, lbl in eval_data]))


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
         learning_rate: float = 2e-5, seed: int = 0,
         family_split: bool = False, use_wordpiece: bool = True,
         vocab_size: int = 8192, init_from: str = "",
         oov_conf: float | None = None) -> dict:
    from rassengine_tpu.models.tokenizer import (load_tokenizer,
                                                 train_wordpiece_vocab)
    from rassengine_tpu.train.trainer import graft_encoder, load_pretrained

    init_params = None
    pre_vocab = None
    if init_from:
        cfg, enc_params, pre_vocab = load_pretrained(init_from)
        model = BertForSequenceClassification(cfg, num_labels=len(ALL_INTENTS))
        init_params = graft_encoder(model, enc_params, seed)
    else:
        cfg = {"tiny": BertConfig.tiny, "small": BertConfig.small,
               "base": BertConfig.base, "large": BertConfig.large}[size]()
        model = BertForSequenceClassification(cfg, num_labels=len(ALL_INTENTS))

    if family_split:
        # off-distribution eval. family_split="hard" holds out whole cue
        # vocabularies (odd templates); True/"paraphrase" evaluates on
        # held-out paraphrases that reuse trained cue words — see
        # data.INTENT_EVAL_TEMPLATES for the distinction.
        tr_split = "train_hard" if family_split == "hard" else "train"
        ev_split = "eval_hard" if family_split == "hard" else "eval"
        train_data = generate_intent_data(samples, seed, template_split=tr_split)
        eval_data = generate_intent_data(max(64, samples // 5), seed + 1,
                                         template_split=ev_split)
    else:
        data = generate_intent_data(samples, seed)
        n_eval = max(1, int(len(data) * 0.2))
        train_data, eval_data = data[:-n_eval], data[-n_eval:]

    from rassengine_tpu.train.trainer import copy_vocab

    extra_files: list[str] = []
    extra_files.append(save_cue_words(train_data, out))
    if pre_vocab:  # the pretrained embedding's vocab MUST be reused
        vocab_path = copy_vocab(pre_vocab, out)
        extra_files.append(vocab_path)
        tokenizer = load_tokenizer(out, cfg.vocab_size, 128)
    elif use_wordpiece:
        vocab_path = train_wordpiece_vocab([t for t, _ in train_data], out,
                                           min(vocab_size, cfg.vocab_size))
        extra_files.append(vocab_path)
        tokenizer = load_tokenizer(out, cfg.vocab_size, 128)
    else:
        tokenizer = HashTokenizer(cfg.vocab_size, 128)

    def enc(rows):
        texts = [t for t, _ in rows]
        labels = np.asarray([l for _, l in rows], np.int32)
        ids, mask = tokenizer.encode_batch(texts, 128)
        # encode_batch buckets by longest; re-pad to one width across splits
        if ids.shape[1] < 64:
            pad = 64 - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        return ids[:, :64], mask[:, :64], labels

    tcfg = TrainConfig(epochs=epochs, batch_size=batch_size,
                       learning_rate=learning_rate, seed=seed)
    trainer = Trainer(model, tcfg, token_level=False, out_dir=out,
                      meta_extra={"max_seq_len": 64},
                      bert_config=cfg, extra_files=extra_files,
                      init_params=init_params)
    result = trainer.fit(
        batch_iterator(*enc(train_data), batch_size),
        batch_iterator(*enc(eval_data), batch_size),
        evaluate(model, tokenizer),
    )
    result["family_split"] = family_split
    if oov_conf is not None:
        # production runs train on every template family, so no unseen-cue
        # calibration split exists here — the tau comes from the hard-split
        # experiment (run with --family-split hard --init-from <backbone>)
        _set_meta_key(result["final_path"], "oov_conf", oov_conf)
        result["oov_conf"] = oov_conf
    if family_split:
        # the production fallback baseline on the same off-dist split
        from rassengine_tpu.core.schema import ALL_INTENTS as _AI
        from rassengine_tpu.nlu.intent import RuleIntentClassifier

        rules = RuleIntentClassifier()
        rule_acc = float(np.mean([
            rules.classify(t)[0].value == _AI[lbl] for t, lbl in eval_data]))
        result["rule_baseline_accuracy"] = rule_acc
        log.info("rule-classifier baseline on this split: %.4f", rule_acc)
        # the PRODUCTION path (cue-evidence gate + threshold + rules) on the
        # same split — the number that must never fall below rule_acc
        result["combined_accuracy"] = eval_combined_policy(
            result["final_path"], eval_data)
        log.info("combined model+cue-gate+rules on this split: %.4f",
                 result["combined_accuracy"])
        if init_from:
            # pretrained backbone: calibrate the OOV-trust bound on a
            # separate draw of the same held-out-family split (dev), then
            # re-score the reported eval (test) with it active
            calib_data = generate_intent_data(max(256, samples // 5),
                                              seed + 2,
                                              template_split=ev_split)
            oov = calibrate_oov_conf(result["final_path"], calib_data)
            result["oov_calibration"] = oov
            if oov["oov_conf"] is not None:
                _set_meta_key(result["final_path"], "oov_conf",
                              oov["oov_conf"])
                result["combined_accuracy_oov"] = eval_combined_policy(
                    result["final_path"], eval_data)
                log.info("combined policy WITH oov trust (tau=%s): %.4f",
                         oov["oov_conf"], result["combined_accuracy_oov"])
    log.info("intent training done → %s (family_split=%s, acc=%.4f)",
             result["final_path"], family_split,
             result["history"][-1].get("accuracy", -1))
    return result


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=2000)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--size", default="tiny", choices=["tiny", "small", "base", "large"])
    p.add_argument("--out", default="./intent_model")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--family-split", default="",
                   choices=["", "paraphrase", "hard"],
                   help="off-dist eval: 'paraphrase' = unseen phrasings with "
                        "trained cue words; 'hard' = whole cue vocabularies "
                        "held out")
    p.add_argument("--hash-tokenizer", action="store_true")
    p.add_argument("--init-from", default="",
                   help="MLM-pretrained encoder dir (train/pretrain.py)")
    p.add_argument("--oov-conf", type=float, default=None,
                   help="ship this OOV-trust bound (from the hard-split "
                        "calibration) in the checkpoint meta")
    a = p.parse_args()
    main(a.samples, a.epochs, a.size, a.out, a.batch_size, a.lr,
         family_split=a.family_split, use_wordpiece=not a.hash_tokenizer,
         init_from=a.init_from, oov_conf=a.oov_conf)
