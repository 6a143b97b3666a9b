"""Round-5 continued InfoNCE fine-tune of the 24L production encoder, with
explicit hard negatives (synthetic structured + framework-mined).

Why this exists (VERDICT r4 missing #1 / next #1): the shipped
``encoder_model_prod24/`` got only 800 InfoNCE steps after MLM pretraining —
a smoke run at 335M params — landing at recall@1 0.603 on the wide cross-eval
while recall@5 ~ 1.0. Rank-1 precision is the metric a bi-encoder replacement
for mxbai-embed-large (reference app/main.py:67, 225-274) lives on, and the
remaining rank-1 errors are *confusions*, not noise: chunks about the same
patient with a different condition, or the same condition under a different
patient (the name pool is 840 persons for 1024 eval chunks, so person
collisions are guaranteed). Plain in-batch InfoNCE at batch 64 almost never
samples those confusables as negatives; this trainer builds them explicitly:

- phase 1: each (query, pos) pair carries a SYNTHETIC hard negative — same
  person/different condition (50%) or same condition/different person (50%) —
  so the chunk tower is [pos; hard] and every query scores 2B candidates.
- mining: the framework's own retrieval (index/exact.py:exact_topk — the
  production blockwise scan) retrieves each training query's top candidates
  from the full training-chunk corpus under the CURRENT weights; the top
  non-gold hits become phase-2 negatives. This targets whatever the model
  actually still confuses, which synthetic structure cannot anticipate.
- phase 2: continue training with mined negatives (synthetic fallback where
  mining returned only the gold row).

Checkpoints are written every ``ckpt_every`` steps so a tunnel stall loses
minutes, not hours. The final artifact ships bf16 with remat scrubbed from
the metadata (ADVICE r4: remat is a training-only memory trade).

Run (through tools/tpu_worker.py): see tools/job_encoder_hard.py.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import random
import time

import numpy as np

from rassengine_tpu.models.bert import BertConfig, BertEncoder
from rassengine_tpu.models.tokenizer import load_tokenizer
from rassengine_tpu.models.weights import load_encoder_params, save_params
from rassengine_tpu.train.encoder_train import (
    SYNONYMS_WIDE, _QUERY_TEMPLATES_WIDE, calibrate_cache_threshold,
    eval_recall, generate_pairs, generate_pairs_wide)
from rassengine_tpu.train.serialization import save_model_meta

log = logging.getLogger("rassengine.train.encoder_hard")

SEQ_LEN = 96  # matches the round-4 recipe (BENCH.md §24L)


def _anchor(rng: random.Random, person: str, term: str) -> str:
    return rng.choice([
        f"{person} is followed for {term}, reviewed at today's visit.",
        f"Active problem list for {person} includes {term}.",
        f"Assessment: {term}, plan discussed with {person}.",
        f"{person} reports the {term} is stable on current therapy.",
    ])


def _note(rng: random.Random, person: str, term: str) -> str:
    """Multi-sentence clinical note: anchor sentence + distractor sentences
    (same construction as encoder_train.generate_pairs_wide)."""
    from rassengine_tpu.train.corpus import clinical_sentence

    distractors = [clinical_sentence(rng) for _ in range(rng.randint(1, 3))]
    pos = rng.randrange(len(distractors) + 1)
    sents = distractors[:pos] + [_anchor(rng, person, term)] + distractors[pos:]
    return " ".join(sents)


def generate_triples(n: int, seed: int = 0) -> list[tuple[str, str, str]]:
    """→ [(query, pos_chunk, hard_neg_chunk)].

    The hard negative is the rank-1 confusion class the wide eval actually
    contains: same person bound to a different condition, or the same
    condition bound to a different person. Token overlap with the query is
    deliberately HIGH on one slot and wrong on the other, so the encoder must
    bind (person, condition) jointly to win rank 1.
    """
    from rassengine_tpu.train.data import FIRST_NAMES, LAST_NAMES

    rng = random.Random(seed)
    terms = list(SYNONYMS_WIDE)
    out = []
    for _ in range(n):
        person = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        term = rng.choice(terms)
        pos = _note(rng, person, term)
        query = rng.choice(_QUERY_TEMPLATES_WIDE).format(
            PERSON=person, ALT=rng.choice(SYNONYMS_WIDE[term]))
        if rng.random() < 0.5:
            other_term = rng.choice([t for t in terms if t != term])
            neg = _note(rng, person, other_term)          # same person
        else:
            other = person
            while other == person:
                other = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
            neg = _note(rng, other, term)                 # same condition
        out.append((query, pos, neg))
    return out


def _encode(tokenizer, texts: list[str], L: int = SEQ_LEN):
    ids, mask = tokenizer.encode_batch(texts, L)
    if ids.shape[1] < L:
        ids = np.pad(ids, ((0, 0), (0, L - ids.shape[1])))
        mask = np.pad(mask, ((0, 0), (0, L - mask.shape[1])))
    return ids[:, :L].astype(np.int32), mask[:, :L].astype(np.int32)


def mine_hard_negatives(queries_emb: np.ndarray,
                        chunks_emb: np.ndarray, gold: np.ndarray,
                        k: int = 3, q_batch: int = 1024) -> np.ndarray:
    """Top non-gold chunk per query via the framework's production scan
    (index/exact.py:exact_topk — the same blockwise kernel serving uses for
    sub-ann_threshold corpora). → [N] mined chunk indices (-1 = nothing
    beyond the gold row retrieved; caller falls back to the synthetic neg).
    """
    import jax.numpy as jnp

    from rassengine_tpu.index.exact import exact_topk

    n_chunks = chunks_emb.shape[0]
    block = 8192
    cap = ((n_chunks + block - 1) // block) * block
    vecs = np.zeros((cap, chunks_emb.shape[1]), np.float32)
    vecs[:n_chunks] = chunks_emb
    add_mask = np.full(cap, -1e30, np.float32)
    add_mask[:n_chunks] = 0.0
    vecs_d = jnp.asarray(vecs, jnp.bfloat16)
    mask_d = jnp.asarray(add_mask)

    mined = np.full(queries_emb.shape[0], -1, np.int64)
    for st in range(0, queries_emb.shape[0], q_batch):
        q = jnp.asarray(queries_emb[st: st + q_batch])
        _, idx = exact_topk(vecs_d, q, mask_d, k, block)
        idx = np.asarray(idx)
        for r in range(idx.shape[0]):
            g = gold[st + r]
            for c in idx[r]:
                if c >= 0 and c != g:
                    mined[st + r] = int(c)
                    break
    return mined


def _quick_eval(embed_fn, seed: int = 222, n: int = 512) -> dict:
    pairs = generate_pairs_wide(n, seed=seed)
    return eval_recall(embed_fn, pairs)


def main(init_from: str = "./encoder_model_prod24",
         out: str = "./encoder_model_prod24",
         work_dir: str = "/tmp/encoder_hard_ckpt",
         n_triples: int = 120_000,
         phase1_steps: int = 2500, phase2_steps: int = 4500,
         batch: int = 96, learning_rate: float = 1.5e-4,
         temperature: float = 0.05, grad_clip: float = 1.0,
         ckpt_every: int = 500, seed: int = 11,
         resume: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from rassengine_tpu.train.serialization import load_model_meta

    os.makedirs(work_dir, exist_ok=True)
    meta = load_model_meta(init_from)
    cfg = BertConfig(**{**meta["bert_config"], "remat": True})
    tokenizer = load_tokenizer(init_from, cfg.vocab_size, SEQ_LEN)
    model = BertEncoder(cfg)

    state_path = os.path.join(work_dir, "state.json")
    state = {"phase": 1, "step": 0}
    if resume and os.path.exists(state_path):
        state = json.load(open(state_path))
        log.info("resuming from %s", state)

    ckpt_dir = os.path.join(work_dir, "ckpt")
    load_dir = ckpt_dir if (resume and os.path.exists(
        os.path.join(ckpt_dir, "params.msgpack"))) else init_from
    params_bf16 = load_encoder_params(load_dir, cfg)
    assert params_bf16 is not None, load_dir
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        params_bf16)
    params = jax.device_put(params)

    log.info("generating %d triples…", n_triples)
    t0 = time.time()
    triples = generate_triples(n_triples, seed=seed)
    q_ids, q_mask = _encode(tokenizer, [t[0] for t in triples])
    p_ids, p_mask = _encode(tokenizer, [t[1] for t in triples])
    n_ids, n_mask = _encode(tokenizer, [t[2] for t in triples])
    log.info("data ready in %.1fs", time.time() - t0)

    total = phase1_steps + phase2_steps
    optimizer = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, min(150, max(1, total // 10)), total),
            weight_decay=0.01))

    def loss_fn(p, bqi, bqm, bci, bcm):
        # chunk tower rows: [pos(B); neg(B)] — every query scores 2B
        # candidates; only the first B have a matching query, so the
        # chunk→query direction uses the pos block only.
        B = bqi.shape[0]
        zq = model.pool(model.apply(p, bqi, bqm), bqm)
        zc = model.pool(model.apply(p, bci, bcm), bcm)
        logits = (zq @ zc.T) / temperature            # [B, 2B]
        labels = jnp.arange(B)
        lq = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        lc = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :B].T, labels)
        return 0.5 * (lq.mean() + lc.mean())

    @jax.jit
    def step_fn(p, o, bqi, bqm, bci, bcm):
        loss, grads = jax.value_and_grad(loss_fn)(p, bqi, bqm, bci, bcm)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    fwd = jax.jit(lambda p, i, m: model.pool(model.apply(p, i, m), m))

    def embed_with(p):
        def fn(texts):
            outv = []
            for st in range(0, len(texts), 256):
                ids, mask = _encode(tokenizer, texts[st: st + 256])
                outv.append(np.asarray(
                    fwd(p, jnp.asarray(ids), jnp.asarray(mask)), np.float32))
            return np.concatenate(outv)
        return fn

    def embed_tok(p, ids, mask, bs=512):
        outv = []
        for st in range(0, ids.shape[0], bs):
            outv.append(np.asarray(fwd(p, jnp.asarray(ids[st:st + bs]),
                                       jnp.asarray(mask[st:st + bs])),
                                   np.float32))
        return np.concatenate(outv)

    opt_state = optimizer.init(params)
    rng = np.random.default_rng(seed + state["phase"] * 1000 + state["step"])
    mined: np.ndarray | None = None
    mined_path = os.path.join(work_dir, "mined.npy")
    if resume and os.path.exists(mined_path):
        mined = np.load(mined_path)
        log.info("loaded mined negatives: %d/%d",
                 int((mined >= 0).sum()), mined.shape[0])

    def save_ckpt(step_no: int, phase: int):
        save_params(ckpt_dir, params)
        json.dump({"phase": phase, "step": step_no}, open(state_path, "w"))

    def run_phase(phase: int, n_steps: int, start_step: int):
        nonlocal params, opt_state
        t0 = time.time()
        losses = []
        for s in range(start_step, n_steps):
            take = rng.integers(0, n_triples, batch)
            if phase == 2 and mined is not None:
                m = mined[take]
                use = np.where(m >= 0, m, take)  # fallback: synthetic neg row
                bni, bnm = np.where((m >= 0)[:, None],
                                    p_ids[use], n_ids[take]), \
                    np.where((m >= 0)[:, None], p_mask[use], n_mask[take])
            else:
                bni, bnm = n_ids[take], n_mask[take]
            bci = np.concatenate([p_ids[take], bni])
            bcm = np.concatenate([p_mask[take], bnm])
            params, opt_state, loss = step_fn(
                params, opt_state,
                jnp.asarray(q_ids[take]), jnp.asarray(q_mask[take]),
                jnp.asarray(bci), jnp.asarray(bcm))
            losses.append(float(loss))
            done = s + 1
            if done % 100 == 0:
                log.info("phase %d step %d/%d nce %.4f (%.2f steps/s)",
                         phase, done, n_steps, float(np.mean(losses[-100:])),
                         (done - start_step) / (time.time() - t0))
            if done % ckpt_every == 0:
                save_ckpt(done, phase)
            if done % 1000 == 0:
                log.info("phase %d step %d quick-eval %s", phase, done,
                         _quick_eval(embed_with(params)))
        return float(np.mean(losses[-100:])) if losses else float("nan")

    # ---- phase 1: synthetic hard negatives --------------------------------
    if state["phase"] == 1:
        run_phase(1, phase1_steps, state["step"])
        state = {"phase": 1.5, "step": 0}
        save_ckpt(0, 1.5)

    # ---- mining: framework scan under current weights ---------------------
    if state["phase"] == 1.5 or (state["phase"] == 2 and mined is None):
        log.info("mining hard negatives over %d chunks…", n_triples)
        t0 = time.time()
        qe = embed_tok(params, q_ids, q_mask)
        ce = embed_tok(params, p_ids, p_mask)
        mined = mine_hard_negatives(qe, ce, np.arange(n_triples))
        np.save(mined_path, mined)
        log.info("mined %d/%d non-gold negatives in %.1fs",
                 int((mined >= 0).sum()), n_triples, time.time() - t0)
        state = {"phase": 2, "step": 0}
        save_ckpt(0, 2)

    # ---- phase 2: mined negatives ------------------------------------------
    final_loss = run_phase(2, phase2_steps, state["step"])

    # ---- final cross-eval (fresh seed, same protocol as BENCH.md §24L) ----
    embed_fn = embed_with(params)
    wide = eval_recall(embed_fn, generate_pairs_wide(1024, seed=777))
    easy = eval_recall(embed_fn, generate_pairs(1024, seed=777))
    log.info("cross-eval wide=%s easy=%s", wide, easy)

    calib = calibrate_cache_threshold(embed_fn)
    result = {"final_loss": final_loss, "wide_777": wide, "easy_777": easy,
              "cache_calibration": calib, "out": out}

    # ship only if rank-1 actually improved over the round-4 checkpoint
    if wide["recall@1"] > 0.65:
        cast = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, params)
        save_params(out, cast)
        save_model_meta(out, dataclasses.replace(cfg, remat=False),
                        extra=calib)
        result["saved"] = True
    else:
        log.error("NOT shipping: wide recall@1 %.3f <= 0.65 floor",
                  wide["recall@1"])
        result["saved"] = False
    json.dump(result, open(os.path.join(work_dir, "result.json"), "w"),
              indent=2)
    log.info("encoder_hard done: %s", result)
    return result
