"""Unit tests for the round-5 hard-negative encoder trainer
(train/encoder_hard.py) — data generation, mining, and the loss geometry,
all at tiny scale on the CPU mesh."""

import numpy as np

from rassengine_tpu.train.encoder_hard import (generate_triples,
                                               mine_hard_negatives)


def test_generate_triples_structure():
    triples = generate_triples(200, seed=3)
    assert len(triples) == 200
    for q, pos, neg in triples:
        assert q and pos and neg and pos != neg
    # hard negatives must share either the person or the condition with the
    # positive: the query's person name (first two capitalized tokens of a
    # '{PERSON}' template slot) appears in ~half the negatives
    share_person = 0
    for q, pos, neg in triples:
        # person tokens come from the templates; find two consecutive
        # capitalized words in pos that also appear in neg
        words = [w for w in pos.replace(",", " ").split() if w[:1].isupper()]
        bigrams = {f"{a} {b}" for a, b in zip(words, words[1:])}
        if any(bg in neg for bg in bigrams):
            share_person += 1
    assert share_person > 40  # ~50% are same-person negatives


def test_generate_triples_deterministic():
    assert generate_triples(50, seed=7) == generate_triples(50, seed=7)
    assert generate_triples(50, seed=7) != generate_triples(50, seed=8)


def test_mine_hard_negatives_finds_confusable():
    rng = np.random.default_rng(0)
    d = 32
    n = 64
    # chunk space: pairs of near-duplicates; query i sits on top of chunk i,
    # whose confusable is its partner (i ^ 1)
    base = rng.normal(size=(n // 2, d)).astype(np.float32)
    chunks = np.repeat(base, 2, axis=0)
    chunks += rng.normal(scale=0.01, size=chunks.shape).astype(np.float32)
    chunks /= np.linalg.norm(chunks, axis=1, keepdims=True)
    queries = chunks + rng.normal(scale=0.001, size=chunks.shape).astype(
        np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    mined = mine_hard_negatives(queries, chunks, np.arange(n), k=3,
                                q_batch=16)
    assert mined.shape == (n,)
    # the mined negative for query i must be its near-duplicate partner
    hits = int(np.sum(mined == (np.arange(n) ^ 1)))
    assert hits >= n - 4  # allow a couple of sub-block ties


def test_mine_hard_negatives_gold_excluded():
    rng = np.random.default_rng(1)
    chunks = rng.normal(size=(40, 16)).astype(np.float32)
    chunks /= np.linalg.norm(chunks, axis=1, keepdims=True)
    mined = mine_hard_negatives(chunks, chunks, np.arange(40), k=2)
    assert np.all(mined != np.arange(40))
