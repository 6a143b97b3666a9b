"""Tokenizers for the on-TPU encoder.

Two interchangeable implementations:

- ``WordPieceTokenizer``: loads a standard BERT ``vocab.txt`` (or HF
  ``tokenizer.json``) via the ``tokenizers`` library — used when real encoder
  weights are installed (EngineConfig.encoder_weights_path).
- ``HashTokenizer``: deterministic hashing-trick tokenizer needing no files —
  the default for random-weight mode, tests, and benches. Splits on
  non-alphanumerics, hashes each lowercased word into the vocab range, and
  reserves ids 0..4 for special tokens.

Both return fixed-shape (ids, attention_mask) with sequence-length bucketing so
jit sees a handful of static shapes instead of one per input length.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np

PAD_ID, CLS_ID, SEP_ID, UNK_ID, MASK_ID = 0, 1, 2, 3, 4
N_SPECIAL = 5

_WORD_RE = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")

SEQ_BUCKETS = (32, 64, 128, 256, 512)


def bucket_length(n: int, max_len: int) -> int:
    for b in SEQ_BUCKETS:
        if n <= b and b <= max_len:
            return b
    return max_len


class HashTokenizer:
    def __init__(self, vocab_size: int = 30522, max_len: int = 512):
        self.vocab_size = vocab_size
        self.max_len = max_len

    def _token_id(self, word: str) -> int:
        h = int.from_bytes(hashlib.md5(word.lower().encode()).digest()[:4], "little")
        return N_SPECIAL + h % (self.vocab_size - N_SPECIAL)

    def encode_words(self, words: list[str], max_len: int | None = None):
        """Word-aligned encoding → (ids [1, L], mask [1, L], word_ids [1, L]).

        One token per whitespace word; word_ids maps each position to its
        source word (-1 for CLS/SEP/pad). Shared API with WordPieceTokenizer
        so NER training and inference tokenize identically.
        """
        max_len = max_len or self.max_len
        words = words[: max_len - 2]
        toks = [CLS_ID] + [self._token_id(w) for w in words] + [SEP_ID]
        wids = [-1] + list(range(len(words))) + [-1]
        pad_to = bucket_length(len(toks), max_len)
        ids = np.full((1, pad_to), PAD_ID, np.int32)
        mask = np.zeros((1, pad_to), np.int32)
        word_ids = np.full((1, pad_to), -1, np.int32)
        ids[0, : len(toks)] = toks
        mask[0, : len(toks)] = 1
        word_ids[0, : len(wids)] = wids
        return ids, mask, word_ids

    def encode_batch(self, texts: list[str], max_len: int | None = None):
        max_len = max_len or self.max_len
        toks = []
        longest = 2
        for t in texts:
            words = _WORD_RE.findall(t or "")[: max_len - 2]
            ids = [CLS_ID] + [self._token_id(w) for w in words] + [SEP_ID]
            toks.append(ids)
            longest = max(longest, len(ids))
        pad_to = bucket_length(longest, max_len)
        n = len(texts)
        ids = np.full((n, pad_to), PAD_ID, dtype=np.int32)
        mask = np.zeros((n, pad_to), dtype=np.int32)
        for i, t in enumerate(toks):
            t = t[:pad_to]
            ids[i, : len(t)] = t
            mask[i, : len(t)] = 1
        return ids, mask


class WordPieceTokenizer:
    """BERT WordPiece via the `tokenizers` library from a weights directory."""

    def __init__(self, path: str, max_len: int = 512):
        from tokenizers import Tokenizer
        from tokenizers.models import WordPiece

        tok_json = os.path.join(path, "tokenizer.json")
        vocab_txt = os.path.join(path, "vocab.txt")
        if os.path.exists(tok_json):
            self._tok = Tokenizer.from_file(tok_json)
        elif os.path.exists(vocab_txt):
            from tokenizers import normalizers, pre_tokenizers
            from tokenizers.processors import TemplateProcessing

            self._tok = Tokenizer(WordPiece.from_file(vocab_txt, unk_token="[UNK]"))
            self._tok.normalizer = normalizers.BertNormalizer(lowercase=True)
            self._tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
            self._tok.post_processor = TemplateProcessing(
                single="[CLS] $A [SEP]",
                special_tokens=[("[CLS]", self._tok.token_to_id("[CLS]")),
                                ("[SEP]", self._tok.token_to_id("[SEP]"))],
            )
        else:
            raise FileNotFoundError(f"no tokenizer.json or vocab.txt under {path}")
        self.max_len = max_len
        self.pad_id = self._tok.token_to_id("[PAD]") or 0

    def encode_batch(self, texts: list[str], max_len: int | None = None):
        max_len = max_len or self.max_len
        encs = self._tok.encode_batch([t or "" for t in texts])
        longest = max((len(e.ids) for e in encs), default=2)
        pad_to = bucket_length(min(longest, max_len), max_len)
        n = len(texts)
        ids = np.full((n, pad_to), self.pad_id, dtype=np.int32)
        mask = np.zeros((n, pad_to), dtype=np.int32)
        for i, e in enumerate(encs):
            t = e.ids[:pad_to]
            ids[i, : len(t)] = t
            mask[i, : len(t)] = 1
        return ids, mask


    def encode_words(self, words: list[str], max_len: int | None = None):
        """Word-aligned subword encoding (see HashTokenizer.encode_words).

        Each word tokenizes independently; continuation subtokens carry the
        same word id, so BIO training labels first-subtokens B- and
        continuations I-, and decoding reads the first subtoken per word.
        """
        max_len = max_len or self.max_len
        toks: list[int] = [self._tok.token_to_id("[CLS]")]
        wids: list[int] = [-1]
        for wi, w in enumerate(words):
            sub = self._tok.encode(w, add_special_tokens=False).ids or [
                self._tok.token_to_id("[UNK]")]
            if len(toks) + len(sub) + 1 > max_len:
                break
            toks.extend(sub)
            wids.extend([wi] * len(sub))
        toks.append(self._tok.token_to_id("[SEP]"))
        wids.append(-1)
        pad_to = bucket_length(len(toks), max_len)
        ids = np.full((1, pad_to), self.pad_id, np.int32)
        mask = np.zeros((1, pad_to), np.int32)
        word_ids = np.full((1, pad_to), -1, np.int32)
        ids[0, : len(toks)] = toks
        mask[0, : len(toks)] = 1
        word_ids[0, : len(wids)] = wids
        return ids, mask, word_ids


def train_wordpiece_vocab(texts: list[str], out_dir: str,
                          vocab_size: int = 8192) -> str:
    """Train a WordPiece vocab on a text corpus → writes ``vocab.txt``.

    Real-weight deployments ship a pretrained vocab; synthetic-trained NLU
    models get subword generalization (unseen surface forms decompose into
    seen pieces — the hash tokenizer maps them to arbitrary ids instead,
    which is why round-1 models couldn't generalize off-template).
    Special-token order matches the module constants (PAD=0 … MASK=4).
    """
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, trainers

    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.normalizer = normalizers.BertNormalizer(lowercase=True)
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    trainer = trainers.WordPieceTrainer(
        vocab_size=vocab_size,
        special_tokens=["[PAD]", "[CLS]", "[SEP]", "[UNK]", "[MASK]"],
    )
    tok.train_from_iterator(texts, trainer)
    os.makedirs(out_dir, exist_ok=True)
    tok.model.save(out_dir)
    return os.path.join(out_dir, "vocab.txt")


def load_tokenizer(weights_path: str, vocab_size: int, max_len: int):
    if weights_path and (
        os.path.exists(os.path.join(weights_path, "tokenizer.json"))
        or os.path.exists(os.path.join(weights_path, "vocab.txt"))
    ):
        return WordPieceTokenizer(weights_path, max_len)
    return HashTokenizer(vocab_size, max_len)
