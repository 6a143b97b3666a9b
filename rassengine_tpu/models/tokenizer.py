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


def load_tokenizer(weights_path: str, vocab_size: int, max_len: int):
    if weights_path and (
        os.path.exists(os.path.join(weights_path, "tokenizer.json"))
        or os.path.exists(os.path.join(weights_path, "vocab.txt"))
    ):
        return WordPieceTokenizer(weights_path, max_len)
    return HashTokenizer(vocab_size, max_len)
