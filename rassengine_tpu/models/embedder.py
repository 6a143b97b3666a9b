"""On-TPU text embedding — the in-process replacement for the Ollama client.

API parity with reference app/main.py:225-274:
- ``embed_texts_in_batches(texts) -> np.ndarray[float32, (N, dim)]``
- ``embed_query(q) -> np.ndarray[(1, dim)]``
- empty/whitespace text → zero vector (main.py:225-228),
- batches of ``EngineConfig.embed_batch_size``,

but instead of one HTTP POST per text under an asyncio semaphore, the whole
batch is a single bf16 forward pass. Passing ``mesh`` (a 1-D ``("dp",)`` or
2-D ``("dp","tp")`` jax Mesh) shards the batch across chips — XLA inserts the
collectives; ingestion throughput scales with the dp size.
"""

from __future__ import annotations

import logging
import jax
import jax.numpy as jnp
import numpy as np

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.tracing import stage
from rassengine_tpu.models.bert import BertConfig, BertEncoder
from rassengine_tpu.models.tokenizer import load_tokenizer

log = logging.getLogger("rassengine.embedder")


class Embedder:
    def __init__(self, config: EngineConfig | None = None,
                 bert_cfg: BertConfig | None = None,
                 params=None, mesh=None, seed: int = 0):
        self.config = config or EngineConfig()
        meta = None
        if self.config.encoder_weights_path:
            from rassengine_tpu.train.serialization import load_model_meta

            meta = load_model_meta(self.config.encoder_weights_path)
        if bert_cfg is None:
            if self.config.encoder_weights_path:
                # our trained checkpoints carry their config; bare HF dirs
                # (mxbai-embed-large class) default to BERT-large
                bert_cfg = (BertConfig(**{**meta["bert_config"],
                                          "remat": False}) if meta
                            else BertConfig.large())
                # remat is a training-only memory trade; serving never takes
                # grads, so force it off even for checkpoints whose meta
                # predates save_model_meta's remat scrub
            else:
                # weightless mode: tiny deterministic encoder (tests/benches)
                bert_cfg = BertConfig.tiny()
        # train-time paraphrase calibration (encoder_train
        # .calibrate_cache_threshold): the similarity scale is a property of
        # the ENCODER (mean-pooled models sit lower than cls-pooled), so a
        # fixed cache threshold silently disables the semantic cache
        self.suggested_cache_threshold = (
            meta.get("cache_sim_threshold") if meta else None)
        # the embedding dim is the hidden size unless a projection is added;
        # weightless tiny mode projects up to config.embed_dim with a fixed
        # random matrix so the index dimension matches production.
        self.bert_cfg = bert_cfg
        self.model = BertEncoder(bert_cfg)
        self.tokenizer = load_tokenizer(
            self.config.encoder_weights_path, bert_cfg.vocab_size,
            self.config.embed_max_seq_len,
        )
        self.mesh = mesh
        # embeddings from random-init weights are not semantically meaningful;
        # similarity-based features (the semantic answer cache) must not trust
        # them (verified live: unrelated queries cosine > 0.88 under tiny init)
        self.trusted_semantics = bool(self.config.encoder_weights_path)
        if params is None:
            params = self._init_params(seed)
            if self.config.encoder_weights_path:
                from rassengine_tpu.models.weights import load_encoder_params

                loaded = load_encoder_params(self.config.encoder_weights_path, bert_cfg)
                if loaded is not None:
                    params = loaded
        # commit params to device ONCE: msgpack/HF loads return host numpy
        # trees, and a jitted apply re-uploads any host operand EVERY call —
        # 436 MB of BERT-large f32 per forward, ~3 s/batch through a
        # tunneled chip (measured: 19 texts/s; ~40 ms even over PCIe)
        self.params = jax.device_put(params)
        self.dim = self.config.embed_dim
        if bert_cfg.hidden_size != self.dim:
            key = jax.random.PRNGKey(7)
            proj = jax.random.normal(key, (bert_cfg.hidden_size, self.dim)) / np.sqrt(
                bert_cfg.hidden_size
            )
            self._proj = proj.astype(jnp.float32)
        else:
            self._proj = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from rassengine_tpu.parallel.sharding import param_shardings

            axes = mesh.axis_names
            batch_spec = P("dp") if "dp" in axes else P(axes[0])
            rep = NamedSharding(mesh, P())
            if "tp" in axes:
                self.params = jax.device_put(self.params,
                                             param_shardings(self.params, mesh))
            else:
                self.params = jax.device_put(self.params, rep)
            self._batch_sharding = NamedSharding(mesh, batch_spec)
            proj_sh = rep if self._proj is not None else None
            self._forward = jax.jit(
                self._embed_fn,
                in_shardings=(None, self._batch_sharding, self._batch_sharding,
                              proj_sh),
                out_shardings=rep,
            )
        else:
            self._batch_sharding = None
            self._forward = jax.jit(self._embed_fn)

    def _init_params(self, seed: int):
        dummy = jnp.zeros((1, 8), jnp.int32)
        return self.model.init(jax.random.PRNGKey(seed), dummy, jnp.ones_like(dummy))

    def _embed_fn(self, params, ids, mask, proj):
        hidden = self.model.apply(params, ids, mask)
        emb = self.model.pool(hidden, mask)  # [B, H] already L2-normalized
        if proj is not None:
            emb = emb @ proj
            norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
            emb = emb / jnp.maximum(norm, 1e-12)
        return emb

    # --- public API (reference name parity) -----------------------------------

    def embed_texts_in_batches(self, texts: list[str], batch_size: int | None = None) -> np.ndarray:
        """Reference embed_texts_in_batches (main.py:240-263), on device."""
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        bs = batch_size or self.config.embed_batch_size
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        nonempty = [(i, t) for i, t in enumerate(texts) if t and t.strip()]
        if len(nonempty) > bs:
            # batches pad to their longest member (tokenizer buckets), so a
            # lone long text in a batch of short ones wastes MXU FLOPs on
            # padding; length-sorting groups like with like (out[i] below
            # restores order; word count is a cheap token-count proxy)
            nonempty.sort(key=lambda it: len(it[1].split()))
        with stage("embed"):
            # software pipeline: dispatch batch i's forward (async under
            # jax), tokenize batch i+1 WHILE the device runs, and only then
            # block on batch i's result. Host WordPiece is ~40% of the
            # 8L-encoder embed stage on a one-core host (11.4 s / 13k
            # chunks measured round 5); serializing it behind the forward
            # wasted exactly that
            pending: tuple[list, object] | None = None

            def _drain(p):
                chunk_, emb_ = p
                arr = np.asarray(emb_[: len(chunk_)], dtype=np.float32)
                for (i, _), e in zip(chunk_, arr):
                    out[i] = e

            for start in range(0, len(nonempty), bs):
                chunk = nonempty[start : start + bs]
                ids, mask = self.tokenizer.encode_batch(
                    [t for _, t in chunk], self.config.embed_max_seq_len
                )
                pad = bs - len(chunk)
                if pad:
                    ids = np.pad(ids, ((0, pad), (0, 0)))
                    mask = np.pad(mask, ((0, pad), (0, 0)))
                emb = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask),
                                    self._proj)
                if pending is not None:
                    _drain(pending)
                pending = (chunk, emb)
            if pending is not None:
                _drain(pending)
        return out

    def embed_query(self, query: str) -> np.ndarray:
        """Reference embed_query (main.py:266-274): → float32 [1, dim]."""
        return self.embed_texts_in_batches([query], batch_size=8)

    def encode_args(self, texts: list[str]):
        """Tokenize on host and expose the pure forward for in-dispatch use.

        → (embed_fn, params, proj, ids, mask): fusion/fused_query.py inlines
        ``embed_fn`` (the SAME function ``embed_texts_in_batches`` jits, so
        fused and unfused paths share one numerical definition) into the
        retrieval dispatch — encoder forward + corpus scan as one XLA
        program, one device round-trip per lone ask.
        """
        ids, mask = self.tokenizer.encode_batch(texts,
                                                self.config.embed_max_seq_len)
        return (self._embed_fn, self.params, self._proj,
                jnp.asarray(ids), jnp.asarray(mask))
