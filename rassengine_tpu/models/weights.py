"""Weight I/O: HF-torch → Flax conversion and msgpack checkpoints.

Provides the path from public BERT-family checkpoints (mxbai-embed-large,
bert-base-uncased, BioBERT) into this framework's parameter tree, plus simple
save/load so trained NLU models round-trip (train/ writes, nlu/ reads).
"""

from __future__ import annotations

import logging
import os

import jax.numpy as jnp
import numpy as np

from rassengine_tpu.models.bert import BertConfig

log = logging.getLogger("rassengine.weights")


def save_params(path: str, params, extra: dict | None = None) -> None:
    import flax.serialization as ser

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(ser.to_bytes(params))
    if extra:
        import json

        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(extra, f, indent=2)


def load_params(path: str, template):
    import flax.serialization as ser

    fname = os.path.join(path, "params.msgpack")
    if not os.path.exists(fname):
        return None
    with open(fname, "rb") as f:
        return ser.from_bytes(template, f.read())


def load_encoder_params(path: str, cfg: BertConfig):
    """Load encoder params from a weights dir: our msgpack, or HF pytorch_model.bin."""
    import flax.serialization as ser

    msgpack = os.path.join(path, "params.msgpack")
    if os.path.exists(msgpack):
        with open(msgpack, "rb") as f:
            return ser.msgpack_restore(f.read())
    for candidate in ("pytorch_model.bin", "model.safetensors"):
        p = os.path.join(path, candidate)
        if os.path.exists(p):
            sd = _load_torch_state_dict(p)
            return {"params": convert_hf_bert(sd, cfg)}
    log.warning("no encoder weights found under %s; using random init", path)
    return None


def _load_torch_state_dict(path: str) -> dict:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def convert_hf_bert(sd: dict, cfg: BertConfig) -> dict:
    """Map a HF `BertModel` state dict onto our BertEncoder param tree.

    HF layout: bert.embeddings.*, bert.encoder.layer.{i}.attention.self.{query,key,value},
    .attention.output.dense, .intermediate.dense, .output.dense, with
    attention.output.LayerNorm and output.LayerNorm.
    """
    sd = {k.removeprefix("bert."): np.asarray(v) for k, v in sd.items()}
    h, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim

    def t(name):  # torch Linear stores [out, in]; flax Dense wants [in, out]
        return sd[name].T

    p: dict = {
        "token_embed": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embed": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "type_embed": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
        "embed_norm": {
            "scale": sd["embeddings.LayerNorm.weight"],
            "bias": sd["embeddings.LayerNorm.bias"],
        },
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."
        attn = {}
        for name in ("query", "key", "value"):
            w = t(pre + f"attention.self.{name}.weight").reshape(h, nh, hd)
            b = sd[pre + f"attention.self.{name}.bias"].reshape(nh, hd)
            attn[name] = {"kernel": w, "bias": b}
        attn["out"] = {
            "kernel": t(pre + "attention.output.dense.weight").reshape(nh, hd, h),
            "bias": sd[pre + "attention.output.dense.bias"],
        }
        p[f"layer_{i}"] = {
            "attention": attn,
            "attention_norm": {
                "scale": sd[pre + "attention.output.LayerNorm.weight"],
                "bias": sd[pre + "attention.output.LayerNorm.bias"],
            },
            "mlp_in": {
                "kernel": t(pre + "intermediate.dense.weight"),
                "bias": sd[pre + "intermediate.dense.bias"],
            },
            "mlp_out": {
                "kernel": t(pre + "output.dense.weight"),
                "bias": sd[pre + "output.dense.bias"],
            },
            "mlp_norm": {
                "scale": sd[pre + "output.LayerNorm.weight"],
                "bias": sd[pre + "output.LayerNorm.bias"],
            },
        }
    return p
