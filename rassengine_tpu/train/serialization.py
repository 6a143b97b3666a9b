"""Model checkpoint metadata helpers shared by train/ (writers) and nlu/ (readers)."""

from __future__ import annotations

import dataclasses
import json
import os


def save_model_meta(path: str, bert_config, extra: dict | None = None) -> None:
    os.makedirs(path, exist_ok=True)
    # Shipped checkpoints are inference artifacts: remat is a TRAINING memory
    # trade (models/bert.py BertConfig.remat) and training scripts re-enable
    # it explicitly, so never persist remat=True — a consumer building
    # BertConfig(**meta) would drag nn.remat tracing into the serving forward.
    if getattr(bert_config, "remat", False):
        bert_config = dataclasses.replace(bert_config, remat=False)
    meta = {"bert_config": dataclasses.asdict(bert_config)}
    if extra:
        meta.update(extra)
    with open(os.path.join(path, "model_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_model_meta(path: str) -> dict | None:
    p = os.path.join(path, "model_meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
