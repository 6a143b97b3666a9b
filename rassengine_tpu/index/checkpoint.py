"""Index checkpoint / resume.

HBM is volatile and the reference has no index-persistence concept (OpenSearch
owns durability — SURVEY §5 "checkpoint/resume"). Here every tenant's index
serializes to disk: the canonical host arrays as one .npz, the document
sources as jsonl. The lexical postings are rebuilt from the sources on load
(cheaper than serializing postings, and guarantees postings/doc consistency).
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from rassengine_tpu.index.store import TenantIndex
from rassengine_tpu.lexical.bm25 import LexicalIndex

log = logging.getLogger("rassengine.checkpoint")

FORMAT_VERSION = 1


def save_tenant(index: TenantIndex, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(
        os.path.join(path, "arrays.npz"),
        vecs=index._vecs[: index.count],
        patient_hash=index._patient_hash[: index.count],
        resource_type=index._resource_type[: index.count],
        doc_type=index._doc_type[: index.count],
        has_embedding=index._has_embedding[: index.count],
        keyword=index._keyword[: index.count],
        dates=index._dates[: index.count],
        deleted=index._deleted[: index.count],
    )
    with open(os.path.join(path, "docs.jsonl"), "w", encoding="utf-8") as f:
        for row in range(index.count):
            f.write(json.dumps(index.docs[row]) + "\n")
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"version": FORMAT_VERSION, "name": index.name,
                   "dim": index.dim, "count": index.count,
                   "block_rows": index.block_rows}, f)
    log.info("saved %s (%d docs) → %s", index.name, index.count, path)


def load_tenant(path: str) -> tuple[TenantIndex, LexicalIndex]:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    index = TenantIndex(meta["name"], meta["dim"], capacity=max(meta["count"], 1024),
                        block_rows=meta["block_rows"])
    data = np.load(os.path.join(path, "arrays.npz"))
    n = meta["count"]
    index.count = n
    index._vecs[:n] = data["vecs"]
    index._patient_hash[:n] = data["patient_hash"]
    index._resource_type[:n] = data["resource_type"]
    index._doc_type[:n] = data["doc_type"]
    index._has_embedding[:n] = data["has_embedding"]
    index._keyword[:n] = data["keyword"]
    index._dates[:n] = data["dates"]
    if "deleted" in data:  # absent in pre-deletion checkpoints
        index._deleted[:n] = data["deleted"]
        index.deleted_count = int(data["deleted"].sum())
    lexical = LexicalIndex()
    with open(os.path.join(path, "docs.jsonl"), encoding="utf-8") as f:
        for row, line in enumerate(f):
            doc = json.loads(line)
            index.docs[row] = doc
            if doc is not None:
                index._id_to_row[str(doc.get("doc_id"))] = row
                index.encode_agg(row, doc)  # agg columns rebuild from sources
                lexical.index_doc(row, doc)
    index._mutated()
    log.info("loaded %s (%d docs) from %s", index.name, n, path)
    return index, lexical


def save_engine(engine, root: str) -> None:
    """Persist every tenant of a RassEngine.

    Runs concurrently with ingestion/retrieval (serve/app.py checkpoint loop):
    snapshot the tenants dict first (a live ``tenant()`` insert would raise
    mid-iteration) and hold each tenant's mutation lock while serializing so a
    concurrent upsert can't leave a half-written row in the checkpoint.
    """
    os.makedirs(root, exist_ok=True)
    names = []
    for name, tenant in list(engine._tenants.items()):
        safe = name.replace("/", "_")
        with tenant.lock:
            save_tenant(tenant.index, os.path.join(root, safe))
        names.append(safe)
    with open(os.path.join(root, "tenants.json"), "w") as f:
        json.dump(names, f)


def load_engine(engine, root: str) -> int:
    """Restore tenants into a RassEngine; → number of tenants loaded."""
    from rassengine_tpu.engine import Tenant
    from rassengine_tpu.fusion.strategies import Retriever

    manifest = os.path.join(root, "tenants.json")
    if not os.path.exists(manifest):
        return 0
    with open(manifest) as f:
        names = json.load(f)
    for safe in names:
        index, lexical = load_tenant(os.path.join(root, safe))
        engine._tenants[index.name] = Tenant(
            index.name, index, lexical,
            Retriever(index, lexical, engine.config, engine.use_pallas),
        )
    return len(names)
