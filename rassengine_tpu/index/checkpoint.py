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

FORMAT_VERSION = 2


def save_tenant(index: TenantIndex, path: str) -> None:
    """Persist the LIVE rows (tombstones drop — a checkpoint is an implicit
    compaction point); rows are gathered so sharded region layouts serialize
    the same as contiguous ones."""
    os.makedirs(path, exist_ok=True)
    rows = np.nonzero(index._allocated)[0]
    np.savez_compressed(
        os.path.join(path, "arrays.npz"),
        vecs=index._vecs[rows],
        patient_hash=index._patient_hash[rows],
        resource_type=index._resource_type[rows],
        doc_type=index._doc_type[rows],
        has_embedding=index._has_embedding[rows],
        keyword=index._keyword[rows],
        dates=index._dates[rows],
    )
    with open(os.path.join(path, "docs.jsonl"), "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(index.docs[int(row)]) + "\n")
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"version": FORMAT_VERSION, "name": index.name,
                   "dim": index.dim, "count": int(rows.size),
                   "block_rows": index.block_rows}, f)
    log.info("saved %s (%d docs) → %s", index.name, rows.size, path)


def load_tenant(path: str, mesh=None) -> tuple[TenantIndex, LexicalIndex]:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    index = TenantIndex(meta["name"], meta["dim"], capacity=max(meta["count"], 1024),
                        block_rows=meta["block_rows"], mesh=mesh)
    data = np.load(os.path.join(path, "arrays.npz"))
    n = meta["count"]
    lexical = LexicalIndex()
    with open(os.path.join(path, "docs.jsonl"), encoding="utf-8") as f:
        docs = [json.loads(line) for line in f]
    if mesh is not None:
        # sharded target: re-place every row into its patient's shard region
        index.remap_hooks.append(lexical.shift_rows)
        for i, doc in enumerate(docs):
            if doc is None:
                continue
            emb = data["vecs"][i] if data["has_embedding"][i] else None
            row = index.upsert(doc, emb)
            lexical.index_doc(row, doc)
        log.info("loaded %s (%d docs, re-sharded) from %s",
                 index.name, index.count, path)
        return index, lexical
    live = [i for i, d in enumerate(docs) if d is not None]
    for dst, src in enumerate(live):  # v1 files may carry tombstoned rows
        index._vecs[dst] = data["vecs"][src]
        index._patient_hash[dst] = data["patient_hash"][src]
        index._resource_type[dst] = data["resource_type"][src]
        index._doc_type[dst] = data["doc_type"][src]
        index._has_embedding[dst] = data["has_embedding"][src]
        index._keyword[dst] = data["keyword"][src]
        index._dates[dst] = data["dates"][src]
        doc = docs[src]
        index.docs[dst] = doc
        index._id_to_row[str(doc.get("doc_id"))] = dst
        index.encode_agg(dst, doc)  # agg columns rebuild from sources
        lexical.index_doc(dst, doc)
    index.count = len(live)
    index._allocated[: len(live)] = True
    index._mutated()
    log.info("loaded %s (%d docs) from %s", index.name, len(live), path)
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
    mesh = getattr(engine, "mesh", None)
    router = getattr(engine, "router", None)
    for safe in names:
        index, lexical = load_tenant(os.path.join(root, safe), mesh=mesh)
        t = Tenant(
            index.name, index, lexical,
            Retriever(index, lexical, engine.config, engine.use_pallas,
                      mesh=mesh, router=router),
        )
        index.remap_hooks.clear()  # drop the load-time lexical binding
        index.remap_hooks.append(lambda mv, _t=t: _t.lexical.shift_rows(mv))
        engine._tenants[index.name] = t
    return len(names)
