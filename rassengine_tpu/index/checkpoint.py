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
import shutil
import time
from urllib.parse import quote

import numpy as np

from rassengine_tpu.index.store import TenantIndex, replace_rows
from rassengine_tpu.lexical.bm25 import LexicalIndex


def _saved_pairs(docs: list, data) -> "iter":
    """(doc, emb|None) pairs from a checkpoint's docs.jsonl + arrays.npz,
    skipping tombstones — the source side of replace_rows on restore."""
    for i, doc in enumerate(docs):
        if doc is not None:
            yield doc, (data["vecs"][i] if data["has_embedding"][i]
                        else None)

log = logging.getLogger("rassengine.checkpoint")

FORMAT_VERSION = 2


def save_tenant(index: TenantIndex, path: str,
                row_range: tuple[int, int] | None = None,
                partition_meta: dict | None = None) -> None:
    """Persist the LIVE rows (tombstones drop — a checkpoint is an implicit
    compaction point); rows are gathered so sharded region layouts serialize
    the same as contiguous ones.

    ``row_range=(start, stop)`` saves only that slice of the global row space
    — the per-host checkpoint partition (ROADMAP r3 #2): on a multi-host
    fleet each process persists exactly the shard regions it owns
    (parallel/multihost.host_local_rows), so checkpoint IO scales with
    per-host corpus share instead of every host serializing everything."""
    os.makedirs(path, exist_ok=True)
    rows = np.nonzero(index._allocated)[0]
    if row_range is not None:
        rows = rows[(rows >= row_range[0]) & (rows < row_range[1])]
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
                   "block_rows": index.block_rows,
                   # topology stamp: load_tenant uses saved_at + n_procs/pid
                   # to reject stale layouts after a fleet-topology change
                   "saved_at": time.time(),
                   **(partition_meta or {})}, f)
    log.info("saved %s (%d docs) → %s", index.name, rows.size, path)


def load_tenant(path: str, mesh=None) -> tuple[TenantIndex, LexicalIndex]:
    """Restore one tenant. A directory of ``part*/`` subdirs (per-host
    partitioned save) loads every partition through the re-placement path:
    each doc re-upserts into ITS patient's shard region under the CURRENT
    mesh — so a checkpoint taken on N hosts/shards restores onto M ≠ N
    (elastic re-sharding; the partition layout on disk never constrains the
    serving topology)."""
    parts = sorted(
        d for d in (os.listdir(path) if os.path.isdir(path) else [])
        if d.startswith("part")
        and os.path.exists(os.path.join(path, d, "meta.json")))
    metas = []
    for p in parts:
        with open(os.path.join(path, p, "meta.json")) as f:
            metas.append(json.load(f))
    if parts:
        # topology guard: a fleet that shrank (or moved to single-process
        # saves) leaves stale part dirs behind — load only the NEWEST save's
        # layout. The flat meta.json wins when it is at least as recent;
        # among parts, keep those matching the newest part's n_procs stamp
        # with pid < n_procs (stale higher parts from a wider fleet drop).
        newest_part = max(m.get("saved_at", 0) for m in metas)
        flat_meta = os.path.join(path, "meta.json")
        if os.path.exists(flat_meta):
            with open(flat_meta) as f:
                if json.load(f).get("saved_at", 0) >= newest_part:
                    parts = []
    if parts:
        auth = max(metas, key=lambda m: m.get("saved_at", 0))
        n_procs = auth.get("n_procs")
        kept = [(p, m) for p, m in zip(parts, metas)
                if n_procs is None
                or (m.get("n_procs") == n_procs
                    and m.get("pid", 0) < n_procs)]
        dropped = len(parts) - len(kept)
        if dropped:
            log.warning("%s: ignoring %d stale checkpoint partition(s) "
                        "from an older fleet topology", path, dropped)
        parts = [p for p, _m in kept]
        metas = [m for _p, m in kept]
        total = sum(m["count"] for m in metas)
        index = TenantIndex(metas[0]["name"], metas[0]["dim"],
                            capacity=max(total, 1024),
                            block_rows=metas[0]["block_rows"], mesh=mesh)
        lexical = LexicalIndex()
        index.remap_hooks.append(lexical.shift_rows)
        for p, m in zip(parts, metas):
            data = np.load(os.path.join(path, p, "arrays.npz"))
            with open(os.path.join(path, p, "docs.jsonl"),
                      encoding="utf-8") as f:
                docs = [json.loads(line) for line in f]
            replace_rows(index, lexical, _saved_pairs(docs, data))
        log.info("loaded %s (%d docs from %d partitions%s) from %s",
                 index.name, index.count, len(parts),
                 ", re-sharded" if mesh is not None else "", path)
        return index, lexical
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
        replace_rows(index, lexical, _saved_pairs(docs, data))
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


def save_engine(engine, root: str,
                partition: tuple[int, int] | None = None) -> None:
    """Persist every tenant of a RassEngine.

    Runs concurrently with ingestion/retrieval (serve/app.py checkpoint loop):
    snapshot the tenants dict first (a live ``tenant()`` insert would raise
    mid-iteration) and hold each tenant's mutation lock while serializing so a
    concurrent upsert can't leave a half-written row in the checkpoint.

    Multi-host fleets partition the save (ROADMAP r3 #2): each process writes
    only its host-local shard regions into ``<tenant>/part<pid>/`` plus a
    per-process manifest, so no host serializes (or even holds fresh copies
    of) rows it doesn't own. ``partition=(pid, n_procs)`` overrides the jax
    process topology (tests simulate a fleet single-process with it).
    """
    os.makedirs(root, exist_ok=True)
    if partition is not None:
        pid, n_procs = partition
    else:
        import jax

        pid, n_procs = jax.process_index(), jax.process_count()
    names = []
    for name, tenant in list(engine._tenants.items()):
        # INJECTIVE dir encoding (percent-escape, '%' itself included):
        # a lossy map like '/'→'_' would let tenants "a/b" and "a_b"
        # collide on one directory and clobber each other's checkpoints.
        # Ordinary names (letters, digits, '_-.') are unchanged, so
        # existing checkpoint dirs keep loading.
        safe = quote(name, safe="")
        with tenant.lock:
            if n_procs > 1:
                idx = tenant.index
                rs = idx.capacity // idx.n_shards
                per_proc = max(idx.n_shards // n_procs, 1)
                s0 = min(pid * per_proc, idx.n_shards)
                # the last process owns any remainder shards (n_shards need
                # not divide n_procs) so no row goes unsaved
                stop = (idx.capacity if pid == n_procs - 1
                        else min((s0 + per_proc) * rs, idx.capacity))
                rr = (s0 * rs, stop)
                save_tenant(idx, os.path.join(root, safe, f"part{pid}"),
                            row_range=rr,
                            partition_meta={"pid": pid, "n_procs": n_procs})
            else:
                tdir = os.path.join(root, safe)
                save_tenant(tenant.index, tdir)
                # a single-process save owns the whole tenant: drop part
                # dirs left by an earlier fleet topology (load_tenant also
                # guards by saved_at, but cleaning keeps the dir canonical)
                for d in list(os.listdir(tdir)):
                    if d.startswith("part") and os.path.isdir(
                            os.path.join(tdir, d)):
                        shutil.rmtree(os.path.join(tdir, d),
                                      ignore_errors=True)
        names.append(safe)
    manifest = (os.path.join(root, f"tenants.p{pid}.json") if n_procs > 1
                else os.path.join(root, "tenants.json"))
    with open(manifest, "w") as f:
        json.dump(names, f)
    if n_procs == 1:
        # stale per-process manifests would resurrect fleet-era tenant lists
        for fn in list(os.listdir(root)):
            if fn.startswith("tenants.p") and fn.endswith(".json"):
                os.remove(os.path.join(root, fn))


def load_engine(engine, root: str) -> int:
    """Restore tenants into a RassEngine; → number of tenants loaded.

    Unions the single-process manifest with any per-process partition
    manifests, so a checkpoint written by an N-host fleet restores on any
    topology (each tenant's partitions re-shard at load, see load_tenant)."""
    from rassengine_tpu.engine import Tenant
    from rassengine_tpu.fusion.strategies import Retriever

    names: list[str] = []
    manifest = os.path.join(root, "tenants.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            names = json.load(f)
    if os.path.isdir(root):
        for fn in sorted(os.listdir(root)):
            if fn.startswith("tenants.p") and fn.endswith(".json"):
                with open(os.path.join(root, fn)) as f:
                    names.extend(n for n in json.load(f) if n not in names)
    if not names:
        return 0
    mesh = getattr(engine, "mesh", None)
    router = getattr(engine, "router", None)
    loaded = 0
    for safe in names:
        tdir = os.path.join(root, safe)
        if not (os.path.exists(os.path.join(tdir, "meta.json"))
                or any(d.startswith("part")
                       for d in (os.listdir(tdir)
                                 if os.path.isdir(tdir) else ()))):
            # stale manifest entry (tenant deleted after a fleet-era save):
            # skip rather than abort the whole restore
            log.warning("checkpoint manifest names %s but no data exists "
                        "under %s; skipping", safe, tdir)
            continue
        index, lexical = load_tenant(tdir, mesh=mesh)
        t = Tenant(
            index.name, index, lexical,
            Retriever(index, lexical, engine.config, engine.use_pallas,
                      mesh=mesh, router=router),
        )
        index.remap_hooks.clear()  # drop the load-time lexical binding
        index.remap_hooks.append(lambda mv, _t=t: _t.lexical.shift_rows(mv))
        engine._tenants[index.name] = t
        loaded += 1
    return loaded
