"""HBM-resident per-tenant vector + metadata store.

Replaces the reference's per-user OpenSearch index (ensure_index_exists,
app/main.py:346-579): one ``TenantIndex`` per user holds

- unit-normalized embedding vectors as a capacity-padded bf16 device array
  (only unstructured docs carry embeddings, mirroring main.py:1250-1282 —
  structured docs get a zero row and are excluded from semantic scans via the
  ``has_embedding`` column),
- int32 *filter columns*: patient hash, resource type, doc type, dictionary-
  encoded keyword fields, and epoch-day date fields. Every OpenSearch bool
  filter the reference builds (term/terms/range/_routing) lowers to one
  vectorized mask over these columns (see ``FilterSpec`` / ``build_filter_mask``),
- the full document sources host-side (the ``_source`` returned by searches).

Shapes are static: capacity is padded to a multiple of the scan block and grows
by doubling + re-upload (SURVEY §7 "streaming upserts into static-shape device
arrays"). Upserts by doc_id overwrite in place like OpenSearch ``_id`` indexing.
"""

from __future__ import annotations

import hashlib
import logging
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rassengine_tpu.core import schema
from rassengine_tpu.core.meshes import STORE_DTYPE

log = logging.getLogger("rassengine.store")

NEG_INF = -1.0e30
N_KEYWORD = len(schema.KEYWORD_FIELDS)
N_DATE = len(schema.DATE_FIELDS)
MAX_FILTER_VALUES = 8  # max OR'd values per keyword field in one filter

_KW_POS = {f: i for i, f in enumerate(schema.KEYWORD_FIELDS)}
_DATE_POS = {f: i for i, f in enumerate(schema.DATE_FIELDS)}

# _update_log dedup threshold (see upsert): bounds the log at O(distinct
# rows) for high-churn tenants that never trip an IVF rebuild
UPDATE_LOG_DEDUP_AT = 131072

# aggregation column → the doc key(s) it dictionary-encodes
AGG_FIELDS: dict[str, tuple[str, ...]] = {
    "condition": ("conditionCodeText",),
    "resource": ("resourceType",),
    "patient": ("patientId",),
    "filekey": ("file_path", "doc_id"),  # first non-empty wins
}


def stable_hash32(s: str) -> int:
    """Stable positive 31-bit hash for routing/term columns (0 reserved for none)."""
    if not s:
        return 0
    h = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "little")
    return (h & 0x7FFFFFFF) or 1


@dataclass
class FilterSpec:
    """Host-side canonical filter, lowered to fixed-shape device arrays.

    Semantics (matching the reference's bool-filter composition):
    - clauses across different fields AND together,
    - multiple values for one keyword field OR together,
    - date ranges across several fields OR together (entity DATE maps to many
      date fields, main.py:204-211; temporal/multi-intent build should-clauses).
    """

    patient_id: str | None = None
    doc_type: int | None = None              # schema.DOC_TYPE.*
    resource_type: str | None = None
    keyword_terms: dict[str, list[str]] = field(default_factory=dict)
    date_ranges: dict[str, tuple[int | None, int | None]] = field(default_factory=dict)
    require_embedding: bool = False

    def merged_with(self, other: "FilterSpec | None") -> "FilterSpec":
        if other is None:
            return self
        kw = {k: list(v) for k, v in self.keyword_terms.items()}
        for k, v in other.keyword_terms.items():
            kw.setdefault(k, []).extend(v)
        # same-field ranges INTERSECT (both constraints must hold); ranges on
        # different fields still OR together in build_filter_mask
        dr = dict(self.date_ranges)
        for fname, (lo, hi) in other.date_ranges.items():
            if fname in dr:
                olo, ohi = dr[fname]
                lo = olo if lo is None else (lo if olo is None else max(lo, olo))
                hi = ohi if hi is None else (hi if ohi is None else min(hi, ohi))
            dr[fname] = (lo, hi)
        return FilterSpec(
            patient_id=self.patient_id or other.patient_id,
            doc_type=self.doc_type if self.doc_type is not None else other.doc_type,
            resource_type=self.resource_type or other.resource_type,
            keyword_terms=kw,
            date_ranges=dr,
            require_embedding=self.require_embedding or other.require_embedding,
        )

    def to_arrays(self) -> dict[str, np.ndarray]:
        kw = np.zeros((N_KEYWORD, MAX_FILTER_VALUES), dtype=np.int32)
        for fname, values in self.keyword_terms.items():
            pos = _KW_POS.get(fname)
            if pos is None:
                continue
            if len(values) > MAX_FILTER_VALUES:
                # fixed-shape device filter: values beyond the cap cannot be
                # OR'd in and their docs would be silently excluded — surface
                # it (merged multi-entity specs can pile up values)
                log.warning("keyword filter %s truncated to %d of %d values",
                            fname, MAX_FILTER_VALUES, len(values))
            for j, v in enumerate(values[:MAX_FILTER_VALUES]):
                kw[pos, j] = stable_hash32(str(v).strip().lower())
        dates = np.zeros((N_DATE, 2), dtype=np.int32)
        dates[:, 0] = np.iinfo(np.int32).min
        dates[:, 1] = np.iinfo(np.int32).max
        has_range = np.zeros((N_DATE,), dtype=bool)
        for fname, (lo, hi) in self.date_ranges.items():
            pos = _DATE_POS.get(fname)
            if pos is None:
                continue
            has_range[pos] = True
            if lo is not None:
                dates[pos, 0] = lo
            if hi is not None:
                dates[pos, 1] = hi
        return {
            "patient": np.int32(stable_hash32(self.patient_id or "")),
            "doc_type": np.int32(-1 if self.doc_type is None else self.doc_type),
            # a REQUESTED-but-unknown resource type must match NOTHING
            # (OpenSearch term semantics) — lowering it to 0 would drop the
            # clause entirely and return every resource type; -1 can never
            # equal a row's code
            "resource": np.int32(
                schema.RESOURCE_TYPE_IDS.get(self.resource_type, -1)
                if self.resource_type else 0
            ),
            "keyword": kw,
            "date_lo_hi": dates,
            "date_has_range": has_range,
            "require_embedding": np.bool_(self.require_embedding),
        }


@partial(jax.jit, donate_argnums=())
def build_filter_mask(cols: dict, spec: dict) -> jax.Array:
    """Additive f32 mask [cap]: 0.0 where the row passes all clauses, -inf otherwise."""
    ok = cols["valid"]
    ok &= (spec["patient"] == 0) | (cols["patient_hash"] == spec["patient"])
    ok &= (spec["doc_type"] < 0) | (cols["doc_type"] == spec["doc_type"])
    ok &= (spec["resource"] == 0) | (cols["resource_type"] == spec["resource"])
    # keyword terms: [cap, n_kw] vs [n_kw, V]
    vals = spec["keyword"]                                    # [n_kw, V]
    has_constraint = jnp.any(vals > 0, axis=1)                # [n_kw]
    match = cols["keyword"][:, :, None] == vals[None, :, :]   # [cap, n_kw, V]
    match &= (vals > 0)[None, :, :]
    field_ok = ~has_constraint[None, :] | jnp.any(match, axis=2)
    ok &= jnp.all(field_ok, axis=1)
    # date ranges: OR across fields that carry a range
    lo = spec["date_lo_hi"][:, 0][None, :]
    hi = spec["date_lo_hi"][:, 1][None, :]
    d = cols["dates"]                                         # [cap, n_date]
    in_range = (d >= lo) & (d <= hi) & (d != schema.NO_DATE)
    any_range = jnp.any(spec["date_has_range"])
    date_ok = ~any_range | jnp.any(in_range & spec["date_has_range"][None, :], axis=1)
    ok &= date_ok
    ok &= ~spec["require_embedding"] | cols["has_embedding"]
    return jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)


class TenantIndex:
    """One user's index: vectors + filter columns on device, sources on host.

    With ``mesh`` (a 1-D ``("shard",)`` jax Mesh), the index serves
    row-sharded across chips: device columns are placed with
    ``NamedSharding(mesh, P("shard"))``, and rows allocate into per-shard
    *regions* by patient hash (``ShardRouter.shard_of``), so a patient-routed
    query can mask every shard but the owner — the reference's ``_routing``
    fast path (main.py:1230) as SPMD metadata.
    """

    def __init__(self, name: str, dim: int, capacity: int = 16384,
                 block_rows: int = 2048, mesh=None):
        self.name = name
        self.dim = dim
        self.block_rows = block_rows
        self.mesh = mesh
        self.n_shards = int(mesh.shape["shard"]) if mesh is not None else 1
        cap = max(block_rows, _round_up(capacity, block_rows))
        self.capacity = _round_up(cap, self.n_shards * block_rows) \
            if self.n_shards > 1 else cap
        self.count = 0
        # host-canonical arrays (device copies derived on flush)
        self._vecs = np.zeros((self.capacity, dim), dtype=np.float32)
        self._patient_hash = np.zeros((self.capacity,), dtype=np.int32)
        self._resource_type = np.zeros((self.capacity,), dtype=np.int32)
        self._doc_type = np.zeros((self.capacity,), dtype=np.int32)
        self._has_embedding = np.zeros((self.capacity,), dtype=bool)
        self._keyword = np.zeros((self.capacity, N_KEYWORD), dtype=np.int32)
        self._dates = np.full((self.capacity, N_DATE), schema.NO_DATE, dtype=np.int32)
        self.docs: list[dict | None] = [None] * self.capacity
        self._id_to_row: dict[str, int] = {}
        self._device: dict | None = None
        self._device_q: dict | None = None  # int8 codes + scales (large corpora)
        self._device_pq4: dict | None = None  # packed 4-bit PQ codes (>int8 budget)
        self._pq4 = None
        self._mask_cache: dict = {}
        # every mutation bumps the generation; each device view records the
        # generation it was flushed at (a shared boolean went stale: refreshing
        # the filter columns must not mark the int8/PQ code views fresh)
        self.generation = 0
        self._flushed = {"cols": -1, "int8": -1, "pq4": -1, "mask": -1}
        self._deleted = np.zeros((self.capacity,), dtype=bool)
        self.deleted_count = 0
        # row-liveness (contiguous low-water in single-device mode; per-shard
        # regions leave holes, so liveness is explicit)
        self._allocated = np.zeros((self.capacity,), dtype=bool)
        rs = self.capacity // self.n_shards
        self._region_next = [s * rs for s in range(self.n_shards)]
        # called with [(old_start, new_start, used)] when a region grow moves
        # rows — external row-id holders (lexical postings) must remap
        self.remap_hooks: list = []
        # append-only log of upserted rows, so derived structures built from a
        # row snapshot (the retriever's IVF cache) can find rows whose vectors
        # changed after the build without rebuilding per upsert
        self._update_log: list[int] = []
        # dense-coded aggregation columns: terms-aggs and distinct-file
        # collapse run as vectorized bincounts instead of Python doc loops
        # (reference aggregate_search main.py:1777-1808, collapse main.py:2143)
        self._agg_cols: dict[str, np.ndarray] = {
            name: np.zeros((self.capacity,), np.int32) for name in AGG_FIELDS
        }
        # per-column dictionary: value string → dense code (0 = absent)
        self._agg_dicts: dict[str, dict[str, int]] = {n: {} for n in AGG_FIELDS}
        self._agg_values: dict[str, list[str | None]] = {n: [None] for n in AGG_FIELDS}

    # --- ingestion -----------------------------------------------------------

    def upsert(self, doc: dict, embedding: np.ndarray | None = None,
               on_move=None) -> int:
        """Index one document (OpenSearch bulk-item equivalent, main.py:1224-1282).

        ``doc`` is the full source dict (structured FHIR fields and/or
        ``unstructuredText``). Embeddings are L2-normalized on write, matching
        main.py:1250-1251. ``on_move(old_row)`` is called when a sharded
        re-upsert relocates the doc to a different shard region, so external
        row-id holders (lexical postings) can evict the tombstoned row.
        """
        doc_id = str(doc.get("doc_id") or "")
        if not doc_id:
            # auto id: monotonic sequence, WRITTEN BACK into the doc — the
            # rebuild paths (compact, sharded grow) re-key _id_to_row from
            # self.docs, so an id that lives only in the map would vanish
            # there; and compaction resets count, so f"doc-{count}" could
            # collide with an existing auto id
            self._auto_id_seq = getattr(self, "_auto_id_seq", 0)
            while f"doc-{self._auto_id_seq}" in self._id_to_row:
                self._auto_id_seq += 1
            doc_id = f"doc-{self._auto_id_seq}"
            self._auto_id_seq += 1
            doc["doc_id"] = doc_id
        row = self._id_to_row.get(doc_id)
        if row is not None and self.n_shards > 1:
            # re-upsert with a different patientId must move shard regions,
            # or routed masks would miss the row (owner-shard invariant)
            rs = self.capacity // self.n_shards
            want = (stable_hash32(str(doc.get("patientId") or ""))
                    % self.n_shards if doc.get("patientId")
                    else row // rs)
            if row // rs != want:
                if on_move is not None:
                    on_move(row)
                self.delete(doc_id)
                self.count -= 1  # delete() dropped it; re-add below
                row = None
        if row is None:
            row = self._alloc_row(doc)
            self.count += 1
            self._id_to_row[doc_id] = row
        self._allocated[row] = True
        self._deleted[row] = False
        self.docs[row] = doc
        if embedding is not None:
            v = np.asarray(embedding, dtype=np.float32).reshape(-1)
            norm = float(np.linalg.norm(v))
            self._vecs[row] = v / norm if norm > 0 else v
            self._has_embedding[row] = norm > 0
        else:
            self._vecs[row] = 0.0
            self._has_embedding[row] = False
        self._patient_hash[row] = stable_hash32(str(doc.get("patientId") or ""))
        self._resource_type[row] = schema.RESOURCE_TYPE_IDS.get(
            str(doc.get("resourceType") or ""), 0
        )
        self._doc_type[row] = (
            schema.DOC_TYPE.UNSTRUCTURED
            if doc.get("doc_type") == "unstructured"
            else schema.DOC_TYPE.STRUCTURED
        )
        for f, pos in _KW_POS.items():
            val = doc.get(f)
            self._keyword[row, pos] = stable_hash32(str(val).strip().lower()) if val else 0
        for f, pos in _DATE_POS.items():
            self._dates[row, pos] = schema.date_to_epoch_days(doc.get(f))
        self.encode_agg(row, doc)
        self._update_log.append(row)
        if len(self._update_log) > UPDATE_LOG_DEDUP_AT:
            # tenants that never take the IVF path (hybrid/lexical-only, or
            # below ann_threshold) would otherwise grow this forever under
            # re-upsert churn; consumers (Retriever._ivf_index) always read
            # the full list and np.unique it, so in-place dedup is lossless
            # and bounds the log at O(distinct live rows)
            self._update_log[:] = np.unique(
                np.asarray(self._update_log, np.int64)).tolist()
        self._mutated()
        return row

    def _mutated(self) -> None:
        self.generation += 1

    def _alloc_row(self, doc: dict) -> int:
        """Next free row: contiguous single-device, patient-region sharded."""
        if self.n_shards == 1:
            if self.count >= self.capacity:
                self._grow()
            return self.count
        shard = stable_hash32(str(doc.get("patientId") or "")) % self.n_shards \
            if doc.get("patientId") else self.count % self.n_shards
        rs = self.capacity // self.n_shards
        if self._region_next[shard] >= (shard + 1) * rs:
            self._grow()
            rs = self.capacity // self.n_shards
        row = self._region_next[shard]
        self._region_next[shard] += 1
        return row

    # --- deletion / compaction -------------------------------------------------
    # The reference delegates deletes to OpenSearch; long-lived mutable tenants
    # here tombstone rows (excluded from every mask) and periodically compact.

    def delete(self, doc_id: str) -> bool:
        """Tombstone one document; False if the id is unknown."""
        row = self._id_to_row.pop(str(doc_id), None)
        if row is None:
            return False
        self.docs[row] = None
        self._deleted[row] = True
        self._allocated[row] = False
        self.deleted_count += 1
        self._vecs[row] = 0.0
        self._has_embedding[row] = False
        self._patient_hash[row] = 0
        self._resource_type[row] = 0
        self._keyword[row] = 0
        self._dates[row] = schema.NO_DATE
        for col in self._agg_cols.values():
            col[row] = 0
        self._mutated()
        return True

    def compact(self) -> np.ndarray:
        """Drop tombstoned rows in place; → kept old-row ids (in new-row order).

        Lexical postings reference row ids, so the caller must rebuild its
        LexicalIndex from the surviving docs (engine.compact_tenant). In
        sharded mode each region compacts to its own start, preserving
        patient→shard placement.
        """
        rs = self.capacity // self.n_shards
        all_keep: list[np.ndarray] = []
        row_arrays = [getattr(self, n) for n in self._row_arrays()
                      if n not in ("_deleted", "_allocated")]
        fills = {id(self._dates): schema.NO_DATE}
        for s in range(self.n_shards):
            if self.n_shards == 1:
                lo, hi = 0, self.count
            else:
                lo, hi = s * rs, self._region_next[s]
            keep = np.asarray([r for r in range(lo, hi)
                               if self.docs[r] is not None
                               and not self._deleted[r]], dtype=np.int64)
            n_new = keep.size
            for arr in row_arrays:
                arr[lo: lo + n_new] = arr[keep]
                arr[lo + n_new: hi] = fills.get(id(arr), 0)
            for col in self._agg_cols.values():
                col[lo: lo + n_new] = col[keep]
                col[lo + n_new: hi] = 0
            kept_docs = [self.docs[r] for r in keep]
            self.docs[lo: lo + n_new] = kept_docs
            for r in range(lo + n_new, hi):
                self.docs[r] = None
            self._allocated[lo: lo + n_new] = True
            self._allocated[lo + n_new: hi] = False
            if self.n_shards > 1:
                self._region_next[s] = lo + n_new
            all_keep.append(keep)
        self._id_to_row = {str(d.get("doc_id")): r
                           for r, d in enumerate(self.docs) if d is not None}
        self.count = sum(k.size for k in all_keep)
        self._deleted[:] = False
        self.deleted_count = 0
        self._update_log.clear()  # row ids changed; IVF caches reset anyway
        self._mutated()
        return np.concatenate(all_keep) if all_keep else np.zeros(0, np.int64)

    def encode_agg(self, row: int, doc: dict) -> None:
        """Dictionary-encode the aggregation columns for one row."""
        for name, keys in AGG_FIELDS.items():
            val = next((doc.get(k) for k in keys if doc.get(k)), None)
            if val is None:
                self._agg_cols[name][row] = 0
                continue
            val = str(val)
            d = self._agg_dicts[name]
            code = d.get(val)
            if code is None:
                code = len(self._agg_values[name])
                d[val] = code
                self._agg_values[name].append(val)
            self._agg_cols[name][row] = code

    def agg_buckets(self, name: str, mask: np.ndarray, size: int = 5) -> dict:
        """Terms aggregation over one dense-coded column (vectorized bincount;
        the reference's terms aggs, main.py:1786-1800). Ties break by key asc
        like OpenSearch."""
        codes = self._agg_cols[name][mask]
        counts = np.bincount(codes, minlength=len(self._agg_values[name]))
        counts[0] = 0  # code 0 = field absent
        nz = np.nonzero(counts)[0]
        vals = self._agg_values[name]
        top = sorted(((vals[c], int(counts[c])) for c in nz),
                     key=lambda kv: (-kv[1], kv[0]))[:size]
        return {"buckets": [{"key": k, "doc_count": n} for k, n in top]}

    def distinct_first_rows(self, name: str, mask: np.ndarray, k: int) -> np.ndarray:
        """First row (in row order) of each distinct value of an agg column
        within ``mask`` — the vectorized collapse for document_fetch_search."""
        rows = np.nonzero(mask)[0]
        if rows.size == 0:
            return rows
        codes = self._agg_cols[name][rows]
        _, first = np.unique(codes, return_index=True)
        first.sort()
        return rows[first[:k]]

    def upsert_batch(self, docs: list[dict], embeddings: np.ndarray | None = None) -> int:
        n = 0
        for i, doc in enumerate(docs):
            emb = None
            if embeddings is not None and doc.get("doc_type") == "unstructured":
                emb = embeddings[i]
            self.upsert(doc, emb)
            n += 1
        return n

    def _row_arrays(self) -> tuple[str, ...]:
        return ("_vecs", "_patient_hash", "_resource_type", "_doc_type",
                "_has_embedding", "_keyword", "_dates", "_deleted",
                "_allocated")

    def _grow(self) -> None:
        new_cap = self.capacity * 2
        fills = {"_dates": schema.NO_DATE}
        if self.n_shards == 1:
            for name in self._row_arrays():
                setattr(self, name,
                        _pad_rows(getattr(self, name), new_cap,
                                  fill=fills.get(name, 0)))
            self._agg_cols = {n: _pad_rows(c, new_cap)
                              for n, c in self._agg_cols.items()}
            self.docs.extend([None] * (new_cap - self.capacity))
        else:
            # region mode: each shard's rows move to its doubled region
            old_rs = self.capacity // self.n_shards
            new_rs = new_cap // self.n_shards
            moves = []  # (old_start, new_start, used)
            for s in range(self.n_shards):
                used = self._region_next[s] - s * old_rs
                moves.append((s * old_rs, s * new_rs, used))
            for name in self._row_arrays():
                old = getattr(self, name)
                new = np.full((new_cap,) + old.shape[1:],
                              fills.get(name, 0), dtype=old.dtype)
                for o, nn, used in moves:
                    new[nn: nn + used] = old[o: o + used]
                setattr(self, name, new)
            new_aggs = {}
            for cname, col in self._agg_cols.items():
                new = np.zeros(new_cap, col.dtype)
                for o, nn, used in moves:
                    new[nn: nn + used] = col[o: o + used]
                new_aggs[cname] = new
            self._agg_cols = new_aggs
            new_docs: list[dict | None] = [None] * new_cap
            for o, nn, used in moves:
                new_docs[nn: nn + used] = self.docs[o: o + used]
            self.docs = new_docs
            self._region_next = [nn + used for _o, nn, used in moves]
            self._id_to_row = {
                str(d.get("doc_id")): r for r, d in enumerate(self.docs)
                if d is not None
            }
            for hook in self.remap_hooks:
                hook(moves)
        self.capacity = new_cap
        self._device = None
        self._device_q = None
        self._device_pq4 = None
        self._mutated()

    # --- device view ---------------------------------------------------------

    def device_columns(self, include_vecs: bool = True) -> dict:
        """Upload (or refresh) the device-resident arrays.

        ``include_vecs=False`` keeps the bf16 rows off-device (the int8 scan
        path owns the HBM vector budget at 10M-scale; exact re-rank reads the
        host-canonical f32 rows instead).
        """
        if self._device is not None and self._flushed["cols"] == self.generation:
            if include_vecs and "vecs" not in self._device:
                # MUST go through _put_rows like the fresh path below: a
                # plain jnp.asarray lands the full bf16 corpus un-sharded on
                # one device — jit reshards it per dispatch and a
                # beyond-one-chip corpus OOMs
                self._device["vecs"] = self._put_rows(
                    jnp.asarray(self._vecs, dtype=STORE_DTYPE)
                    if self.mesh is None else self._vecs.astype(STORE_DTYPE))
            return self._device
        valid = self._allocated & ~self._deleted
        put = self._put_rows
        self._device = {
            "valid": put(valid),
            "patient_hash": put(self._patient_hash),
            "resource_type": put(self._resource_type),
            "doc_type": put(self._doc_type),
            "has_embedding": put(self._has_embedding),
            "keyword": put(self._keyword),
            "dates": put(self._dates),
        }
        if include_vecs:
            self._device["vecs"] = put(
                jnp.asarray(self._vecs, dtype=STORE_DTYPE)
                if self.mesh is None else self._vecs.astype(STORE_DTYPE))
        self._flushed["cols"] = self.generation
        return self._device

    def _put_rows(self, arr: np.ndarray):
        """Upload a [cap, ...] array — row-sharded over the mesh when set."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(self.mesh, P("shard")))

    def device_columns_pq4(self, bytes_per_vec: int) -> dict:
        """Packed 4-bit PQ codes + codebooks on device (index/pq4.py) — the
        scan view for corpora whose rows never touch HBM (beyond the int8
        budget). Codebooks train once and retrain when the corpus doubles;
        codes re-encode per index generation.

        Besides the XLA-scan columns (packed/assign), the view carries the
        fused-kernel layout (ops/fused_pq4.py): assignment-augmented codes
        sorted by coarse cluster (``aug_sorted``), the sort permutation
        (``order``, sorted position → row), and per-block 128-aligned LUT
        window starts (``win_starts``; None when some block spans more than
        ``win_width`` clusters and the kernel must use full-width coarse).
        """
        if (self._device_pq4 is not None
                and self._flushed["pq4"] == self.generation):
            return self._device_pq4
        from rassengine_tpu.index.pq4 import Pq4Index
        from rassengine_tpu.ops.fused_pq4 import (augment_packed,
                                                  sort_for_window)

        self.device_columns(include_vecs=False)  # refresh filter columns
        m_sub = Pq4Index.subvectors_for(self.dim, bytes_per_vec)
        pq = self._pq4
        if (pq is None or pq.m_sub != m_sub
                or self.count > 2 * max(pq.trained_count, 1)):
            pq = Pq4Index.build(self._vecs, m_sub, count=self.count)
            self._pq4 = pq
        else:
            pq.packed, pq.assign, pq.resid_norm = pq.encode(
                self._vecs, 0, self.capacity)
        nlist_pad = ((pq.coarse.shape[0] + 127) // 128) * 128
        rs = self.capacity // self.n_shards
        br = next((b for b in (1024, 512, 256, 128) if rs % b == 0),
                  self.block_rows)
        br = min(br, rs)
        win_width = min(512, nlist_pad)
        # per-REGION cluster sort so row-shard partitioning is preserved:
        # each shard's rows stay inside its region, just reordered
        orders, wins_parts = [], []
        windowed = True
        for s in range(self.n_shards):
            o_r, w_r = sort_for_window(pq.assign[s * rs:(s + 1) * rs], br,
                                       nlist_pad, win_width)
            orders.append(o_r + s * rs)
            if w_r is None:
                windowed = False
            else:
                wins_parts.append(w_r)
        order = np.concatenate(orders)
        wins = np.concatenate(wins_parts) if windowed else None
        aug = augment_packed(pq.packed[order], pq.assign[order])
        # tight per-block branch-and-bound inputs (ops/fused_pq4 docstring):
        # exact window start (block's min cluster id) + max decoded-residual
        # norm over the block's rows
        a_sorted = pq.assign[order]
        nb_total = self.capacity // br
        win_lo = a_sorted.reshape(nb_total, br).min(axis=1).astype(np.int32)
        block_resid = pq.resid_norm[order].reshape(nb_total, br).max(
            axis=1).astype(np.float32)
        put = self._put_rows
        self._device_pq4 = {
            "packed": jnp.asarray(pq.packed),
            "assign": jnp.asarray(pq.assign),
            "codebooks": jnp.asarray(pq.codebooks),
            "coarse": jnp.asarray(pq.coarse),
            "aug_sorted": put(aug),
            "order": order,  # host np: sorted position → original row
            "win_starts": put(wins) if wins is not None else None,
            "win_lo": put(win_lo),
            "block_resid": put(block_resid),
            "win_width": win_width if wins is not None else 0,
            "nlist_pad": nlist_pad,
            "block_rows": br,
        }
        self._flushed["pq4"] = self.generation
        return self._device_pq4

    def device_columns_int8(self) -> dict:
        """int8 codes + per-row scales for the quantized scan (index/quant.py).

        Halves HBM residency vs bf16 — the path for corpora near HBM capacity
        (10M×1024-d). Rebuilt lazily when the index mutates.
        """
        if self._device_q is not None and self._flushed["int8"] == self.generation:
            return self._device_q
        from rassengine_tpu.index.quant import quantize_int8_block

        # refresh filter columns; keep bf16 rows off-device (int8 owns HBM)
        self.device_columns(include_vecs=False)
        # per-BLOCK scales: codes within a block share one scale, enabling
        # the all-integer Pallas epilogue (ops/fused_topk.py). "scales"
        # stays per-row (broadcast) so every per-row-scale consumer — XLA
        # int8_scan_topm, sharded local scans — dequantizes unchanged.
        codes, bscales = quantize_int8_block(self._vecs, self.block_rows)
        self._device_q = {
            "codes": self._put_rows(codes),
            "scales": self._put_rows(np.repeat(bscales, self.block_rows)),
            "block_scales": jnp.asarray(bscales),
            "scale_block_rows": self.block_rows,
        }
        self._flushed["int8"] = self.generation
        return self._device_q

    def filter_mask(self, spec: FilterSpec | None) -> jax.Array:
        spec_arrays = (spec or FilterSpec()).to_arrays()
        # cache per (index generation, spec): the common no-filter / per-patient
        # masks are reused on every query of a serving session
        key = tuple(np.asarray(v).tobytes() for v in spec_arrays.values())
        if self._flushed["mask"] == self.generation:
            cached = self._mask_cache.get(key)
            if cached is not None:
                return cached
        else:
            self._mask_cache.clear()
            self._flushed["mask"] = self.generation
        cols = self.device_columns(include_vecs=False)
        spec_dev = {k: jnp.asarray(v) for k, v in spec_arrays.items()}
        mask = build_filter_mask(
            {k: cols[k] for k in (
                "valid", "patient_hash", "resource_type", "doc_type",
                "has_embedding", "keyword", "dates",
            )},
            spec_dev,
        )
        if len(self._mask_cache) > 64:
            self._mask_cache.clear()
        self._mask_cache[key] = mask
        return mask

    def host_mask(self, spec: FilterSpec | None) -> np.ndarray:
        """Numpy mirror of build_filter_mask (bool [cap]) for host-side scoring."""
        s = (spec or FilterSpec()).to_arrays()
        ok = self._allocated & ~self._deleted
        if s["patient"] != 0:
            ok &= self._patient_hash == s["patient"]
        if s["doc_type"] >= 0:
            ok &= self._doc_type == s["doc_type"]
        if s["resource"] != 0:
            ok &= self._resource_type == s["resource"]
        vals = s["keyword"]
        for pos in np.nonzero(np.any(vals > 0, axis=1))[0]:
            vv = vals[pos][vals[pos] > 0]
            ok &= np.isin(self._keyword[:, pos], vv)
        if np.any(s["date_has_range"]):
            any_ok = np.zeros(self.capacity, bool)
            for pos in np.nonzero(s["date_has_range"])[0]:
                d = self._dates[:, pos]
                any_ok |= (d != schema.NO_DATE) & (d >= s["date_lo_hi"][pos, 0]) & (
                    d <= s["date_lo_hi"][pos, 1]
                )
            ok &= any_ok
        if s["require_embedding"]:
            ok &= self._has_embedding
        return ok

    def has_any_data(self) -> bool:
        """Reference OpenSearchIndexer.has_any_data (main.py:1470)."""
        return self.count > 0

    def sources(self, rows: np.ndarray) -> list[dict | None]:
        return [self.docs[int(r)] if 0 <= int(r) < self.capacity else None for r in rows]

    def iter_live(self):
        """Yield ``(doc, embedding | None)`` for every live (non-tombstoned)
        row — the source side of a re-placement (reshard, checkpoint)."""
        for row in np.nonzero(self._allocated & ~self._deleted)[0]:
            yield (self.docs[row],
                   self._vecs[row] if self._has_embedding[row] else None)


def replace_rows(index: "TenantIndex", lexical, pairs) -> int:
    """Re-place ``(doc, embedding | None)`` pairs into a FRESH index/lexical
    pair, routing each doc into its patient's shard region under the index's
    mesh. The one re-placement loop shared by live reshard
    (engine.reshard) and checkpoint restore (checkpoint.load_tenant) — any
    per-row column added to upsert/index_doc flows to both automatically.
    → number of docs placed."""
    n = 0
    for doc, emb in pairs:
        row = index.upsert(doc, emb)
        lexical.index_doc(row, doc)
        n += 1
    return n


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(a: np.ndarray, new_cap: int, fill=0) -> np.ndarray:
    out = np.full((new_cap,) + a.shape[1:], fill, dtype=a.dtype)
    out[: a.shape[0]] = a
    return out
