"""Device-resident BM25 postings + fused hybrid top-k (the hybrid hot path).

Replaces the reference's per-query OpenSearch ``multi_match`` BM25 round-trip
(app/main.py:1562-1615) with a TPU-resident design: at flush time every
posting's *full* BM25 contribution — idf · wtf·(k1+1)/(wtf + k1·(1−b+b·dl/avgdl))
— is precomputed host-side (it depends only on corpus statistics, not the
query) and shipped to HBM as **chunk-aligned** CSR arrays:

    rows2d    int32 [NC, C]   document row per posting (SENTINEL = pad)
    contrib2d f32   [NC, C]   that posting's BM25 contribution (0 = pad)

with a host dict ``(group, term) → ((chunk_start, n_postings), …)`` segments.
Each segment starts on a chunk boundary and is **impact-ordered**
(contribution descending), so truncating a query's posting budget keeps the
highest-scoring docs, and the device never needs per-element index
arithmetic: a query's postings are a *row gather of whole chunks* — the
memory shape TPUs are fast at (an element gather measured 16 ms for a
256×1024 expand; the chunk gather is ~0.1 ms).

Mutations: pure appends flush **incrementally** — only the new postings ship
as appended chunks (an extra segment per touched term; O(touched) host work,
O(delta) upload, one HBM-side concatenate), with a stats-drift guard that
falls back to a full rebuild when idf/avgdl move >10% or anything was
deleted/remapped (``_flush_delta`` / ``_delta_ok``).

A query batch costs O(#terms) host dict lookups; the batch then runs as ONE
jitted dispatch (``hybrid_topk_batch``) — per-dispatch overhead on remote-TPU
links is ~ms, so stage-per-dispatch designs lose even when every stage is µs:

1. gather the chunk postings, sort by doc row, and run-sum duplicate rows
   (one doc hit by several terms) with cumsum + prefix-max — log-depth VPU
   scans, no scatter/segment ops (TPU scatters serialize);
2. the Pallas pooled corpus scan (ops/fused_topk.py) for semantic top-m;
3. exact additive fusion ``w_sem·cos + Σ w_g·bm25_g`` over two candidate
   branches: BM25 top-M rows (exact cosine via a [B, M, d] corpus-row gather
   + einsum) and semantic top-m rows (cosine from the scan, BM25 by binary
   search in the sorted sparse rows). A fused-top-k doc is provably covered
   whenever its BM25 rank ≤ M or its cosine rank ≤ m — misses need a doc
   mediocre in *both* signals yet top-k combined (measured recall 1.0 vs the
   exact fused oracle at M=128/m=64/k=5 on 1M rows; gated in bench.py).

Host BM25 (lexical/bm25.py) remains the reference oracle and the path for the
lexical-only strategies; parity is tested in tests/test_device_bm25.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rassengine_tpu.lexical.bm25 import _G, B, K1, LexicalIndex, analyze

NEG_INF = -1.0e30
SENTINEL = np.int32(2**30)  # "no row": sorts after every real doc row

CHUNK = 128                  # postings per chunk (one gather row)
SMIN, SMAX = 4, 128          # chunks-per-query buckets: maxp = S*CHUNK
PACK_SENTINEL = np.uint32(0xFFFFFF)  # 24-bit pad row in the packed layout


class GroupView:
    """Flushed device postings for one tuple of field groups.

    Two HBM layouts (``tables`` abstracts over them for the device stage):

    - dense: ``rows2d`` int32 + ``contrib2d`` f32 — 8 B/posting, exact.
    - packed (ROADMAP r3 "compressed postings"): ``packed2d`` uint32 holding
      ``row (24 bits) | contrib-code (8 bits)`` + per-chunk affine decode
      arrays ``base``/``step`` f32 [NC] — 4 B/posting, halving both HBM
      residency and per-query gather bandwidth. Chunks are impact-ordered
      (contribution descending within a segment), so each chunk spans a
      narrow contribution range and the 8-bit affine code's error is bounded
      by (chunk max − chunk min)/510 — ~0.2% of a term's score in practice.
      Rows must fit 24 bits (<16.7M; the flush falls back to dense beyond).
    """

    __slots__ = ("rows2d", "contrib2d", "packed2d", "base", "step", "terms",
                 "generation", "chunk_group", "_wvecs", "flushed_len",
                 "destructive_gen", "n_docs0", "avgdl0")

    def __init__(self, rows2d: jax.Array, contrib2d: jax.Array,
                 terms: dict[tuple[str, str], tuple[tuple[int, int], ...]],
                 generation: int, chunk_group: np.ndarray,
                 flushed_len: dict[str, int], destructive_gen: int,
                 n_docs0: int, avgdl0: dict[str, float],
                 packed2d: jax.Array | None = None,
                 base: jax.Array | None = None,
                 step: jax.Array | None = None):
        self.rows2d = rows2d
        self.contrib2d = contrib2d
        self.packed2d = packed2d
        self.base = base
        self.step = step
        # (group, term) → ((chunk_start, n_postings), ...) segments: one from
        # the full flush plus one per delta flush since (impact order holds
        # within a segment; plan() walks them in append order)
        self.terms = terms
        self.generation = generation
        self.chunk_group = chunk_group  # [NC] group index per chunk (host)
        self._wvecs: dict[tuple[float, ...], jax.Array] = {}
        # delta-flush baseline: raw postings length per term at last flush,
        # the destructive generation this table is valid for, and the corpus
        # stats the flushed contributions were computed with (drift guard)
        self.flushed_len = flushed_len
        self.destructive_gen = destructive_gen
        self.n_docs0 = n_docs0
        self.avgdl0 = avgdl0

    @property
    def tables(self) -> tuple:
        """Device arrays for the sparse-score stage: ``(rows2d, contrib2d)``
        dense or ``(packed2d, base, step)`` packed — the tuple *structure*
        selects the jit variant (no static flag needed)."""
        if self.packed2d is not None:
            return (self.packed2d, self.base, self.step)
        return (self.rows2d, self.contrib2d)

    def weight_vector(self, groups: tuple[str, ...],
                      group_weights: dict[str, float]) -> jax.Array:
        """Per-chunk strategy weight [NC], cached on device.

        A chunk's weight depends only on its field group, so per-batch uploads
        carry chunk ids alone (each host→device transfer costs ~3 ms on a
        tunneled chip; one 8 KB upload per batch is the floor)."""
        key = tuple(group_weights.get(g, 0.0) for g in groups)
        w = self._wvecs.get(key)
        if w is None:
            lut = np.asarray([0.0] + list(key), np.float32)  # group 0 = pad
            w = jnp.asarray(lut[self.chunk_group])
            self._wvecs[key] = w
        return w


class DeviceLexical:
    """Lazy device mirror of a host LexicalIndex, re-flushed on mutation.

    Bigram (phrase) postings are excluded from the flushed views — the hybrid
    strategies score unigrams (reference multi_match best_fields semantics);
    phrase strategies stay on the host scorer.
    """

    def __init__(self, lexical: LexicalIndex, packed: bool = False):
        self.lexical = lexical
        # request the 4 B/posting packed layout (GroupView docstring); each
        # flush still falls back to dense when any row exceeds 24 bits
        self.packed = packed
        self._views: dict[tuple[str, ...], GroupView] = {}
        # per-query chunk-list cache (generation-keyed): repeated queries skip
        # tokenization + dict walks on the hot path
        self._plan_cache: dict[tuple, list[int]] = {}
        self._plan_gen = -1

    # full rebuild triggers for an append-only delta: corpus stats baked into
    # the flushed contributions may drift this far before the table rebuilds
    # (BM25 idf/avgdl are corpus-global, so appends leave old chunks computed
    # with slightly stale stats — bounded-error by construction)
    STATS_DRIFT = 0.10

    def view(self, groups: tuple[str, ...]) -> GroupView:
        v = self._views.get(groups)
        if v is not None and v.generation == self.lexical.generation:
            return v
        if v is not None and self._delta_ok(v):
            v = self._flush_delta(groups, v)
        else:
            v = self._flush(groups)
        self._views[groups] = v
        return v

    def _delta_ok(self, v: GroupView) -> bool:
        """Append-only since last flush AND corpus stats within drift bound."""
        lex = self.lexical
        if v.destructive_gen != lex.destructive_generation:
            return False
        n0 = max(v.n_docs0, 1)
        if abs(lex._n_docs - v.n_docs0) > self.STATS_DRIFT * n0:
            return False
        for gname, a0 in v.avgdl0.items():
            _n, a1 = lex._group_stats(_G[gname])
            if a0 > 0 and abs(a1 - a0) > self.STATS_DRIFT * a0:
                return False
        return True

    @staticmethod
    def _term_chunks(rows: np.ndarray, wtf: np.ndarray, dl_col: np.ndarray,
                     n: int, avgdl: float,
                     df: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        """One term-group's postings → impact-ordered chunk-padded arrays.

        ``df`` overrides the document frequency for the idf term — a delta
        flush passes the term's TOTAL live count (its ``rows`` hold only the
        appended postings)."""
        df = rows.size if df is None else df
        idf = float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        dl = dl_col[rows]
        denom = wtf + K1 * (1.0 - B + B * dl / avgdl)
        contrib = (idf * (wtf * (K1 + 1.0)) / np.maximum(denom, 1e-9)
                   ).astype(np.float32)
        order = np.argsort(-contrib, kind="stable")  # impact order
        pad = (-rows.size) % CHUNK
        r = np.full(rows.size + pad, SENTINEL, np.int32)
        c = np.zeros(rows.size + pad, np.float32)
        r[: rows.size] = rows[order]
        c[: rows.size] = contrib[order]
        return r, c

    @staticmethod
    def _pack_chunks(rows2d: np.ndarray, contrib2d: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """[NC, C] dense host chunks → (packed2d uint32, base f32, step f32).

        Per-chunk affine 8-bit code over the REAL entries' range (pads carry
        row 0xFFFFFF and decode to exactly 0 on device)."""
        real = rows2d != SENTINEL
        c = np.where(real, contrib2d, np.inf)
        lo = np.where(real.any(axis=1), c.min(axis=1), 0.0).astype(np.float32)
        c = np.where(real, contrib2d, -np.inf)
        hi = np.where(real.any(axis=1), c.max(axis=1), 0.0).astype(np.float32)
        step = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
        code = np.clip(np.rint((contrib2d - lo[:, None]) / step[:, None]),
                       0, 255).astype(np.uint32)
        rows_u = np.where(real, rows2d, PACK_SENTINEL).astype(np.uint32)
        return rows_u | (code << 24), lo, step

    def _flush(self, groups: tuple[str, ...]) -> GroupView:
        lex = self.lexical
        n = max(1, lex._n_docs)
        # chunk 0 is the all-pad chunk unused query slots point at
        rows_parts: list[np.ndarray] = [np.full(CHUNK, SENTINEL, np.int32)]
        contrib_parts: list[np.ndarray] = [np.zeros(CHUNK, np.float32)]
        terms: dict[tuple[str, str], tuple[tuple[int, int], ...]] = {}
        chunk_groups: list[int] = [0]  # chunk 0 = pad
        chunk_off = 1
        flushed_len: dict[str, int] = {}
        avgdl0: dict[str, float] = {}
        for gi, gname in enumerate(groups, start=1):
            g = _G[gname]
            _n, avgdl = lex._group_stats(g)
            avgdl0[gname] = avgdl
            dl_col = lex._doc_len[:, g]
            for t, p in lex._postings.items():
                if "_" in t:  # bigram postings: host phrase scoring only
                    continue
                flushed_len[t] = p.n
                rows_all, wtf_all = p.finalize()
                wtf = wtf_all[:, g]
                live = wtf > 0
                if not live.any():
                    continue
                r, c = self._term_chunks(rows_all[live], wtf[live], dl_col,
                                         n, avgdl)
                rows_parts.append(r)
                contrib_parts.append(c)
                terms[(gname, t)] = ((chunk_off, int(live.sum())),)
                n_ch = r.size // CHUNK
                chunk_groups.extend([gi] * n_ch)
                chunk_off += n_ch
        rows2d = np.concatenate(rows_parts).reshape(-1, CHUNK)
        contrib2d = np.concatenate(contrib_parts).reshape(-1, CHUNK)
        real_rows = rows2d[rows2d != SENTINEL]
        if self.packed and (real_rows < int(PACK_SENTINEL)).all():
            packed2d, base, step = self._pack_chunks(rows2d, contrib2d)
            return GroupView(None, None, terms, lex.generation,
                             np.asarray(chunk_groups, np.int32),
                             flushed_len, lex.destructive_generation,
                             lex._n_docs, avgdl0,
                             packed2d=jnp.asarray(packed2d),
                             base=jnp.asarray(base), step=jnp.asarray(step))
        return GroupView(jnp.asarray(rows2d), jnp.asarray(contrib2d),
                         terms, lex.generation,
                         np.asarray(chunk_groups, np.int32),
                         flushed_len, lex.destructive_generation,
                         lex._n_docs, avgdl0)

    def _flush_delta(self, groups: tuple[str, ...], v: GroupView) -> GroupView:
        """Append-only incremental flush (ROADMAP #4): ship ONLY the postings
        added since ``v`` was built as new chunks appended to the device CSR.

        Host work is O(touched terms) instead of O(vocab) and the H2D upload
        is O(delta); the device-side concatenate copies HBM→HBM at memory
        bandwidth (~µs/MB), orders of magnitude cheaper than re-uploading the
        table through the tunnel. New chunks use CURRENT idf/dl stats while
        old chunks keep the stats they were flushed with — the error is
        bounded by the ``STATS_DRIFT`` rebuild guard in ``_delta_ok``.
        """
        lex = self.lexical
        n = max(1, lex._n_docs)
        touched = [t for t, gen in lex._touched.items()
                   if gen > v.generation and "_" not in t]
        rows_parts: list[np.ndarray] = []
        contrib_parts: list[np.ndarray] = []
        chunk_groups: list[int] = []
        terms = dict(v.terms)
        flushed_len = dict(v.flushed_len)
        chunk_off = int(v.chunk_group.shape[0])
        for gi, gname in enumerate(groups, start=1):
            g = _G[gname]
            _n, avgdl = lex._group_stats(g)
            dl_col = lex._doc_len[:, g]
            for t in touched:
                p = lex._postings.get(t)
                if p is None:
                    continue
                start = v.flushed_len.get(t, 0)
                rows_new = p.rows[start:]
                if rows_new.size == 0:
                    continue
                wtf_all = p.wtf[:, g]
                wtf = wtf_all[start:]
                live = wtf > 0
                if not live.any():
                    continue
                r, c = self._term_chunks(rows_new[live], wtf[live], dl_col,
                                         n, avgdl,
                                         df=int((wtf_all > 0).sum()))
                rows_parts.append(r)
                contrib_parts.append(c)
                terms[(gname, t)] = terms.get((gname, t), ()) + (
                    (chunk_off, int(live.sum())),)
                n_ch = r.size // CHUNK
                chunk_groups.extend([gi] * n_ch)
                chunk_off += n_ch
        for t in touched:
            p = lex._postings.get(t)
            if p is not None:
                flushed_len[t] = p.n
        if not rows_parts:  # touched terms had no live postings for groups
            return GroupView(v.rows2d, v.contrib2d, terms, lex.generation,
                             v.chunk_group, flushed_len, v.destructive_gen,
                             v.n_docs0, v.avgdl0, packed2d=v.packed2d,
                             base=v.base, step=v.step)
        new_rows = np.concatenate(rows_parts).reshape(-1, CHUNK)
        new_contrib = np.concatenate(contrib_parts).reshape(-1, CHUNK)
        chunk_group = np.concatenate([v.chunk_group,
                                      np.asarray(chunk_groups, np.int32)])
        real_rows = new_rows[new_rows != SENTINEL]
        if (v.packed2d is not None
                and (real_rows < int(PACK_SENTINEL)).all()):
            p, lo, st = self._pack_chunks(new_rows, new_contrib)
            return GroupView(None, None, terms, lex.generation, chunk_group,
                             flushed_len, v.destructive_gen, v.n_docs0,
                             v.avgdl0,
                             packed2d=jnp.concatenate([v.packed2d,
                                                       jnp.asarray(p)]),
                             base=jnp.concatenate([v.base, jnp.asarray(lo)]),
                             step=jnp.concatenate([v.step, jnp.asarray(st)]))
        if v.packed2d is not None:
            # a delta row outgrew 24 bits: full reflush (its own row check
            # falls back to the dense layout)
            return self._flush(groups)
        rows2d = jnp.concatenate([v.rows2d, jnp.asarray(new_rows)])
        contrib2d = jnp.concatenate([v.contrib2d, jnp.asarray(new_contrib)])
        return GroupView(rows2d, contrib2d, terms, lex.generation,
                         chunk_group, flushed_len, v.destructive_gen,
                         v.n_docs0, v.avgdl0)

    # --- host query planning ---------------------------------------------------

    def plan(self, queries: list[str], group_weights: dict[str, float]
             ) -> tuple[np.ndarray, GroupView, jax.Array]:
        """Queries → (chunk_ids [B, S], view, weight_vector [NC]).

        O(#terms) dict lookups per query (cached per generation for repeated
        queries) — the only per-query host work on the hybrid hot path.
        Unused slots point at the all-pad chunk 0. S is bucketed to a power of
        two (bounded jit cache); a query needing more chunks than SMAX·CHUNK
        postings is truncated, and impact ordering makes that an
        early-termination, not a quality cliff. Per-chunk strategy weights
        live on device (GroupView.weight_vector), so the per-batch upload is
        chunk ids alone.
        """
        groups = tuple(group_weights)
        view = self.view(groups)
        if self._plan_gen != view.generation:
            self._plan_cache.clear()
            self._plan_gen = view.generation
        per_q: list[list[int]] = []
        max_s = 1
        for q in queries:
            key = (groups, q)
            chunks = self._plan_cache.get(key)
            if chunks is None:
                terms = list(dict.fromkeys(analyze(q)))
                # reference hybrid multi_match uses fuzziness AUTO
                # (main.py:1582): expand out-of-vocab (typo) terms to their
                # edit-distance-1 vocabulary neighbors at plan time
                for t in list(terms):
                    if t not in self.lexical._postings:
                        terms.extend(self.lexical.fuzzy_expand(t))
                chunks = []
                for gname in groups:
                    for t in dict.fromkeys(terms):
                        for start, n_post in view.terms.get((gname, t), ()):
                            chunks.extend(range(
                                start, start + (n_post + CHUNK - 1) // CHUNK))
                chunks = chunks[:SMAX]
                self._plan_cache[key] = chunks
            max_s = max(max_s, len(chunks))
            per_q.append(chunks)
        if len(self._plan_cache) > 100_000:
            self._plan_cache.clear()
        s_cap = SMIN
        while s_cap < max_s:
            s_cap *= 2
        chunk_ids = np.zeros((len(queries), s_cap), np.int32)
        for i, chunks in enumerate(per_q):
            chunk_ids[i, : len(chunks)] = chunks
        return chunk_ids, view, view.weight_vector(groups, group_weights)


# --- device pipeline -----------------------------------------------------------


def _lex_scores_body(rows2d, contrib2d, chunk_ids, wvec):
    """Per-query sparse BM25: → (rows [B, S·C] ascending, scores [B, S·C]).

    Chunk row-gather, sort by doc row, run-sum duplicates (same doc hit by
    several terms, adjacent after the sort) via cumsum + prefix-max — no
    scatter/segment ops. Rows may repeat: only the LAST duplicate carries the
    doc's total score (earlier ones are NEG_INF); pads carry SENTINEL rows.
    ``wvec`` is the [NC] per-chunk strategy weight (GroupView.weight_vector).
    """
    bn, s = chunk_ids.shape
    # flatten the index array before gathering: a [B, S] batched row gather
    # lowers ~3× slower than the identical [B·S] flat gather (measured 6.5 ms
    # vs 2.2 ms for 2048×128 rows on v5e)
    flat = chunk_ids.reshape(-1)
    chunk_w = wvec[flat].reshape(bn, s)
    drow = rows2d[flat].reshape(bn, s * CHUNK)
    val = (contrib2d[flat].reshape(bn, s, CHUNK)
           * chunk_w[:, :, None]).reshape(bn, s * CHUNK)
    return _sort_run_sum(drow, val, bn)


def _lex_scores_body_packed(packed2d, base, step, chunk_ids, wvec):
    """Packed-layout sparse BM25: gather 4 B/posting chunks, affine-decode
    AFTER the gather (GroupView docstring), then the same sort + run-sum.
    Pads (24-bit row 0xFFFFFF) decode to row SENTINEL and value exactly 0."""
    bn, s = chunk_ids.shape
    flat = chunk_ids.reshape(-1)
    chunk_w = wvec[flat].reshape(bn, s)
    pv = packed2d[flat]                                     # [B·S, C] uint32
    row_u = pv & jnp.uint32(0xFFFFFF)
    is_pad = row_u == jnp.uint32(0xFFFFFF)
    drow = jnp.where(is_pad, SENTINEL,
                     row_u.astype(jnp.int32)).reshape(bn, s * CHUNK)
    code = (pv >> 24).astype(jnp.float32)
    dec = base[flat][:, None] + code * step[flat][:, None]
    dec = jnp.where(is_pad, 0.0, dec)
    val = (dec.reshape(bn, s, CHUNK)
           * chunk_w[:, :, None]).reshape(bn, s * CHUNK)
    return _sort_run_sum(drow, val, bn)


def _sort_run_sum(drow, val, bn):
    """Shared tail of the sparse-score stage: sort postings by doc row, then
    run-sum duplicates with cumsum + prefix-max (log-depth VPU scans)."""
    drow_s, val_s = jax.lax.sort_key_val(drow, val, dimension=1)
    c = jnp.cumsum(val_s, axis=1)
    c_excl = c - val_s
    boundary = jnp.concatenate(
        [jnp.ones((bn, 1), bool), drow_s[:, 1:] != drow_s[:, :-1]], axis=1)
    run_base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, c_excl, -1.0), axis=1)
    is_last = jnp.concatenate(
        [drow_s[:, :-1] != drow_s[:, 1:], jnp.ones((bn, 1), bool)], axis=1)
    scores = jnp.where(is_last & (drow_s < SENTINEL), c - run_base, NEG_INF)
    return drow_s, scores


lexical_sparse_scores = jax.jit(_lex_scores_body)
lexical_sparse_scores_packed = jax.jit(_lex_scores_body_packed)


def _lex_scores_dispatch(lex_tables, chunk_ids, wvec):
    """Select the sparse-score stage by table structure (GroupView.tables).

    Routes through the jitted entry points: eager callers (sparse-only
    strategies, tests) get compiled code; under hybrid_topk_batch's jit the
    nested jit simply traces inline.
    """
    if len(lex_tables) == 3:
        return lexical_sparse_scores_packed(*lex_tables, chunk_ids, wvec)
    return lexical_sparse_scores(*lex_tables, chunk_ids, wvec)


def _gather_cos(vec_source, rows, q_unit):
    """Cosine of gathered corpus rows vs unit queries; the row source is
    structural — ``(vecs,)`` bf16 rows, or ``(codes, scales)`` int8 codes +
    per-row scale (the >bf16-budget hybrid: codes are the ONLY resident
    form, ~0.5% bounded score noise)."""
    if len(vec_source) == 2:
        codes, scales = vec_source
        cos = jnp.einsum("bmd,bd->bm", codes[rows].astype(jnp.bfloat16),
                         q_unit.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return cos * scales[rows]
    g = vec_source[0][rows].astype(jnp.bfloat16)
    return jnp.einsum("bmd,bd->bm", g, q_unit.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def _fuse_body(vec_source, add_mask, q_unit, lex_rows, lex_scores, sem_rows,
               sem_scores, sem_weight, *, k: int, top_m_lex: int,
               sem_bm_join: str = "all"):
    """Exact additive fusion over (BM25 top-M ∪ semantic top-m) candidates.

    vec_source: ``(vecs,)`` bf16 [cap, d] rows or ``(codes, scales)`` int8
    (see _gather_cos); add_mask [cap] (0/−inf filter), q_unit [B, d] f32
    unit queries, lex_rows/lex_scores from the sparse BM25 stage,
    sem_rows/sem_scores [B, m] from the device scan (scores = cosine +
    mask). Returns (scores [B, k], rows [B, k]).

    ``sem_bm_join``: where semantic candidates collect their BM25 term.
    "all" joins against every sparse candidate ([B, maxp, m] compare —
    exact additive fusion). "topm" joins against the top-M lex candidates
    only, reusing the dup compare — at maxp=1024/M=128/m=64 that deletes
    8/9 of the join work; a semantic candidate whose BM25 evidence ranks
    below the M-th lexical candidate loses that (≤ M-th score) term, so
    run it under the oracle recall gate before trusting a new config.
    """
    cap = vec_source[0].shape[0]
    m_lex = min(top_m_lex, lex_scores.shape[1])
    lm_s, lm_pos = jax.lax.top_k(lex_scores, m_lex)
    lm_rows = jnp.take_along_axis(lex_rows, lm_pos, axis=1)       # [B, M]
    safe = jnp.where(lm_rows < cap, lm_rows, 0)
    cos = _gather_cos(vec_source, safe, q_unit)
    fused_lex = sem_weight * cos + lm_s + add_mask[safe]
    ok = (lm_rows < cap) & (lm_s > NEG_INF / 2)
    # drop lexical candidates the semantic branch already covers (it fuses
    # them exactly; double-listing would surface one doc twice in the top-k)
    hit_top = lm_rows[:, :, None] == sem_rows[:, None, :]     # [B, M, m]
    dup = jnp.any(hit_top, axis=2)
    fused_lex = jnp.where(ok & ~dup, fused_lex, NEG_INF)

    # BM25 for the semantic candidates: broadcast-compare against the sparse
    # rows and sum (duplicates hold NEG_INF → zeroed, the run-last holds the
    # total). A [B, maxp, m] compare beats vmapped searchsorted on TPU
    # (measured 1.7 ms vs 2.6 ms standalone).
    if sem_bm_join not in ("all", "topm"):
        # a typo (e.g. "top_m") must not silently measure the "all" join —
        # this knob exists for A/Bs, so a misconfigured A/B is the failure
        # mode that matters (ADVICE r4)
        raise ValueError(
            f"sem_bm_join must be 'all' or 'topm', got {sem_bm_join!r}")
    if sem_bm_join == "topm":
        lm_s0 = jnp.where(lm_s > NEG_INF / 2, lm_s, 0.0)
        bm_sem = jnp.sum(jnp.where(hit_top, lm_s0[:, :, None], 0.0), axis=1)
    else:
        ls0 = jnp.where(lex_scores > NEG_INF / 2, lex_scores, 0.0)
        hit = lex_rows[:, :, None] == sem_rows[:, None, :]    # [B, maxp, m]
        bm_sem = jnp.sum(jnp.where(hit, ls0[:, :, None], 0.0), axis=1)
    sem_ok = (sem_rows >= 0) & (sem_scores > NEG_INF / 2)
    fused_sem = jnp.where(sem_ok, sem_weight * sem_scores + bm_sem, NEG_INF)

    all_s = jnp.concatenate([fused_lex, fused_sem], axis=1)
    all_r = jnp.concatenate([jnp.where(lm_rows < cap, lm_rows, -1),
                             sem_rows], axis=1)
    top_s, pos = jax.lax.top_k(all_s, k)
    top_r = jnp.take_along_axis(all_r, pos, axis=1)
    top_r = jnp.where(top_s > NEG_INF / 2, top_r, -1)
    return top_s, top_r


@partial(jax.jit, static_argnames=("k", "m", "top_m_lex", "block_rows",
                                   "scan_mode", "interpret", "sem_bm_join"))
def hybrid_topk_batch(vecs, add_mask, queries, lex_tables, chunk_ids,
                      wvec, sem_weight, k: int, m: int = 64,
                      top_m_lex: int = 128, block_rows: int = 2048,
                      scan_mode: str = "pallas", int8_tables=None,
                      interpret: bool = False, int8_block_scales=None,
                      sem_bm_join: str = "all"):
    """The whole batched hybrid in ONE dispatch: scan + sparse BM25 + fusion.

    queries [B, d] raw embeddings (normalized here). ``lex_tables`` is
    GroupView.tables — (rows2d, contrib2d) dense or (packed2d, base, step)
    packed; the tuple structure picks the sparse stage under this jit.
    ``scan_mode``: "pallas" (fused pooled kernel), "pallas_int8" (int8 codes
    scan, needs ``int8_tables`` = (codes, scales)), "xla_scan" (lax.scan
    blocks, large CPU corpora), "xla_direct" (single matmul, small corpora /
    tests).

    pallas_int8 has two regimes, selected by whether bf16 rows are provided:

    - ``vecs`` present: int8 only SELECTS the semantic top-m; an in-dispatch
      [B, m, d] bf16 gather re-scores them exactly, so fused ordering stays
      at bf16-oracle parity (measured ≈ the bf16 scan at 1M — the rescore
      gather offsets the halved scan read; kept for parity tests).
    - ``vecs=None``: the corpus beyond the bf16 hybrid budget — EVERY cosine
      (scan and lex-candidate) comes from the int8 codes (~0.5% bounded
      noise). Extends the one-dispatch hybrid to ~6× more rows/chip; the
      alternative above the budget is per-query host candidate-union fusion.
    """
    q32 = queries.astype(jnp.float32)
    qn = q32 / jnp.maximum(jnp.linalg.norm(q32, axis=-1, keepdims=True), 1e-12)
    if scan_mode == "pallas_int8":
        from rassengine_tpu.ops.fused_topk import fused_topk_int8_pooled

        codes, scales = int8_tables
        sem_s, sem_r = fused_topk_int8_pooled(codes, scales, qn, add_mask,
                                              m, block_rows,
                                              interpret=interpret,
                                              block_scales=int8_block_scales)
        if vecs is not None:
            cap = vecs.shape[0]
            safe = jnp.where((sem_r >= 0) & (sem_r < cap), sem_r, 0)
            cos = _gather_cos((vecs,), safe, qn)
            sem_ok = (sem_r >= 0) & (sem_s > NEG_INF / 2)
            sem_s = jnp.where(sem_ok, cos + add_mask[safe], NEG_INF)
    elif scan_mode == "pallas":
        from rassengine_tpu.ops.fused_topk import fused_topk_pooled

        sem_s, sem_r = fused_topk_pooled(vecs, qn, add_mask, m, block_rows,
                                         interpret=interpret)
    elif scan_mode == "xla_scan":
        from rassengine_tpu.index.exact import exact_topk

        sem_s, sem_r = exact_topk(vecs, qn, add_mask, m, block_rows)
    else:
        from rassengine_tpu.index.exact import exact_topk_direct

        sem_s, sem_r = exact_topk_direct(vecs, qn, add_mask, m)
    lex_rows, lex_scores = _lex_scores_dispatch(lex_tables, chunk_ids, wvec)
    vec_source = (vecs,) if vecs is not None else int8_tables
    return _fuse_body(vec_source, add_mask, qn, lex_rows, lex_scores, sem_r,
                      sem_s, sem_weight, k=k, top_m_lex=top_m_lex,
                      sem_bm_join=sem_bm_join)
