"""The 12 intent-specific retrieval strategies with hybrid score fusion.

API-parity port of the reference ``OpenSearchIndexer``'s search surface
(app/main.py:1395-2150): same method names, same ``(query[, query_emb], k,
filter_clause, patient_id) → [(source, score)]`` contract, same per-strategy
semantics — but instead of composing OpenSearch DSL, each strategy combines

- **semantic** scores: device top-M over the HBM index (Pallas fused
  distance+top-k kernel, falling back to the XLA scan), and
- **lexical** scores: host BM25 over the strategy's field group (lexical/),
- **filters**: the FilterSpec mask (patient routing, doc_type, dates).

Single-query hybrid strategies fuse *additively on device* (see
``_additive_hybrid``): the query's sparse BM25 contributions scatter into the
scan's additive vector, so one pass scores every corpus row with OpenSearch's
should-clause weighted sum. Batched hybrid keeps candidate-union fusion
(semantic top-M ∪ lexical top-M, missing halves filled host-side), since
per-query additive vectors would be [B, cap].

Behavioral fixes over the reference (SURVEY §2 "known defects"):
- ``structured_search`` works (upstream raises NameError, main.py:1649),
- ``multi_intent_search`` applies a real recency bonus (upstream's dict
  comprehension collapses its date clauses, main.py:2004-2007),
- ``entity_specific_search`` falls back to OR matching when strict AND matches
  nothing (upstream returns [] for nearly every NL query).
"""

from __future__ import annotations

import datetime as _dt
import logging

import jax
import jax.numpy as jnp
import numpy as np

from rassengine_tpu.core import schema
from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.tracing import stage
from rassengine_tpu.index.exact import exact_topk, exact_topk_direct, l2_normalize
from rassengine_tpu.index.store import NEG_INF, FilterSpec, TenantIndex
from rassengine_tpu.lexical.bm25 import LexicalIndex
from rassengine_tpu.ops.fused_topk import fused_topk_pooled

log = logging.getLogger("rassengine.retriever")

Hit = tuple[dict, float]


def _today_epoch_days() -> int:
    return (_dt.date.today() - _dt.date(1970, 1, 1)).days


@jax.jit
def _scatter_scale(mask, rows, vals, inv_scale):
    """mask + scatter(vals at rows), scaled — builds the hybrid additive
    vector on device so only the sparse (rows, vals) cross the host link."""
    return (mask + jnp.zeros_like(mask).at[rows].add(vals)) * inv_scale


def _pad_pow2(rows: np.ndarray, vals: np.ndarray, minimum: int = 256):
    """Pad sparse updates to power-of-two length (bounded jit cache); padding
    scatters 0.0 at row 0 — a no-op."""
    n = max(int(rows.size), 1)
    size = max(minimum, 1 << (n - 1).bit_length())
    r = np.zeros(size, np.int32)
    v = np.zeros(size, np.float32)
    r[: rows.size] = rows
    v[: vals.size] = vals
    return r, v


# corpora whose bf16 rows fit comfortably in HBM use the exact fused-hybrid
# path (bf16 scan + candidate-row gather); larger ones fall back to int8 scan
# with candidate-union fusion
HYBRID_BF16_BUDGET_BYTES = 6 * 1024**3


class PqEscalation:
    """Decaying per-tenant PQ escalation state (VERDICT r3 weak #4).

    Round 2's escalation was sticky for the tenant's lifetime: ONE
    low-agreement batch (possible on a freak query set) permanently doubled
    the candidate oversample and forced bf16 LUTs — a silent ~30% throughput
    tax on a 16M-row tenant with no decay and no metric. Now the state
    machine re-probes the ADC/exact rank agreement every ``reprobe_every``
    escalated batches and de-escalates when the quantizer resolves the
    corpus again, with hysteresis (enter below ``ENTER_RHO``, exit at or
    above ``EXIT_RHO``) and a post-flip cooldown so a boundary corpus cannot
    flap every batch. Both transitions log and bump METRICS counters
    (``pq_escalations`` / ``pq_deescalations``), so the state is observable
    at /metrics instead of silent.
    """

    ENTER_RHO = 0.2
    EXIT_RHO = 0.35

    def __init__(self, reprobe_every: int = 32):
        self.active = False
        self.reprobe_every = reprobe_every
        self.flips = 0
        self._batches_since_flip = 0

    def note_batch(self) -> bool:
        """Count one served batch → True when an agreement re-probe is due."""
        self._batches_since_flip += 1
        return (self.active
                and self._batches_since_flip % self.reprobe_every == 0)

    def flip(self, active: bool, rho: float, where: str) -> None:
        from rassengine_tpu.core.tracing import METRICS

        self.active = active
        self.flips += 1
        self._batches_since_flip = 0
        if active:
            METRICS.incr("pq_escalations")
            log.info("%s: low ADC/exact rank agreement (rho=%.3f) — "
                     "escalating oversample + bf16 LUTs", where, rho)
        else:
            METRICS.incr("pq_deescalations")
            log.info("%s: rank agreement recovered (rho=%.3f) — "
                     "de-escalating to base oversample", where, rho)


class Retriever:
    def __init__(self, index: TenantIndex, lexical: LexicalIndex,
                 config: EngineConfig | None = None, use_pallas: bool = True,
                 mesh=None, router=None):
        self.index = index
        self.lexical = lexical
        self.config = config or EngineConfig()
        self.use_pallas = use_pallas
        self.mesh = mesh            # 1-D ("shard",) Mesh → SPMD sharded scans
        self.router = router        # ShardRouter for patient-routed masking
        self._device_lexical = None
        # (built_count, update_log_len_at_build, IvfIndex)
        self._ivf_cache: tuple[int, int, object] | None = None
        # (index generation, IvfIndex-from-PQ-assignments) — the PQ4-source
        # probe's inverted file (rebuilt with the codes, no k-means of its own)
        self._ivf_pq_cache: tuple[int, object] | None = None
        # per-tenant PQ escalation (VERDICT r2 #8, decaying since r4): set
        # when ADC candidate order disagrees with the exact re-rank — widens
        # the oversample and switches to bf16 LUTs; re-probes agreement
        # periodically and de-escalates when the quantizer recovers
        self._pq_esc = PqEscalation()

    @property
    def _pq_escalated(self) -> bool:
        return self._pq_esc.active

    @property
    def device_lexical(self):
        from rassengine_tpu.lexical.device_bm25 import DeviceLexical

        # big corpora flush the 4 B/posting packed layout (half the HBM
        # residency AND half the per-query gather bandwidth; ~0.2% bounded
        # score quantization — device_bm25.GroupView); small corpora keep
        # the exact dense layout. Re-evaluated per access: a tenant GROWING
        # past the threshold switches on its next flush (the cached views
        # are rebuilt, not patched)
        packed = (self.index.capacity
                  >= getattr(self.config, "lexical_packed_min_rows",
                             1 << 20))
        dl = self._device_lexical
        if dl is None or dl.packed != packed:
            self._device_lexical = dl = DeviceLexical(self.lexical,
                                                      packed=packed)
        return self._device_lexical

    # --- shared building blocks ----------------------------------------------

    def _spec(self, filter_clause: FilterSpec | None, patient_id: str | None,
              **kw) -> FilterSpec:
        spec = FilterSpec(**kw)
        if filter_clause is not None:
            spec = spec.merged_with(filter_clause)
        if patient_id:
            spec = FilterSpec(patient_id=patient_id).merged_with(spec)
        return spec

    def _scan_tier(self) -> str:
        """Auto-select the semantic scan by corpus size vs HBM budgets
        (VERDICT round 1: exact → int8 → PQ wired into serving; `ann_mode`
        forces a tier, incl. the IVF list-probe path, honoring the
        EngineConfig ivf_*/pq_* knobs).
        """
        cfg, idx = self.config, self.index
        if self.mesh is not None:
            return "sharded"  # SPMD row-sharded scan + all-gather merge
        if cfg.ann_mode in ("exact", "int8", "pq", "ivf"):
            return cfg.ann_mode
        if not (cfg.ann_enabled and idx.capacity >= cfg.ann_threshold):
            return "exact"
        if idx.capacity * idx.dim > cfg.int8_hbm_budget_bytes:
            return "pq"  # int8 codes would blow HBM: rows never touch HBM
        return "int8" if self.use_pallas else "exact"

    def _rerank_exact(self, query_embs: np.ndarray, rows: np.ndarray, m: int):
        """Candidate rows [B, >=m] → exact-cosine top-m from host f32 rows."""
        rows = np.asarray(rows)
        q2 = np.atleast_2d(query_embs)
        out_r = np.full((rows.shape[0], m), -1, np.int64)
        out_s = np.full((rows.shape[0], m), NEG_INF, np.float32)
        for b in range(rows.shape[0]):
            rb = rows[b][rows[b] >= 0]
            exact = self._sem_scores_for(q2[b], rb)
            order = np.argsort(-exact)[:m]
            out_r[b, : order.size] = rb[order]
            out_s[b, : order.size] = exact[order]
        return out_r, out_s

    def _pq_top_m_batch(self, query_embs: np.ndarray, mask, m: int):
        """ADC candidates over packed 4-bit codes + exact re-rank (pq4.py).

        On TPU the scan runs as the fused Pallas kernel (ops/fused_pq4.py:
        one dispatch, cluster-sorted codes, int8 LUTs, branch-and-bound
        block pruning); elsewhere as the XLA one-hot scan.
        """
        idx, cfg = self.index, self.config
        with stage("semantic_scan_pq4"):
            cols = idx.device_columns_pq4(cfg.pq_subvectors)
            q = jnp.asarray(np.atleast_2d(query_embs))

            def scan(over: int, escalated: bool):
                # int8 LUTs are ~30% faster but add ~0.5% score noise — worth
                # it only when the batched scan dominates latency (huge
                # corpora); escalation and the small-batch probe (whose
                # branch-and-bound gate needs the tight bf16 slack) use bf16
                small_batch = np.atleast_2d(query_embs).shape[0] <= 4
                ldt = ("int8" if idx.capacity > 4 * 1024 * 1024
                       and not escalated and not small_batch else "bf16")
                if self.use_pallas and jax.default_backend() != "cpu":
                    from rassengine_tpu.ops.fused_pq4 import (pq4_lutq,
                                                              pq4_topk_fused)

                    lutq = pq4_lutq(cols["codebooks"], cols["coarse"], q,
                                    cols["nlist_pad"])
                    mask_sorted = jnp.take(mask, jnp.asarray(
                        cols["order"].astype(np.int32)))
                    _s, rows_sorted = pq4_topk_fused(
                        cols["aug_sorted"], lutq, mask_sorted, over,
                        block_rows=cols["block_rows"], lut_dtype=ldt,
                        win_starts=cols["win_starts"],
                        win_width=cols["win_width"],
                        win_lo=cols["win_lo"],
                        block_resid=cols["block_resid"],
                        # small batches: best-bound-first block order → the
                        # branch-and-bound gate prunes nearly every block
                        # (the device IVF probe, VERDICT r2 #6)
                        order_by_bound=small_batch)
                    rs = np.asarray(rows_sorted)
                    return np.where(rs >= 0,
                                    cols["order"][np.clip(rs, 0, None)], -1)
                from rassengine_tpu.index.pq4 import pq4_luts, pq4_topk

                luts, coarse_lut = pq4_luts(cols["codebooks"], cols["coarse"], q)
                _s, rows = pq4_topk(cols["packed"], cols["assign"], luts,
                                    coarse_lut, mask, over,
                                    min(idx.block_rows, idx.capacity))
                return np.asarray(rows)

            esc = self._pq_esc
            reprobe_due = esc.note_batch()
            base_over = min(max(cfg.pq_oversample * m, 512),
                            idx.capacity, 2048)
            wide_over = min(2 * base_over, idx.capacity, 2048)
            over = wide_over if esc.active else base_over
            rows = scan(over, esc.active)
            if not esc.active and base_over < min(idx.capacity, 2048):
                # adaptive oversample (VERDICT r2 #8): when the ADC candidate
                # order barely correlates with exact scores, the quantizer is
                # struggling on this corpus (near-duplicate ties, heavy
                # distortion) and the true top-k may sit beyond the candidate
                # list — escalate, with bf16 LUTs, until agreement recovers
                rho = self._pq_rank_agreement(query_embs, rows)
                if rho < PqEscalation.ENTER_RHO:
                    esc.flip(True, rho, "pq4")
                    rows = scan(wide_over, True)
            elif reprobe_due:
                # decay probe (VERDICT r3 weak #4): agreement measured on the
                # escalated candidates — when the quantizer resolves this
                # corpus again, drop back to the cheap base configuration
                rho = self._pq_rank_agreement(query_embs, rows)
                if rho >= PqEscalation.EXIT_RHO:
                    esc.flip(False, rho, "pq4")
            return self._rerank_exact(query_embs, rows, m)

    def _pq_rank_agreement(self, query_embs: np.ndarray, rows: np.ndarray,
                           sample: int = 4) -> float:
        """Spearman correlation between ADC candidate order and exact scores
        (VERDICT r2 #8's cheap serve-time detector), on a few queries."""
        q2 = np.atleast_2d(query_embs)
        rhos = []
        for b in range(min(sample, rows.shape[0])):
            rb = rows[b][rows[b] >= 0]
            if rb.size < 16:
                continue
            exact = self._sem_scores_for(q2[b], rb)
            pos = np.arange(rb.size, dtype=np.float64)
            er = np.argsort(np.argsort(-exact)).astype(np.float64)
            c = np.corrcoef(pos, er)[0, 1]
            if np.isfinite(c):
                rhos.append(float(c))
        return float(np.mean(rhos)) if rhos else 1.0

    def _ivf_index(self):
        """Lazily (re)built IVF structure; stale tail rows are exact-scanned.

        Rebuild triggers on 25% count growth OR when the brute-forced tail
        (new rows + re-upserted rows, whose per-query exact scan cost grows
        unboundedly otherwise) exceeds ``ivf_tail_bound``.
        """
        from rassengine_tpu.index.ivf import IvfIndex

        idx, cfg = self.index, self.config
        cached = self._ivf_cache
        if cached is not None:
            built, log_len, _ivf = cached
            # tail = appended rows + re-upserts of PRE-build rows (the log
            # also records appends, so count them once via np.unique — raw
            # log length would double-count every new row and trip rebuilds
            # at half the configured bound)
            entries = idx._update_log[log_len:]
            n_dirty = 0
            if entries:
                dirty = np.unique(np.asarray(entries, np.int64))
                n_dirty = int((dirty < built).sum())
            tail = (idx.count - built) + n_dirty
            if idx.count <= int(1.25 * built) and tail <= cfg.ivf_tail_bound:
                return cached
        built = idx.count
        ivf = IvfIndex.build(idx._vecs[:built],
                             nlist=min(cfg.ivf_nlist, max(1, built // 4)),
                             nprobe=cfg.ivf_nprobe)
        del idx._update_log[:]  # entries before this build are now irrelevant
        self._ivf_cache = (built, 0, ivf)
        return self._ivf_cache

    def _ivf_top_m_batch(self, query_embs: np.ndarray, spec: FilterSpec, m: int):
        """IVF list-probe + exact re-rank (single/low-batch latency path).

        Honors ivf_nlist/ivf_nprobe/ivf_rerank; rows ingested after the last
        k-means build are exact-scanned and merged, so results stay fresh
        without rebuilding per upsert.
        """
        idx, cfg = self.index, self.config
        with stage("semantic_scan_ivf"):
            k_out = min(m, cfg.ivf_rerank)
            # device probe (VERDICT r2 #6, index/ivf.py:_probe_kernel): one
            # dispatch per <=16-query slice gathers only the probed lists'
            # rows from HBM instead of the reference's host per-query loop.
            # Gather source: bf16 rows; the int8 codes when bf16 residency
            # would blow the HBM budget (the 10M-scale regime); the packed
            # PQ4 codes when even int8 busts it (16M+ — ROADMAP r3 #3, which
            # needs no k-means of its own: the PQ coarse stage IS the IVF)
            add_mask = idx.filter_mask(spec)
            if idx.capacity * idx.dim > cfg.int8_hbm_budget_bytes:
                return self._ivf_probe_pq(query_embs, add_mask, k_out)
            built, log_len, ivf = self._ivf_index()
            host_mask = idx.host_mask(spec)
            use_int8 = idx.capacity * idx.dim * 2 > cfg.int8_hbm_budget_bytes
            if use_int8:
                qcols = idx.device_columns_int8()
                vecs_dev, scales = qcols["codes"], qcols["scales"]
            else:
                vecs_dev = idx.device_columns()["vecs"]
                scales = None
            q_all = np.atleast_2d(query_embs)
            # int8 candidate scores carry ~0.5% quantization noise: SELECT
            # with an oversampled probe, then score exactly from host f32
            # rows — the same contract as every other int8 tier in this
            # module (never surface quantized scores as final semantics)
            k_fetch = min(2 * k_out, built) if use_int8 else k_out
            s_parts, r_parts = [], []
            for b0 in range(0, q_all.shape[0], 16):
                sb, rb = ivf.probe_device(
                    vecs_dev, jnp.asarray(q_all[b0: b0 + 16]), add_mask,
                    k_fetch, nprobe=cfg.ivf_nprobe, scales=scales)
                s_parts.append(np.asarray(sb, np.float32))
                r_parts.append(np.asarray(rb, np.int64))
            s = np.concatenate(s_parts, axis=0)
            r = np.concatenate(r_parts, axis=0)
            if use_int8:
                r, s = self._rerank_exact(q_all, r, k_out)
            # fresh tail = rows added after the build + re-upserted rows whose
            # vector may have moved to a different centroid's list (they would
            # otherwise be unretrievable until the next rebuild)
            tail = np.arange(built, idx.count)
            dirty = np.unique(np.asarray(idx._update_log[log_len:], np.int64))
            if dirty.size:
                tail = np.union1d(tail, dirty[dirty < built])
            tail = tail[host_mask[tail]] if tail.size else tail
            if tail.size:
                q2 = np.atleast_2d(query_embs)
                for b in range(q2.shape[0]):
                    ts = self._sem_scores_for(q2[b], tail)
                    # a dirty row can also surface from its (old) probed list —
                    # drop the probe copy so the merge never duplicates a row
                    keep = (r[b] >= 0) & ~np.isin(r[b], tail)
                    probed, pscores = r[b][keep], s[b][keep]
                    rows_cat = np.concatenate([probed, tail])
                    scores_cat = np.concatenate([pscores, ts])
                    order = np.argsort(-scores_cat)[:k_out]
                    pad = k_out - order.size
                    r[b] = np.pad(rows_cat[order], (0, pad), constant_values=-1)
                    s[b] = np.pad(scores_cat[order], (0, pad),
                                  constant_values=NEG_INF)
            return r.astype(np.int64), s

    def _ivf_probe_pq(self, query_embs: np.ndarray, add_mask, k_out: int):
        """IVF probe sourced from packed PQ4 codes (>int8-budget corpora).

        The PQ coarse stage doubles as the inverted file
        (index/ivf.py:IvfIndex.from_assignments — one argsort, no k-means),
        so freshness is inherited from device_columns_pq4: codes re-encode
        per index generation, leaving no stale tail to brute-force. ADC
        candidate scores are approximate → exact re-rank against the host
        f32 rows before returning (same contract as _pq_top_m_batch).
        """
        from rassengine_tpu.index.ivf import IvfIndex

        idx, cfg = self.index, self.config
        cols = idx.device_columns_pq4(cfg.pq_subvectors)
        cached = self._ivf_pq_cache
        if cached is None or cached[0] != idx.generation:
            assign = np.asarray(cols["assign"])[: idx.count]
            ivf = IvfIndex.from_assignments(
                np.asarray(cols["coarse"]), assign, nprobe=cfg.ivf_nprobe)
            cached = (idx.generation, ivf)
            self._ivf_pq_cache = cached
        ivf = cached[1]
        q_all = np.atleast_2d(query_embs)

        def probe(over: int) -> np.ndarray:
            r_parts = []
            for b0 in range(0, q_all.shape[0], 16):
                _sb, rb = ivf.probe_device_pq(
                    cols["packed"], cols["codebooks"],
                    jnp.asarray(q_all[b0: b0 + 16]), add_mask, over,
                    nprobe=cfg.ivf_nprobe)
                r_parts.append(np.asarray(rb, np.int64))
            return np.concatenate(r_parts, axis=0)

        esc = self._pq_esc
        reprobe_due = esc.note_batch()
        base_over = min(max(cfg.pq_oversample * k_out, 128), 512)
        wide_over = min(2 * base_over, 1024)
        rows = probe(wide_over if esc.active else base_over)
        if not esc.active:
            # same decaying escalation as _pq_top_m_batch (VERDICT r2 #8 /
            # r3 weak #4): low ADC/exact rank agreement → the 4-bit quantizer
            # can't resolve this corpus at the base candidate width
            rho = self._pq_rank_agreement(q_all, rows)
            if rho < PqEscalation.ENTER_RHO:
                esc.flip(True, rho, "ivf-pq probe")
                rows = probe(wide_over)
        elif reprobe_due:
            rho = self._pq_rank_agreement(q_all, rows)
            if rho >= PqEscalation.EXIT_RHO:
                esc.flip(False, rho, "ivf-pq probe")
        r, s = self._rerank_exact(q_all, rows, k_out)
        return r.astype(np.int64), s

    def _routed_mask(self, mask, spec: FilterSpec):
        """Compose the shard-routing mask for patient-routed queries
        (reference _routing, main.py:1230). Rows allocate into per-shard
        regions by patient hash (store._alloc_row), so masking non-owner
        shards is result-preserving — the patient's rows all live there."""
        if self.router is None or spec is None or not spec.patient_id:
            return mask
        return self.router.routed_mask(mask, spec.patient_id, self.index.capacity)

    def _bf16_fits(self) -> bool:
        """Whether the bf16 rows fit the per-chip HBM budget (sharded corpora
        divide across the mesh)."""
        n = self.index.n_shards if self.mesh is not None else 1
        return (2 * self.index.capacity * self.index.dim) // n \
            <= HYBRID_BF16_BUDGET_BYTES

    def _int8_fits(self) -> bool:
        """Whether int8 codes fit the per-chip HBM budget (the beyond-bf16
        tier: ~6× more rows/chip from codes alone)."""
        n = self.index.n_shards if self.mesh is not None else 1
        return (self.index.capacity * self.index.dim) // n \
            <= self.config.int8_hbm_budget_bytes

    def _int8_select(self) -> bool:
        """Within-bf16-budget hybrid: whether the semantic stage should
        SELECT candidates with the block-scale int8 scan (all-integer
        epilogue, half the HBM read) and re-score them from the bf16 rows
        in-dispatch. Final ordering stays bf16-exact either way — this is
        purely a speed/residency trade (config.hybrid_select; bench suite
        config hybrid_int8sel vs hybrid measures it)."""
        mode = getattr(self.config, "hybrid_select", "auto")
        if mode == "int8":
            return True
        if mode != "auto":
            return False
        from rassengine_tpu.ops.fused_topk import PACKED_MIN_BLOCKS

        idx = self.index
        n = idx.n_shards if self.mesh is not None else 1
        # auto: only where the packed all-integer kernel engages per shard
        # (the f32 small-corpus form has no epilogue advantage) and double
        # residency (bf16 rows + codes = 3 B per dim-row) stays affordable
        return (idx.capacity // n >= PACKED_MIN_BLOCKS * idx.block_rows
                and (3 * idx.capacity * idx.dim) // n
                <= 3 * HYBRID_BF16_BUDGET_BYTES // 2)

    def _sharded_top_m(self, query_embs: np.ndarray, spec: FilterSpec, m: int):
        """SPMD sharded scan: per-chip partition scan + all-gather merge
        (parallel/topk_merge.py), mesh-invariant across the same three tiers
        as single-chip (VERDICT r2 #4): bf16 exact while the per-chip
        partition fits the budget; int8 codes + exact re-rank while codes fit
        (8×~13M×1024-d on a v5e-8 slice); fused PQ4 ADC beyond that. Local
        scans run the fused Pallas kernels on TPU."""
        from rassengine_tpu.parallel.topk_merge import (sharded_topk,
                                                        sharded_topk_int8,
                                                        sharded_topk_pq4,
                                                        to_host)

        idx, cfg = self.index, self.config
        with stage("semantic_scan_sharded"):
            q = jnp.asarray(np.atleast_2d(query_embs))
            if self._bf16_fits():
                mask = self._routed_mask(idx.filter_mask(spec), spec)
                cols = idx.device_columns()
                s, r = sharded_topk(self.mesh, cols["vecs"], mask, q,
                                    min(m, idx.capacity),
                                    use_pallas=None if self.use_pallas else False,
                                    candidate_grade=True)
                s = to_host(s)
                # filter-masked rows (score NEG_INF+ε) must not surface as
                # hits — under a patient filter they are other patients' docs
                r = np.where(s <= NEG_INF / 2, -1, to_host(r))
                return r, s
            if (idx.capacity * idx.dim) // idx.n_shards \
                    <= cfg.int8_hbm_budget_bytes:
                mask = self._routed_mask(idx.filter_mask(spec), spec)
                q8 = idx.device_columns_int8()
                over = min(max(4 * m, 64), idx.capacity)
                s8, rows = sharded_topk_int8(self.mesh, q8["codes"],
                                             q8["scales"], mask, q, over,
                                             use_pallas=None if self.use_pallas else False,
                                             block_scales=q8.get("block_scales"),
                                             scale_block_rows=q8.get(
                                                 "scale_block_rows", 2048))
                # drop masked rows before re-rank — a filtered-out row can
                # reach the candidate list (scoring NEG_INF+ε) and exact
                # re-rank would resurrect it
                rows = np.where(to_host(s8) <= NEG_INF / 2, -1,
                                to_host(rows))
                return self._rerank_exact(np.atleast_2d(query_embs), rows, m)
            return self._sharded_pq_top_m(query_embs, q, spec, m)

    def _sharded_pq_top_m(self, query_embs: np.ndarray, q, spec: FilterSpec,
                          m: int):
        """Sharded >HBM tier: per-shard fused PQ4 ADC scan + all-gather merge
        + exact re-rank. The filter/routing mask is built host-side in sorted
        order (a device gather of a row-sharded array would all-gather it)."""
        from rassengine_tpu.ops.fused_pq4 import pq4_lutq
        from rassengine_tpu.parallel.topk_merge import sharded_topk_pq4

        idx, cfg = self.index, self.config
        cols = idx.device_columns_pq4(cfg.pq_subvectors)
        lutq = pq4_lutq(cols["codebooks"], cols["coarse"], q,
                        cols["nlist_pad"])
        add = np.where(idx.host_mask(spec), np.float32(0.0),
                       np.float32(NEG_INF))
        if self.router is not None and spec is not None and spec.patient_id:
            shard = self.router.shard_of(spec.patient_id)
            rs = idx.capacity // idx.n_shards
            shard_of_row = np.arange(idx.capacity) // rs
            add = np.where(shard_of_row == shard, add, np.float32(NEG_INF))
        mask_sorted = idx._put_rows(add[cols["order"]].astype(np.float32))
        nb = idx.capacity // cols["block_rows"]
        wins = cols["win_starts"]
        if wins is None:
            wins = idx._put_rows(np.zeros(nb, np.int32))
        over = min(max(cfg.pq_oversample * m, 512), idx.capacity, 2048)
        interp = jax.default_backend() == "cpu"
        _s, pos = sharded_topk_pq4(
            self.mesh, cols["aug_sorted"], wins, mask_sorted, lutq, over,
            cols["block_rows"], cols["win_width"],
            lut_dtype="int8" if not interp else "bf16", interpret=interp)
        from rassengine_tpu.parallel.topk_merge import to_host

        pos = to_host(pos)
        rows = np.where(pos >= 0, cols["order"][np.clip(pos, 0, None)], -1)
        return self._rerank_exact(np.atleast_2d(query_embs), rows, m)

    def _sem_top_m_batch(self, query_embs: np.ndarray, spec: FilterSpec, m: int):
        """Batched device top-M: query_embs [B, d] → (rows [B, m], scores [B, m]).

        One kernel launch scans the corpus once for the whole batch — the
        TPU-native serving shape (the corpus read amortizes across queries).
        All queries share one FilterSpec (per-query filters fall back to the
        single-query path).
        """
        idx = self.index
        spec = FilterSpec(require_embedding=True).merged_with(spec)
        m = min(m, idx.capacity)
        tier = self._scan_tier()
        if tier == "sharded":
            return self._sharded_top_m(query_embs, spec, m)
        if tier == "ivf":
            return self._ivf_top_m_batch(query_embs, spec, m)
        mask = idx.filter_mask(spec)
        if tier == "pq":
            return self._pq_top_m_batch(query_embs, mask, m)
        q = jnp.asarray(np.atleast_2d(query_embs))
        if tier == "int8" and self.use_pallas:
            from rassengine_tpu.ops.fused_topk import fused_topk_int8_pooled

            with stage("semantic_scan_int8"):
                qcols = idx.device_columns_int8()
                over = min(max(2 * m, 32), idx.capacity, 256)
                s8, rows = fused_topk_int8_pooled(qcols["codes"], qcols["scales"],
                                                  q, mask, over, idx.block_rows,
                                                  block_scales=qcols.get(
                                                      "block_scales"))
                # masked rows (NEG_INF+ε) must not reach the exact re-rank
                rows = np.where(to_host(s8) <= NEG_INF / 2, -1,
                                to_host(rows))
                return self._rerank_exact(query_embs, rows, m)
        with stage("semantic_scan"):
            if self.use_pallas and idx.capacity >= idx.block_rows:
                try:
                    cols = idx.device_columns()
                    s, r = fused_topk_pooled(cols["vecs"], l2_normalize(q), mask,
                                             min(m, 256),
                                             min(idx.block_rows, idx.capacity))
                except Exception:
                    self.use_pallas = False
                    cols = idx.device_columns()
                    s, r = self._xla_topk(cols, q, mask, m)
            else:
                cols = idx.device_columns()
                s, r = self._xla_topk(cols, q, mask, m)
        return np.asarray(r), np.asarray(s)

    def _sem_top_m(self, query_emb: np.ndarray, spec: FilterSpec, m: int):
        """Device top-M semantic candidates → (rows [m], scores [m]) on host."""
        idx = self.index
        spec = FilterSpec(require_embedding=True).merged_with(spec)
        m = min(m, idx.capacity)
        tier = self._scan_tier()
        if tier == "sharded":
            r, s = self._sharded_top_m(query_emb, spec, m)
            good = (r[0] >= 0) & (s[0] > NEG_INF / 2)
            return r[0][good], s[0][good]
        if tier in ("ivf", "pq"):
            if tier == "ivf":
                r, s = self._ivf_top_m_batch(query_emb, spec, m)
            else:
                r, s = self._pq_top_m_batch(query_emb, idx.filter_mask(spec), m)
            good = (r[0] >= 0) & (s[0] > NEG_INF / 2)
            return r[0][good], s[0][good]
        mask = idx.filter_mask(spec)
        if (tier == "int8" and self.use_pallas
                and self.config.probe_single_queries
                and idx.capacity >= 1 << 20
                and jax.default_backend() != "cpu"):
            # single-query latency path on big corpora: the bound-ordered
            # fused PQ4 probe scans ~a few blocks instead of the whole int8
            # corpus (device IVF, VERDICT r2 #6); exact re-rank keeps recall
            r, s = self._pq_top_m_batch(query_emb, mask, m)
            good = (r[0] >= 0) & (s[0] > NEG_INF / 2)
            return r[0][good], s[0][good]
        q = jnp.asarray(np.atleast_2d(query_emb))
        if tier == "int8" and self.use_pallas:
            # large corpus: int8 pooled scan (half the HBM traffic,
            # k-independent selection) + exact re-rank on host f32 rows
            from rassengine_tpu.ops.fused_topk import fused_topk_int8_pooled

            with stage("semantic_scan_int8"):
                qcols = idx.device_columns_int8()
                try:
                    over = min(max(4 * m, 32), idx.capacity, 256)
                    s8, rows = fused_topk_int8_pooled(
                        qcols["codes"], qcols["scales"], q, mask, over,
                        idx.block_rows,
                        block_scales=qcols.get("block_scales"))
                    rows = np.asarray(rows[0])
                    rows = rows[(rows >= 0) & (np.asarray(s8[0]) > NEG_INF / 2)]
                    exact = self._sem_scores_for(query_emb, rows)
                    order = np.argsort(-exact)[:m]
                    return rows[order], exact[order]
                except Exception:
                    log.debug("int8 scan unavailable; falling back")
        cols = idx.device_columns()
        with stage("semantic_scan"):
            if self.use_pallas and idx.capacity >= idx.block_rows:
                try:
                    s, r = fused_topk_pooled(cols["vecs"], l2_normalize(q), mask,
                                             min(m, 256),
                                             min(idx.block_rows, idx.capacity))
                except Exception:  # CPU tests / interpret: fall back to XLA
                    log.debug("pallas fused_topk unavailable; using XLA path")
                    self.use_pallas = False
                    s, r = self._xla_topk(cols, q, mask, m)
            else:
                s, r = self._xla_topk(cols, q, mask, m)
        s, r = np.asarray(s[0]), np.asarray(r[0])
        good = (r >= 0) & (s > -1e29)
        return r[good], s[good]

    def _xla_topk(self, cols, q, mask, m):
        if self.index.capacity <= 65536:
            return exact_topk_direct(cols["vecs"], q, mask, m)
        return exact_topk(cols["vecs"], q, mask, m, self.index.block_rows)

    def _sem_scores_for(self, query_emb: np.ndarray, rows: np.ndarray) -> np.ndarray:
        """Exact cosine for specific rows from the host-canonical f32 vectors."""
        if rows.size == 0:
            return np.zeros(0, np.float32)
        q = np.asarray(query_emb, np.float32).reshape(-1)
        q = q / max(float(np.linalg.norm(q)), 1e-12)
        v = self.index._vecs[rows]
        return (v @ q).astype(np.float32)

    def _lex_top_m(self, query: str, spec: FilterSpec, m: int, group: str = "text",
                   **kw):
        host_mask = self.index.host_mask(spec)
        with stage("lexical_scan"):
            return self.lexical.top_m(query, self.index.capacity, m, group,
                                      host_mask=host_mask, **kw)

    def _fuse(self, parts: list[tuple[np.ndarray, np.ndarray, float]], k: int,
              sem_rows_mask: np.ndarray | None = None) -> list[Hit]:
        """parts: [(rows, scores, weight)] → weighted-sum fusion over the union."""
        acc: dict[int, float] = {}
        for rows, scores, w in parts:
            for r, s in zip(rows.tolist(), scores.tolist()):
                acc[r] = acc.get(r, 0.0) + w * s
        ranked = sorted(acc.items(), key=lambda kv: -kv[1])[:k]
        out = []
        for r, s in ranked:
            src = self.index.docs[r]
            if src is not None:
                out.append((src, float(s)))
        return out

    def has_any_data(self) -> bool:
        return self.index.has_any_data()

    # --- the 12 strategies ----------------------------------------------------

    def semantic_search_batch(self, queries: list[str], query_embs: np.ndarray,
                              k: int = 3, filter_clause=None,
                              patient_id=None) -> list[list[Hit]]:
        """Batched semantic_search: one scan for B queries (shared filter)."""
        spec = self._spec(filter_clause, patient_id)
        rows, scores = self._sem_top_m_batch(query_embs, spec, k)
        out: list[list[Hit]] = []
        for b in range(rows.shape[0]):
            hits = []
            for r, s in zip(rows[b], scores[b]):
                if r < 0 or s <= NEG_INF / 2:
                    continue
                src = self.index.docs[int(r)]
                if src is not None:
                    hits.append((src, float(s)))
            out.append(hits)
        return out

    def hybrid_search_batch(self, queries: list[str], query_embs: np.ndarray,
                            k: int = 3, filter_clause=None,
                            patient_id=None) -> list[list[Hit]]:
        """Batched hybrid_search — device BM25 + one scan, zero per-query host
        work (falls back to candidate-union fusion past the bf16 HBM budget)."""
        spec = self._spec(filter_clause, patient_id)
        idx = self.index
        if (self.mesh is None
                and (2 * idx.capacity * idx.dim <= HYBRID_BF16_BUDGET_BYTES
                     or (self.use_pallas and idx.capacity * idx.dim
                         <= self.config.int8_hbm_budget_bytes))):
            try:
                return self._hybrid_batch_device(queries, query_embs, k, spec)
            except Exception:
                log.exception("device hybrid path failed; using candidate union")
        elif self.mesh is not None and (self._bf16_fits()
                                        or self._int8_fits()):
            try:
                return self._hybrid_batch_sharded(queries, query_embs, k,
                                                  spec)
            except Exception:
                log.exception(
                    "sharded hybrid path failed; using candidate union")
        m = max(4 * k, 50)
        sem_rows, sem_scores = self._sem_top_m_batch(query_embs, spec, m)
        out: list[list[Hit]] = []
        for b, query in enumerate(queries):
            lex_t = self._lex_top_m(query, spec, m, "text", fuzzy=True)
            lex_k = self._lex_top_m(query, spec, m, "keyword", fuzzy=True)
            good = sem_rows[b] >= 0
            parts = [(lex_t[0], lex_t[1], 1.5), (lex_k[0], lex_k[1], 1.0),
                     (sem_rows[b][good], sem_scores[b][good], 2.0)]
            lex_only = np.setdiff1d(np.concatenate([lex_t[0], lex_k[0]]),
                                    sem_rows[b]).astype(np.int64)
            lex_only = lex_only[self.index._has_embedding[lex_only]]
            parts.append((lex_only, self._sem_scores_for(query_embs[b], lex_only),
                          2.0))
            out.append(self._fuse(parts, k))
        return out

    def _hybrid_batch_device(self, queries: list[str], query_embs: np.ndarray,
                             k: int, spec: FilterSpec,
                             lex_weights: dict[str, float] | None = None,
                             sem_weight: float = 2.0) -> list[list[Hit]]:
        """Fully on-device batched hybrid (reference boosts main.py:1562-1615).

        Host work is O(#query terms) dict lookups (device_bm25.plan); the
        batch then runs as ONE jitted dispatch — corpus scan + sparse BM25 +
        exact additive fusion ``2·cos + Σ w·bm25`` over BM25-top-M ∪
        semantic-top-m candidates (device_bm25 docstring).
        """
        from rassengine_tpu.lexical.device_bm25 import hybrid_topk_batch

        idx = self.index
        chunk_ids, view, wvec = self.device_lexical.plan(
            queries, lex_weights or {"text": 1.5, "keyword": 1.0})
        mask = idx.filter_mask(spec)
        q = np.atleast_2d(np.asarray(query_embs, np.float32))
        sem_m = getattr(self.config, "hybrid_sem_m", None)
        m = min(sem_m or max(4 * k, 64),
                idx.capacity if sem_m else min(128, idx.capacity))
        # beyond the bf16 hybrid budget the dispatch runs from int8 codes
        # ONLY (~0.5% bounded score noise, 6× more rows/chip); bf16 rows
        # never upload. Within budget, bf16 rows are the single resident
        # form — exact scores, no double residency — unless the operator
        # opts into HYBRID_SELECT=int8only (max-QPS mode: half the HBM
        # read, all-integer epilogue, quantized final scores; the bench
        # gate measures its recall vs the f32 fused oracle).
        int8_only = self.use_pallas and (
            2 * idx.capacity * idx.dim > HYBRID_BF16_BUDGET_BYTES
            or getattr(self.config, "hybrid_select", "auto") == "int8only")
        int8_tables = None
        int8_bscales = None
        if int8_only:
            c8 = idx.device_columns_int8()
            int8_tables = (c8["codes"], c8["scales"])
            int8_bscales = c8.get("block_scales")
            vecs_arg, scan_mode = None, "pallas_int8"
        else:
            vecs_arg = idx.device_columns()["vecs"]
            if self.use_pallas and idx.capacity >= idx.block_rows:
                if self._int8_select():
                    # int8 SELECTS the semantic top-m (block-scale codes,
                    # half the HBM read, all-integer epilogue); the bf16
                    # rows re-score candidates exactly inside the dispatch
                    c8 = idx.device_columns_int8()
                    int8_tables = (c8["codes"], c8["scales"])
                    int8_bscales = c8.get("block_scales")
                    scan_mode = "pallas_int8"
                else:
                    scan_mode = "pallas"
            elif idx.capacity <= 65536:
                scan_mode = "xla_direct"
            else:
                scan_mode = "xla_scan"

        def run(mode):
            with stage("hybrid_batch"):
                return hybrid_topk_batch(
                    vecs_arg, mask, jnp.asarray(q), view.tables,
                    jnp.asarray(chunk_ids), wvec,
                    sem_weight, min(k, 256), m=m,
                    top_m_lex=getattr(self.config, "hybrid_top_m_lex", 128),
                    block_rows=min(idx.block_rows, idx.capacity),
                    scan_mode=mode, int8_tables=int8_tables,
                    int8_block_scales=int8_bscales,
                    sem_bm_join=getattr(self.config, "hybrid_sem_bm_join",
                                        "all"))

        try:
            top_s, top_r = run(scan_mode)
        except Exception:
            if not scan_mode.startswith("pallas") or int8_only:
                raise  # int8-only has no in-budget fallback form
            self.use_pallas = False
            top_s, top_r = run("xla_direct" if idx.capacity <= 65536
                               else "xla_scan")
        return self._fused_rows_to_hits(np.asarray(top_s), np.asarray(top_r))

    def _fused_rows_to_hits(self, top_s: np.ndarray,
                            top_r: np.ndarray) -> list[list[Hit]]:
        """Device fused (scores, rows) [B, k] → per-query hit lists."""
        idx = self.index
        out: list[list[Hit]] = []
        for b in range(top_r.shape[0]):
            hits: list[Hit] = []
            for s, r in zip(top_s[b], top_r[b]):
                if r < 0 or s <= NEG_INF / 2 or s <= 0.0:
                    continue
                src = idx.docs[int(r)]
                if src is not None:
                    hits.append((src, float(s)))
            out.append(hits)
        return out

    def _hybrid_batch_sharded(self, queries: list[str],
                              query_embs: np.ndarray, k: int,
                              spec: FilterSpec,
                              lex_weights: dict[str, float] | None = None,
                              sem_weight: float = 2.0) -> list[list[Hit]]:
        """Meshed one-dispatch hybrid: per-shard Pallas scan + replicated
        sparse BM25 (each shard keeps the candidates it owns) + exact
        additive fusion, merged with one all-gather
        (parallel/topk_merge.sharded_hybrid_topk). Previously a sharded
        corpus fell back to per-query host candidate-union fusion. Past the
        per-shard bf16 budget the dispatch runs entirely from row-sharded
        int8 codes (~0.5% bounded noise, ~6× more rows/chip) — the sharded
        analogue of _hybrid_batch_device's int8-only regime."""
        from rassengine_tpu.parallel.topk_merge import (sharded_hybrid_topk,
                                                        to_host)

        idx = self.index
        chunk_ids, view, wvec = self.device_lexical.plan(
            queries, lex_weights or {"text": 1.5, "keyword": 1.0})
        mask = self._routed_mask(idx.filter_mask(spec), spec)
        q = np.atleast_2d(np.asarray(query_embs, np.float32))
        sem_m = getattr(self.config, "hybrid_sem_m", None)
        m = min(sem_m or max(4 * k, 64),
                idx.capacity if sem_m else min(128, idx.capacity))
        int8_bscales, sbr = None, 2048
        int8only = (self.use_pallas and getattr(
            self.config, "hybrid_select", "auto") == "int8only")
        if self._bf16_fits() and not int8only:
            vecs_arg, int8_tables = idx.device_columns()["vecs"], None
            if self.use_pallas and self._int8_select():
                # speed mode: per-shard int8 SELECT + bf16 re-score
                c8 = idx.device_columns_int8()
                int8_tables = (c8["codes"], c8["scales"])
                int8_bscales = c8.get("block_scales")
                sbr = c8.get("scale_block_rows", 2048)
        else:  # bf16 rows never upload — codes are the only resident form
            c8 = idx.device_columns_int8()
            vecs_arg, int8_tables = None, (c8["codes"], c8["scales"])
            int8_bscales = c8.get("block_scales")
            sbr = c8.get("scale_block_rows", 2048)
        with stage("hybrid_batch_sharded"):
            top_s, top_r = sharded_hybrid_topk(
                self.mesh, vecs_arg, mask,
                jnp.asarray(q), view.tables, jnp.asarray(chunk_ids), wvec,
                sem_weight, min(k, 256), m=m,
                top_m_lex=getattr(self.config, "hybrid_top_m_lex", 128),
                use_pallas=None if self.use_pallas else False,
                int8_tables=int8_tables,
                int8_block_scales=int8_bscales, scale_block_rows=sbr,
                sem_bm_join=getattr(self.config, "hybrid_sem_bm_join",
                                    "all"))
        return self._fused_rows_to_hits(to_host(top_s), to_host(top_r))

    def exact_match_search(self, query: str, k: int = 3,
                           filter_clause=None, patient_id=None) -> list[Hit]:
        """Phrase multi_match over text fields (reference main.py:1480-1525)."""
        if not query.strip():
            return []
        spec = self._spec(filter_clause, patient_id)
        rows, scores = self._lex_top_m(query, spec, max(k, 16), "text", phrase=True)
        return self._fuse([(rows, scores, 1.0)], k)

    def semantic_search(self, query: str, query_emb: np.ndarray, k: int = 3,
                        filter_clause=None, patient_id=None) -> list[Hit]:
        """Pure k-NN over unit vectors (reference main.py:1527-1560)."""
        if query_emb is None or np.size(query_emb) == 0:
            return []
        spec = self._spec(filter_clause, patient_id)
        rows, scores = self._sem_top_m(query_emb, spec, k)
        return self._fuse([(rows, scores, 1.0)], k)

    def _additive_hybrid(self, query: str, query_emb: np.ndarray, k: int,
                         spec: FilterSpec,
                         lex_weights: dict[str, float],
                         sem_weight: float,
                         extra_add: np.ndarray | None = None) -> list[Hit]:
        """Corpus-wide additive fusion in one scan.

        The scan kernels already add a per-row f32 vector to every score row
        (the filter mask); scattering the weighted sparse BM25 contributions
        into that vector makes the single pass compute
        ``sem_weight·cos + Σ w_g·bm25_g`` for EVERY corpus row — exactly
        OpenSearch's additive should-clause semantics, with no candidate-union
        approximation (a doc mediocre in each signal but strong combined is
        never missed). Docs without embeddings score 0 on the semantic term
        (their stored vector is zero), matching knn-clause behavior.
        """
        idx = self.index
        cap = idx.capacity
        # collect the weighted sparse BM25 contributions host-side (O(postings))
        parts_r: list[np.ndarray] = []
        parts_v: list[np.ndarray] = []
        for group, w in lex_weights.items():
            rows, vals = self.lexical.score_sparse(query, cap, group, fuzzy=True)
            if rows.size:
                parts_r.append(rows.astype(np.int32))
                parts_v.append((w * vals).astype(np.float32))
        if extra_add is not None:
            nz = np.flatnonzero(extra_add)
            if nz.size:
                parts_r.append(nz.astype(np.int32))
                parts_v.append(extra_add[nz].astype(np.float32))
        rows_cat = np.concatenate(parts_r) if parts_r else np.zeros(0, np.int32)
        vals_cat = np.concatenate(parts_v) if parts_v else np.zeros(0, np.float32)
        rows_pad, vals_pad = _pad_pow2(rows_cat, vals_cat)
        q = np.asarray(query_emb, np.float32).reshape(1, -1)
        qn = q / max(float(np.linalg.norm(q)), 1e-12)
        # the additive vector is assembled ON DEVICE: base filter mask (already
        # device-resident) + scatter of the sparse contributions — only KBs
        # cross the host link per query. The scan computes cos + add'; dividing
        # add by sem_weight and re-scaling the result gives sem_weight·cos +
        # add uniformly on every scan path (the XLA path normalizes queries
        # internally, so the weight cannot ride on the query vector).
        base_mask = self._routed_mask(idx.filter_mask(spec), spec)
        add_dev = _scatter_scale(base_mask, jnp.asarray(rows_pad),
                                 jnp.asarray(vals_pad),
                                 jnp.float32(1.0 / sem_weight))
        qd = jnp.asarray(qn)
        with stage("hybrid_scan"):
            if self.mesh is not None:
                from rassengine_tpu.parallel.topk_merge import sharded_topk

                s, r = sharded_topk(self.mesh, idx.device_columns()["vecs"],
                                    add_dev, qd, min(k, cap))
            elif self.use_pallas and cap >= idx.block_rows:
                try:
                    cols = idx.device_columns()
                    s, r = fused_topk_pooled(cols["vecs"], qd, add_dev,
                                             min(k, 256),
                                             min(idx.block_rows, cap))
                except Exception:
                    self.use_pallas = False
                    s, r = self._xla_topk(idx.device_columns(), qd, add_dev, k)
            else:
                s, r = self._xla_topk(idx.device_columns(), qd, add_dev, k)
        from rassengine_tpu.parallel.topk_merge import to_host

        s, r = to_host(s)[0], to_host(r)[0]
        out = []
        for sc, row in zip(s, r):
            if row < 0 or sc <= NEG_INF / 2:
                continue
            final = float(sc) * sem_weight
            if final <= 0.0:
                continue
            src = idx.docs[int(row)]
            if src is not None:
                out.append((src, final))
        return out

    def fused_encode_search(self, embedder, query: str, kind: str, k: int = 3,
                            filter_clause=None, patient_id=None):
        """Lone-ask latency path: encode + scan in ONE dispatch (ROADMAP #4).

        ``kind`` ∈ {"semantic", "hybrid", "multi_intent"}. Semantically
        identical to ``embed_query`` + ``semantic_search`` /
        ``hybrid_search`` / ``multi_intent_search`` (the fused program
        inlines the same encoder forward and the same additive-scan math —
        fusion/fused_query.py), but a single ask pays one device round-trip
        instead of two. → (hits, query_emb [1, dim] f32), or None when
        ineligible. Coverage (round 3): bf16 single-chip; int8-only
        hybrid/multi_intent past the bf16 budget (pallas_int8, ~0.5%
        bounded score noise — the same regime _hybrid_batch_device serves
        batched); sharded meshes while the per-shard partition fits bf16
        (encode + scatter + shard_map scan as one program). Multi-stage
        paths remain for: semantic on quantized tiers (their exact re-rank
        is a host stage), sharded int8/PQ tiers, and the IVF probe.
        """
        idx = self.index
        if embedder is None or not query.strip():
            return None
        int8_only = False
        if self.mesh is not None:
            if not self._bf16_fits():
                return None  # sharded int8/PQ tiers re-rank host-side
        elif not self._bf16_fits():
            if (kind == "semantic" or not self.use_pallas
                    or idx.capacity * idx.dim
                    > self.config.int8_hbm_budget_bytes):
                return None
            int8_only = True
        if (kind == "semantic" and self.mesh is None
                and self._scan_tier() != "exact"):
            return None  # int8/PQ/IVF single-query paths have host stages
        spec = self._spec(filter_clause, patient_id)
        sem_weight = 2.0
        if kind in ("hybrid", "multi_intent"):
            # sparse BM25 contributions (+ multi_intent's recency bonus),
            # scattered on device into the filter mask — corpus-wide
            # additive fusion (same math as _additive_hybrid)
            if kind == "hybrid":
                lex_weights = {"text": 1.5, "keyword": 1.0}
                extra_add = None
            else:
                lex_weights, sem_weight = {"text": 1.0, "keyword": 0.5}, 1.5
                today = _today_epoch_days()
                d = idx._dates
                recent = ((d != schema.NO_DATE) & (d >= today - 365)
                          & (d <= today)).any(axis=1)
                extra_add = np.where(recent, np.float32(0.5),
                                     np.float32(0.0))
            parts_r, parts_v = [], []
            for group, w in lex_weights.items():
                rows, vals = self.lexical.score_sparse(query, idx.capacity,
                                                       group, fuzzy=True)
                if rows.size:
                    parts_r.append(rows.astype(np.int32))
                    parts_v.append((w * vals).astype(np.float32))
            if extra_add is not None:
                nz = np.flatnonzero(extra_add)
                if nz.size:
                    parts_r.append(nz.astype(np.int32))
                    parts_v.append(extra_add[nz].astype(np.float32))
            rows_cat = (np.concatenate(parts_r) if parts_r
                        else np.zeros(0, np.int32))
            vals_cat = (np.concatenate(parts_v) if parts_v
                        else np.zeros(0, np.float32))
            rows_pad, vals_pad = _pad_pow2(rows_cat, vals_cat)
            base_mask = self._routed_mask(idx.filter_mask(spec), spec)
            scat_r, scat_v = jnp.asarray(rows_pad), jnp.asarray(vals_pad)
        else:
            spec_e = FilterSpec(require_embedding=True).merged_with(spec)
            base_mask = self._routed_mask(idx.filter_mask(spec_e), spec)
            scat_r = scat_v = None
        cap = idx.capacity
        if self.mesh is not None:
            mode = "sharded"
        elif int8_only:
            mode = "pallas_int8"
        elif self.use_pallas and cap >= idx.block_rows:
            mode = "pallas"
        elif cap <= 65536:
            mode = "xla_direct"
        else:
            mode = "xla_scan"

        from rassengine_tpu.fusion.fused_query import (encode_scan_topk,
                                                       encode_scan_topk_sharded)

        embed_fn, params, proj, ids, tok_mask = embedder.encode_args([query])

        def run(m):
            with stage("encode_scan_fused"):
                if m == "sharded":
                    return encode_scan_topk_sharded(
                        self.mesh, embed_fn, params, proj, ids, tok_mask,
                        idx.device_columns()["vecs"], base_mask, scat_r,
                        scat_v, 1.0 / sem_weight, k=min(k, 256, cap),
                        use_pallas=None if self.use_pallas else False)
                if m == "pallas_int8":
                    c8 = idx.device_columns_int8()
                    return encode_scan_topk(
                        embed_fn, params, proj, ids, tok_mask, None,
                        base_mask, scat_r, scat_v, 1.0 / sem_weight,
                        k=min(k, 256, cap),
                        block_rows=min(idx.block_rows, cap), mode=m,
                        int8_codes=c8["codes"], int8_scales=c8["scales"],
                        int8_block_scales=c8.get("block_scales"))
                return encode_scan_topk(
                    embed_fn, params, proj, ids, tok_mask,
                    idx.device_columns()["vecs"], base_mask, scat_r, scat_v,
                    1.0 / sem_weight, k=min(k, 256, cap),
                    block_rows=min(idx.block_rows, cap), mode=m)

        try:
            emb, s, r = run(mode)
        except Exception:
            if mode in ("sharded", "pallas_int8"):
                log.exception("fused %s lone ask failed; multi-stage path",
                              mode)
                return None
            if mode != "pallas":
                raise
            self.use_pallas = False
            emb, s, r = run("xla_direct" if cap <= 65536 else "xla_scan")
        from rassengine_tpu.parallel.topk_merge import to_host

        emb, s, r = to_host(emb), to_host(s), to_host(r)  # ONE host fetch
        query_emb = np.asarray(emb[:1], np.float32)
        s, r = s[0], r[0]
        if kind != "semantic":
            hits = []
            for sc, row in zip(s, r):
                if row < 0 or sc <= NEG_INF / 2:
                    continue
                final = float(sc) * sem_weight
                if final <= 0.0:
                    continue
                src = idx.docs[int(row)]
                if src is not None:
                    hits.append((src, final))
        else:
            good = (r >= 0) & (s > NEG_INF / 2)
            hits = self._fuse([(r[good], s[good], 1.0)], k)
        return hits, query_emb

    def hybrid_search(self, query: str, query_emb: np.ndarray, k: int = 3,
                      filter_clause=None, patient_id=None) -> list[Hit]:
        """BM25 text(1.5) + keyword(1.0) + knn(2.0) (reference main.py:1562-1615),
        fused corpus-wide in one scan (see _additive_hybrid)."""
        if not query.strip():
            return []
        spec = self._spec(filter_clause, patient_id)
        idx = self.index
        has_emb = query_emb is not None and np.size(query_emb) and idx.has_any_data()
        if has_emb and self._bf16_fits():
            return self._additive_hybrid(query, query_emb, k, spec,
                                         {"text": 1.5, "keyword": 1.0}, 2.0)
        m = max(4 * k, 50)
        lex_t_rows, lex_t_scores = self._lex_top_m(query, spec, m, "text",
                                                   fuzzy=True)
        lex_k_rows, lex_k_scores = self._lex_top_m(query, spec, m, "keyword",
                                                   fuzzy=True)
        parts = [(lex_t_rows, lex_t_scores, 1.5), (lex_k_rows, lex_k_scores, 1.0)]
        if has_emb:
            # beyond the bf16 HBM budget: candidate-union fusion over the
            # quantized scan tier (int8/PQ) instead of the corpus-wide pass
            sem_rows, sem_scores = self._sem_top_m(query_emb, spec, m)
            parts.append((sem_rows, sem_scores, 2.0))
            lex_only = np.setdiff1d(np.concatenate([lex_t_rows, lex_k_rows]),
                                    sem_rows).astype(np.int64)
            lex_only = lex_only[self.index._has_embedding[lex_only]]
            parts.append((lex_only,
                          self._sem_scores_for(query_emb, lex_only), 2.0))
        return self._fuse(parts, k)

    def structured_search(self, query: str, k: int = 3,
                          filter_clause=None, patient_id=None) -> list[Hit]:
        """Term/phrase matching over structured fields only (fixed vs reference
        main.py:1617-1708, which raises NameError on its commented field list)."""
        if not query.strip():
            return []
        spec = self._spec(filter_clause, patient_id,
                          doc_type=schema.DOC_TYPE.STRUCTURED)
        rows, scores = self._lex_top_m(query, spec, max(k, 16), "structured")
        return self._fuse([(rows, scores, 1.0)], k)

    def hybrid_structured_search(self, query: str, query_emb: np.ndarray, k: int = 3,
                                 filter_clause=None, patient_id=None) -> list[Hit]:
        """phrase_prefix over structured fields + knn, doc_type=structured filter
        (reference main.py:1710-1775)."""
        if not query.strip():
            return []
        spec = self._spec(filter_clause, patient_id,
                          doc_type=schema.DOC_TYPE.STRUCTURED)
        rows, scores = self._lex_top_m(query, spec, max(4 * k, 50), "structured",
                                       prefix_last=True)
        parts = [(rows, scores, 1.0)]
        if query_emb is not None and np.size(query_emb):
            # reference applies the structured filter to its knn clause too;
            # structured docs only carry embeddings when embed_structured is on
            sem_rows, sem_scores = self._sem_top_m(query_emb, spec, max(k, 16))
            parts.append((sem_rows, sem_scores, 1.0))
        return self._fuse(parts, k)

    def aggregate_search(self, query: str, filter_clause=None,
                         patient_id=None) -> dict:
        """Terms aggregations by condition/resource/patient (main.py:1777-1808).

        Vectorized bincounts over the index's dense-coded agg columns — a
        1M-doc tenant aggregates in milliseconds instead of a Python doc loop.
        """
        spec = self._spec(filter_clause, patient_id)
        with stage("aggregate"):
            mask = self.index.host_mask(spec)
            return {
                "by_condition": self.index.agg_buckets("condition", mask),
                "by_resource": self.index.agg_buckets("resource", mask),
                "by_patient": self.index.agg_buckets("patient", mask),
            }

    def comparison_search(self, query: str, k: int = 3,
                          filter_clause=None, patient_id=None) -> list[Hit]:
        """best_fields over comparison fields (reference main.py:1810-1864)."""
        if not query.strip():
            return []
        spec = self._spec(filter_clause, patient_id)
        rows, scores = self._lex_top_m(query, spec, max(k, 16), "compare")
        return self._fuse([(rows, scores, 1.0)], k)

    def temporal_search(self, query: str, k: int = 3,
                        filter_clause=None, patient_id=None) -> list[Hit]:
        """Text match AND any-date-in-last-year, sorted by onset desc
        (reference main.py:1866-1918)."""
        if not query.strip():
            return []
        today = _today_epoch_days()
        ranges = {f: (today - 365, today) for f in schema.DATE_FIELDS}
        spec = self._spec(filter_clause, patient_id).merged_with(
            FilterSpec(date_ranges=ranges)
        )
        t_rows, t_scores = self._lex_top_m(query, spec, max(4 * k, 50), "text")
        k_rows, k_scores = self._lex_top_m(query, spec, max(4 * k, 50), "keyword")
        hits = self._fuse([(t_rows, t_scores, 1.0), (k_rows, k_scores, 1.0)],
                          max(4 * k, 50))

        def onset(h: Hit):
            d = schema.date_to_epoch_days(h[0].get("conditionOnsetDateTime"))
            return d if d != schema.NO_DATE else -(2**31)

        hits.sort(key=onset, reverse=True)
        return hits[:k]

    def explanatory_search(self, query: str, k: int = 3,
                           filter_clause=None, patient_id=None) -> list[Hit]:
        """Note-field boosted match (reference main.py:1920-1967)."""
        if not query.strip():
            return []
        spec = self._spec(filter_clause, patient_id)
        rows, scores = self._lex_top_m(query, spec, max(k, 16), "note")
        return self._fuse([(rows, scores, 1.0)], k)

    def multi_intent_search(self, query: str, query_emb: np.ndarray, k: int = 3,
                            filter_clause=None, patient_id=None) -> list[Hit]:
        """text(1.0) + keyword(0.5) + knn(1.5) + recency bonus(0.5)
        (reference main.py:1969-2027, with its collapsed date clauses fixed),
        fused corpus-wide in one scan."""
        if not query.strip():
            return []
        spec = self._spec(filter_clause, patient_id)
        # recency bonus as an additive per-row vector from the date columns
        today = _today_epoch_days()
        d = self.index._dates  # [cap, n_date] epoch days
        recent = ((d != schema.NO_DATE) & (d >= today - 365) & (d <= today)).any(axis=1)
        bonus = np.where(recent, np.float32(0.5), np.float32(0.0))
        if (query_emb is not None and np.size(query_emb)
                and self.index.has_any_data() and self._bf16_fits()):
            return self._additive_hybrid(query, query_emb, k, spec,
                                         {"text": 1.0, "keyword": 0.5}, 1.5,
                                         extra_add=bonus)
        m = max(4 * k, 50)
        t_rows, t_scores = self._lex_top_m(query, spec, m, "text")
        k_rows, k_scores = self._lex_top_m(query, spec, m, "keyword")
        hits = self._fuse([(t_rows, t_scores, 1.0), (k_rows, k_scores, 0.5)],
                          max(2 * k, 20))
        def _bonus(src) -> float:
            row = self.index._id_to_row.get(str(src.get("doc_id")))
            return float(bonus[row]) if row is not None else 0.0

        rescored = [(src, s + _bonus(src)) for src, s in hits]
        rescored.sort(key=lambda h: -h[1])
        return rescored[:k]

    def entity_specific_search(self, query: str, k: int = 3,
                               filter_clause=None, patient_id=None) -> list[Hit]:
        """Phrase+AND over entity fields, OR fallback (reference main.py:2029-2074)."""
        if not query.strip():
            return []
        spec = self._spec(filter_clause, patient_id)
        rows, scores = self._lex_top_m(query, spec, max(k, 16), "entity",
                                       phrase=True, require_all=True)
        if rows.size == 0:
            # OR fallback with AUTO-style fuzziness (reference patient-name
            # lookup fuzzy should-clause, main.py:2709-2731)
            rows, scores = self._lex_top_m(query, spec, max(k, 16), "entity",
                                           fuzzy=True)
        return self._fuse([(rows, scores, 1.0)], k)

    def document_fetch_search(self, query: str, k: int = 3,
                              filter_clause=None, patient_id=None) -> list[Hit]:
        """patientId-filtered fetch collapsed to distinct source files
        (reference main.py:2120-2150)."""
        if not patient_id:
            return []
        spec = self._spec(filter_clause, patient_id)
        mask = self.index.host_mask(spec)
        # vectorized collapse: first row of each distinct file key in row order
        rows = self.index.distinct_first_rows("filekey", mask, k)
        out: list[Hit] = []
        for r in rows:
            doc = self.index.docs[int(r)]
            if doc:
                out.append((doc, 1.0))
        return out
