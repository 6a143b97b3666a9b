"""Engine configuration.

Environment-driven config surface with the same knobs the reference exposes via
`.env` + os.getenv (reference: app/main.py:59-108, app/embedding_gen.py:39-70,
.env.example:1-34), plus TPU-native knobs (mesh shape, dtypes, index capacity)
that have no reference counterpart.

Unlike the reference (module-level constants read at import), config here is an
explicit immutable dataclass so tests and multi-tenant servers can construct
isolated configurations.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.getenv(name, default))
    except (TypeError, ValueError):
        return default


def _env_float(name: str, default: float) -> float:
    try:
        return float(os.getenv(name, default))
    except (TypeError, ValueError):
        return default


def _env_bool(name: str, default: bool) -> bool:
    raw = os.getenv(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


@dataclass(frozen=True)
class EngineConfig:
    # --- embedding / encoder (reference: EMBED_DIM, OLLAMA_EMBED_MODEL) ---
    embed_dim: int = 1024
    embed_model: str = "mxbai-embed-large-tpu"  # BERT-large-class bi-encoder
    embed_max_seq_len: int = 512
    embed_batch_size: int = 64          # reference BATCH_SIZE (main.py:78)
    # bulk-ingest embed batch: ingestion is throughput- not latency-bound,
    # so it amortizes dispatch + tunnel round-trips over larger forwards
    # than the per-query default (measured: the engine ingest path at
    # batch 256 vs the upload app's 64 is the bulk of their docs/s gap).
    # 0 → fall back to embed_batch_size; from_env serves 256
    ingest_embed_batch: int = 0
    encoder_weights_path: str = ""      # empty → deterministic random init
    # --- chunking (reference: CHUNK_SIZE main.py:79, ADAPTIVE_CHUNKING main.py:100) ---
    chunk_size: int = 512               # words per chunk
    adaptive_chunking: bool = True      # implemented for real here (dead flag upstream)
    chunk_overlap: int = 0
    # --- retrieval (reference: TOP_K main.py:88) ---
    top_k: int = 3
    # --- index (TPU-native; replaces OpenSearch index settings main.py:350-579) ---
    index_prefix: str = "rass-index"    # reference OPENSEARCH_INDEX_NAME prefix
    index_capacity: int = 16384         # initial padded capacity per tenant, grows 2x
    index_block_rows: int = 2048        # rows per scan block (streaming top-k)
    shard_count: int = 1                # reference SHARD_COUNT (main.py:89)
    replica_count: int = 0              # reference REPLICA_COUNT (main.py:90)
    vector_dtype: str = "bfloat16"
    # device-loss detection → auto reshard onto survivors (parallel/health.py;
    # beyond reference parity — its recovery is Docker restart + OpenSearch
    # replicas, docker-compose.yml:38-51). 0 disables; only armed when a
    # multi-device mesh is serving.
    health_interval_s: float = 15.0
    health_probe_timeout_s: float = 20.0
    # --- ANN (replaces HNSW m=48 ef_construction=400, main.py:563-572) ---
    ann_enabled: bool = True
    ann_threshold: int = 200_000        # below this, exact scan is faster than IVF
    ann_mode: str = "auto"              # auto | exact | int8 | pq | ivf
    ivf_nlist: int = 1024
    ivf_nprobe: int = 64
    ivf_rerank: int = 256               # exact re-rank depth after list scan
    ivf_tail_bound: int = 32768         # brute-forced fresh-tail rows before rebuild
    pq_subvectors: int = 64             # PQ bytes/vector (>int8-budget corpora)
    probe_single_queries: bool = True   # B=1 on ≥1M corpora → bound-ordered PQ probe
    pq_oversample: int = 8              # ADC candidates = oversample × k
    int8_hbm_budget_bytes: int = 12 * 1024**3  # beyond this, codes go PQ
    # within-bf16-budget hybrid semantic stage: "bf16" scans the bf16 rows;
    # "int8" selects candidates with the block-scale int8 scan (half the HBM
    # read, all-integer epilogue) and re-scores them from bf16 in-dispatch
    # (double residency: 3 B/dim). "auto" picks int8 when both forms fit.
    # "int8only" serves the WHOLE hybrid from the codes even in budget
    # (max QPS; final scores carry ~0.5% bounded quantization noise —
    # bench.py gates its recall vs the f32 fused oracle).
    hybrid_select: str = "auto"         # auto | bf16 | int8 | int8only
    # where semantic candidates collect their BM25 term in the one-dispatch
    # hybrid: "all" = exact join vs every sparse candidate; "topm" = join vs
    # the BM25 top-M only (deletes 8/9 of the fuse join work at production
    # widths; a sem candidate loses BM25 evidence ranked below the M-th
    # lexical candidate — bench/hybrid_ablate.py gates it vs the f32 oracle)
    hybrid_sem_bm_join: str = "all"     # all | topm
    # BM25 candidates carried into the fusion epilogue per query. 128 is
    # the safe default; 32 halves the epilogue's gather/join and measured
    # ~1.4 ms faster per batch256 (hybrid_ablate full_M32) — a doc whose
    # BM25 evidence ranks below the M-th lexical candidate loses that term,
    # so drop it only under the bench's f32-fused-oracle recall gate
    hybrid_top_m_lex: int = 128
    # semantic candidates carried into the fusion epilogue per query
    # (the scan's in-kernel top-m). None = derived from k as
    # min(max(4k, 64), 128); narrowing shrinks the [B, maxp, m] fuse join
    # and the scan epilogue — same oracle-gate rule as hybrid_top_m_lex
    # (bench.py's M64/m48 path measured ~1.4 ms/batch256 faster at 0.9938)
    hybrid_sem_m: int | None = None
    lexical_packed_min_rows: int = 1 << 20  # ≥this, 4 B/posting packed CSR
    # --- NLU (reference: NER_MODEL_PATH, INTENT_MODEL_PATH, thresholds) ---
    ner_model_path: str = "./ner_model/final"
    intent_model_path: str = "./intent_model/final"
    intent_threshold: float = 0.75      # reference INTENT_THRESHOLD (main.py:2415)
    entity_threshold: float = 0.80      # NER confidence cutoff (main.py:2414)
    nlu_max_seq_len: int = 128          # main.py:2424, 2624
    # --- LLM generation (reference: BlueHive + OpenAI clients) ---
    bluehive_api_url: str = ""
    bluehive_bearer_token: str = ""
    openai_api_key: str = ""
    llm_backend: str = "echo"           # "bluehive" | "openai" | "echo" (test fake)
    use_llm_ner: bool = False           # reference's always-LLM NER path (main.py:2531)
    max_llm_concurrency: int = 5        # MAX_BLUEHIVE_CONCURRENCY (main.py:70)
    max_embed_concurrency: int = 5      # MAX_EMBED_CONCURRENCY (main.py:71)
    # --- chat persistence (reference: Prisma/Postgres, schema.prisma) ---
    database_path: str = "./rass_chat.db"   # sqlite; ":memory:" for tests
    max_chat_history: int = 10          # MAX_CHAT_HISTORY (main.py:96)
    # --- uploads (reference: embedding_gen.py:68-70) ---
    upload_dir: str = "./uploads"
    emb_dir: str = "sample_dataset"     # EMB_DIR bulk-ingestion directory
    max_files_per_request: int = 5
    max_file_size_bytes: int = 10 * 1024 * 1024
    max_concurrent_files: int = 5
    max_files_per_patient: int = 5      # MAX_FILES_PER_PATIENT (main.py:108)
    # --- semantic cache (reference defines but never uses: .env.example:19-24) ---
    cache_enabled: bool = True
    cache_max_items: int = 1000         # REDIS_MAX_ITEMS
    cache_sim_threshold: float = 0.88   # CACHE_SIM_THRESHOLD
    cache_ttl_seconds: float = 480.0    # REDIS_SHORT_TTL_SECONDS
    # --- mesh / parallelism (TPU-native; no reference counterpart) ---
    mesh_shape: tuple = ()              # () → all local devices on one "shard" axis
    dp_axis: str = "dp"
    tp_axis: str = "tp"
    shard_axis: str = "shard"
    # --- serving ---
    host: str = "0.0.0.0"
    port: int = 8000
    upload_port: int = 8001
    micro_batching: bool = True         # collect concurrent asks into one scan
    micro_batch_window_ms: float = 8.0
    micro_batch_max: int = 32
    # --- durability (HBM is volatile; no reference counterpart) ---
    checkpoint_dir: str = ""            # non-empty → restore at startup + periodic save
    checkpoint_interval_s: float = 300.0
    # non-empty → persistent XLA compilation cache: serving restarts skip the
    # 30-60 s first-compile of the big scan/encoder programs (torch.compile
    # has no cross-process cache in the reference — this is a TPU-side win)
    compile_cache_dir: str = ""
    # --- observability ---
    profile_dir: str = ""               # non-empty → jax.profiler traces per request
    audit_log_path: str = ""            # non-empty → JSONL audit trail (serve/audit.py)
    # --- serving protection (no reference counterpart; see serve/ratelimit.py) ---
    upload_rate_limit_per_min: float = 0.0  # per-user uploads/min; 0 = off
    admin_token: str = ""               # required header for /admin/* when set
    # non-empty → every serving endpoint requires "Authorization: Bearer
    # <token>". The reference's surface is unauthenticated (user_id is
    # self-asserted, main.py:2996-3018) — that parity default is fine on a
    # private network but NOT on an exposed one; this is the one-knob gate.
    api_token: str = ""
    # True → unknown chat_id is a 403 like the reference (main.py:2764-2767,
    # chats provisioned out of band); False keeps standalone auto-provision
    strict_chat_auth: bool = False

    def __post_init__(self):
        # enum knobs fail at CONSTRUCTION (startup for from_env), not on the
        # first query: a typo like HYBRID_SEM_BM_JOIN=top_m silently taking
        # the "all" branch is how an A/B measures the wrong join (ADVICE r4)
        if self.hybrid_sem_bm_join not in ("all", "topm"):
            raise ValueError("HYBRID_SEM_BM_JOIN must be 'all' or 'topm', "
                             f"got {self.hybrid_sem_bm_join!r}")
        if self.hybrid_select not in ("auto", "bf16", "int8", "int8only"):
            raise ValueError("HYBRID_SELECT must be one of auto|bf16|int8|"
                             f"int8only, got {self.hybrid_select!r}")
        if self.hybrid_top_m_lex < 1:
            raise ValueError("HYBRID_TOP_M_LEX must be >= 1, "
                             f"got {self.hybrid_top_m_lex}")
        if self.hybrid_sem_m is not None and self.hybrid_sem_m < 1:
            raise ValueError("HYBRID_SEM_M must be >= 1, "
                             f"got {self.hybrid_sem_m}")

    @staticmethod
    def from_env(**overrides) -> "EngineConfig":
        base = dict(
            embed_dim=_env_int("EMBED_DIM", 1024),
            embed_model=os.getenv("EMBED_MODEL", "mxbai-embed-large-tpu"),
            embed_batch_size=_env_int("BATCH_SIZE", 64),
            ingest_embed_batch=_env_int("INGEST_EMBED_BATCH", 256),
            # serving default: the shipped production 1024-d bi-encoder
            # (reference serves mxbai-embed-large, main.py:67; tests construct
            # EngineConfig directly and stay weightless). Round 4 ships the
            # 24L/16k-vocab pre-LN encoder; the 8L round-3 checkpoint remains
            # the fallback (and the low-latency choice via this env var).
            encoder_weights_path=os.getenv(
                "ENCODER_WEIGHTS_PATH",
                next((d for d in ("./encoder_model_prod24",
                                  "./encoder_model_prod")
                      if os.path.isdir(d)), "")),
            chunk_size=_env_int("CHUNK_SIZE", 512),
            adaptive_chunking=_env_bool("ADAPTIVE_CHUNKING", True),
            top_k=_env_int("TOP_K", 3),
            index_prefix=os.getenv("INDEX_NAME", os.getenv("OPENSEARCH_INDEX_NAME", "rass-index") or "rass-index"),
            index_capacity=_env_int("INDEX_CAPACITY", 16384),
            shard_count=_env_int("SHARD_COUNT", 1),
            replica_count=_env_int("REPLICA_COUNT", 0),
            health_interval_s=_env_float("HEALTH_INTERVAL_S", 15.0),
            health_probe_timeout_s=_env_float("HEALTH_PROBE_TIMEOUT_S", 20.0),
            ann_mode=os.getenv("ANN_MODE", "auto"),
            ivf_nlist=_env_int("IVF_NLIST", 1024),
            ivf_nprobe=_env_int("IVF_NPROBE", 64),
            ivf_rerank=_env_int("IVF_RERANK", 256),
            ivf_tail_bound=_env_int("IVF_TAIL_BOUND", 32768),
            pq_subvectors=_env_int("PQ_SUBVECTORS", 64),
            pq_oversample=_env_int("PQ_OVERSAMPLE", 8),
            probe_single_queries=_env_bool("PROBE_SINGLE_QUERIES", True),
            int8_hbm_budget_bytes=_env_int("INT8_HBM_BUDGET_BYTES", 12 * 1024**3),
            hybrid_select=os.getenv("HYBRID_SELECT", "auto"),
            hybrid_sem_bm_join=os.getenv("HYBRID_SEM_BM_JOIN", "all"),
            hybrid_top_m_lex=_env_int("HYBRID_TOP_M_LEX", 128),
            hybrid_sem_m=(int(os.environ["HYBRID_SEM_M"])
                          if os.getenv("HYBRID_SEM_M") else None),
            lexical_packed_min_rows=_env_int("LEXICAL_PACKED_MIN_ROWS", 1 << 20),
            # round-4 NLU checkpoints (6L/384 MLM-pretrained backbone, 16k
            # shared vocab) take precedence when present; the round-3 tiny
            # models remain the fallback
            ner_model_path=os.getenv(
                "NER_MODEL_PATH",
                "./ner_model_wide/final"
                if os.path.isdir("./ner_model_wide/final")
                else "./ner_model/final"),
            intent_model_path=os.getenv(
                "INTENT_MODEL_PATH",
                "./intent_model_wide/final"
                if os.path.isdir("./intent_model_wide/final")
                else "./intent_model/final"),
            intent_threshold=_env_float("INTENT_THRESHOLD", 0.75),
            entity_threshold=_env_float("ENTITY_THRESHOLD", 0.80),
            bluehive_api_url=os.getenv("BLUEHIVEAI_URL", ""),
            bluehive_bearer_token=os.getenv("BLUEHIVE_BEARER_TOKEN", ""),
            openai_api_key=os.getenv("OPENAI_API_KEY", ""),
            llm_backend=os.getenv("LLM_BACKEND", "echo"),
            use_llm_ner=_env_bool("USE_LLM_NER", False),
            max_llm_concurrency=_env_int("MAX_BLUEHIVE_CONCURRENCY", 5),
            max_embed_concurrency=_env_int("MAX_EMBED_CONCURRENCY", 5),
            database_path=os.getenv("DATABASE_PATH", "./rass_chat.db"),
            max_chat_history=_env_int("MAX_CHAT_HISTORY", 10),
            upload_dir=os.getenv("UPLOAD_DIR", "./uploads"),
            emb_dir=os.getenv("EMB_DIR", "sample_dataset"),
            max_files_per_request=_env_int("MAX_FILES_PER_REQUEST", 5),
            max_file_size_bytes=_env_int("MAX_FILE_SIZE_BYTES", 10 * 1024 * 1024),
            max_concurrent_files=_env_int("MAX_CONCURRENT_FILES", 5),
            max_files_per_patient=_env_int("MAX_FILES_PER_PATIENT", 5),
            cache_enabled=_env_bool("SEMANTIC_CACHE", True),
            cache_max_items=_env_int("REDIS_MAX_ITEMS", 1000),
            cache_sim_threshold=_env_float("CACHE_SIM_THRESHOLD", 0.88),
            cache_ttl_seconds=_env_float("REDIS_SHORT_TTL_SECONDS", 480.0),
            port=_env_int("PORT", 8000),
            upload_port=_env_int("UPLOAD_PORT", 8001),
            checkpoint_dir=os.getenv("CHECKPOINT_DIR", ""),
            compile_cache_dir=os.getenv("COMPILE_CACHE_DIR", ""),
            checkpoint_interval_s=_env_float("CHECKPOINT_INTERVAL_S", 300.0),
            profile_dir=os.getenv("PROFILE_DIR", ""),
            audit_log_path=os.getenv("AUDIT_LOG_PATH", ""),
            upload_rate_limit_per_min=_env_float(
                "UPLOAD_RATE_LIMIT_PER_MIN", 0.0),
            admin_token=os.getenv("ADMIN_TOKEN", ""),
            api_token=os.getenv("API_TOKEN", ""),
            strict_chat_auth=_env_bool("STRICT_CHAT_AUTH", False),
        )
        base.update(overrides)
        return EngineConfig(**base)

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)


_GLOBAL_CONFIG: EngineConfig | None = None


def get_config() -> EngineConfig:
    global _GLOBAL_CONFIG
    if _GLOBAL_CONFIG is None:
        _GLOBAL_CONFIG = EngineConfig.from_env()
    return _GLOBAL_CONFIG


def set_config(cfg: EngineConfig) -> None:
    global _GLOBAL_CONFIG
    _GLOBAL_CONFIG = cfg


def enable_compile_cache(cfg: EngineConfig) -> bool:
    """Arm JAX's persistent compilation cache when configured.

    Serving restarts then reuse compiled programs instead of paying the
    30-60 s first-compile of the scan/encoder kernels (COMPILE_CACHE_DIR;
    the reference's torch.compile recompiles every process start,
    main.py:153,173). Safe to call repeatedly; returns whether armed.
    """
    if not cfg.compile_cache_dir:
        return False
    import jax

    os.makedirs(cfg.compile_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cfg.compile_cache_dir)
    # default min compile time (1 s) skips tiny programs; cache the big ones
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True
