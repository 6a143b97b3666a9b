"""EngineConfig env parsing + tracing/metrics unit tests."""

import time

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.tracing import Metrics, new_trace, stage


class TestConfigFromEnv:
    def test_reference_env_names(self, monkeypatch):
        monkeypatch.setenv("EMBED_DIM", "512")
        monkeypatch.setenv("CHUNK_SIZE", "256")
        monkeypatch.setenv("TOP_K", "7")
        monkeypatch.setenv("MAX_CHAT_HISTORY", "4")
        monkeypatch.setenv("CACHE_SIM_THRESHOLD", "0.91")
        monkeypatch.setenv("BLUEHIVEAI_URL", "http://bh.example")
        monkeypatch.setenv("ADAPTIVE_CHUNKING", "false")
        cfg = EngineConfig.from_env()
        assert cfg.embed_dim == 512
        assert cfg.chunk_size == 256
        assert cfg.top_k == 7
        assert cfg.max_chat_history == 4
        assert cfg.cache_sim_threshold == 0.91
        assert cfg.bluehive_api_url == "http://bh.example"
        assert cfg.adaptive_chunking is False

    def test_ingest_embed_batch_knob(self, monkeypatch):
        # direct construction: 0 = fall back to embed_batch_size (keeps
        # test/bench configs small); serving (from_env) bulk-ingests at 256
        assert EngineConfig().ingest_embed_batch == 0
        assert EngineConfig.from_env().ingest_embed_batch == 256
        monkeypatch.setenv("INGEST_EMBED_BATCH", "128")
        assert EngineConfig.from_env().ingest_embed_batch == 128

    def test_hybrid_join_knob(self, monkeypatch):
        assert EngineConfig().hybrid_sem_bm_join == "all"
        monkeypatch.setenv("HYBRID_SEM_BM_JOIN", "topm")
        assert EngineConfig.from_env().hybrid_sem_bm_join == "topm"

    def test_hybrid_top_m_lex_knob(self, monkeypatch):
        import pytest

        assert EngineConfig().hybrid_top_m_lex == 128
        monkeypatch.setenv("HYBRID_TOP_M_LEX", "32")
        assert EngineConfig.from_env().hybrid_top_m_lex == 32
        with pytest.raises(ValueError):
            EngineConfig(hybrid_top_m_lex=0)

    def test_hybrid_sem_m_knob(self, monkeypatch):
        import pytest

        assert EngineConfig().hybrid_sem_m is None  # derived from k
        monkeypatch.setenv("HYBRID_SEM_M", "48")
        assert EngineConfig.from_env().hybrid_sem_m == 48
        with pytest.raises(ValueError):
            EngineConfig(hybrid_sem_m=0)

    def test_bad_values_fall_back(self, monkeypatch):
        monkeypatch.setenv("TOP_K", "not-a-number")
        cfg = EngineConfig.from_env()
        assert cfg.top_k == 3

    def test_overrides_win(self, monkeypatch):
        monkeypatch.setenv("TOP_K", "9")
        cfg = EngineConfig.from_env(top_k=2)
        assert cfg.top_k == 2

    def test_replace_immutability(self):
        a = EngineConfig()
        b = a.replace(top_k=11)
        assert a.top_k == 3 and b.top_k == 11


class TestTracing:
    def test_stage_records_to_trace_and_metrics(self):
        trace = new_trace("req-1")
        with stage("unit_stage"):
            time.sleep(0.01)
        assert trace.stages["unit_stage"] >= 0.01
        summary = trace.summary()
        assert summary["request_id"] == "req-1"
        assert summary["unit_stage_ms"] >= 10

    def test_metrics_snapshot(self):
        m = Metrics()
        m.incr("x")
        m.incr("x", 2)
        m.observe("lat", 0.002)
        m.observe("lat", 0.004)
        snap = m.snapshot()
        assert snap["counters"]["x"] == 3
        assert snap["latency"]["lat"]["count"] == 2
        assert snap["latency"]["lat"]["p50_ms"] >= 2


class TestPrometheusFormat:
    def test_prometheus_exposition(self):
        from rassengine_tpu.core.tracing import Metrics

        m = Metrics()
        m.incr("ask_requests", 3)
        m.observe("retrieve", 0.012)
        text = m.prometheus()
        assert "# TYPE rass_ask_requests_total counter" in text
        assert "rass_ask_requests_total 3" in text
        assert 'rass_retrieve_latency_ms{quantile="0.5"}' in text
        assert "rass_retrieve_latency_ms_count 1" in text

    def test_metrics_endpoint_format_param(self):
        import asyncio

        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.engine import RassEngine
        from rassengine_tpu.models.bert import BertConfig
        from rassengine_tpu.serve.app import build_app
        from rassengine_tpu.serve.http import Request

        cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=512,
                           database_path=":memory:", llm_backend="echo",
                           intent_model_path="/none", ner_model_path="/none")
        eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        app = build_app(eng)
        handler = app.routes[("GET", "/metrics")]
        resp = asyncio.run(handler(Request("GET", "/metrics",
                                           {"format": ["prometheus"]}, {})))
        assert resp.content_type.startswith("text/plain")
        assert b"# TYPE" in (resp.body if isinstance(resp.body, bytes)
                             else resp.body.encode())
        resp2 = asyncio.run(handler(Request("GET", "/metrics", {}, {})))
        assert resp2.content_type == "application/json"


class TestCompileCache:
    def test_env_knob_parsed(self, monkeypatch):
        from rassengine_tpu.core.config import EngineConfig

        monkeypatch.setenv("COMPILE_CACHE_DIR", "/tmp/xlacache-test")
        assert EngineConfig.from_env().compile_cache_dir == "/tmp/xlacache-test"

    def test_enable_arms_jax_and_writes_programs(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from rassengine_tpu.core.config import EngineConfig, enable_compile_cache

        assert not enable_compile_cache(EngineConfig())  # off by default
        cfg = EngineConfig(compile_cache_dir=str(tmp_path / "cc"))
        try:
            assert enable_compile_cache(cfg)
            assert jax.config.jax_compilation_cache_dir == cfg.compile_cache_dir
            # compile something non-trivial enough to be eligible; the cache
            # dir must exist (entries themselves depend on compile-time
            # thresholds, so only the arming is asserted strictly)
            jnp.ones((64, 64)).__matmul__(jnp.ones((64, 64))).block_until_ready()
            assert (tmp_path / "cc").is_dir()
        finally:
            jax.config.update("jax_compilation_cache_dir", None)
