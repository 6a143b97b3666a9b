"""Automatic device-failure detection → live reshard (parallel/health.py).

Runs on the virtual 8-device CPU mesh: failures are injected via the
monitor's probe_fn hook; the reshard it triggers is the real
engine.reshard live re-placement path.
"""

import jax
import numpy as np
import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig
from rassengine_tpu.parallel.health import DeviceHealthMonitor, probe_devices


def mk_engine(shard_count):
    cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=2048,
                       index_block_rows=256, shard_count=shard_count,
                       database_path=":memory:", llm_backend="echo",
                       intent_model_path="/none", ner_model_path="/none")
    return RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)


def corpus_docs(n=60):
    conds = ["hypertension", "diabetes", "asthma", "bronchitis"]
    return [{"doc_id": f"d{i}", "doc_type": "unstructured",
             "patientId": f"p{i % 7}",
             "unstructuredText":
             f"patient note {i} about {conds[i % 4]} management"}
            for i in range(n)]


def test_probe_devices_all_healthy():
    healthy, failed = probe_devices(timeout_s=60.0)
    assert len(healthy) == len(jax.devices()) and not failed


class TestAutoReshard:
    def test_device_loss_reshards_onto_survivors(self):
        eng = mk_engine(8)
        assert eng.mesh is not None
        eng.ingest_docs("u", [], corpus_docs())
        before = eng.retrieve("u", "asthma management note", top_k=5)

        devs = jax.devices()
        state = {"dead": set()}
        mon = DeviceHealthMonitor(
            eng, fail_threshold=2,
            probe_fn=lambda: ([d for d in devs if d not in state["dead"]],
                              [d for d in devs if d in state["dead"]]))
        assert mon.tick() is False  # all healthy

        state["dead"] = {devs[2], devs[5]}  # non-suffix loss
        assert mon.tick() is False  # 1st failed tick: debounced
        assert mon.tick() is True   # 2nd: declared dead → reshard
        assert mon.resharded == 1
        assert eng.mesh is not None and eng.mesh.devices.size == 6
        assert not set(state["dead"]) & set(eng.mesh.devices.flat)

        after = eng.retrieve("u", "asthma management note", top_k=5)
        assert ([h["doc_id"] for h, _ in after.hits]
                == [h["doc_id"] for h, _ in before.hits])
        # no further reshard while the dead stay dead (handled + cleared)
        assert mon.tick() is False or mon.resharded == 1

    def test_idle_spare_loss_is_ignored(self):
        eng = mk_engine(4)  # mesh uses devices[:4]; 4 spares
        assert eng.mesh is not None and eng.mesh.devices.size == 4
        devs = jax.devices()
        spare = devs[7]
        mon = DeviceHealthMonitor(
            eng, fail_threshold=1,
            probe_fn=lambda: ([d for d in devs if d != spare], [spare]))
        assert mon.tick() is False
        assert mon.resharded == 0 and eng.mesh.devices.size == 4

    def test_all_dead_does_not_reshard(self):
        eng = mk_engine(2)
        devs = jax.devices()
        mon = DeviceHealthMonitor(eng, fail_threshold=1,
                                  probe_fn=lambda: ([], list(devs)))
        assert mon.tick() is False
        assert mon.resharded == 0

    def test_status_surface(self):
        eng = mk_engine(1)
        mon = DeviceHealthMonitor(eng, probe_fn=lambda: (jax.devices(), []))
        mon.tick()
        st = mon.status()
        assert st["healthy"] == len(jax.devices()) and st["failed"] == 0
        assert st["auto_reshards"] == 0


def test_probe_returns_despite_hung_device():
    """A wedged device hangs (not errors) — the probe must surface it as
    failed within ~timeout_s. Regression: the executor's context-manager
    exit joined the stuck thread, so probe_devices never returned."""
    import threading
    import time

    release = threading.Event()

    def probe_op(dev):
        if str(dev) == "hung":
            release.wait(30.0)   # simulates a device that never answers
            return 0.0
        return 1.0

    t0 = time.monotonic()
    healthy, failed = probe_devices(devices=["ok1", "hung", "ok2"],
                                    timeout_s=1.0, probe_op=probe_op)
    dt = time.monotonic() - t0
    release.set()  # unblock the abandoned worker thread before teardown
    assert failed == ["hung"] and set(healthy) == {"ok1", "ok2"}
    assert dt < 10.0, f"probe blocked {dt:.1f}s on the hung device"
