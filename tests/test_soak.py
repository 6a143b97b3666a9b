"""Short-scale soak gate (the 30-min version runs via bench/soak.py).

Exercises the full mixed-traffic loop — REST asks, WS asks, uploads,
deletes, metrics — against real sockets for ~20 s and enforces the same
bounds the long soak reports: no 5xx, bounded RSS, no fd leak.
"""

import asyncio

from rassengine_tpu.bench.soak import run


def test_soak_short():
    res = asyncio.run(run(minutes=20 / 60.0, concurrency=3, sample_s=2.0))
    assert not res["errors"], res["errors"]
    for op, st in res["ops"].items():
        assert st.get("n", 0) >= 1, f"op {op} never ran"
        assert st.get("5xx", 0) == 0, (op, st)
    assert res["rss_bounded"] is True, res
    assert res["fds_bounded"] is True, res
