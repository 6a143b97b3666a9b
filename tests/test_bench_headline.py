"""Driver-contract headline bench: the drift-defense convergence loop.

The axon tunnel was observed holding EVERY timing sample ~11x over the
kernel's true latency for a full 12-minute run (fresh-attach pathology) —
a min-of-N that stops on sample agreement alone ships that regime as the
headline. bench.sample_until_stable adds a static HBM-roofline sanity
floor; these tests drive it with synthetic samplers (no device).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


FLOOR = {"int8": 1.31e-3, "bf16": 2.62e-3}


def test_stable_and_sane_stops_immediately():
    reps = {"int8": [1.9e-3, 1.95e-3], "bf16": [4.0e-3, 4.1e-3]}
    calls = []
    dts = bench.sample_until_stable(
        reps, lambda n: calls.append(n) or 1.9e-3, FLOOR, enforce_floor=True)
    assert calls == []  # two smallest within 5% and under 4x floor
    assert dts["int8"] == 1.9e-3
    assert len(reps["int8"]) == 2


def test_unstable_min_keeps_sampling_until_agreement():
    # first rounds disagree >5%; the sampler then settles at the true value
    reps = {"int8": [1.9e-3, 3.0e-3]}
    feed = iter([2.8e-3, 1.92e-3])
    dts = bench.sample_until_stable(
        reps, lambda n: next(feed), FLOOR, enforce_floor=True)
    # stopped as soon as the two smallest (1.9, 1.92) agreed within 5%
    assert dts["int8"] == 1.9e-3
    assert len(reps["int8"]) == 4


def test_drifted_but_stable_regime_is_not_accepted():
    # the observed pathology: every sample ~11x high AND mutually consistent
    # — agreement alone must not stop the loop while the floor is violated
    reps = {"int8": [45e-3, 45.1e-3]}
    feed = iter([44.9e-3, 45.2e-3, 2.0e-3, 1.96e-3])
    dts = bench.sample_until_stable(
        reps, lambda n: next(feed), FLOOR, enforce_floor=True)
    assert dts["int8"] == 1.96e-3  # sampled through the bad window
    assert len(reps["int8"]) == 6


def test_budget_expiry_returns_best_seen():
    reps = {"int8": [45e-3, 45.1e-3]}
    clock = iter(range(0, 10_000, 400))  # 400 "s" per round > 600 s budget

    def sampler(name):
        return 45e-3

    dts = bench.sample_until_stable(
        reps, sampler, FLOOR, enforce_floor=True, budget_s=600.0,
        now=lambda: float(next(clock)))
    assert dts["int8"] == 45e-3  # gave up, best seen reported
    # caller marks the capture sane_vs_hbm_floor=False in the JSON line
    assert dts["int8"] > 4.0 * FLOOR["int8"]


def test_floor_not_enforced_off_tpu():
    reps = {"bf16": [45e-3, 45.2e-3]}  # CPU smoke: no roofline claim
    dts = bench.sample_until_stable(
        reps, lambda n: 45e-3, FLOOR, enforce_floor=False)
    assert dts["bf16"] == 45e-3
    assert len(reps["bf16"]) == 2
