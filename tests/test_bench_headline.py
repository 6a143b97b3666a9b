"""Driver-contract headline bench: the drift-defense convergence loop.

Three observed tunnel pathologies motivate the estimator:
- a fresh-attach regime held EVERY sample ~11x high for a 12-minute run
  (stable-but-wrong — agreement alone must not stop sampling);
- a 379-sample run's bare min-of-N captured 0.993 ms for a kernel whose
  HBM floor is 1.31 ms (slope timing errs LOW when a slow window hits the
  short chain — min-of-many biases low as N grows);
- a 4-sample run false-corroborated a PAIR of ~20%-low samples (3.28 ms
  for the 4.05 ms int8 path) — two samples is agreement, three is a
  regime.
bench.sample_until_stable therefore reports the CORROBORATED min (smallest
floor-respecting sample confirmed by two more within 5%) and requires it
to sit within 4x the static HBM-roofline floor. These tests drive it with
synthetic samplers (no device).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


FLOOR = {"int8": 1.31e-3, "bf16": 2.62e-3}


def test_stable_and_sane_stops_immediately():
    reps = {"int8": [1.9e-3, 1.95e-3, 1.93e-3],
            "bf16": [4.0e-3, 4.1e-3, 4.05e-3]}
    calls = []
    dts = bench.sample_until_stable(
        reps, lambda n: calls.append(n) or 1.9e-3, FLOOR, enforce_floor=True)
    assert calls == []  # three agreeing samples under 4x floor on entry
    assert dts["int8"] == 1.9e-3
    assert len(reps["int8"]) == 3


def test_unstable_min_keeps_sampling_until_corroborated():
    # early samples disagree; the sampler then settles at the true value
    reps = {"int8": [1.9e-3, 3.0e-3]}
    feed = iter([2.8e-3, 1.92e-3, 1.94e-3])
    dts = bench.sample_until_stable(
        reps, lambda n: next(feed), FLOOR, enforce_floor=True)
    # stopped once (1.9, 1.92, 1.94) clustered within 5%
    assert dts["int8"] == 1.9e-3
    assert len(reps["int8"]) == 5


def test_drifted_but_stable_regime_is_not_accepted():
    # the fresh-attach pathology: every sample ~11x high AND mutually
    # consistent — agreement alone must not stop the loop while the best
    # estimate violates the 4x floor bound
    reps = {"int8": [45e-3, 45.1e-3, 45.05e-3]}
    feed = iter([2.0e-3, 1.96e-3, 1.98e-3])
    dts = bench.sample_until_stable(
        reps, lambda n: next(feed), FLOOR, enforce_floor=True)
    assert dts["int8"] == 1.96e-3  # sampled through the bad window
    assert len(reps["int8"]) == 6


def test_subfloor_artifact_is_rejected():
    # the 379-sample pathology: a slope sample BELOW the physical HBM floor
    # is an artifact by definition and must never become the estimate
    reps = {"int8": [0.993e-3, 4.0e-3, 4.05e-3, 4.02e-3]}
    dts = bench.sample_until_stable(
        reps, lambda n: 4.0e-3, FLOOR, enforce_floor=True)
    assert dts["int8"] == 4.0e-3
    assert len(reps["int8"]) == 4  # corroborated+sane on entry: no sampling


def test_low_pair_is_not_trusted():
    # the false-corroborating-pair pathology: (3.28, 3.29) agree but the
    # regime evidence is the (4.0, 4.02, 4.05) cluster
    reps = {"int8": [3.28e-3, 3.29e-3, 4.0e-3, 4.02e-3, 4.05e-3]}
    dts = bench.sample_until_stable(
        reps, lambda n: 4.0e-3, FLOOR, enforce_floor=True)
    assert dts["int8"] == 4.0e-3


def test_corroborated_min_clusters():
    assert bench.corroborated_min([1.0, 2.0, 3.0], 0.5) is None
    assert bench.corroborated_min([0.4, 0.41, 0.42], 0.5) is None  # sub-floor
    assert bench.corroborated_min([1.0, 1.04, 3.0], 0.5) is None  # pair only
    assert bench.corroborated_min([1.0, 1.04, 1.05, 3.0], 0.5) == 1.0
    assert bench.corroborated_min([1.0, 1.04, 3.0], 0.5, need=2) == 1.0


def test_budget_expiry_returns_best_estimate_seen():
    reps = {"int8": [45e-3, 45.1e-3]}
    clock = iter(range(0, 10_000, 400))  # 400 "s" per round > 600 s budget

    def sampler(name):
        return 45e-3

    dts = bench.sample_until_stable(
        reps, sampler, FLOOR, enforce_floor=True, budget_s=600.0,
        now=lambda: float(next(clock)))
    assert dts["int8"] == 45e-3  # gave up, best corroborated value reported
    # caller marks the capture sane_vs_hbm_floor=False in the JSON line
    assert dts["int8"] > 4.0 * FLOOR["int8"]


def test_round_cap_bounds_artifact_exposure():
    # never-corroborating sampler: the loop must stop at max_rounds, not
    # sample forever hunting for agreement (more samples in a bad regime
    # only raise the odds of artifacts agreeing)
    reps = {"int8": [2.0e-3]}
    vals = iter(3.0e-3 + i * 1.0e-3 for i in range(1000))
    dts = bench.sample_until_stable(
        reps, lambda n: next(vals), FLOOR, enforce_floor=True, max_rounds=5)
    assert len(reps["int8"]) == 6  # 1 seed + 5 rounds
    assert dts["int8"] > 0


def test_floor_not_enforced_off_tpu():
    reps = {"bf16": [45e-3, 45.2e-3, 45.1e-3]}  # CPU smoke: no roofline claim
    dts = bench.sample_until_stable(
        reps, lambda n: 45e-3, FLOOR, enforce_floor=False)
    assert dts["bf16"] == 45e-3
    assert len(reps["bf16"]) == 3
