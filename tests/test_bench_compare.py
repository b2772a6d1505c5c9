"""bench_compare.compare() flag logic — the artifact that replaces manual
host-drift adjudication must get the arithmetic right: drift divides out
(on EITHER sentinel axis), noisy measurements cannot testify, real
regressions survive."""

from __future__ import annotations

from tools.bench_compare import _load_run, compare


def _run(queries, spread=None, sentinel=0.4, overhead=None, sf="0.1"):
    return {
        "sf": sf,
        "sentinel": sentinel,
        "overhead_sentinel": overhead,
        "queries": queries,
        "spread": spread or {q: 0.05 for q in queries},
    }


def test_uniform_host_drift_is_not_flagged():
    """The r9 scenario: every query 1.35x slower, cpu sentinel 1.35x
    slower too -> normalized ratios ~1.0, zero regression candidates."""
    old = _run({f"q{i}": 1.0 + i / 10 for i in range(20)}, sentinel=0.40)
    new = _run(
        {f"q{i}": (1.0 + i / 10) * 1.35 for i in range(20)}, sentinel=0.54
    )
    md, flagged = compare(old, new, bar=1.3, max_spread=0.3)
    assert flagged == []
    assert "0 regression candidate" in md
    assert "1.000x" in md  # median normalized ratio


def test_real_regression_survives_drift_normalization():
    old = _run({"stable": 1.0, "regressed": 1.0}, sentinel=0.40)
    new = _run({"stable": 1.35, "regressed": 2.7}, sentinel=0.54)
    md, flagged = compare(old, new, bar=1.3, max_spread=0.3)
    names = [f[0] for f in flagged]
    assert names == ["regressed"]
    # cpu-normalized ratio = 2.7 / (1.0 * 1.35) = 2.0
    assert abs(flagged[0][4] - 2.0) < 1e-9


def test_overhead_drift_excuses_small_query_cluster():
    """The r10 scenario: fixed-overhead-dominated queries 2.5x slower, cpu
    sentinel flat, but the OVERHEAD sentinel also 2.5x -> excused. A real
    regression above even that drift still flags."""
    old = _run(
        {"tiny_kafka": 0.3, "real_regression": 0.3},
        sentinel=0.40,
        overhead=0.10,
    )
    new = _run(
        {"tiny_kafka": 0.75, "real_regression": 1.2},
        sentinel=0.404,  # cpu drift 1.01x
        overhead=0.25,  # overhead drift 2.5x
    )
    md, flagged = compare(old, new, bar=1.3, max_spread=0.3)
    names = [f[0] for f in flagged]
    assert "tiny_kafka" not in names, "2.5x raw excused by 2.5x overhead drift"
    assert names == ["real_regression"], "4x raw survives the worst drift axis"
    assert "overhead sentinel" in md


def test_noisy_measurement_cannot_testify():
    """A 2x normalized jump with min-of-3 spread above the gate in either
    round is NOT a candidate — noise can't accuse."""
    old = _run({"noisy": 1.0}, spread={"noisy": 0.05}, sentinel=0.40)
    new = _run({"noisy": 2.0}, spread={"noisy": 0.8}, sentinel=0.40)
    _, flagged = compare(old, new, bar=1.3, max_spread=0.3)
    assert flagged == []


def test_missing_sentinel_falls_back_to_raw():
    old = _run({"q": 1.0}, sentinel=None)
    new = _run({"q": 1.5}, sentinel=0.4)
    md, flagged = compare(old, new, bar=1.3, max_spread=0.3)
    assert "RAW ratios" in md
    assert [f[0] for f in flagged] == ["q"]


def test_added_and_removed_queries_reported():
    old = _run({"kept": 1.0, "gone": 1.0})
    new = _run({"kept": 1.0, "fresh": 1.0})
    md, _ = compare(old, new, bar=1.3, max_spread=0.3)
    assert "New queries this round: fresh" in md
    assert "Removed since last round: gone" in md


def test_load_run_prefers_detail_sentinels_with_local_fallback():
    detail = {"sf": "0.1", "queries": {"q": 1.0}, "spread": {"q": 0.0}}
    local = {"ambient_sentinel_sec": 0.37, "overhead_sentinel_sec": 0.11}
    run = _load_run(detail, local)
    assert run["sentinel"] == 0.37 and run["overhead_sentinel"] == 0.11
    detail["ambient_sentinel_sec"] = 0.41
    run = _load_run(detail, local)
    assert run["sentinel"] == 0.41


def test_excused_queries_are_listed_for_review():
    """advisor r10: a query over the bar on the cpu axis but excused by a
    larger drift on the overhead axis must still APPEAR in the artifact
    (visibility section), even though it is not flagged."""
    old = _run({"maybe_cpu_regression": 1.0, "stable": 1.0},
               sentinel=0.40, overhead=0.40)
    # cpu sentinel flat, overhead sentinel 2x; query 1.6x slower:
    # vs cpu drift = 1.6 (> bar) but vs worst drift = 0.8 -> excused
    new = _run({"maybe_cpu_regression": 1.6, "stable": 1.0},
               sentinel=0.40, overhead=0.80)
    md, flagged = compare(old, new, bar=1.3, max_spread=0.3)
    assert flagged == []
    assert "excused by the worst drift axis" in md
    assert "maybe_cpu_regression" in md


def test_noisy_over_bar_queries_are_listed_for_review():
    """A query over the bar under EVERY axis but with spread >= the cap is
    not flagged — but must be visible as unjudgeable, not silent."""
    old = _run({"noisy": 1.0, "stable": 1.0},
               spread={"noisy": 0.5, "stable": 0.05}, sentinel=0.40)
    new = _run({"noisy": 2.0, "stable": 1.0},
               spread={"noisy": 0.5, "stable": 0.05}, sentinel=0.40)
    md, flagged = compare(old, new, bar=1.3, max_spread=0.3)
    assert flagged == []
    assert "too noisy to testify" in md
    assert "noisy" in md


def test_io_sentinel_normalizes_throughput_probes():
    """The r12 scenario: headline msgs/s fell 22% while cpu/overhead
    sentinels barely moved — with an io sentinel recording a matching
    disk slowdown, the normalized throughput ratio reads ~1.0 and the
    swing is attributed to host I/O drift."""
    old = _run({"q": 1.0})
    new = _run({"q": 1.0})
    old["io_sentinel"], new["io_sentinel"] = 2.0, 2.56  # disk 1.28x slower
    old["throughput"] = {"baseline_sized_msgs_per_sec": 10_470_000.0}
    new["throughput"] = {"baseline_sized_msgs_per_sec": 8_200_000.0}
    md, flagged = compare(old, new, bar=1.3, max_spread=0.3)
    assert flagged == []
    assert "io sentinel" in md and "drift 1.280x" in md
    assert "baseline_sized_msgs_per_sec" in md
    # raw 0.78x, normalized 0.78 * 1.28 ~ 1.00
    assert "| 0.78 | 1.00 |" in md


def test_throughput_without_io_sentinel_is_unattributed():
    old = _run({"q": 1.0})
    new = _run({"q": 1.0})
    old["throughput"] = {"steady_state_msgs_per_sec": 2.0e7}
    new["throughput"] = {"steady_state_msgs_per_sec": 1.5e7}
    md, _ = compare(old, new, bar=1.3, max_spread=0.3)
    assert "n/a (no io sentinel)" in md
