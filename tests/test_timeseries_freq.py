"""infer_frequency: dominant-delta frequency + regularity inference
(the reference's declared-but-stubbed TimeSeriesMetadata detection,
timeseries.rs:205-232 / :331) vs an independent pure-Python oracle."""

from __future__ import annotations

import datetime as dt
from collections import Counter

from ml_data_pipeline_spark.operators.timeseries import (
    _NAMED_FREQS_US,
    infer_frequency,
)

T0 = dt.datetime(2024, 1, 1)


def _oracle(stamps, tol=0.05):
    """Independent reimplementation: mode of deltas (ties → smallest),
    reference label ladder, regularity ratio."""
    deltas = [
        int((b - a).total_seconds() * 1_000_000)
        for a, b in zip(stamps, stamps[1:])
    ]
    if not deltas:
        return None
    counts = Counter(deltas)
    best_n = max(counts.values())
    period = min(d for d, n in counts.items() if n == best_n)
    ratio = best_n / len(deltas)
    named = {per: name for name, per in _NAMED_FREQS_US}
    if period in named:
        label = named[period]
    elif period > 0 and period % 60_000_000 == 0:
        label = f"{period // 60_000_000}min"
    elif period > 0 and period % 1_000_000 == 0:
        label = f"{period // 1_000_000}s"
    elif period > 0 and period % 1_000 == 0:
        label = f"{period // 1_000}ms"
    elif period > 0:
        label = f"{period}us"
    else:
        label = "variable"
    regular = ratio >= 1 - tol
    return {
        "frequency": label if regular else "variable",
        "period_us": period,
        "is_regular": regular,
        "n_deltas": len(deltas),
    }


def _series():
    hourly = [T0 + dt.timedelta(hours=i) for i in range(50)]
    five_min = [T0 + dt.timedelta(minutes=5 * i) for i in range(100)]
    # jittered: 90 clean 1-second steps, 10 stragglers (+250 ms) —
    # still the 1 s mode, ratio 0.90 < 0.95 → variable/irregular
    jitter = [T0]
    for i in range(100):
        step = 1_000_000 + (250_000 if i % 10 == 9 else 0)
        jitter.append(jitter[-1] + dt.timedelta(microseconds=step))
    daily = [T0 + dt.timedelta(days=i) for i in range(30)]
    ms250 = [T0 + dt.timedelta(microseconds=250_000 * i) for i in range(40)]
    return {
        "hourly": hourly,
        "five_min": five_min,
        "jitter": jitter,
        "daily": daily,
        "ms250": ms250,
    }


def test_infer_frequency_per_series_matches_oracle(spark):
    series = _series()
    rows = [
        (name, ts) for name, stamps in series.items() for ts in stamps
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp_ntz")
    got = {
        r["series"]: r
        for r in infer_frequency(df, "ts", by="series").collect()
    }
    assert set(got) == set(series)
    for name, stamps in series.items():
        want = _oracle(sorted(stamps))
        g = got[name]
        assert g["frequency"] == want["frequency"], (name, g, want)
        assert g["period_us"] == want["period_us"], name
        assert g["is_regular"] == want["is_regular"], name
        assert g["n_deltas"] == want["n_deltas"], name
    # spot-check the labels are the reference's model
    assert got["hourly"]["frequency"] == "hourly"
    assert got["five_min"]["frequency"] == "5min"
    assert got["daily"]["frequency"] == "daily"
    assert got["ms250"]["frequency"] == "250ms"
    assert got["jitter"]["frequency"] == "variable"
    assert not got["jitter"]["is_regular"]
    assert abs(got["jitter"]["regularity_ratio"] - 0.90) < 1e-9


def test_infer_frequency_whole_frame_and_plan(spark):
    stamps = [T0 + dt.timedelta(weeks=i) for i in range(20)]
    df = spark.createDataFrame([(s,) for s in stamps], "ts timestamp_ntz")
    out = infer_frequency(df, "ts")
    row = out.collect()[0]
    assert row["frequency"] == "weekly"
    assert row["is_regular"]
    # distributed shape: no Python eval nodes, mode via partial agg
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "partial_max" in plan or "partial" in plan.lower()
