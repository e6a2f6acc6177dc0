"""Custom stateful streaming operators via applyInPandasWithState.

Two operators the built-in aggregations can't express:

- ``streaming_dedup_first_seen``: emit each key's record only the
  first time it appears, with TTL'd state so memory is bounded — the
  streaming analogue of the exact-dedup batch operator, and the
  stateful generalization of the reference's watch-dedup "cookie
  licking" (reference main.go:203-212: at-most-one watcher per target,
  a mutexed seen-set).
- ``streaming_running_counters``: per-key cumulative counters emitted
  every micro-batch — the A2 Prometheus counter surface (reference
  main.go:28-47,147-152) as an explicit state machine.

State is partitioned by key across executors (the groupBy shuffle), so
state size scales horizontally; the TTL bounds per-key lifetime.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUTPUT = StructType([
    StructField("key", StringType(), False),
    StructField("first_value", StringType(), True),
    StructField("n_in_batch", LongType(), False),
])

COUNTER_OUTPUT = StructType([
    StructField("key", StringType(), False),
    StructField("total_records", LongType(), False),
    StructField("total_value", LongType(), False),
])

_DEDUP_STATE = StructType([StructField("seen", LongType(), False)])
_COUNTER_STATE = StructType([
    StructField("total_records", LongType(), False),
    StructField("total_value", LongType(), False),
])


def _make_dedup_fn(ttl_ms: int | None):
    def dedup_fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n = 0
        first = None
        for pdf in pdfs:
            n += len(pdf)
            if first is None and len(pdf):
                first = str(pdf.iloc[0]["value"])
        if not state.exists and n > 0:
            state.update((1,))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame({"key": [key[0]], "first_value": [first],
                                "n_in_batch": [n]})
        # key already seen: emit nothing (suppressed duplicate)
    return dedup_fn


def streaming_dedup_first_seen(records: DataFrame,
                               key_col: str = "key",
                               ttl_ms: int | None = None) -> DataFrame:
    """Emit only the first record per key across the whole stream.

    ``ttl_ms`` bounds per-key state lifetime for always-on deployments.
    Leave it None for availableNow/backfill drains: with a processing-
    time timeout pending, Spark keeps scheduling empty "cleaning up
    state" batches after the data is exhausted, so an availableNow
    query with distant TTLs never terminates.
    """
    timeout = (GroupStateTimeout.NoTimeout if ttl_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (records
            .groupBy(key_col)
            .applyInPandasWithState(
                _make_dedup_fn(ttl_ms), DEDUP_OUTPUT, _DEDUP_STATE,
                "append", timeout))


def _counter_fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    total_records, total_value = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        total_records += len(pdf)
        total_value += int(pdf["value"].astype("int64").sum())
    state.update((total_records, total_value))
    yield pd.DataFrame({"key": [key[0]],
                        "total_records": [total_records],
                        "total_value": [total_value]})


def streaming_running_counters(records: DataFrame,
                               key_col: str = "key") -> DataFrame:
    """Per-key cumulative counters, emitted once per micro-batch."""
    return (records
            .groupBy(key_col)
            .applyInPandasWithState(
                _counter_fn, COUNTER_OUTPUT, _COUNTER_STATE,
                "update", GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# Streaming rate anomaly: trailing z-scores as explicit keyed state
# ---------------------------------------------------------------------------
# The streaming twin of operators/temporal.py::score_per_minute.  A
# trailing-N window over an unbounded stream is exactly what the
# built-in windowed aggregations can't express (they bucket by time,
# not by observation count), so the ring of the last N counts lives in
# applyInPandasWithState per event_type.  The float arithmetic
# replays the batch operator step for step (integer sums, one double
# division each for mean and var, IEEE sqrt), so batch/stream parity
# is bit-for-bit on in-order input — the contract: rows arrive in
# minute order per key (true for the delivery-stats rollup that feeds
# it; late data would need a watermarked upstream sort).
# State is N longs per event_type: bounded by construction.

from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    BooleanType,
    DoubleType,
)

# Shared with the batch operator so the documented bit-for-bit
# batch/stream parity cannot drift when the constants are tuned.
from cga_logs_to_kinesis_spark.operators.temporal import (  # noqa: E402
    ANOMALY_MIN_N as ANOM_MIN_N,
    ANOMALY_TRAIL as ANOM_TRAIL,
    ANOMALY_Z as ANOM_Z,
)

ANOMALY_OUTPUT = StructType([
    StructField("event_type", StringType(), False),
    StructField("minute", LongType(), False),
    StructField("n_events", LongType(), False),
    StructField("trail_n", LongType(), False),
    StructField("z", DoubleType(), False),
    StructField("is_anomaly", BooleanType(), False),
])

_ANOMALY_STATE = StructType([
    StructField("counts", ArrayType(LongType()), False),
])


def _anomaly_fn(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    import math

    counts = list(state.get[0]) if state.exists else []
    out = {k: [] for k in ("minute", "n_events", "trail_n", "z")}
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("minute")
    for minute, n in zip(rows["minute"], rows["n_events"]):
        n = int(n)
        tn = len(counts)
        if tn >= ANOM_MIN_N:
            s1 = sum(counts)
            s2 = sum(c * c for c in counts)
            mean = s1 / tn
            var = s2 / tn - mean * mean
            std = math.sqrt(max(var, 0.0))
            if std > 0.0:
                out["minute"].append(int(minute))
                out["n_events"].append(n)
                out["trail_n"].append(tn)
                out["z"].append((n - mean) / std)
        counts = (counts + [n])[-ANOM_TRAIL:]
    state.update((counts,))
    if out["minute"]:
        yield pd.DataFrame({
            "event_type": [key[0]] * len(out["minute"]),
            "minute": pd.Series(out["minute"], dtype="int64"),
            "n_events": pd.Series(out["n_events"], dtype="int64"),
            "trail_n": pd.Series(out["trail_n"], dtype="int64"),
            "z": pd.Series(out["z"], dtype="float64"),
            "is_anomaly": [abs(z) > ANOM_Z for z in out["z"]],
        })


def streaming_rate_anomaly(per_min: DataFrame) -> DataFrame:
    """Trailing z-scores over a per-minute count stream
    (event_type, minute, n_events), keyed state = the last 30 counts."""
    return (per_min
            .groupBy("event_type")
            .applyInPandasWithState(
                _anomaly_fn, ANOMALY_OUTPUT, _ANOMALY_STATE,
                "append", GroupStateTimeout.NoTimeout))
