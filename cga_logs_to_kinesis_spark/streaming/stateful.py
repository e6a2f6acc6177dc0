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
