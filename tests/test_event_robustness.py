"""Dirty-events robustness: NULL user/type/value/props/ts rows and
malformed JSON props must neither crash the event-analytics operators
(ANSI mode turns a zero denominator into a mid-job exception — caught
retention_cohorts before the try_divide fix) nor diverge from the
DuckDB oracle's treatment of the same rows."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from cga_logs_to_kinesis_spark.registry import all_queries
from tests.test_queries_oracle import table_hash

# Every registered query that reads the events table.
EVENT_QUERIES = [
    "approx_distinct_users", "array_functions", "asof_last_signup",
    "conditional_pivot", "dedup_events_first", "distinct_users",
    "funnel_conversion", "json_props", "map_functions",
    "multi_resolution_rollup", "pivot_event_types",
    "range_join_error_after_purchase", "retention_cohorts",
    "rate_anomaly", "session_windows", "sliding_window",
    "stats_tumbling", "event_funnel",
]

_TYPES = ["view", "click", "purchase", "error", "signup"]


def _dirty_events() -> pd.DataFrame:
    base = pd.Timestamp("2023-11-14T22:13:20")
    rows = []
    for i in range(40):
        rows.append((
            i,
            base + pd.Timedelta(minutes=i),
            i % 5,
            _TYPES[i % 5] if i != 7 else None,          # NULL type
            float(i) if i != 11 else None,              # NULL value
            '{"k": %d}' % i if i % 9 else "not-json{{{",  # junk JSON
        ))
    rows.append((100, pd.NaT, None, None, None, None))  # all-NULL row
    return pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty_events")
    spark.createDataFrame(
        _dirty_events(),
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dirty_oracle(dirty_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{dirty_dir}/events.parquet/*.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_matches_oracle_on_dirty_events(spark, dirty_dir,
                                                    dirty_oracle, name):
    spec = all_queries()[name]
    sdf = spec.fn(spark, dirty_dir)
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) >= 0
    if spec.oracle is None:
        return
    cur = dirty_oracle.execute(spec.oracle)
    ocols = [c[0] for c in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), "row count mismatch on dirty events"
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(srows, list(sdf.columns)) == \
        table_hash(orows, ocols), \
        f"{name}: cross-engine divergence on dirty events"
