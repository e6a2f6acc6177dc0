"""Oracle-checked query tests: the sqllogictest-style corpus the
reference lacks (SURVEY.md §5.1).  Every registered query runs on
Spark and its DuckDB oracle at sf0.001 and must match on row count,
column names, and an order-insensitive canonical value hash — the same
gate the driver applies at sf0.01."""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from cga_logs_to_kinesis_spark.registry import all_queries
from cga_logs_to_kinesis_spark.schema import FIXTURE_TABLES
from tests.conftest import SF_SMOKE

SPECS = all_queries()


def canon(v) -> str:
    if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
        # The driver's pandas-based canonicalizer crashes on non-hashable
        # cells; queries must serialize arrays/maps to strings themselves.
        raise TypeError(
            f"non-scalar output cell ({type(v).__name__}): serialize with "
            "array_join / to_json in the query")
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_SMOKE}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, oracle, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only contract: runs and is stable
        assert sdf.columns
        return
    cur = oracle.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), "row count mismatch"
    assert sorted(sdf.columns) == sorted(ocols), "schema mismatch"
    assert table_hash(srows, list(sdf.columns)) == table_hash(orows, ocols)


def test_every_query_has_nonempty_result_at_sf001(spark):
    """Queries that legitimately return 0 rows at tiny SF are listed;
    everything else must produce rows so the hash check has teeth."""
    may_be_empty = {
        "anti_join_customers",
        # sf0.001 events are ~1/minute, so every trailing window has
        # zero variance and no minute is scoreable; the driver gate at
        # sf0.01 checks 4500+ scored rows
        "rate_anomaly",
    }
    for name, spec in SPECS.items():
        if name in may_be_empty:
            continue
        n = spec.fn(spark, SF_SMOKE).count()
        assert n > 0, f"{name} returned 0 rows at sf0.001"
