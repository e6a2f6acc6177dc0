"""Fixture-schema guard: the driver regenerates the testdata parquet
between rounds and has already changed a column's physical type once
(`events.ts` TIMESTAMP(NANOS) → timestamp[us], which silently broke
every events query).  This test pins what the engine actually relies
on, so the NEXT regeneration fails here — loudly, with the offending
table and column named — instead of deep inside a query plan.

Checks are deliberately about the *contract*, not the bytes:
column names per table, the dtype families the readers handle, and
the normalized output of ``load_events``.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from cga_logs_to_kinesis_spark.schema import FIXTURE_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                        "/root/testdata/sf0.001")

# Column names every query/oracle addresses, per table.
EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value",
               "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

# Dtype families load_events knows how to normalize (sources/tables.py).
EVENTS_TS_ACCEPTED = ("int64", "timestamp[us]", "timestamp[ns]",
                      "timestamp[us, tz=UTC]", "timestamp[ns, tz=UTC]")


@pytest.mark.parametrize("table", FIXTURE_TABLES)
def test_fixture_columns_unchanged(table):
    path = f"{SF_DIR}/{table}.parquet"
    assert os.path.exists(path), f"fixture missing: {path}"
    schema = pq.read_schema(path)
    assert schema.names == EXPECTED_COLUMNS[table], (
        f"driver regenerated {table}.parquet with different columns: "
        f"{schema.names} (queries/oracles address "
        f"{EXPECTED_COLUMNS[table]})")


def test_events_ts_dtype_is_handled():
    schema = pq.read_schema(f"{SF_DIR}/events.parquet")
    ts = str(schema.field("ts").type)
    assert ts in EVENTS_TS_ACCEPTED, (
        f"events.ts regenerated as {ts!r}, which load_events "
        f"(sources/tables.py) does not normalize — add a branch for it "
        f"(accepted today: {EVENTS_TS_ACCEPTED})")


def test_load_events_normalized_contract(spark):
    """Whatever the physical type, load_events yields int64-ns `ts`
    plus TimestampType `event_time`, µs-consistent with each other."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    from cga_logs_to_kinesis_spark.sources.tables import load_events

    ev = load_events(spark, SF_DIR)
    assert isinstance(ev.schema["ts"].dataType, LongType)
    assert isinstance(ev.schema["event_time"].dataType, TimestampType)
    mismatch = ev.filter(
        F.expr("ts DIV 1000") != F.unix_micros("event_time")).count()
    assert mismatch == 0
