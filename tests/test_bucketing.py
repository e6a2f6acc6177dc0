"""Bucketed-table co-located join: pre-shuffling both sides into the
same bucket layout removes the join exchange entirely — the lever for
repeatedly-joined 100 TB fact tables (pay the shuffle once at write
time, never at read time)."""

from __future__ import annotations

import pytest

from cga_logs_to_kinesis_spark.plans import formatted_plan
from cga_logs_to_kinesis_spark.sources import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    # spark.sql.warehouse.dir is static; external tables with explicit
    # paths keep bucket metadata in the metastore without touching it
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .option("path", str(wh / "lineitem_b"))
     .mode("overwrite").saveAsTable("bktest.lineitem_b"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .option("path", str(wh / "orders_b"))
     .mode("overwrite").saveAsTable("bktest.orders_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP DATABASE IF EXISTS bktest")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.sql("""
            SELECT o_orderkey, COUNT(*) AS n
            FROM bktest.lineitem_b JOIN bktest.orders_b
              ON l_orderkey = o_orderkey
            GROUP BY o_orderkey
        """)
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, \
            "bucketed join must not shuffle either side"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(32 * 1024 * 1024))


def test_bucketed_join_matches_plain_join(spark, warehouse):
    bucketed = spark.sql("""
        SELECT l_orderkey, o_totalprice FROM
        bktest.lineitem_b JOIN bktest.orders_b ON l_orderkey = o_orderkey
    """)
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey) \
        .select("l_orderkey", "o_totalprice")
    assert sorted(map(tuple, bucketed.collect())) == \
        sorted(map(tuple, plain.collect()))
