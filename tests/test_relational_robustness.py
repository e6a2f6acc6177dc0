"""Dirty-TPC-H robustness: NULL-riddled rows injected into every
relational fixture table must not crash the join/agg surface (a full
138-query probe found zero crashes when this net was added — equi
joins drop NULL keys, aggregates skip NULLs; this keeps it that way).
Scoped to the division/outer-join-bearing queries where an ANSI
divide-by-zero or NULL-key regression would first appear."""

from __future__ import annotations

import shutil

import duckdb
import pytest

from cga_logs_to_kinesis_spark.registry import all_queries
from tests.conftest import SF_SMOKE

PROBED = [
    "market_share", "promo_share", "share_of_total",
    "customer_distribution", "above_nation_avg", "volume_shipping",
    "small_qty_revenue", "returned_revenue", "pricing_summary",
    "revenue_by_nation", "segment_totals", "price_percentiles",
    "running_revenue", "top3_orders_per_customer", "shipping_priority",
    "waiting_suppliers", "idle_customers", "large_volume_customers",
    "bulk_orders", "orders_no_bulk_item", "unpivot_metrics",
    "conditional_pivot", "similar_part_names", "global_topk",
]

_MODS = {
    "customer": "SELECT * FROM t UNION ALL "
                "SELECT 99999, NULL, NULL, NULL, NULL",
    "orders": "SELECT * FROM t UNION ALL "
              "SELECT 999999, NULL, NULL, NULL, NULL, NULL",
    "lineitem": ("SELECT * FROM t UNION ALL SELECT 999999, NULL, NULL, "
                 "1, 0.0, 0.0, 0.0, 0.0, NULL, NULL, NULL"),
    "supplier": "SELECT * FROM t UNION ALL SELECT 99999, NULL, NULL, NULL",
    "part": "SELECT * FROM t UNION ALL "
            "SELECT 99999, NULL, NULL, NULL, NULL, NULL",
}


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty_tpch")
    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        if name in _MODS:
            con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM "
                        f"read_parquet('{SF_SMOKE}/{name}.parquet')")
            con.execute(f"COPY ({_MODS[name]}) TO "
                        f"'{d}/{name}.parquet' (FORMAT PARQUET)")
        else:
            shutil.copy(f"{SF_SMOKE}/{name}.parquet",
                        f"{d}/{name}.parquet")
    con.close()
    return str(d)


@pytest.mark.parametrize("name", PROBED)
def test_relational_query_survives_null_rows(spark, dirty_dir, name):
    n = all_queries()[name].fn(spark, dirty_dir).count()
    assert n >= 0
