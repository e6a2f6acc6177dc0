"""Dirty-TPC-H robustness: NULL-riddled rows injected into every
relational fixture table must keep the join/agg/window surface not
just crash-free but HASH-IDENTICAL to the DuckDB oracle (the upgrade
that caught nine real divergences when applied to the documents net —
NULL keys in joins/aggs and NULL sort keys are exactly where
Spark-vs-DuckDB semantics can drift).  Scoped to the
division/outer-join-bearing queries where an ANSI divide-by-zero or
NULL-key regression would first appear."""

from __future__ import annotations

import shutil

import duckdb
import pytest

from cga_logs_to_kinesis_spark.registry import all_queries
from tests.conftest import SF_SMOKE
from tests.test_queries_oracle import table_hash

PROBED = [
    "market_share", "promo_share", "share_of_total",
    "customer_distribution", "above_nation_avg", "volume_shipping",
    "small_qty_revenue", "returned_revenue", "pricing_summary",
    "revenue_by_nation", "segment_totals", "price_percentiles",
    "running_revenue", "top3_orders_per_customer", "shipping_priority",
    "waiting_suppliers", "idle_customers", "large_volume_customers",
    "bulk_orders", "orders_no_bulk_item", "unpivot_metrics",
    "conditional_pivot", "similar_part_names", "global_topk",
    # r7 widening: the rest of the join/agg/window/set-op families
    "date_trunc_buckets", "priority_count", "rollup_pricing",
    "cube_orders", "grouping_sets_sql", "date_gallery", "rank_gallery",
    "scalar_gallery", "top_supplier", "disjunctive_revenue",
    "nation_set_ops", "union_by_name", "semi_join_customers",
    "anti_join_customers", "filter_project", "orders_in_window",
    # r8 widening: the pushdown-only scan and the per-column profile
    # (the dirty lineitem row exercises its NULL accounting directly)
    "forecast_revenue", "table_profile",
    # r11: the shuffle-key skew diagnosis (lineitem + orders +
    # documents sources; NULL-punched keys must group and hash
    # identically cross-engine)
    "join_key_skew",
    # r12: the salting planner shares join_key_skew's frequency front;
    # NULL keys must survive the hot filter + row_number cap
    "salted_join_plan",
    # r13: the APPLIED mitigation — NULL join keys must behave exactly
    # like the plain join through the salt/replicate machinery
    "salted_join_apply",
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


@pytest.fixture(scope="module")
def dirty_oracle(dirty_dir):
    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{dirty_dir}/{name}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", PROBED)
def test_relational_query_matches_oracle_on_dirty(spark, dirty_dir,
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
    assert len(srows) == len(orows), "row count mismatch on dirty rows"
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(srows, list(sdf.columns)) == \
        table_hash(orows, ocols), \
        f"{name}: cross-engine divergence on dirty relational rows"
