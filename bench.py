"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is total wall-clock over the headline queries (excluding Spark
session startup, which is environment cost, not engine cost).  Each
query is materialized via a count-style action that forces full
execution without driver-side collection of the result set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cga_logs_to_kinesis_spark.registry import all_queries
from cga_logs_to_kinesis_spark.session import get_session

# Headline set: one per operator family, weighted toward the
# shuffle-heavy shapes that dominate at scale.
HEADLINE = (
    "stats_tumbling",        # flagship: tumbling-window agg
    "pricing_summary",       # multi-aggregate hash agg
    "revenue_by_nation",     # fact-spine join + broadcast dims
    "top3_orders_per_customer",  # partitioned window
    "global_topk",           # TakeOrderedAndProject
    "dedup_exact",           # digest hash-groupBy
    "dedup_minhash_lsh",     # shingle->band->candidate near-dup
    "text_stats",            # tokenize + agg
    "cosine_topk",           # similarity brute-force
    "cosine_topk_lsh",       # LSH-bucketed ANN
    "batch_pages",           # pipeline batch-cut window+agg
    "json_props",            # JSON extraction + agg
    "sliding_window",        # hopping-window agg
    "session_windows",       # session_window stateless-batch agg
    "shipping_priority",     # TPC-H Q3: filters + 3-way join + topk
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_session("bench")
    specs = all_queries()

    # Warm each query's codegen/JIT path on a smaller SF so per-query
    # numbers measure the engine, not first-call JIT.  sf0.01 (not
    # sf0.001): C2 compilation of the generated code needs enough
    # invocations to trigger; a 600-row warm run leaves the hot loops
    # interpreted and the measured run then pays the compile.
    warm_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(warm_dir) or warm_dir == sf_dir:
        warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        specs[name].fn(spark, warm_dir) \
            .write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = specs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
