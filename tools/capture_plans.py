"""Capture .explain("formatted") for headline queries → plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [query ...]
  env PLANS_ROUND=r19 picks the output dir (default r19).
  suffix: "before" or "after" (file name becomes <query>_<suffix>.txt)
  queries: default = the bench HEADLINE set.

Plans are captured at sf0.1 (the bench scale) with the same session
confs bench uses, so the Exchange/join shapes match what the bench
actually times.  Queries whose construction runs eager jobs
(localCheckpoint) execute those during capture; the explain itself
does not run the final plan.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from cga_logs_to_kinesis_spark.registry import all_queries  # noqa: E402
from cga_logs_to_kinesis_spark.session import get_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r19"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("capture-plans")
    specs = all_queries()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        try:
            sys.stdout = buf
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"captured {name}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
