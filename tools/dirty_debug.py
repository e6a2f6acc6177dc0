"""Debug helper: print Spark vs DuckDB rows on the dirty corpus for
the queries failing tests/test_null_robustness.py."""
import sys
import tempfile

import duckdb
import pandas as pd

from cga_logs_to_kinesis_spark.registry import all_queries
from cga_logs_to_kinesis_spark.session import get_session

from tests.test_null_robustness import _DOCS

names = sys.argv[1:]
spark = get_session()
d = tempfile.mkdtemp()
spark.createDataFrame(_DOCS).write.parquet(f"{d}/documents.parquet")
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet/*.parquet')")
for name in names:
    spec = all_queries()[name]
    sdf = spec.fn(spark, d)
    srows = sorted(tuple(r) for r in sdf.collect())
    cur = con.execute(spec.oracle)
    ocols = [c[0] for c in cur.description]
    orows = sorted(cur.fetchall())
    print(f"===== {name} =====")
    print("spark cols:", sdf.columns)
    print("oracle cols:", ocols)
    sset, oset = set(srows), set(orows)
    for r in srows:
        if r not in oset:
            print("SPARK ONLY:", r)
    for r in orows:
        if r not in sset:
            print("ORACLE ONLY:", r)
    if sset == oset:
        print("(row sets equal — ordering/type diff in hash canon)")
        for s, o in zip(srows, orows):
            if s != o:
                print("s:", s)
                print("o:", o)
