"""Column builders for oracle-exact arithmetic.

Floating-point aggregation is order-dependent, and Spark's shuffle
order differs run to run — so any `SUM(double)` can drift in the last
few ULPs between Spark and an oracle engine.  The engine therefore
computes additive aggregates in fixed-point: cast each addend to
DECIMAL (exact, order-independent addition), sum, and cast the total
back to double.  Both Spark and DuckDB round the *same* input double to
the *same* decimal, so results are bit-identical regardless of
parallelism — at sf0.01 or at 100 TB.

The decimal cast is a codegen'd JVM expression; the overhead over a raw
double sum is small and it removes a whole class of nondeterminism that
otherwise shows up only at scale (more partitions → more orderings).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38-digit decimals with 6 fractional digits: plenty for TPC-H-ish
# monetary values, and the same literal type DuckDB infers for
# DECIMAL(38,6).
PRECISION, SCALE = 38, 6
_DEC = f"decimal({PRECISION},{SCALE})"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM(double) → double, exact across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """AVG as exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_DEC)).cast("double")
            / F.count(c)).alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return (f"CAST(SUM(CAST(({expr}) AS DECIMAL({PRECISION},{SCALE}))) "
            f"AS DOUBLE) AS {alias}")


def davg_sql(expr: str, alias: str) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return (f"CAST(SUM(CAST(({expr}) AS DECIMAL({PRECISION},{SCALE}))) "
            f"AS DOUBLE) / COUNT({expr}) AS {alias}")
