"""TPC-H partsupp plan topologies: Q2 / Q9 / Q11 / Q16 / Q20 — LIVE.

The driver testdata carries no partsupp fixture (TESTDATA.md), but in
TPC-H partsupp IS a deterministic function of part x supplier (dbgen
generates its rows from the part key and the supplier count — there is
no independent information in the table).  So instead of gating the
suite on a fixture that will never ship, BOTH engines derive the same
partsupp: Spark via :func:`load_partsupp` (part x 4 generator rows,
integer arithmetic), the oracle via the :data:`PARTSUPP_SQL` CTE over
the part/supplier views the driver already registers.  Identical
integer folds → identical tables → the five shapes are ordinary
hash-checked registry queries at ANY scale dir, no probe, no latent
crash (this also retires the r7 advisory about the multi-scale-dir
fixture probe — the probe no longer exists).

tests/test_partsupp_shapes.py pins the derivation against the
independent pure-Python ``generate_partsupp`` and keeps the dirty net
by monkeypatching :func:`load_partsupp` (and rewriting the CTE) to a
NULL-punched parquet — NOT-IN/semi/anti NULL semantics stay covered.

Topologies covered (the five TPC-H shapes the main registry otherwise
lacks, SURVEY §8.2):

* Q2  — correlated scalar subquery over an aggregate (min supplycost
        per part within a region), decorrelated into agg + re-join;
* Q9  — double fact-fact join (orders + partsupp on different keys)
        plus broadcast dims, profit by nation x year;
* Q11 — HAVING against a global-scalar aggregate (share-of-total
        stock value), realized as agg + broadcast of one scalar row;
* Q16 — NOT-IN anti join + multi-column COUNT(DISTINCT);
* Q20 — agg-filtered semi join chain (availqty > ½ of the supplier's
        shipped quantity for that part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.functions.exact import dsum, dsum_sql
from cga_logs_to_kinesis_spark.registry import QuerySpec
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_table

# The fixture's nation names are synthetic (NATION_0..24), not the
# TPC-H country names; NATION_15 is one that actually has suppliers
# at every fixture SF (supplier nationkeys are hash-spread).
Q11_NATION = "NATION_15"

# 1/1024: exactly representable in binary, so the Q11 threshold
# total * FRACTION is the identical IEEE double in Spark and DuckDB.
Q11_FRACTION = 1.0 / 1024.0

# Deterministic partsupp generation: 4 supplier rows per part (the
# TPC-H cardinality), integer-hash availqty, exact-decimal supplycost
# in cents.  Kept here (not in the test) so a future fixture generator
# and the oracle-backed tests share one definition.
PS_PER_PART = 4


def generate_partsupp(part_keys, n_suppliers: int):
    """[(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents)].

    The reference definition of the derivation — pure Python, used by
    tests to pin :func:`load_partsupp` and :data:`PARTSUPP_SQL` (three
    independent implementations of one integer formula)."""
    rows = []
    for pk in part_keys:
        for i in range(PS_PER_PART):
            rows.append((
                pk,
                (pk + i * 7 + i) % n_suppliers,
                1 + (pk * 7 + i * 13) % 5000,
                1 + (pk * 31 + i * 17) % 100000,
            ))
    return rows


# DuckDB twin of load_partsupp: derives the same rows from the part and
# supplier views.  Every oracle below reads partsupp through this CTE
# body (kept as ONE exact string so the dirty-net test can substitute a
# NULL-punched parquet read for it).
PARTSUPP_SQL = f"""(
        SELECT p_partkey AS ps_partkey,
               (p_partkey + i * 7 + i)
                   % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
               1 + (p_partkey * 7 + i * 13) % 5000 AS ps_availqty,
               1 + (p_partkey * 31 + i * 17) % 100000
                   AS ps_supplycost_cents
        FROM part, (SELECT unnest(range(0, {PS_PER_PART})) AS i) g
    )"""


def _with_partsupp(sql: str) -> str:
    """Prefix an oracle with the derived-partsupp CTE."""
    return f"WITH partsupp AS {PARTSUPP_SQL}\n{sql}"


def load_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive partsupp from the scale dir's part table + supplier
    count — the Spark twin of :data:`PARTSUPP_SQL` and of dbgen's own
    generation rule (4 supplier rows per part, arithmetic columns).

    Scale shape: one narrow projection of part and a 4-way row-local
    explode — the derived fact table is join/shuffle-free until a
    query joins it, exactly as if it had been scanned.  The supplier
    count enters as a LITERAL via one bounded driver action (a
    count() of the supplier dim — same bounded-collect budget as the
    BPE merge table or the kmeans centroids): folding it in as a
    broadcast 1-row crossJoin instead would plant a
    BroadcastNestedLoopJoin inside every consuming plan and muddy the
    plan assertions that pin these topologies.  The dirty-net test
    monkeypatches this function to read a NULL-punched parquet
    instead."""
    part = load_table(spark, sf_dir, "part")
    n_supp = load_table(spark, sf_dir, "supplier").count()
    i = F.col("i")
    pk = F.col("p_partkey")
    return (part.select("p_partkey")
            .select("p_partkey",
                    F.explode(F.sequence(
                        F.lit(0), F.lit(PS_PER_PART - 1))).alias("i"))
            .select(
                pk.alias("ps_partkey"),
                ((pk + i * 7 + i) % F.lit(n_supp))
                .cast("bigint").alias("ps_suppkey"),
                (1 + (pk * 7 + i * 13) % 5000)
                .cast("bigint").alias("ps_availqty"),
                (1 + (pk * 31 + i * 17) % 100000)
                .cast("bigint").alias("ps_supplycost_cents")))


def _cost(col: str = "ps_supplycost_cents") -> F.Column:
    """Supplycost as exact decimal dollars from the cents column."""
    return (F.col(col).cast("decimal(14,2)") / 100).cast("decimal(12,2)")


_COST_SQL = "CAST(CAST(ps_supplycost_cents AS DECIMAL(14,2)) / 100 AS DECIMAL(12,2))"


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for ECONOMY parts, the EUROPE supplier(s) matching the
    minimum supplycost of that part within the region.

    The correlated scalar subquery (min cost per part, correlated on
    partkey AND restricted to the same region) decorrelates into one
    groupBy over the region-filtered partsupp and an equi-join back on
    (partkey, cost) — two shuffles on ps_partkey which AQE can plan as
    one exchange reuse; all dims broadcast."""
    tune_session(spark)
    ps = load_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    europe = (ps
              .join(F.broadcast(supplier),
                    F.col("ps_suppkey") == F.col("s_suppkey"))
              .join(F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"))
              .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .withColumn("cost", _cost()))
    min_cost = (europe.groupBy(F.col("ps_partkey").alias("mc_partkey"))
                .agg(F.min("cost").alias("min_cost")))
    return (europe
            .join(min_cost,
                  (F.col("ps_partkey") == F.col("mc_partkey"))
                  & (F.col("cost") == F.col("min_cost")))
            .join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
                  F.col("ps_partkey") == F.col("p_partkey"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    F.col("cost").cast("double").alias("supplycost"))
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey"))


_Q2_ORACLE = f"""
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST({_COST_SQL} AS DOUBLE) AS supplycost
    FROM partsupp
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    JOIN part     ON ps_partkey = p_partkey
    WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
      AND {_COST_SQL} = (
          SELECT MIN({_COST_SQL})
          FROM partsupp, supplier, nation, region
          WHERE ps_partkey = p_partkey
            AND ps_suppkey = s_suppkey
            AND s_nationkey = n_nationkey
            AND n_regionkey = r_regionkey
            AND r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part stock value in one nation, kept only when it
    exceeds FRACTION of the nation's total — HAVING against a global
    scalar.  The scalar total is one row: computed once and
    broadcast-joined (crossJoin of a 1-row frame), never recomputed
    per group and never a driver round-trip."""
    tune_session(spark)
    ps = load_partsupp(spark, sf_dir)
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    # localCheckpoint: `nat` feeds BOTH the per-part agg and the
    # global scalar — without the cut the partsupp-supplier-nation
    # join tree executes twice (the shingle-once discipline every
    # other reused expensive subtree in the repo follows).
    nat = (ps
           .join(F.broadcast(supplier),
                 F.col("ps_suppkey") == F.col("s_suppkey"))
           .join(F.broadcast(nation.filter(F.col("n_name") == Q11_NATION)),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .withColumn("value", _cost() * F.col("ps_availqty"))
           .select("ps_partkey", "value")
           .localCheckpoint())
    per_part = (nat.groupBy("ps_partkey")
                .agg(dsum("value", "stock_value")))
    total = nat.agg(dsum("value", "total_value"))
    return (per_part
            .crossJoin(F.broadcast(total))
            .filter(F.col("stock_value")
                    > F.col("total_value") * F.lit(Q11_FRACTION))
            .select("ps_partkey", "stock_value")
            .orderBy(F.col("stock_value").desc(), "ps_partkey"))


_Q11_ORACLE = f"""
    SELECT ps_partkey,
           {dsum_sql(f"{_COST_SQL} * ps_availqty", "stock_value")}
    FROM partsupp
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = '{Q11_NATION}'
    GROUP BY ps_partkey
    HAVING CAST(SUM(CAST(({_COST_SQL} * ps_availqty)
                         AS DECIMAL(38,6))) AS DOUBLE) > (
        SELECT CAST(SUM(CAST(({_COST_SQL} * ps_availqty)
                             AS DECIMAL(38,6))) AS DOUBLE)
               * {Q11_FRACTION!r}
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_name = '{Q11_NATION}')
    ORDER BY stock_value DESC, ps_partkey
"""


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, type, size) for parts
    outside an excluded brand/type, minus "complaint" suppliers — a
    NOT-IN anti join feeding a multi-column COUNT(DISTINCT).  The
    anti side (low-acctbal suppliers, standing in for the comment
    LIKE of real Q16) is tiny → broadcast anti join; the distinct
    lands in one partial-aggregated exchange on the group key."""
    tune_session(spark)
    ps = load_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    # NOT IN vs left_anti null semantics: SQL NOT IN yields UNKNOWN
    # (drops the row) when ps_suppkey is NULL or any complaint key is
    # NULL; Spark left_anti KEEPS a NULL-key probe row.  The explicit
    # IS NOT NULL on both sides (mirrored in the oracle) makes the
    # equivalence exact instead of fixture-luck — same dirty-data
    # discipline as the relational nets.
    complaints = supplier.filter(F.col("s_acctbal") < 1000) \
        .filter(F.col("s_suppkey").isNotNull()).select("s_suppkey")
    wanted = part.filter((F.col("p_brand") != "Brand#13")
                         & (F.col("p_type") != "PROMO")
                         & (F.col("p_size") <= 25))
    return (ps
            .filter(F.col("ps_suppkey").isNotNull())
            .join(F.broadcast(complaints),
                  F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
            .join(F.broadcast(wanted),
                  F.col("ps_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


_Q16_ORACLE = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON ps_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size <= 25
      AND ps_suppkey IS NOT NULL
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier
          WHERE s_acctbal < 1000 AND s_suppkey IS NOT NULL)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers of widget parts whose availqty exceeds half
    of what they shipped for that part in 1997 — an agg-filtered semi
    join chain.  lineitem aggregates once on its natural
    (partkey, suppkey) key; partsupp joins that aggregate and the
    surviving (suppkey) set semi-filters supplier.  The fact table
    shuffles once, on the same key the join needs."""
    tune_session(spark)
    ps = load_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")

    shipped = (li
               .filter((F.col("l_shipdate") >= F.lit("1997-01-01")
                        .cast("timestamp"))
                       & (F.col("l_shipdate") < F.lit("1998-01-01")
                          .cast("timestamp")))
               .groupBy("l_partkey", "l_suppkey")
               .agg(F.sum(F.col("l_quantity")
                          .cast("decimal(38,6)")).alias("qty")))
    widgets = part.filter(F.col("p_name").endswith("widget")) \
        .select("p_partkey")
    excess = (ps
              .join(F.broadcast(widgets),
                    F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
              .join(shipped,
                    (F.col("ps_partkey") == F.col("l_partkey"))
                    & (F.col("ps_suppkey") == F.col("l_suppkey")))
              .filter(F.col("ps_availqty").cast("decimal(38,6)")
                      > F.col("qty") * F.lit(0.5).cast("decimal(2,1)"))
              .select("ps_suppkey"))
    return (supplier
            .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"),
                  "left_semi")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_name", "n_name")
            .orderBy("s_name"))


_Q20_ORACLE = """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%widget')
          AND CAST(ps_availqty AS DECIMAL(38,6)) > (
              SELECT SUM(CAST(l_quantity AS DECIMAL(38,6)))
                     * CAST(0.5 AS DECIMAL(2,1))
              FROM lineitem
              WHERE l_partkey = ps_partkey
                AND l_suppkey = ps_suppkey
                AND l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate <  TIMESTAMP '1998-01-01'))
    ORDER BY s_name
"""


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: the largest TPC-H join tree — lineitem joins BOTH
    orders (fact-fact, for the year) AND partsupp (fact-fact, for the
    supplycost) plus three broadcast dims, then profit by nation and
    year.  The two fact-fact joins key on different columns
    (l_orderkey vs l_partkey+l_suppkey), so two shuffles of the spine
    are unavoidable — the plan's job is to make everything else
    broadcast and aggregate map-side."""
    tune_session(spark)
    ps = load_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    widget = part.filter(F.col("p_name").contains("widget")) \
        .select("p_partkey")
    # double arithmetic with the identical expression tree as the
    # oracle (deterministic IEEE), exactness via dsum's final decimal
    # cast — the repo's standard cross-engine aggregation pattern
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - _cost().cast("double") * F.col("l_quantity"))
    return (li
            .join(F.broadcast(widget),
                  F.col("l_partkey") == F.col("p_partkey"))
            .join(ps, (F.col("l_partkey") == F.col("ps_partkey"))
                  & (F.col("l_suppkey") == F.col("ps_suppkey")))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(supplier),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(dsum(amount, "sum_profit"))
            .orderBy("nation", F.col("o_year").desc()))


_Q9_ORACLE = f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           {dsum_sql(
               "l_extendedprice * (1 - l_discount)"
               f" - CAST({_COST_SQL} AS DOUBLE) * l_quantity",
               "sum_profit")}
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
"""


def register_partsupp_suite() -> bool:
    """Wire the partsupp suite into the live registry — unconditional,
    since both engines DERIVE partsupp from tables every scale dir
    ships (see module docstring).  Idempotent (safe from repeated
    ``all_queries`` calls)."""
    from cga_logs_to_kinesis_spark.registry import _REGISTRY, register

    if "min_cost_supplier" in _REGISTRY:
        return True
    for spec in PARTSUPP_SPECS.values():
        register(spec)
    return True


PARTSUPP_SPECS: dict[str, QuerySpec] = {
    spec.name: spec for spec in (
        QuerySpec("min_cost_supplier", q_min_cost_supplier, _with_partsupp(_Q2_ORACLE),
                  doc="TPC-H Q2 shape: correlated scalar-min subquery "
                      "decorrelated to agg + re-join",
                  tags=("join", "subquery", "agg")),
        QuerySpec("product_profit", q_product_profit, _with_partsupp(_Q9_ORACLE),
                  doc="TPC-H Q9 shape: double fact-fact join "
                      "(orders + partsupp on different keys) + "
                      "broadcast dims, profit by nation x year",
                  tags=("join", "agg")),
        QuerySpec("important_stock", q_important_stock, _with_partsupp(_Q11_ORACLE),
                  doc="TPC-H Q11 shape: HAVING vs global scalar via "
                      "broadcast 1-row cross join",
                  tags=("agg", "subquery", "broadcast")),
        QuerySpec("supplier_part_counts", q_supplier_part_counts,
                  _with_partsupp(_Q16_ORACLE),
                  doc="TPC-H Q16 shape: NOT-IN anti join + "
                      "multi-column COUNT(DISTINCT)",
                  tags=("join", "anti", "distinct")),
        QuerySpec("excess_stock_suppliers", q_excess_stock_suppliers,
                  _with_partsupp(_Q20_ORACLE),
                  doc="TPC-H Q20 shape: agg-filtered nested semi "
                      "join chain",
                  tags=("join", "semi", "agg", "subquery")),
    )
}
