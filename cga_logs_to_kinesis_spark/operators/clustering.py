"""Embedding clustering: distributed Lloyd's k-means.

The iterative-algorithm pattern on Spark: per-iteration state is the
k×dim centroid matrix — small enough to collect and broadcast — while
the corpus-sized work (assignment) stays a narrow Arrow-vectorized
map and the centroid update is one exact-decimal aggregation.  No
driver-side loop ever touches corpus rows; at 100 TB each iteration is
one scan + one (cluster, dim)-keyed shuffle whose key space is k×dim,
perfectly uniform.

Determinism (rows-only in the driver gate, but reproducible
run-to-run, partitioning-independent — pinned by tests):

* init: centroids = embeddings of the k smallest vec_ids (no RNG);
* assignment: squared-distance accumulation is sequential over dims
  (same IEEE order every run); ties broken by lowest cluster id;
* update: per-(cluster, dim) means via DECIMAL(38,6) sums —
  order-independent, so shuffle nondeterminism cannot perturb the
  next iteration's centroids (a double sum here would make k-means
  results depend on partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import (
    explode_parallelism,
    tune_session,
)
from cga_logs_to_kinesis_spark.sources import load_embeddings, load_table

K_CLUSTERS = 8
N_ITERS = 3
_DEC = "decimal(38,6)"


def _assign(emb: DataFrame, centroids) -> DataFrame:
    """(vec_id, embedding) + k×dim matrix → (vec_id, embedding,
    cluster, sqdist).  Vectorized argmin; distances accumulate
    sequentially over dims (deterministic IEEE order)."""
    import pandas as pd

    import numpy as np
    cents = np.asarray(centroids, dtype=np.float64)      # (k, dim)

    def assign(it):
        for pdf in it:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d = np.zeros((E.shape[0], cents.shape[0]))
            for i in range(cents.shape[1]):              # sequential
                diff = E[:, i:i + 1] - cents[:, i]
                d += diff * diff
            cluster = d.argmin(axis=1)                   # first min wins
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "embedding": pdf["embedding"],
                "cluster": cluster.astype(np.int32),
                "sqdist": d[np.arange(len(cluster)), cluster],
            })

    return emb.mapInPandas(
        assign,
        schema="vec_id long, embedding array<float>, "
               "cluster int, sqdist double")


def _update(assigned: DataFrame, k: int, dim: int):
    """Exact-decimal per-(cluster, dim) means → new k×dim matrix.
    Empty clusters keep their previous centroid absent → caller
    preserves the old row (stable, no NaNs)."""
    rows = (assigned
            .select("cluster", F.posexplode("embedding")
                    .alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg((F.sum(F.col("v").cast("double").cast(_DEC))
                  .cast("double") / F.count("*")).alias("m"))
            .collect())                                  # k*dim rows
    out: dict[int, list[float | None]] = {}
    for r in rows:
        out.setdefault(r.cluster, [None] * dim)[r.dim] = r.m
    return out


def kmeans(emb: DataFrame, k: int = K_CLUSTERS,
           n_iters: int = N_ITERS) -> DataFrame:
    """Returns (vec_id, cluster, sqdist) after ``n_iters`` Lloyd
    rounds from the deterministic seed."""
    seed_rows = (emb.orderBy("vec_id").limit(k)
                 .select("embedding").collect())
    cents = [list(r.embedding) for r in seed_rows]
    dim = len(cents[0])
    assigned = None
    for _ in range(n_iters):
        assigned = _assign(emb, cents).localCheckpoint()
        means = _update(assigned, k, dim)
        cents = [means.get(c, cents[c]) for c in range(k)]
    return assigned.select("vec_id", "cluster", "sqdist")


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    emb = load_embeddings(spark, sf_dir)
    return kmeans(emb).orderBy("vec_id")


def _kmeans_oracle(k: int = K_CLUSTERS, n_iters: int = N_ITERS) -> str:
    """Fixed-iteration Lloyd's unrolled as chained CTEs.

    Bit-exact against the Spark implementation because every float
    decision point is order-pinned on both engines: the per-dim
    squared-distance accumulation is a left fold (numpy's sequential
    ``d += diff*diff`` == DuckDB's ``list_sum`` left fold, verified),
    centroid means are DECIMAL(38,6) sums (order-free), ties break on
    lowest cluster id, and the seed is the k smallest vec_ids.  An
    iterative algorithm normally escapes SQL oracles; pinning the
    iteration count turns it into straight-line dataflow.
    """
    ctes, final = _kmeans_oracle_ctes(k, n_iters)
    return (f"WITH {ctes} "
            f"SELECT vec_id, cluster, sqdist FROM {final}")


def _kmeans_oracle_ctes(k: int = K_CLUSTERS,
                        n_iters: int = N_ITERS) -> tuple[str, str]:
    """The unrolled-Lloyd CTE block and the name of its final
    assignment relation — reusable by queries composed ON the
    clustering (cluster_mixture)."""
    sqd = ("list_sum(list_transform(range(1, len(e.embedding) + 1), "
           "d -> (CAST(e.embedding[d] AS DOUBLE) - c.cent[d]) "
           "* (CAST(e.embedding[d] AS DOUBLE) - c.cent[d])))")
    parts = [f"""
        emb AS (SELECT vec_id, embedding FROM embeddings),
        c1 AS (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster,
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE)) AS cent
            FROM (SELECT vec_id, embedding FROM emb
                  ORDER BY vec_id LIMIT {k})
        )"""]
    for i in range(1, n_iters + 1):
        parts.append(f"""
        a{i} AS (
            SELECT vec_id, embedding, cluster, sqdist FROM (
                SELECT vec_id, embedding, cluster, sqdist,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY sqdist, cluster) AS rn
                FROM (SELECT e.vec_id, e.embedding, c.cluster,
                             {sqd} AS sqdist
                      FROM emb e, c{i} c)
            ) WHERE rn = 1
        )""")
        if i < n_iters:
            parts.append(f"""
        u{i} AS (
            SELECT cluster, o.d - 1 AS dim,
                   CAST(SUM(CAST(CAST(embedding[o.d] AS DOUBLE)
                       AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS m
            FROM a{i},
                 UNNEST(range(1, len(embedding) + 1)) AS o(d)
            GROUP BY cluster, o.d
        ),
        cl{i} AS (
            SELECT cluster, list(m ORDER BY dim) AS cent
            FROM u{i} GROUP BY cluster
        ),
        c{i + 1} AS (
            SELECT c.cluster, COALESCE(cl.cent, c.cent) AS cent
            FROM c{i} c LEFT JOIN cl{i} cl USING (cluster)
        )""")
    return ",".join(parts), f"a{n_iters}"


register(QuerySpec(
    "kmeans_embeddings", q_kmeans_embeddings,
    oracle=_kmeans_oracle(),
    doc=f"distributed Lloyd's k-means (k={K_CLUSTERS}, "
        f"{N_ITERS} iters, exact-decimal centroid updates; oracle = "
        "fixed-iteration unrolled CTE chain, bit-exact)",
    tags=("similarity", "north-star", "iterative", "pandas-udf"),
))


# ---------------------------------------------------------------------------
# Cluster-balanced mixture: temperature weights over TOPIC mass
# ---------------------------------------------------------------------------
# mixture_weights rebalances by SOURCE; at web scale the sources are
# few and coarse, and the balancing production pipelines actually run
# (DCLM, SemDeDup §4) is by embedding-cluster — topics the metadata
# doesn't label.  Composition: the k-means assignment above reduces
# the corpus to k cluster sizes, and the SAME decimal-sqrt mixture
# algebra (llm_pipeline.mixture_weight_columns, mass = vector count)
# turns them into w ∝ n^0.5 resampling weights + expected epochs at
# the fixed budget.  Plan: the clustering's own Arrow-map assignment,
# one k-key groupBy (k=8 — partial aggs reduce map-side), and the
# bounded global window over k rows (allowlisted, the
# mixture_weights shape).

def q_cluster_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cga_logs_to_kinesis_spark.operators.llm_pipeline import (
        mixture_weight_columns,
    )

    tune_session(spark)
    emb = load_embeddings(spark, sf_dir)
    sizes = (kmeans(emb).groupBy("cluster")
             .agg(F.count("*").alias("n_vecs")))
    # budget_per_vec, not expected_epochs: the shared budget constant
    # is a TOKEN budget and the mass here is a vector count, so the
    # ratio's units are budget-tokens per cluster vector (r15 advice).
    return (mixture_weight_columns(sizes, mass_col="n_vecs",
                                   budget_col="budget_per_vec")
            .orderBy("cluster"))


from cga_logs_to_kinesis_spark.operators.llm_pipeline import (  # noqa: E402
    MIX_TOKEN_BUDGET as _CM_BUDGET,
)

_CM_CTES, _CM_FINAL = _kmeans_oracle_ctes()

register(QuerySpec(
    "cluster_mixture", q_cluster_mixture,
    oracle=f"""
        WITH {_CM_CTES},
        sizes AS (
            SELECT cluster, COUNT(*) AS n_vecs
            FROM {_CM_FINAL} GROUP BY cluster
        ),
        q AS (
            SELECT cluster, n_vecs,
                   CAST(sqrt(CAST(n_vecs AS DOUBLE))
                        AS DECIMAL(38,6)) AS sq
            FROM sizes
        )
        SELECT cluster, CAST(n_vecs AS BIGINT) AS n_vecs,
               CAST(sq AS DOUBLE) / CAST(SUM(sq) OVER () AS DOUBLE)
                   AS weight,
               (CAST(sq AS DOUBLE) / CAST(SUM(sq) OVER () AS DOUBLE)
                * {_CM_BUDGET}) / n_vecs AS budget_per_vec
        FROM q
    """,
    doc="cluster-balanced temperature mixture (w ∝ cluster_size^0.5 "
        "over the k-means topics) — the embedding-space twin of "
        "mixture_weights, shared decimal-sqrt algebra",
    tags=("similarity", "llm-pipeline", "agg", "ratio"),
))


# ---------------------------------------------------------------------------
# Covariance + PCA over embeddings
# ---------------------------------------------------------------------------
# Dimensionality reduction for embedding post-processing (whitening
# before semantic dedup, compression before ANN).  The covariance
# accumulation is the scale-critical part: the d x d pair products are
# expanded ROW-LOCALLY (nested array transform, no self-join), so the
# only shuffle is the (i, j)-keyed aggregation whose key space is
# d*(d+1)/2 — partial map-side aggregation absorbs the corpus-sized
# blowup before it ever crosses the network.  Sums are exact decimals
# (order-independent), which makes the covariance — and therefore the
# eigenvectors computed from it — reproducible across partitionings
# and bit-checkable against the DuckDB oracle.
#
# The eigensolve itself runs driver-side on the d x d matrix (4 KB at
# d=64 — legitimately driver-scale, like k-means centroids); the
# corpus-sized projection is an Arrow map with sequential per-dim
# accumulation (the repo's bit-exact pattern).


def _pair_products():
    """Upper-triangle (i, j, xi*xj) structs expanded within each row."""
    return F.expr("""
        filter(flatten(transform(embedding, (xi, i) ->
            transform(embedding, (xj, j) ->
                struct(i AS i, j AS j,
                       cast(xi AS double) * cast(xj AS double) AS xy)))),
            p -> p.j >= p.i)
    """)


def covariance_long(emb: DataFrame) -> DataFrame:
    """(i, j, cov, n) for the upper triangle, exact-decimal sums.

    The input is spread across the explode-parallelism width first: a
    single-file embeddings scan is 1 partition, and the d(d+1)/2
    per-row pair expansion (2080 structs/row at d=64) would otherwise
    run serial.  The repartition ships raw vectors (d floats/row) —
    tiny next to the expansion it parallelizes."""
    par = explode_parallelism(emb.sparkSession)
    emb = emb.repartition(par)
    n_mean = (emb
              .select(F.posexplode("embedding").alias("dim", "v"))
              .groupBy("dim")
              .agg((F.sum(F.col("v").cast("double").cast(_DEC))
                    .cast("double") / F.count("*")).alias("mean")))
    sums = (emb
            .select(F.explode(_pair_products()).alias("p"))
            .select("p.i", "p.j", "p.xy")
            .groupBy("i", "j")
            .agg(F.sum(F.col("xy").cast(_DEC)).cast("double").alias("sxy"),
                 F.count("*").alias("n")))
    mi = F.broadcast(n_mean.select(F.col("dim").alias("i"),
                                   F.col("mean").alias("mean_i")))
    mj = F.broadcast(n_mean.select(F.col("dim").alias("j"),
                                   F.col("mean").alias("mean_j")))
    return (sums.join(mi, "i").join(mj, "j")
            .select("i", "j",
                    (F.col("sxy") / F.col("n")
                     - F.col("mean_i") * F.col("mean_j")).alias("cov"),
                    "n"))


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return covariance_long(load_embeddings(spark, sf_dir))


# Shared by the pca_project oracle below (covariance CTE reuse, the
# same composition trick as ann_recall_report).
_COV_ORACLE = f"""
        WITH x AS (
            SELECT vec_id,
                   unnest(range(0, len(embedding))) AS dim,
                   unnest(embedding) AS v
            FROM embeddings
        ), means AS (
            SELECT dim,
                   CAST(SUM(CAST(CAST(v AS DOUBLE) AS {_DEC.upper()}))
                        AS DOUBLE) / COUNT(*) AS mean
            FROM x GROUP BY dim
        ), sums AS (
            SELECT a.dim AS i, b.dim AS j,
                   CAST(SUM(CAST(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)
                        AS {_DEC.upper()})) AS DOUBLE) AS sxy,
                   COUNT(*) AS n
            FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.dim >= a.dim
            GROUP BY 1, 2
        )
        SELECT i, j, sxy / n - mi.mean * mj.mean AS cov, n
        FROM sums
        JOIN means mi ON mi.dim = i
        JOIN means mj ON mj.dim = j
    """

register(QuerySpec(
    "embedding_covariance", q_embedding_covariance,
    oracle=_COV_ORACLE,
    doc="upper-triangle embedding covariance: row-local pair expansion "
        "+ exact-decimal (i,j)-keyed aggregation (d^2 keys, never a "
        "self-join shuffle)",
    tags=("similarity", "llm-pipeline", "agg", "north-star"),
))


PCA_COMPONENTS = 2
PCA_POWER_ITERS = 100


def _top_eigvecs(cov_rows, dim: int, k: int):
    """Deterministic top-k eigenvectors of the symmetric covariance:
    driver-side deflated power iteration from a fixed start vector,
    sign-fixed so the largest-magnitude component is positive.

    Every float decision point is a *sequential left fold* (matvec
    rows, norms, deflation dots) rather than a BLAS call: BLAS is free
    to reorder/block its accumulations, which is exactly what kept
    this operator off the DuckDB oracle until round 5.  With the folds
    pinned, the whole iteration is bit-reproducible and the oracle
    below replays it as a recursive CTE — the same
    fixed-iteration-unroll trick that oracle-paired kmeans.  The
    matrix is d x d (driver-scale); the fold loops cost microseconds.
    """
    import math

    import numpy as np
    C = np.zeros((dim, dim))
    for r in cov_rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    vecs = []
    for _ in range(k):
        v = np.ones(dim) / np.sqrt(dim)
        for _ in range(PCA_POWER_ITERS):
            for u in vecs:                       # deflate
                dot = 0.0
                for j in range(dim):             # sequential fold
                    dot += u[j] * v[j]
                v = v - u * dot
            w = np.zeros(dim)
            for j in range(dim):                 # sequential fold:
                w += C[:, j] * v[j]              # w[r] = sum_j C[r,j]v[j]
            s = 0.0
            for x in w:                          # sequential fold
                s += x * x
            nrm = math.sqrt(s)
            if nrm != 0.0:                       # nrm==0 → keep v (a
                v = w / nrm                      # fixpoint: w stays 0)
        lead = int(np.abs(v).argmax())
        if v[lead] < 0:
            v = -v
        vecs.append(v)
    return np.stack(vecs)                        # (k, dim)


def pca_project(emb: DataFrame, k: int = PCA_COMPONENTS) -> DataFrame:
    """(vec_id, pc1..pck): project onto the top-k principal axes.

    The eigensolve sees only the d x d exact covariance (collected —
    driver-scale by construction); the corpus projection is an Arrow
    map accumulating sequentially per dim, bit-identical across
    partitionings."""
    import pandas as pd

    import numpy as np
    dim = len(emb.select("embedding").first()["embedding"])
    W = _top_eigvecs(covariance_long(emb).collect(), dim, k)

    def project(it):
        for pdf in it:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            P = np.zeros((E.shape[0], W.shape[0]))
            for i in range(W.shape[1]):          # sequential over dims
                P += E[:, i:i + 1] * W[:, i]
            out = {"vec_id": pdf["vec_id"]}
            for c in range(W.shape[0]):
                out[f"pc{c + 1}"] = P[:, c]
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(
        f"pc{c + 1} double" for c in range(k))
    return emb.select("vec_id", "embedding").mapInPandas(project, schema)


def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    emb = load_embeddings(spark, sf_dir)
    return pca_project(emb).orderBy("vec_id")


def _pca_oracle(iters: int = PCA_POWER_ITERS) -> str:
    """The deflated power iteration replayed as recursive CTEs.

    Bit-exact against :func:`_top_eigvecs` + the Arrow projection
    because both engines execute identical IEEE operation sequences:
    the covariance CTE is the (already-paired) exact-decimal
    ``embedding_covariance`` oracle; matvec rows, norms and deflation
    dots are left folds (``list_sum`` == the numpy per-dim loops);
    sqrt/divide are correctly-rounded on both engines; sign fix and
    tie-breaks are order-pinned.  A fixed iteration count turns the
    "non-SQL-expressible" eigensolve into straight-line dataflow —
    the kmeans trick, with recursion instead of textual unrolling.
    ``MATERIALIZED`` on the shared CTEs matters: DuckDB inlines CTEs
    by default, which would re-evaluate the covariance aggregation
    inside every recursive step (~200x).
    """
    matvec = """
        SELECT w, sqrt(list_sum(list_transform(w, x -> x * x))) AS nrm
        FROM (SELECT list_transform(cmat.M, row ->
                list_sum(list_transform(range(1, len(row) + 1),
                    j -> row[j] * {v}[j]))) AS w)"""

    def signfix(it: str) -> str:
        return f"""
    SELECT CASE WHEN v[lead] < 0 THEN list_transform(v, x -> -x)
                ELSE v END AS v
    FROM (SELECT v,
                 (SELECT i FROM (SELECT unnest(v) AS x,
                                        unnest(range(1, len(v) + 1)) AS i)
                  ORDER BY abs(x) DESC, i LIMIT 1) AS lead
          FROM {it} WHERE n = {iters})"""

    return f"""
WITH RECURSIVE
cov AS MATERIALIZED ({_COV_ORACLE}),
covfull AS MATERIALIZED (
    SELECT i, j, cov FROM cov
    UNION ALL
    SELECT j AS i, i AS j, cov FROM cov WHERE i <> j
),
cmat AS MATERIALIZED (
    SELECT list(row ORDER BY i) AS M FROM (
        SELECT i, list(cov ORDER BY j) AS row
        FROM covfull GROUP BY i)
),
vinit AS MATERIALIZED (
    SELECT list_transform(range(1, MAX(i) + 2),
                          x -> 1.0 / sqrt(CAST(MAX(i) + 1 AS DOUBLE))) AS v0
    FROM covfull
),
it1(n, v) AS (
    SELECT 0, (SELECT v0 FROM vinit)
    UNION ALL
    SELECT it1.n + 1,
           CASE WHEN q.nrm = 0.0 THEN it1.v
                ELSE list_transform(q.w, x -> x / q.nrm) END
    FROM it1, cmat, LATERAL ({matvec.format(v="it1.v")}) q
    WHERE it1.n < {iters}
),
v1 AS MATERIALIZED ({signfix("it1")}),
it2(n, v) AS (
    SELECT 0, (SELECT v0 FROM vinit)
    UNION ALL
    SELECT it2.n + 1,
           CASE WHEN q.nrm = 0.0 THEN d.vd
                ELSE list_transform(q.w, x -> x / q.nrm) END
    FROM it2, cmat, v1, LATERAL (
        SELECT list_transform(range(1, len(it2.v) + 1),
                   j -> it2.v[j] - v1.v[j] * dot) AS vd
        FROM (SELECT list_sum(list_transform(range(1, len(it2.v) + 1),
                  j -> v1.v[j] * it2.v[j])) AS dot)
    ) d, LATERAL ({matvec.format(v="d.vd")}) q
    WHERE it2.n < {iters}
),
v2 AS MATERIALIZED ({signfix("it2")})
SELECT e.vec_id,
       list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> CAST(e.embedding[i] AS DOUBLE) * v1.v[i])) AS pc1,
       list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> CAST(e.embedding[i] AS DOUBLE) * v2.v[i])) AS pc2
FROM embeddings e, v1, v2
"""


register(QuerySpec(
    "pca_project", q_pca_project,
    oracle=_pca_oracle(),
    doc=f"PCA projection onto top-{PCA_COMPONENTS} axes (exact-decimal "
        "covariance, sequential-fold deflated power iteration, Arrow "
        "projection; oracle = recursive-CTE replay of the iteration, "
        "bit-exact)",
    tags=("similarity", "llm-pipeline", "iterative", "pandas-udf"),
))


# Oracle twins of the gated load_embeddings reads above (see
# sources/tables.py::gate_registered_oracles).
from cga_logs_to_kinesis_spark.sources.tables import (  # noqa: E402
    gate_registered_oracles as _gate_oracles,
)

_gate_oracles("kmeans_embeddings", "cluster_mixture",
              "embedding_covariance", "pca_project")


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean drift between two embedding snapshots — the
    monitoring report a pipeline runs when the encoder, preprocessing,
    or upstream corpus changes: a nonzero per-dim delta localizes
    WHICH dimensions moved (a re-normalization shows up as uniform
    shrink; a truncation bug zeroes a suffix).  Snapshots here are the
    deterministic vec_id parity split (the fixture ships one table);
    in production the two sides are two snapshot paths.

    Scale: one row-local posexplode (no join), then a d-key aggregate
    whose decimal sums fold map-side — the whole report is one shuffle
    of d x n_partitions partial rows, independent of corpus size.
    Means divide exact-decimal sums by counts, so both engines round
    the same rationals and deltas are bit-identical.
    """
    tune_session(spark)
    emb = load_embeddings(spark, sf_dir)
    x = emb.select(
        (F.col("vec_id") % 2 == 0).alias("is_a"),
        F.posexplode("embedding").alias("dim", "v"))
    is_a = F.col("is_a")
    va = F.when(is_a, F.col("v").cast("double")).cast(_DEC)
    vb = F.when(~is_a, F.col("v").cast("double")).cast(_DEC)
    per = (x.groupBy(F.col("dim").cast("bigint").alias("dim"))
           .agg(F.sum(F.when(is_a, 1).otherwise(0))
                .cast("bigint").alias("n_a"),
                F.sum(F.when(~is_a, 1).otherwise(0))
                .cast("bigint").alias("n_b"),
                F.sum(va).cast("double").alias("sum_a"),
                F.sum(vb).cast("double").alias("sum_b")))
    mean_a = F.try_divide(F.col("sum_a"), F.col("n_a").cast("double"))
    mean_b = F.try_divide(F.col("sum_b"), F.col("n_b").cast("double"))
    return (per.select("dim", "n_a", "n_b",
                       mean_a.alias("mean_a"), mean_b.alias("mean_b"))
            .withColumn("delta", F.col("mean_b") - F.col("mean_a"))
            .orderBy("dim"))


register(QuerySpec(
    "embedding_drift", q_embedding_drift,
    oracle=f"""
        WITH x AS (
            SELECT vec_id % 2 = 0 AS is_a,
                   unnest(range(0, len(embedding))) AS dim,
                   unnest(embedding) AS v
            FROM embeddings
        ),
        agg AS (
            SELECT dim,
                   CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b,
                   CAST(SUM(CASE WHEN is_a THEN
                        CAST(CAST(v AS DOUBLE) AS {_DEC.upper()}) END)
                        AS DOUBLE) AS sum_a,
                   CAST(SUM(CASE WHEN NOT is_a THEN
                        CAST(CAST(v AS DOUBLE) AS {_DEC.upper()}) END)
                        AS DOUBLE) AS sum_b
            FROM x GROUP BY dim
        )
        SELECT dim, n_a, n_b,
               sum_a / CASE WHEN n_a = 0 THEN NULL
                            ELSE CAST(n_a AS DOUBLE) END AS mean_a,
               sum_b / CASE WHEN n_b = 0 THEN NULL
                            ELSE CAST(n_b AS DOUBLE) END AS mean_b,
               (sum_b / CASE WHEN n_b = 0 THEN NULL
                             ELSE CAST(n_b AS DOUBLE) END)
               - (sum_a / CASE WHEN n_a = 0 THEN NULL
                               ELSE CAST(n_a AS DOUBLE) END) AS delta
        FROM agg
        ORDER BY dim
    """,
    doc="per-dimension embedding mean drift between two snapshots "
        "(vec_id parity split): n/mean per side + delta, exact-decimal "
        "sums so deltas are bit-identical",
    tags=("similarity", "llm-pipeline", "agg", "report", "north-star"),
))

_gate_oracles("embedding_drift")
