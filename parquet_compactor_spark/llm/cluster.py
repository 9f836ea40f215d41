"""Iterative clustering over embeddings: distributed Lloyd's k-means.

The representative *iterative algorithm* of the surface (driver contract:
iterative ops may omit the SQL oracle — a fixed-point loop is not
SQL-expressible). Each iteration is a broadcast-join assignment plus a
per-dimension mean aggregation; the only driver-side data is the K×dim
centroid matrix (model state, KBs — not row data), so the loop runs
unchanged on a 100 TB corpus.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, register

K = 8
N_ITER = 3
SEED_IDS = (100, 107)  # deterministic seed centroids: vec_ids 100..107

# Centroid-matrix encoding threshold: above this K, embed-as-literals is
# replaced by ONE broadcast row carrying the matrix as an array column —
# plan size O(1) in K, still a zero-shuffle map. Set to 0 (broadcast is
# the default at every K): building K x dim literal expressions costs
# hundreds of py4j round-trips per assignment pass, and the measured
# steady-state at K=8/dim=64/sf0.01 is 1.44 s broadcast vs 2.21 s literal
# for a 3-iteration k-means. The literal path stays available (pass
# ``literal_max`` explicitly) and is pinned bit-equal by
# tests/test_llm.py::test_centroid_encodings_agree_bitwise.
LITERAL_CENTROID_MAX = 0


def _sq_dist(vec_col, cvec):
    """Squared L2 between a vector column and a centroid array column —
    zip_with + left-fold, same IEEE order for both centroid encodings."""
    return F.aggregate(
        F.zip_with(vec_col, cvec, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(
    vecs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    literal_max: int = LITERAL_CENTROID_MAX,
) -> DataFrame:
    """Assign each vector to its nearest centroid — pure map, zero shuffle.

    Small K (<= ``literal_max``): centroids are embedded as literal arrays
    (the KB-scale model state); each row computes its K squared-L2
    distances JVM-side and argmins via array_position (first minimum →
    lowest centroid id on ties). No join, no aggregation: assignment cost
    is exactly one pass over the data.

    Large K: the same K x dim doubles ride along as ONE array<array<double>>
    column on a broadcast single-row relation (BroadcastNestedLoopJoin with
    a 1-row build side — still a map, no shuffle), and the distance array
    is a ``transform`` over it, so the expression tree stays O(1) in K.
    Both forms compute identical IEEE doubles in identical fold order —
    bit-equal assignments (pinned by tests/test_llm.py).
    """
    if len(centroids) <= literal_max:
        from parquet_compactor_spark.llm.text import lit_double_array

        dist_arr = F.array(
            *[
                _sq_dist(F.col("vec"), lit_double_array(cvec))
                for _, cvec in centroids
            ]
        )
        staged = vecs.withColumn("dists", dist_arr)
    else:
        spark = vecs.sparkSession
        matrix = [[float(x) for x in cvec] for _, cvec in centroids]
        cents = spark.createDataFrame(
            [(matrix,)], "_cents array<array<double>>"
        )
        staged = vecs.crossJoin(F.broadcast(cents)).withColumn(
            "dists",
            F.transform(F.col("_cents"), lambda cv: _sq_dist(F.col("vec"), cv)),
        )
    return staged.select(
        "vec_id",
        "vec",
        (F.array_position(F.col("dists"), F.array_min("dists")) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min("dists").alias("dist"),
    )


class _CentroidRow(NamedTuple):
    """Row shim for :func:`per_dim_means` consumers (``r.cluster`` /
    ``r.cvec`` attribute access, same as the former collected Rows)."""

    cluster: int
    cvec: list


def per_dim_means(
    assigned: DataFrame, cluster_col: str = "cluster", vec_col: str = "vec", ndigits: int | None = None
) -> list:
    """Per-cluster per-dimension means, collected as model state.

    posexplode → avg per (cluster, pos) → collect the flat
    (cluster, pos, m) grid and assemble the ordered arrays driver-side.
    One shuffle with cluster×dim groups (KBs); the collect returns
    K×dim scalar rows — the same doubles the former second
    groupBy(cluster)/collect_list pass shipped as K array rows, minus
    that whole extra exchange + stage (guide §2.4: the re-assembly is
    pure model-state shaping, not data work — r15). Values are
    identical: avg per (cluster, pos) is unchanged and the per-cluster
    sort by pos reproduces array_sort's order (pos is a distinct int).
    ``ndigits`` rounds inside the aggregation (Spark ROUND =
    half-away-from-zero, matching SQL ROUND) so a differential oracle
    can reproduce the values exactly.
    """
    m = F.avg("x")
    if ndigits is not None:
        m = F.round(m, ndigits)
    flat = (
        assigned.select(F.col(cluster_col).alias("cluster"), F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(m.alias("m"))
        .collect()
    )
    by_cluster: dict[int, list] = {}
    for r in flat:
        by_cluster.setdefault(r.cluster, []).append((r.pos, r.m))
    return [
        _CentroidRow(cid, [v for _, v in sorted(pm)])
        for cid, pm in by_cluster.items()
    ]


def kmeans(
    vecs: DataFrame,
    k: int = K,
    n_iter: int = N_ITER,
    literal_max: int = LITERAL_CENTROID_MAX,
    ndigits: int | None = None,
) -> DataFrame:
    """Lloyd's k-means: returns (vec_id, cluster, dist) after ``n_iter``
    iterations from deterministic seeds. ``vecs``: (vec_id, vec:array<double>).

    ``ndigits`` rounds each iteration's centroid means to that many decimal
    digits. With rounding on, the whole fixed-point loop becomes
    engine-independent: seed vectors are exact parquet floats, the
    assignment's squared-L2 fold has a pinned IEEE evaluation order
    (``_sq_dist``), and rounding the means quashes the summation-order ULP
    noise that would otherwise make centroids differ across engines — so a
    differential oracle can replay the identical iterations.
    """
    lo, hi = SEED_IDS
    seeds = (
        vecs.filter(F.col("vec_id").between(lo, hi))
        .orderBy("vec_id")
        .collect()
    )
    centroids = [(i, list(r.vec)) for i, r in enumerate(seeds[:k])]

    assigned = _assign(vecs, centroids, literal_max)
    for _ in range(n_iter - 1):
        # K rows of dim doubles — model state, not row data.
        means = per_dim_means(assigned, ndigits=ndigits)
        # Preserve list order (cluster id == position) and carry the old
        # centroid forward for clusters that went empty.
        new = {r.cluster: list(r.cvec) for r in means}
        centroids = [(cid, new.get(cid, old)) for cid, old in centroids]
        assigned = _assign(vecs, centroids, literal_max)
    return assigned.select("vec_id", "cluster", "dist")


def _lloyd_sql_unrolled(n_iter: int = N_ITER, ndigits: int = 6) -> str:
    """ANSI-SQL replay of the exact loop above for the DuckDB oracle.

    A fixed-point loop is not one SQL query, but with ``n_iter`` fixed the
    loop UNROLLS into a straight-line CTE chain: assign -> means -> assign
    -> ... The distance uses list_zip + list_reduce so the fold order is
    bit-identical to ``_sq_dist``'s aggregate (0.0 + x1 == x1 in IEEE, so
    DuckDB's first-element seed matches Spark's explicit 0.0 seed), and
    ties argmin to the lowest cluster id exactly like array_position-of-min.
    """
    lo, hi = SEED_IDS
    parts = [
        f"""WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
c0 AS (
  SELECT CAST(vec_id - {lo} AS INT) AS cluster, vec AS cvec
  FROM v WHERE vec_id BETWEEN {lo} AND {hi}
)"""
    ]
    for i in range(1, n_iter + 1):
        prev_c = f"c{i - 1}"
        parts.append(
            f""",
a{i} AS (
  SELECT vec_id, vec, cluster, dist FROM (
    SELECT v.vec_id, v.vec, c.cluster,
           list_reduce(list_transform(list_zip(v.vec, c.cvec),
                       p -> (p[1] - p[2]) * (p[1] - p[2])),
                       (acc, x) -> acc + x) AS dist,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY dist, c.cluster) AS rn
    FROM v CROSS JOIN {prev_c} c)
  WHERE rn = 1
)"""
        )
        if i < n_iter:
            parts.append(
                f""",
m{i} AS (
  SELECT cluster, pos, ROUND(AVG(x), {ndigits}) AS m
  FROM (SELECT cluster, unnest(vec) AS x,
               generate_subscripts(vec, 1) AS pos FROM a{i})
  GROUP BY cluster, pos
),
c{i} AS (
  SELECT c.cluster, COALESCE(mm.cvec, c.cvec) AS cvec
  FROM {prev_c} c LEFT JOIN (
    SELECT cluster, list(m ORDER BY pos) AS cvec FROM m{i} GROUP BY cluster
  ) mm USING (cluster)
)"""
            )
    parts.append(
        f"""
SELECT cluster,
       COUNT(*) AS n_vectors,
       ROUND(AVG(dist), 4) AS mean_sq_dist
FROM a{n_iter}
GROUP BY cluster"""
    )
    return "".join(parts)


@register(
    "q_kmeans_clusters",
    oracle=_lloyd_sql_unrolled(),
    doc="Distributed Lloyd's k-means over embeddings (K=8, 3 iterations, "
    "deterministic seeds): per-iteration broadcast assignment + "
    "per-dimension mean aggregation; driver holds only the KxD centroid "
    "matrix. Output: cluster sizes and mean within-cluster squared "
    "distance. The fixed-point loop is not one SQL query, but with the "
    "iteration count fixed it unrolls into a straight-line CTE chain the "
    "oracle replays step for step: 6dp-rounded iteration means plus a "
    "pinned IEEE fold order make every intermediate centroid and distance "
    "engine-independent. Convergence asserted in tests/test_llm.py.",
)
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("vec"),
    )
    assigned = kmeans(vecs, ndigits=6)
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("dist"), 4).alias("mean_sq_dist"),
    )
