"""Similarity search over the ``embeddings`` table (array<float> vectors).

Brute-force cosine top-k is the correctness baseline; LSH-bucketed ANN is
the scale path (bucket first, score only within the bucket); blocked
pairwise similarity covers near-dup-by-embedding.

All vector math is JVM-side (zip_with/aggregate on array columns) — at
100 TB the score stage is a pure map over whatever blocking bounded the
candidate set.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, register
from parquet_compactor_spark.llm.text import lit_double_array, lit_long_array


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array columns (zip_with + aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


@register(
    "q_sim_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               e.label,
               ROUND(
                 list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                  list_transform(q.qvec, x -> CAST(x AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qvec,      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                 4) AS cos_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, label, cos_sim
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
    doc="Brute-force cosine top-k against a query vector (vec_id=0). The "
    "query vector is a broadcast scalar (crossJoin of a 1-row DF); scoring "
    "is JVM-side zip_with/aggregate; top-k is TakeOrderedAndProject. At "
    "100 TB the same plan holds — broadcast query, map-side score, heap-k.",
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qvec")), 4).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(10)


# --------------------------------------------------------------------------
# LSH-bucketed approximate nearest neighbors (the scale path)
# --------------------------------------------------------------------------

N_HYPERPLANES = 8
EMBED_DIM = 64

_rng = random.Random(7)
HYPERPLANES: list[list[float]] = [
    [round(_rng.uniform(-1.0, 1.0), 6) for _ in range(EMBED_DIM)]
    for _ in range(N_HYPERPLANES)
]


def _bucket_expr_spark(vec: Column) -> Column:
    """Sign-of-projection LSH bucket id (0..255) for a vector column."""
    bucket = F.lit(0)
    for j, hp in enumerate(HYPERPLANES):
        proj = dot(vec, lit_double_array(hp))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _bucket_expr_sql(vec_sql: str) -> str:
    """The identical bucket computation as DuckDB SQL (same literals)."""
    terms = []
    for j, hp in enumerate(HYPERPLANES):
        arr = "[" + ", ".join(repr(v) for v in hp) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_sql}, {arr}) >= 0 THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


_ANN_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    bucketed AS (
        SELECT vec_id, label, vec, {_bucket_expr_sql('vec')} AS bucket
        FROM v
    ),
    q AS (SELECT vec, bucket FROM bucketed WHERE vec_id = 0)
    SELECT b.vec_id, b.label, b.bucket,
           ROUND(list_dot_product(b.vec, q.vec)
                 / (sqrt(list_sum(list_transform(b.vec, x -> x * x)))
                  * sqrt(list_sum(list_transform(q.vec, x -> x * x)))), 4) AS cos_sim
    FROM bucketed b JOIN q ON b.bucket = q.bucket
    WHERE b.vec_id <> 0
    ORDER BY cos_sim DESC, b.vec_id
    LIMIT 5
"""



@register(
    "q_embed_near_dup",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    blocked AS (
        SELECT vec_id, label, vec, {_bucket_expr_sql('vec')} AS bucket,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v
    ),
    pairs AS (
        SELECT a.label,
               a.vec_id AS id1,
               b.vec_id AS id2,
               list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos_raw
        FROM blocked a JOIN blocked b
          ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    ranked AS (
        SELECT label, id1, id2, ROUND(cos_raw, 4) AS cos_sim,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY cos_raw DESC, id1, id2) AS rn
        FROM pairs
    )
    SELECT label, id1, id2, cos_sim, rn FROM ranked WHERE rn <= 3
    """,
    doc="Embedding-cosine near-duplicate detection with TWO-LEVEL blocking: "
    "label AND the 8-hyperplane sign bucket (the same seeded planes as "
    "q_ann_lsh, reproduced literally in the oracle). Round 5's scale-ramp "
    "measured the earlier label-only blocking at 154x cost for 25x data — "
    "label cardinality is FIXED, so block sizes grow linearly and the "
    "within-block self-join grows quadratically. The sign bucket multiplies "
    "the block count by 2^H (H=8 here; H is the corpus-growth knob — pick "
    "H ~ log2(n / target_block_size) so blocks stay bounded), and true "
    "near-dups co-locate with probability (1 - theta/pi)^H, which tends to "
    "1 exactly for the cos->1 pairs dedup cares about. Top-3 most-similar "
    "co-blocked pairs per label; one hash shuffle on (label, bucket).",
)
def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from parquet_compactor_spark.llm.text import persist_tracked

    e = load(spark, sf_dir, "embeddings")
    # Norms and buckets are materialized per input row BEFORE the pair
    # join (O(n*d)); only the dot product is per-pair. Same arithmetic/
    # rounding path as the oracle: dot / (n1 * n2). Persisted: the two
    # join sides project different column names on top, so their
    # exchange subtrees don't canonicalize equal and the 8-hyperplane
    # bucket map would run twice (the multi-consumer rule).
    blocked = persist_tracked(
        e.select(
            "label",
            "vec_id",
            F.col("embedding").alias("v"),
            _bucket_expr_spark(F.col("embedding")).alias("bucket"),
            l2_norm(F.col("embedding")).alias("nrm"),
        )
    )
    a = blocked.select(
        "label",
        "bucket",
        F.col("vec_id").alias("id1"),
        F.col("v").alias("v1"),
        F.col("nrm").alias("n1"),
    )
    b = blocked.select(
        "label",
        "bucket",
        F.col("vec_id").alias("id2"),
        F.col("v").alias("v2"),
        F.col("nrm").alias("n2"),
    )
    pairs = a.join(b, ["label", "bucket"]).filter(F.col("id1") < F.col("id2"))
    scored = pairs.select(
        "label",
        "id1",
        "id2",
        (dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))).alias("cos_raw"),
    )
    w = Window.partitionBy("label").orderBy(F.desc("cos_raw"), "id1", "id2")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("label", "id1", "id2", F.round("cos_raw", 4).alias("cos_sim"), "rn")
    )


IVF_CENTROID_IDS = (100, 107)  # seed centroids: vec_ids 100..107 (K=8)
IVF_N_PROBE = 2  # cells probed per query
IVF_ROUND = 6  # refined-centroid rounding (exact cross-engine agreement)

_COS_SQL = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
    "  * sqrt(list_sum(list_transform({b}, x -> x * x))))"
)


def _ivf_oracle(n_probe: int) -> str:
    cos_vc = _COS_SQL.format(a="v.vec", b="c.cvec")
    cos_vr = _COS_SQL.format(a="v.vec", b="r.cvec")
    cos_qr = _COS_SQL.format(a="q.vec", b="r.cvec")
    cos_aq = _COS_SQL.format(a="a.vec", b="q.vec")
    return f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    cents AS (
        SELECT CAST(vec_id - 100 AS INT) AS bucket, vec AS cvec FROM v
        WHERE vec_id BETWEEN 100 AND 107
    ),
    sc1 AS (
        SELECT v.vec_id, v.vec, c.bucket, {cos_vc} AS csim
        FROM v CROSS JOIN cents c
    ),
    assign1 AS (
        SELECT vec_id, vec, bucket
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY csim DESC, bucket) AS rn
              FROM sc1)
        WHERE rn = 1
    ),
    exploded AS (
        SELECT bucket, unnest(range(1, len(vec) + 1)) AS pos, vec FROM assign1
    ),
    dims AS (
        SELECT bucket, pos, ROUND(AVG(vec[pos]), {IVF_ROUND}) AS m
        FROM exploded GROUP BY bucket, pos
    ),
    refined AS (
        SELECT bucket, list(m ORDER BY pos) AS cvec FROM dims GROUP BY bucket
    ),
    sc2 AS (
        SELECT v.vec_id, v.label, v.vec, r.bucket, {cos_vr} AS csim
        FROM v CROSS JOIN refined r
    ),
    assign2 AS (
        SELECT vec_id, label, vec, bucket
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY csim DESC, bucket) AS rn
              FROM sc2)
        WHERE rn = 1
    ),
    q AS (SELECT vec FROM v WHERE vec_id = 0),
    probes AS (
        SELECT r.bucket,
               ROW_NUMBER() OVER (ORDER BY {cos_qr} DESC, r.bucket) AS prn
        FROM refined r CROSS JOIN q
    )
    SELECT a.vec_id, a.label, a.bucket,
           ROUND({cos_aq}, 4) AS cos_sim
    FROM assign2 a
    JOIN (SELECT bucket FROM probes WHERE prn <= {n_probe}) p
      ON a.bucket = p.bucket
    CROSS JOIN q
    WHERE a.vec_id <> 0
    ORDER BY cos_sim DESC, a.vec_id
    LIMIT 5
    """


def _argmax_bucket(csims: Column, cids: Column) -> Column:
    """Bucket of the max cosine; first occurrence of the max == lowest
    bucket id on ties — same tie-break as ROW_NUMBER (csim DESC, id ASC)."""
    return (
        F.element_at(cids, F.array_position(csims, F.array_max(csims)).cast("int"))
        .cast("int")
    )


def _py_l2norm(vec: list[float]) -> float:
    """Python left-fold L2 norm — identical accumulation order to the
    ``l2_norm`` column aggregate, so the doubles are bit-identical to the
    engine's (and to the DuckDB oracle's in-order list_sum)."""
    import math

    s = 0.0
    for x in vec:
        s += x * x
    return math.sqrt(s)


def centroid_cosines(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    literal_max: int | None = None,
) -> tuple[DataFrame, Column, Column]:
    """(staged_df, sims, ids): per-row cosine-to-each-centroid array plus
    the aligned centroid-id array. ``df`` must carry ``vec`` and ``_vnorm``.

    Centroids are KB-scale model state (K x dim doubles). Up to
    ``literal_max`` of them are embedded as literal expressions; above it
    (the default — see ``cluster.LITERAL_CENTROID_MAX``) the matrix rides
    along as ONE array<struct> column on a broadcast single-row relation
    (BroadcastNestedLoopJoin with a 1-row build side — still a map, no
    shuffle), keeping the plan and the py4j expression-building cost O(1)
    in K. Both encodings compute bit-identical IEEE doubles (same fold
    order; centroid norms are Python-computed constants either way)."""
    from parquet_compactor_spark.llm.cluster import LITERAL_CENTROID_MAX

    if literal_max is None:
        literal_max = LITERAL_CENTROID_MAX
    if len(cents) <= literal_max:
        sims = F.array(
            *[
                dot(F.col("vec"), lit_double_array(v))
                / (F.col("_vnorm") * F.lit(_py_l2norm(v)))
                for _, v in cents
            ]
        )
        ids = F.array(*[F.lit(b) for b, _ in cents])
        return df, sims, ids
    rows = [(int(b), [float(x) for x in v], _py_l2norm(v)) for b, v in cents]
    cdf = df.sparkSession.createDataFrame(
        [(rows,)],
        "_cents array<struct<cid:int,cvec:array<double>,cnorm:double>>",
    )
    return centroid_cosines_df(df, cdf)


def inplan_seed_cents(seed_df: DataFrame, cid: Column) -> DataFrame:
    """ONE-row ``_cents`` relation (the :func:`centroid_cosines` broadcast
    schema) built IN-PLAN from a bounded seed scan instead of a driver
    collect + ``createDataFrame``: the K seed rows never leave the
    executors — the broadcast build side runs the bounded pushdown scan
    inside the consuming job, so the caller saves one whole driver job
    per query (guide §5; the seed collect measured ~0.45 s warm at
    sf0.1, r15). ``seed_df`` must carry ``vec`` and ``_vnorm``. Values
    are bit-identical to the collected form: ``_vnorm`` IS the
    ``l2_norm`` column whose Python twin ``_py_l2norm`` is pinned
    bit-equal, and ``sort_array`` over the struct orders by ``cid``
    (first field) exactly as the collected rows were ordered by id."""
    c = F.struct(
        cid.cast("int").alias("cid"),
        F.col("vec").alias("cvec"),
        F.col("_vnorm").alias("cnorm"),
    )
    return seed_df.select(c.alias("_c")).agg(
        F.sort_array(F.collect_list("_c")).alias("_cents")
    )


def centroid_cosines_df(
    df: DataFrame, cents_df: DataFrame
) -> tuple[DataFrame, Column, Column]:
    """(staged_df, sims, ids) against a 1-row ``_cents`` relation — the
    broadcast branch of :func:`centroid_cosines`, shared by the collected
    (``createDataFrame``) and in-plan (:func:`inplan_seed_cents`) centroid
    sources. Identical expression shape → identical IEEE doubles."""
    staged = df.crossJoin(F.broadcast(cents_df))
    sims = F.transform(
        F.col("_cents"),
        lambda c: dot(F.col("vec"), c["cvec"]) / (F.col("_vnorm") * c["cnorm"]),
    )
    ids = F.transform(F.col("_cents"), lambda c: c["cid"])
    return staged, sims, ids


def ivf_assign(
    spark: SparkSession,
    sf_dir: str,
    lloyd: bool = True,
    literal_max: int | None = None,
    drop_null: bool = False,
    seed_range: tuple[int, int] | None = None,
) -> tuple[DataFrame, DataFrame, list[tuple[int, list[float]]]]:
    """The IVF coarse-quantization stage, shared by q_ann_ivf and
    q_ivfpq_search: assign EVERY vector (query included) to its
    max-cosine cell and return ``(base_df, assign_df, centroids)`` —
    base_df the raw pre-assignment projection (vec_id, label, vec,
    _vnorm) straight off the parquet scan, assign_df that plus the
    assigned ``bucket``, centroids the final (possibly Lloyd-refined,
    IVF_ROUND-rounded) Python list the caller can rank probes against.
    Callers that only need the query row (probe ranking, LUT building)
    must read it from ``base_df``: deriving it from ``assign_df`` drags
    the whole assignment subtree (its centroid-matrix broadcast join)
    into the query branch — one extra BNLJ + exchange for a row whose
    bucket is never used (the round-9 q_ann_ivf plan regression).
    ``base_df`` is deliberately the UN-spread raw projection: a vec_id
    predicate on it pushes down to the parquet scan (row-group-pruned
    bounded read), whereas the same filter above a spread_scan
    exchange cannot cross it, turning every bounded model collect into
    a full-table shuffle job — the round-11 ivf-family bench
    regression (q_ivf_cell_stats 1.90 s → 3.81 s came from the seed
    collect re-executing the repartition subtree per constructor job).
    ``drop_null`` scopes NULL embeddings out before assignment
    (q_ivfpq_search's convention; q_ann_ivf keeps its original
    unfiltered semantics)."""
    from parquet_compactor_spark.llm.cluster import per_dim_means

    from parquet_compactor_spark.llm.text import spread_scan

    raw = load(spark, sf_dir, "embeddings")
    if drop_null:
        raw = raw.filter(F.col("embedding").isNotNull())

    def project(df: DataFrame) -> DataFrame:
        p = df.select(
            "vec_id",
            "label",
            F.transform(
                F.col("embedding"), lambda x: x.cast("double")
            ).alias("vec"),
        )
        # The row norm is shared by all K cosines of a pass: materialize
        # it once per row instead of re-deriving it inside every
        # centroid's cosine (K-fold smaller expression tree, same IEEE
        # doubles — the aggregate fold order is unchanged).
        return p.withColumn("_vnorm", l2_norm(F.col("vec")))

    # Bounded model collects (the seeds below, callers' query/codebook
    # rows) read the raw scan: vec_id pushdown prunes to a handful of
    # row groups, no exchange in the job.
    base = project(raw)
    # Both assignment passes do K x dim cosines PER ROW — far above
    # scan cost; a single-file embeddings scan would run them on one
    # task (see text.spread_scan). Spread ONLY this branch.
    e = project(spread_scan(raw))
    if lloyd:
        # With a Lloyd round, TWO full passes consume this projection
        # (the refinement assignment + the final assignment) in two
        # separate jobs — persist it once (released by
        # release_guard_caches; LRU-evictable, correctness never
        # depends on it). Measured r14 session 4, interleaved same-JVM
        # A/B: sf0.1 parity (the fixture is tiny either way); at the
        # x25 ramp level q_ann_ivf median 5.22 -> 4.16 s (0.80x) and
        # q_ivfpq_search 4.17 -> 3.65 s (0.88x) — the consumers whose
        # timed pass carries vec through the probe join — with
        # q_ivf_cell_stats/q_semdedup_prune at 0.96-0.99x (no
        # regression). kmeans' vecs and q_ivf_refresh's old projection
        # measured neutral at BOTH levels and stay unpersisted.
        from parquet_compactor_spark.llm.text import persist_tracked

        e = persist_tracked(e)
    # Default: the fixed K=8 ANN-family seeds; callers with their own
    # capacity rule (q_semdedup_prune scales K with the corpus) pass a
    # wider range — same id convention, ids lo..hi, bucket = id - lo.
    lo, hi = seed_range if seed_range is not None else IVF_CENTROID_IDS
    from parquet_compactor_spark.llm.cluster import LITERAL_CENTROID_MAX

    eff_lit = literal_max if literal_max is not None else LITERAL_CENTROID_MAX

    def with_csims(
        df: DataFrame, cents: list[tuple[int, list[float]]]
    ) -> tuple[DataFrame, Column, Column]:
        return centroid_cosines(df, cents, literal_max)

    if lloyd and (hi - lo + 1) > eff_lit:
        # One Lloyd round: coarse-assign, then refine each cell to the
        # per-dimension mean of its members (rounded so the differential
        # oracle reproduces the exact doubles). Cells that went empty
        # simply drop out, as in the oracle. The SEED centroids ride
        # IN-PLAN (inplan_seed_cents): every lloyd=True caller consumes
        # only the REFINED matrix below, so the former seed collect was
        # a pure extra driver job — the bounded pushdown seed scan now
        # executes inside the first assignment job's broadcast build
        # (guide §5; r15). Bit-identical to the collected form (see
        # inplan_seed_cents).
        cents0 = inplan_seed_cents(
            base.filter(F.col("vec_id").between(lo, hi)),
            F.col("vec_id") - F.lit(lo),
        )
        staged, sims, ids = centroid_cosines_df(e, cents0)
        assign1 = staged.select(_argmax_bucket(sims, ids).alias("cluster"), "vec")
        means = per_dim_means(assign1, ndigits=IVF_ROUND)
        centroids = sorted(
            (int(r.cluster), [float(x) for x in r.cvec]) for r in means
        )
    else:
        # Literal-encoding callers (and lloyd=False, whose returned
        # ``centroids`` ARE the seeds) need the Python-side seed values:
        # collect once — K x dim doubles of model state off the raw
        # pushdown scan, no exchange in the job.
        seed_rows = (
            base.filter(F.col("vec_id").between(lo, hi))
            .orderBy("vec_id")
            .collect()
        )
        centroids = [
            (int(r.vec_id) - lo, [float(x) for x in r.vec]) for r in seed_rows
        ]
        if lloyd:
            staged, sims, ids = with_csims(e, centroids)
            assign1 = staged.select(
                _argmax_bucket(sims, ids).alias("cluster"), "vec"
            )
            means = per_dim_means(assign1, ndigits=IVF_ROUND)
            centroids = sorted(
                (int(r.cluster), [float(x) for x in r.cvec]) for r in means
            )

    staged, sims, ids = with_csims(e, centroids)
    assign = staged.select(
        "vec_id", "label", "vec", "_vnorm", _argmax_bucket(sims, ids).alias("bucket")
    )
    return base, assign, centroids


def ann_ivf(
    spark: SparkSession,
    sf_dir: str,
    n_probe: int = IVF_N_PROBE,
    lloyd: bool = True,
    literal_max: int | None = None,
) -> DataFrame:
    """IVF ANN with optional Lloyd refinement and multi-probe (see q_ann_ivf).

    ``literal_max`` caps the centroid count embedded as literal
    expressions; above it the centroid matrix rides along as one
    broadcast array column (see ``centroid_cosines``). Default: the
    shared ``LITERAL_CENTROID_MAX`` threshold.
    """
    base, assign, centroids = ivf_assign(spark, sf_dir, lloyd, literal_max)

    def with_csims(
        df: DataFrame, cents: list[tuple[int, list[float]]]
    ) -> tuple[DataFrame, Column, Column]:
        return centroid_cosines(df, cents, literal_max)

    # Probe ranking happens on a K-row DF (one row per surviving cell):
    # the query row's cosine to every refined centroid, ranked, top-n —
    # no row data leaves the executors. The query row comes off BASE
    # (the raw scan projection), not ``assign``: the assignment subtree
    # would add its centroid-matrix broadcast join to this branch for a
    # bucket column the probe ranking never reads.
    qstaged, qsims, qids = with_csims(base.filter(F.col("vec_id") == 0), centroids)
    qcells = (
        qstaged
        .select(
            F.col("vec").alias("qvec"),
            F.posexplode(
                F.arrays_zip(qids.alias("qbucket"), qsims.alias("qsim"))
            ).alias("pos", "cell"),
        )
        .select(
            "qvec",
            F.col("cell.qbucket").alias("qbucket"),
            F.col("cell.qsim").alias("qsim"),
        )
    )
    w = Window.orderBy(F.desc("qsim"), F.asc("qbucket"))
    probes = (
        qcells.withColumn("prn", F.row_number().over(w))
        .filter(F.col("prn") <= n_probe)
        .select("qvec", "qbucket")
    )

    return (
        assign.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probes), F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id",
            "label",
            "bucket",
            F.round(cosine(F.col("vec"), F.col("qvec")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


@register(
    "q_ann_ivf",
    oracle=_ivf_oracle(IVF_N_PROBE),
    doc="Approximate nearest neighbors via IVF (inverted-file coarse "
    "quantizer) with ONE Lloyd refinement round and 2-cell multi-probe: "
    "8 seed centroids (deterministic: vec_ids 100-107) → coarse "
    "max-cosine assignment (zero-shuffle broadcast-matrix argmax) → refine each "
    "cell to its per-dimension mean (one explode-agg shuffle; K×dim "
    "doubles collected as model state, rounded to 6 decimals so the "
    "DuckDB oracle reproduces the exact values) → reassign against the "
    "refined centroids → probe the query's 2 nearest cells → exact "
    "top-5 within them. At scale: both assignment passes are broadcast "
    "maps over the corpus; each query touches ~n_probe/K of the data; "
    "recall vs brute force is pinned by tests/test_llm.py.",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_ivf(spark, sf_dir, n_probe=IVF_N_PROBE, lloyd=True)


@register(
    "q_ann_lsh",
    oracle=_ANN_ORACLE,
    doc="Approximate nearest neighbors via random-hyperplane LSH: 8 seeded "
    "hyperplanes → 256 sign buckets → exact cosine only within the query's "
    "bucket → top-5. The oracle replays the identical hyperplane literals "
    "in DuckDB. At scale: bucketing is a map; per-bucket scoring touches "
    "~1/256 of the corpus; multi-probe over neighboring buckets would "
    "raise recall without changing the plan shape.",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id",
        "label",
        F.col("embedding").alias("vec"),
        _bucket_expr_spark(F.col("embedding")).alias("bucket"),
    )
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("vec").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    return (
        bucketed.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id",
            "label",
            "bucket",
            F.round(cosine(F.col("vec"), F.col("qvec")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


@register(
    "q_semantic_dedup",
    oracle="""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    c AS (
        SELECT vec_id AS cid, vec AS cvec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS cn
        FROM v WHERE vec_id < 8
    ),
    scored AS (
        SELECT v.vec_id, c.cid, v.vec,
               list_dot_product(v.vec, c.cvec)
                 / (sqrt(list_sum(list_transform(v.vec, x -> x * x))) * c.cn)
                   AS cos_c,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY list_dot_product(v.vec, c.cvec)
                                    / (sqrt(list_sum(list_transform(v.vec,
                                         x -> x * x))) * c.cn) DESC, c.cid)
                   AS rn
        FROM v CROSS JOIN c
    ),
    assigned AS (
        SELECT vec_id, cid, vec FROM scored WHERE rn = 1
    ),
    pairs AS (
        SELECT a.cid,
               list_dot_product(a.vec, b.vec)
                 / (sqrt(list_sum(list_transform(a.vec, x -> x * x)))
                  * sqrt(list_sum(list_transform(b.vec, x -> x * x))))
                   AS cos_p
        FROM assigned a JOIN assigned b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
    )
    SELECT s.cid AS cluster_id,
           COUNT(DISTINCT s.vec_id) AS n_vecs,
           CAST(COALESCE(p.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs
    FROM assigned s
    LEFT JOIN (
        SELECT cid, COUNT(*) AS n_dup_pairs FROM pairs
        WHERE cos_p >= 0.92 GROUP BY cid
    ) p ON p.cid = s.cid
    GROUP BY s.cid, p.n_dup_pairs
    """,
    doc="SemDeDup-style semantic deduplication: embeddings are blocked "
    "by nearest centroid, then exact pairwise cosine runs ONLY within a "
    "block, and pairs above 0.92 count as semantic duplicates. Blocking "
    "centroids are a pluggable model (semantic_dedup(centroids=...) "
    "takes the k-means matrix from llm/cluster.py so K scales with N); "
    "the oracle replays the deterministic seed default. Assignment is "
    "the ann_ivf zero-shuffle literal-argmax map — no N x K crossJoin, "
    "no per-row window — the quadratic step is bounded per block, and "
    "no all-pairs join ever forms.",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_dedup(spark, sf_dir)


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    centroids: list[tuple[int, list[float]]] | None = None,
    k: int = 8,
    threshold: float = 0.92,
) -> DataFrame:
    """SemDeDup over embeddings with pluggable blocking centroids.

    ``centroids`` is the blocking model — pass the refined centroid matrix
    from ``llm.cluster.kmeans`` (via ``per_dim_means``) in production so K
    scales with corpus size (SemDeDup's K ∝ N keeps the within-block
    quadratic step bounded). When omitted, the first ``k`` vectors seed the
    blocks deterministically (what the DuckDB oracle replays).

    Assignment is the same zero-shuffle argmax map as ``ann_ivf``
    (``centroid_cosines``): centroids are KB-scale model state riding
    along as a broadcast matrix, each row computes its K cosines JVM-side
    and argmaxes via array_position (first max → lowest cid on ties, the
    ROW_NUMBER tie-break). No N×K crossJoin, no window — assignment is
    exactly one pass over the data.
    """
    e = load(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    ).withColumn("_vnorm", l2_norm(F.col("vec")))
    from parquet_compactor_spark.llm.text import persist_tracked

    if centroids is None:
        # Default deterministic seeds ride IN-PLAN (no driver collect —
        # the bounded seed scan runs inside the assignment job's
        # broadcast build; bit-identical values, see inplan_seed_cents).
        staged, sims, cids = centroid_cosines_df(
            v, inplan_seed_cents(v.filter(F.col("vec_id") < k), F.col("vec_id"))
        )
    else:
        staged, sims, cids = centroid_cosines(v, centroids)
    # Three consumers below (pair sides a/b + the per-cell rollup) and
    # the assignment subtree has NO exchange for plan-level reuse to
    # collapse — without the persist each consumer re-ran the full
    # K-cosine corpus pass (the q_dsir_weights multi-consumer rule,
    # already applied in q_semdedup_prune).
    assigned = persist_tracked(
        staged.select(
            "vec_id", _argmax_bucket(sims, cids).alias("cid"), "vec", "_vnorm"
        )
    )
    a = assigned.select(
        "cid",
        F.col("vec_id").alias("id1"),
        F.col("vec").alias("v1"),
        F.col("_vnorm").alias("n1"),
    )
    b = assigned.select(
        "cid",
        F.col("vec_id").alias("id2"),
        F.col("vec").alias("v2"),
        F.col("_vnorm").alias("n2"),
    )
    dup_pairs = (
        a.join(b, "cid")
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "cid",
            (dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))).alias(
                "cos_p"
            ),
        )
        .filter(F.col("cos_p") >= threshold)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )
    return (
        assigned.groupBy("cid")
        .agg(F.countDistinct("vec_id").alias("n_vecs"))
        .join(F.broadcast(dup_pairs), "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_vecs",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("bigint").alias(
                "n_dup_pairs"
            ),
        )
    )


SEMDEDUP_T = 0.92  # within-cell cosine above which the later vec drops


@register(
    "q_semdedup_prune",
    oracle=f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    kc AS (
        SELECT GREATEST(8, LEAST(512, (COUNT(*) + 255) // 256)) AS k FROM v
    ),
    cents AS (
        SELECT CAST(vec_id - 100 AS INT) AS bucket, vec AS cvec FROM v, kc
        WHERE vec_id BETWEEN 100 AND 99 + kc.k
    ),
    sc1 AS (
        SELECT v.vec_id, v.vec, c.bucket,
               {_COS_SQL.format(a="v.vec", b="c.cvec")} AS csim
        FROM v CROSS JOIN cents c
    ),
    assign1 AS (
        SELECT vec_id, vec, bucket
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY csim DESC, bucket) AS rn
              FROM sc1)
        WHERE rn = 1
    ),
    exploded AS (
        SELECT bucket, unnest(range(1, len(vec) + 1)) AS pos, vec FROM assign1
    ),
    dims AS (
        SELECT bucket, pos, ROUND(AVG(vec[pos]), {{ivf_round}}) AS m
        FROM exploded GROUP BY bucket, pos
    ),
    refined AS (
        SELECT bucket, list(m ORDER BY pos) AS cvec FROM dims GROUP BY bucket
    ),
    sc2 AS (
        SELECT v.vec_id, v.vec, r.bucket,
               {_COS_SQL.format(a="v.vec", b="r.cvec")} AS csim
        FROM v CROSS JOIN refined r
    ),
    assign2 AS (
        SELECT vec_id, vec, bucket
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY csim DESC, bucket) AS rn
              FROM sc2)
        WHERE rn = 1
    ),
    dropped AS (
        SELECT DISTINCT a.bucket, b.vec_id
        FROM assign2 a JOIN assign2 b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {_COS_SQL.format(a="a.vec", b="b.vec")} >= {SEMDEDUP_T}
    )
    SELECT s.bucket AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
           FLOOR(CAST(COUNT(*) - COALESCE(d.n_dropped, 0) AS DOUBLE)
                 / COUNT(*) * 10000 + 0.5) / 10000 AS kept_frac
    FROM assign2 s
    LEFT JOIN (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_dropped
               FROM dropped GROUP BY bucket) d
      ON d.bucket = s.bucket
    GROUP BY s.bucket, d.n_dropped
    """.replace("{ivf_round}", str(IVF_ROUND)),
    doc="SemDeDup pruning WITHIN Lloyd-refined IVF cells (Abbas et al. "
    "2023, 'SemDeDup: Data-efficient learning at web-scale through "
    "semantic deduplication': k-means the embeddings, compare pairs "
    "ONLY inside a cluster, drop all but one of each semantic-dup "
    "group) — the bucketed DECISION form of what q_semantic_dedup "
    "counts with fixed seed blocks: this runs the ivf_assign "
    "machinery (seed vectors -> one Lloyd refinement round -> "
    "reassignment) with K SCALED TO THE CORPUS — SemDeDup's own rule, "
    "K ~ N: K = ceil(n/256) in [8, 512] from the measured non-null "
    "count, exact integer arithmetic replayed by the oracle's kc CTE, "
    "seeds vec_ids 100..99+K — and applies the keep-first rule: a "
    "vector drops iff a SMALLER-id vector in the SAME refined cell "
    "has cosine >= 0.92. Output is the per-cell pruning ledger "
    "(size, drops, kept fraction) a curation run records. The K ~ N "
    "rule is what keeps the within-cell quadratic step LINEAR in N "
    "(cells hold ~256 vectors at every scale; the round-11 ramp "
    "measured the fixed-K form at 67x wall clock on 25x data — "
    "occupancy x25, pairs x625 — before this rule landed); cross-cell "
    "pairs NEVER form, assignment is a zero-shuffle broadcast-matrix "
    "argmax map (the matrix is K x dim model state; past 64 centroids "
    "it rides the broadcast-array encoding, bit-identical), and the "
    "pair join keys on the cell id. NULL embeddings are scoped out on "
    "both engines (the q_ivfpq_search drop_null convention).",
)
def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_compactor_spark.llm.text import persist_tracked

    # SemDeDup's OWN scaling rule, K ~ N (Abbas et al. run K
    # proportional to corpus size precisely so cells stay
    # constant-sized): K = ceil(n / 256) clamped to [8, 512], computed
    # from the MEASURED non-null count (one bounded scalar, the
    # q_bloom_delta sizing pattern; exact integer arithmetic in both
    # engines — the oracle's kc CTE replays it). A FIXED K here is
    # quadratic: the round-11 ramp measured 67x wall clock on 25x data
    # (per-cell occupancy x25 -> pairs x625) before this rule landed;
    # with K ~ N the per-cell pair count is capped at ~256^2/2 and the
    # pair stage is linear in N. Seeds are vec_ids 100..99+K — the
    # ANN-family convention, widened.
    n = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .count()
    )
    k = max(8, min(512, (n + 255) // 256))
    _, assign, _ = ivf_assign(
        spark, sf_dir, lloyd=True, drop_null=True, seed_range=(100, 99 + k)
    )
    # Three consumers (pair sides a/b + the per-cell size rollup): one
    # materialization of the two-pass assignment subtree (the
    # q_dsir_weights multi-consumer rule).
    assigned = persist_tracked(
        assign.select("vec_id", "bucket", "vec", "_vnorm")
    )
    a = assigned.select(
        "bucket",
        F.col("vec_id").alias("id1"),
        F.col("vec").alias("v1"),
        F.col("_vnorm").alias("n1"),
    )
    b = assigned.select(
        "bucket",
        F.col("vec_id").alias("id2"),
        F.col("vec").alias("v2"),
        F.col("_vnorm").alias("n2"),
    )
    dropped = (
        a.join(b, "bucket")
        .filter(F.col("id1") < F.col("id2"))
        .filter(
            dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
            >= SEMDEDUP_T
        )
        .select("bucket", "id2")
        .distinct()
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dropped"))
    )
    return (
        assigned.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
        .join(F.broadcast(dropped), "bucket", "left")
        .select(
            F.col("bucket").alias("cluster_id"),
            "n_vecs",
            F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias(
                "n_dropped"
            ),
            (
                F.floor(
                    (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0)))
                    .cast("double")
                    / F.col("n_vecs")
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("kept_frac"),
        )
    )


N_BATCH_QUERIES = 5
BATCH_TOPK = 3


@register(
    "q_batch_sim_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
        FROM embeddings WHERE vec_id < {N_BATCH_QUERIES}
    ),
    scored AS (
        SELECT q.query_id,
               e.vec_id,
               e.label,
               ROUND(
                 list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qvec)
                 / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qvec, x -> x * x)))),
                 4) AS cos_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id >= {N_BATCH_QUERIES}
    )
    SELECT query_id, vec_id, label, cos_sim, rn
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    )
    WHERE rn <= {BATCH_TOPK}
    """,
    doc="Batched brute-force similarity: 5 query vectors scored against "
    "the whole corpus, top-3 per query. The realistic retrieval shape "
    "(queries arrive in batches, not one at a time) and the giant-"
    "partition counterexample: ROW_NUMBER partitioned by query_id puts "
    "the ENTIRE corpus in each of 5 tasks. Instead functions.topk."
    "grouped_topk keeps a bounded per-key heap per input partition "
    "(Arrow mapInPandas — Spark has no bounded-partial top-k "
    "aggregate) and ranks only the O(partitions x k) survivors; the "
    "query batch is a 5-row broadcast.",
)
def q_batch_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_compactor_spark.functions.topk import grouped_topk

    e = load(spark, sf_dir, "embeddings")
    # Hoist both norms out of the per-(row, query) score: inline
    # cosine() would recompute l2_norm(embedding) once per query (5x per
    # corpus row) and l2_norm(qvec) once per corpus row — no CSE across
    # the pair expansion. Precomputed per side, each norm is evaluated
    # once per row / once per query, cutting the dominant corpus x 5 map
    # from dot + 2 norms to dot + 1 multiply per pair (~3x less
    # arithmetic — the number that matters at 100 TB; local A/B reads
    # parity at sf0.1 where 25k pairs cost ~nothing). Same fold order,
    # same _vn * _qn multiplication order as l2_norm(a) * l2_norm(b) —
    # bit-identical doubles into the same ROUND.
    q = e.filter(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        l2_norm(F.col("embedding")).alias("_qn"),
    )
    scored = (
        e.filter(F.col("vec_id") >= N_BATCH_QUERIES)
        .select(
            "vec_id", "label", "embedding",
            l2_norm(F.col("embedding")).alias("_vn"),
        )
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            "label",
            F.round(
                dot(F.col("embedding"), F.col("qvec"))
                / (F.col("_vn") * F.col("_qn")),
                4,
            ).alias("cos_sim"),
        )
    )
    return grouped_topk(
        scored,
        key_cols=["query_id"],
        sort_cols=["cos_sim", "vec_id"],
        ascending=[False, True],
        k=BATCH_TOPK,
    )


@register(
    "q_embed_dim_stats",
    oracle="""
    WITH flat AS (
        SELECT generate_subscripts(embedding, 1) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    )
    SELECT dim,
           count(*) AS n,
           ROUND(avg(v), 4) + 0.0 AS mean_v,
           ROUND(stddev_samp(v), 4) AS std_v,
           min(v) AS min_v,
           max(v) AS max_v
    FROM flat
    GROUP BY dim
    """,
    doc="Per-dimension embedding statistics (the feature-normalization "
    "profile a training pipeline computes before z-scoring or "
    "quantizing a vector column): posexplode the array<float> to "
    "(dim, value) pairs and hash-aggregate per dimension. The explode "
    "is a map-side row multiplier (64x rows but 2 tiny columns) and "
    "the aggregate partial-combines to exactly 64 groups — shuffle "
    "traffic is O(dims x partitions), independent of corpus size, so "
    "the pass stays scan-bound at 100 TB. min/max are exact float "
    "selections; mean/std are rounded to 4dp on both engines (fp "
    "accumulation noise is ~1e-10 relative, far inside the rounding), "
    "and the rounded mean adds +0.0 on BOTH engines: a tiny negative "
    "mean rounds to IEEE -0.0 under DuckDB's ROUND while Spark's "
    "normalizes to +0.0, and the driver hashes the sign bit "
    "(found by the round-8 sf0.1 full sweep at dim 10); x + 0.0 "
    "canonicalizes -0.0 without touching any other value. "
    "Dims are 1-based to match SQL generate_subscripts.",
)
def q_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select(F.posexplode("embedding").alias("pos", "v"))
        .select((F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("v"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("mean_v"),
            F.round(F.stddev_samp("v"), 4).alias("std_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


EMBED_DRIFT_T = 20000  # micro-units (0.02): per-dim mean-shift alarm


@register(
    "q_embedding_drift",
    oracle=f"""
    WITH pe AS (
        SELECT vec_id % 3 = 0 AS is_new, embedding,
               unnest(range(1, len(embedding) + 1)) AS pos
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    elems AS (
        SELECT is_new, pos AS dim,
               CAST(FLOOR(CAST(embedding[pos] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS x_micro
        FROM pe
    ),
    agg AS (
        SELECT dim,
               CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_old,
               CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new,
               CAST(SUM(CASE WHEN is_new THEN 0 ELSE x_micro END)
                    AS BIGINT) AS s_old,
               CAST(SUM(CASE WHEN is_new THEN x_micro ELSE 0 END)
                    AS BIGINT) AS s_new
        FROM elems GROUP BY dim
    ),
    means AS (
        SELECT CAST(dim AS BIGINT) AS dim, n_old, n_new,
               CAST(FLOOR(CAST(s_old AS DOUBLE) / n_old + 0.5) AS BIGINT)
                   AS mean_old_micro,
               CAST(FLOOR(CAST(s_new AS DOUBLE) / n_new + 0.5) AS BIGINT)
                   AS mean_new_micro
        FROM agg
    )
    SELECT dim, n_old, n_new, mean_old_micro, mean_new_micro,
           ABS(mean_new_micro - mean_old_micro) AS abs_delta_micro,
           ABS(mean_new_micro - mean_old_micro) > {EMBED_DRIFT_T}
               AS drifted
    FROM means
    """,
    doc="Embedding-space drift monitor between crawl snapshots — "
    "q_dist_drift's sibling in VECTOR space (the ML-ops check that an "
    "embedding model or upstream distribution shift hasn't silently "
    "moved the space an ANN index / dedup threshold was tuned on): "
    "per DIMENSION, the mean activation of the old shard (vec_id % 3 "
    "!= 0, q_dist_drift's split convention) vs the new shard, and the "
    "absolute mean shift with a 0.02 alarm threshold. Element values "
    "are FLOOR-micro-rounded to bigints BEFORE summation (exact, "
    "order-independent — float32 -> double is exact, so both engines "
    "floor identical doubles), and each mean is ONE double division "
    "of exact bigints, floored back to micro — bit-identical cross-"
    "engine with no summation-order exposure anywhere. Deliberately "
    "NOT variance-normalized: a raw mean shift is the alarm that "
    "cosine geometry moved; q_embed_dim_stats carries the per-dim "
    "std for calibration. Plan: ONE posexplode pass with both shards "
    "split by flag inside the same 64-group aggregate (map-side "
    "partials; shuffle is O(dims x partitions), corpus-size-"
    "independent — the q_embed_dim_stats family). NULL embeddings "
    "scoped out on both engines.",
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    elems = e.select(
        (F.col("vec_id") % 3 == 0).alias("is_new"),
        F.posexplode("embedding").alias("pos", "x"),
    ).select(
        "is_new",
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000 + 0.5)
        .cast("bigint")
        .alias("x_micro"),
    )
    agg = elems.groupBy("dim").agg(
        F.sum((~F.col("is_new")).cast("int")).cast("bigint").alias("n_old"),
        F.sum(F.col("is_new").cast("int")).cast("bigint").alias("n_new"),
        F.sum(F.when(~F.col("is_new"), F.col("x_micro")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("s_old"),
        F.sum(F.when(F.col("is_new"), F.col("x_micro")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("s_new"),
    )
    mean_old = F.floor(F.col("s_old").cast("double") / F.col("n_old") + 0.5).cast(
        "bigint"
    )
    mean_new = F.floor(F.col("s_new").cast("double") / F.col("n_new") + 0.5).cast(
        "bigint"
    )
    means = agg.select(
        "dim",
        "n_old",
        "n_new",
        mean_old.alias("mean_old_micro"),
        mean_new.alias("mean_new_micro"),
    )
    delta = F.abs(F.col("mean_new_micro") - F.col("mean_old_micro"))
    return means.select(
        "dim",
        "n_old",
        "n_new",
        "mean_old_micro",
        "mean_new_micro",
        delta.alias("abs_delta_micro"),
        (delta > EMBED_DRIFT_T).alias("drifted"),
    )


@register(
    "q_hard_negatives",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, label AS qlabel,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
        FROM embeddings WHERE vec_id < {N_BATCH_QUERIES}
    ),
    scored AS (
        SELECT q.query_id,
               e.vec_id,
               e.label,
               ROUND(
                 list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qvec)
                 / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qvec, x -> x * x)))),
                 4) AS cos_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id >= {N_BATCH_QUERIES}
          AND e.label <> q.qlabel
    )
    SELECT query_id, vec_id, label, cos_sim, rn
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    )
    WHERE rn <= {BATCH_TOPK}
    """,
    doc="Hard-negative mining for embedding-model training (the data-prep "
    "step behind contrastive fine-tuning, e.g. DPR/Contriever: the most "
    "USEFUL negatives are the most similar items with a DIFFERENT "
    "label). Same plan skeleton as q_batch_sim_topk — 5-row query-batch "
    "broadcast, map-side cosine, bounded per-key heap via grouped_topk "
    "— with the label-mismatch predicate applied BEFORE ranking, so the "
    "heap only ever holds eligible negatives. At 100 TB the label "
    "filter is a per-row comparison against the broadcast row (no "
    "extra shuffle); mining k negatives for B queries stays one "
    "scan + O(B x k) output. Similarities are rounded to 4dp before "
    "ranking in BOTH engines, so rank ties resolve identically by "
    "vec_id.",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_compactor_spark.functions.topk import grouped_topk

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qvec"),
    )
    scored = (
        e.filter(F.col("vec_id") >= N_BATCH_QUERIES)
        .crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "query_id",
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qvec")), 4).alias("cos_sim"),
        )
    )
    return grouped_topk(
        scored,
        key_cols=["query_id"],
        sort_cols=["cos_sim", "vec_id"],
        ascending=[False, True],
        k=BATCH_TOPK,
    )


@register(
    "q_knn_classify",
    oracle="""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    nbr AS (
        SELECT vec_id AS nbr_id, label AS nbr_label, vec AS nvec
        FROM v WHERE vec_id % 4 = 0 AND vec_id < 10000
    ),
    q AS (
        SELECT vec_id, label AS true_label, vec
        FROM v WHERE NOT (vec_id % 4 = 0 AND vec_id < 10000)
    ),
    scored AS (
        SELECT q.vec_id, q.true_label, nbr.nbr_id, nbr.nbr_label,
               ROUND(list_dot_product(q.vec, nbr.nvec)
                     / (sqrt(list_sum(list_transform(q.vec, x -> x * x)))
                      * sqrt(list_sum(list_transform(nbr.nvec, x -> x * x)))),
                     4) AS cs
        FROM q CROSS JOIN nbr
    )
    SELECT vec_id, true_label, nbr_label AS pred_label, cs AS cos_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY cs DESC, nbr_id) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    doc="1-NN label propagation from a seed-labeled subset (the weak-"
    "supervision step behind corpus-scale quality/topic tagging: a "
    "human-annotated seed set labels the rest of the corpus by nearest "
    "embedding — the kNN variant of fastText-classifier labeling used "
    "throughout LLM data curation): vectors with vec_id % 4 = 0 are "
    "the labeled seeds; every other vector takes the label of its "
    "most-cosine-similar seed. The seed predicate carries a FIXED id "
    "ceiling (vec_id < 10000): an annotation budget does not grow with "
    "the corpus, so the labeled side is constant-size as data scales — "
    "which is exactly what makes the broadcast safe and the whole plan "
    "linear in corpus size (the scale ramp pins this). Plan: the seed "
    "set is BROADCAST (a human-labeled set is annotation-budget-sized "
    "— thousands, never corpus-sized), scoring is a pure map over the "
    "broadcast nested-"
    "loop join, and the per-vector argmax is max(struct(cos, -nbr_id, "
    "label)) — a PARTIAL-AGGREGATED struct-max that collapses each "
    "task's candidates to one row per vector BEFORE the shuffle, so "
    "the exchange carries O(vectors) rows, never the O(vectors x "
    "seeds) blow-up a window over the scored set would shuffle. At "
    "100 TB with a larger seed set the same plan swaps the brute-force "
    "candidate stage for q_ann_ivf's centroid blocking; the argmax "
    "stays identical. Determinism: similarities are rounded to 4dp in "
    "BOTH engines before ranking (the q_sim_topk convention), and the "
    "struct's negated-neighbor-id second field makes max() pick the "
    "LOWEST nbr_id on ties — exactly the oracle's ORDER BY cs DESC, "
    "nbr_id. NULL embeddings (hostile fixture) score NULL and lose to "
    "any non-NULL candidate in both engines (struct-max: NULL field "
    "sorts lowest; DuckDB: DESC NULLS LAST); an all-NULL candidate "
    "set ties on cs and falls to the nbr_id tiebreak identically. "
    "Reference parity note: the reference engine has no vector "
    "operators; north-star surface per SURVEY.md SS2B.",
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    seed = (F.col("vec_id") % 4 == 0) & (F.col("vec_id") < 10000)
    # Norms are hoisted to the SIDES of the join (computed once per seed
    # and once per query vector), so the per-PAIR work is one dot product
    # + one divide — the cosine() helper would re-fold both norms per
    # pair, tripling the O(queries x seeds x dim) inner loop. Hoisting
    # does not change the value: identical IEEE ops, just evaluated once.
    nbr = e.filter(seed).select(
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("nbr_label"),
        F.col("embedding").alias("nvec"),
        l2_norm(F.col("embedding")).alias("nn"),
    )
    probe = e.filter(~seed).select(
        "vec_id",
        F.col("label").alias("true_label"),
        "embedding",
        l2_norm(F.col("embedding")).alias("qn"),
    )
    # The pair scoring below does |seeds| (~500-2500) cosines PER PROBE
    # ROW — x500+ more compute per byte than the scan — but a broadcast
    # join inherits the SCAN's partitioning, which maxPartitionBytes
    # sizes by BYTES. A small embeddings file therefore runs the whole
    # O(probes x seeds x dim) loop on 1-6 tasks regardless of cores
    # (measured: the x5 ramp cliff — 4.75M pairs in ONE task, 33.7 s,
    # then FLAT to x25 because files grow with data and pairs-per-task
    # stays constant). spread_scan guarantees one task per core; an
    # already-wide scan passes through with no added shuffle.
    from parquet_compactor_spark.llm.text import spread_scan

    probe = spread_scan(probe)
    scored = (
        probe
        .crossJoin(F.broadcast(nbr))
        .select(
            "vec_id",
            "true_label",
            F.round(
                dot(F.col("embedding"), F.col("nvec"))
                / (F.col("qn") * F.col("nn")),
                4,
            ).alias("cs"),
            "nbr_id",
            "nbr_label",
        )
    )
    best = scored.groupBy("vec_id", "true_label").agg(
        F.max(
            F.struct(
                F.col("cs").alias("cs"),
                (-F.col("nbr_id")).alias("neg_nbr"),
                F.col("nbr_label").alias("pred"),
            )
        ).alias("m")
    )
    return best.select(
        "vec_id",
        "true_label",
        F.col("m.pred").alias("pred_label"),
        F.col("m.cs").alias("cos_sim"),
    )


# --------------------------------------------------------------------------
# Product quantization: map-only subvector codebook assignment
# --------------------------------------------------------------------------

PQ_M = 8  # subspaces (64-dim vectors -> 8 subvectors of 8 dims)
PQ_K = 16  # centroids per subspace
PQ_SUBDIM = EMBED_DIM // PQ_M

_pq_rng = random.Random(11)
#: PQ codebook[m][k] = 8-dim centroid, deterministic literals shared by
#: both engines (the same literal-injection technique as HYPERPLANES).
PQ_CODEBOOK: list[list[list[float]]] = [
    [
        [round(_pq_rng.uniform(-1.0, 1.0), 6) for _ in range(PQ_SUBDIM)]
        for _ in range(PQ_K)
    ]
    for _ in range(PQ_M)
]


def _pq_sql_dists() -> str:
    """DuckDB rows (m, k, centroid) for the whole codebook as VALUES."""
    rows = []
    for m in range(PQ_M):
        for k in range(PQ_K):
            arr = "[" + ", ".join(repr(v) for v in PQ_CODEBOOK[m][k]) + "]"
            rows.append(f"({m}, {k}, {arr})")
    return ",\n               ".join(rows)


@register(
    "q_pq_encode",
    oracle=f"""
    WITH cb(m, k, cent) AS (
        VALUES {_pq_sql_dists()}
    ),
    v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    dists AS (
        SELECT v.vec_id, v.label, cb.m, cb.k,
               list_sum(list_transform(range(1, {PQ_SUBDIM} + 1),
                   i -> (vec[CAST(cb.m AS INT) * {PQ_SUBDIM} + i] - cent[i])
                      * (vec[CAST(cb.m AS INT) * {PQ_SUBDIM} + i] - cent[i])))
                   AS dist
        FROM v CROSS JOIN cb
    ),
    best AS (
        SELECT vec_id, label, m, k,
               CAST(FLOOR(dist * 1000000 + 0.5) AS BIGINT) AS err_micro
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                           ORDER BY dist, k) AS rn
              FROM dists)
        WHERE rn = 1
    )
    SELECT vec_id, label,
           string_agg(CAST(k AS VARCHAR), '-' ORDER BY m) AS pq_code,
           CAST(SUM(err_micro) AS BIGINT) AS err_micro
    FROM best
    GROUP BY vec_id, label
    """,
    doc="Product-quantization encoding (Jegou et al. 2011, 'Product "
    "Quantization for Nearest Neighbor Search' — the compression step "
    "of IVF-PQ indexes): each 64-dim vector splits into 8 subvectors "
    "of 8 dims; each subvector is assigned its nearest of 16 codebook "
    "centroids by squared L2, and the vector is stored as the 8 "
    "centroid ids (4 bits each — a 512x compression of a float32 "
    "vector) plus its total quantization error. The codebook is "
    "deterministic literals shared verbatim by both engines (the "
    "HYPERPLANES technique); a trained codebook would arrive as a "
    "broadcast exactly like q_ann_ivf's centroid matrix. Plan: "
    "MAP-ONLY — the whole argmin evaluates as one JVM expression per "
    "row (array_min over an array of (dist, k) structs per subspace: "
    "min distance, then min k on ties — exactly the oracle's ORDER BY "
    "dist, k), zero joins, zero shuffles beyond the final nothing; at "
    "100 TB this is the ideal operator shape, pure whole-stage-"
    "codegen'd compute scaling with executor count. Engine-exactness: "
    "the fold over each subvector's 8 (x-c)^2 terms runs in the same "
    "order in both engines (the established list_sum/aggregate "
    "convention all ANN queries rely on), argmin compares exact "
    "doubles, and the per-subspace min distance is micro-rounded "
    "BEFORE the order-independent integer total. NULL embeddings are "
    "scoped out on both engines. Reference parity note: the reference "
    "engine has no vector operators; north-star surface per "
    "SURVEY.md SS2B.",
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = e.select("vec_id", "label", vec.alias("vec"))

    def best_in_subspace(m: int) -> Column:
        # One indexed transform over the subspace's literal centroid
        # MATRIX (array<array<double>>) instead of 16 separate
        # aggregate folds: 8 such transforms replace a 128-aggregate
        # expression tree that overflowed codegen's method budget and
        # fell back to interpreted evaluation (~3 ms/row). Per-element
        # math is unchanged (same fold, same IEEE order).
        sub = F.slice(F.col("vec"), m * PQ_SUBDIM + 1, PQ_SUBDIM)
        cb = F.array(
            *[lit_double_array(cent) for cent in PQ_CODEBOOK[m]]
        )
        return F.array_min(
            F.transform(
                cb,
                lambda cent, k: F.struct(
                    F.aggregate(
                        F.zip_with(sub, cent, lambda x, c: (x - c) * (x - c)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    k.alias("k"),
                ),
            )
        )

    # Materialize each subspace's (dist, k) struct ONCE in an
    # intermediate projection; the final projection reads both fields
    # from it instead of re-evaluating the argmin per field.
    staged = v.select(
        "vec_id",
        "label",
        *[best_in_subspace(m).alias(f"b{m}") for m in range(PQ_M)],
    )
    codes = [F.col(f"b{m}.k").cast("string") for m in range(PQ_M)]
    errs = [
        F.floor(F.col(f"b{m}.dist") * 1000000 + 0.5).cast("bigint")
        for m in range(PQ_M)
    ]
    total_err = errs[0]
    for t in errs[1:]:
        total_err = total_err + t
    return staged.select(
        "vec_id",
        "label",
        F.concat_ws("-", *codes).alias("pq_code"),
        total_err.alias("err_micro"),
    )


# --------------------------------------------------------------------------
# IVF-PQ (IVFADC) composed ANN search: coarse cells + ADC scoring + re-rank
# --------------------------------------------------------------------------

# ADC short-list size handed to the exact re-ranker: 6.4x the final k=5,
# inside the 4-16x re-rank ratio FAISS deployments run. On the smoke
# fixture the 16-sample codebook's ADC is noisy enough that the one
# true-top-5 candidate the probed cells contain ranks ~29th by ADC — a
# 16-deep shortlist would make the composition lose everything the
# coarse quantizer kept (measured round 10; tests/test_llm.py pins it).
IVFPQ_SHORTLIST = 32
IVFPQ_CODEBOOK_IDS = (200, 215)  # sample-init PQ codebook: vec_ids 200..215


def _py_sq_l2(a: list[float], b: list[float]) -> float:
    """Left-fold squared L2 — same accumulation order as the oracle's
    in-order ``list_sum(list_transform(...))``, so the doubles (and
    therefore their micro-floors) are bit-identical across engines."""
    s = 0.0
    for x, c in zip(a, b):
        d = x - c
        s += d * d
    return s


def _py_cos(a: list[float], b: list[float]) -> float:
    """Left-fold cosine, mirroring ``_COS_SQL``'s op order exactly."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s / (_py_l2norm(a) * _py_l2norm(b))


def _pq_adc_lut_micro(
    qvec: list[float], codebook: list[list[list[float]]]
) -> list[list[int]]:
    """The classic ADC lookup table (Jegou et al. 2011 SS IV): for each
    subspace m and codebook entry k, the squared L2 distance between the
    QUERY's m-th subvector and centroid k, floor-rounded to integer
    micro-units. M x K = 8 x 16 = 128 BIGINTs of driver-side model
    state; every candidate's approximate distance is then a pure table
    lookup summed over its 8 code ids."""
    import math

    lut: list[list[int]] = []
    for m in range(PQ_M):
        sub = qvec[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
        lut.append(
            [
                int(math.floor(_py_sq_l2(sub, cent) * 1000000 + 0.5))
                for cent in codebook[m]
            ]
        )
    return lut


def _ivfpq_oracle() -> str:
    cos_vc = _COS_SQL.format(a="v.vec", b="c.cvec")
    cos_vr = _COS_SQL.format(a="v.vec", b="r.cvec")
    cos_qr = _COS_SQL.format(a="q.vec", b="r.cvec")
    cos_sq = _COS_SQL.format(a="s.vec", b="q.vec")
    lo, hi = IVF_CENTROID_IDS
    cb_lo, cb_hi = IVFPQ_CODEBOOK_IDS
    sd = PQ_SUBDIM
    return f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    cents AS (
        SELECT CAST(vec_id - {lo} AS INT) AS bucket, vec AS cvec FROM v
        WHERE vec_id BETWEEN {lo} AND {hi}
    ),
    sc1 AS (
        SELECT v.vec_id, v.vec, c.bucket, {cos_vc} AS csim
        FROM v CROSS JOIN cents c
    ),
    assign1 AS (
        SELECT vec_id, vec, bucket
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY csim DESC, bucket) AS rn
              FROM sc1)
        WHERE rn = 1
    ),
    exploded AS (
        SELECT bucket, unnest(range(1, len(vec) + 1)) AS pos, vec FROM assign1
    ),
    dims AS (
        SELECT bucket, pos, ROUND(AVG(vec[pos]), {IVF_ROUND}) AS m
        FROM exploded GROUP BY bucket, pos
    ),
    refined AS (
        SELECT bucket, list(m ORDER BY pos) AS cvec FROM dims GROUP BY bucket
    ),
    q AS (SELECT vec FROM v WHERE vec_id = 0),
    probes AS (
        SELECT r.bucket,
               ROW_NUMBER() OVER (ORDER BY {cos_qr} DESC, r.bucket) AS prn
        FROM refined r CROSS JOIN q
    ),
    sc2 AS (
        SELECT v.vec_id, v.label, v.vec, r.bucket, {cos_vr} AS csim
        FROM v CROSS JOIN refined r
    ),
    assign AS (
        SELECT vec_id, label, vec, bucket
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY csim DESC, bucket) AS rn
              FROM sc2)
        WHERE rn = 1
    ),
    cand AS (
        SELECT a.* FROM assign a
        JOIN (SELECT bucket FROM probes WHERE prn <= {IVF_N_PROBE}) p
          USING (bucket)
        WHERE a.vec_id <> 0
    ),
    cb AS (
        SELECT ms.m, CAST(v.vec_id - {cb_lo} AS INT) AS k,
               v.vec[CAST(ms.m AS INT) * {sd} + 1
                     : CAST(ms.m AS INT) * {sd} + {sd}] AS cent
        FROM v CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) ms
        WHERE v.vec_id BETWEEN {cb_lo} AND {cb_hi}
    ),
    lut AS (
        SELECT cb.m, cb.k,
               CAST(FLOOR(list_sum(list_transform(range(1, {sd} + 1),
                   i -> (q.vec[CAST(cb.m AS INT) * {sd} + i] - cent[i])
                      * (q.vec[CAST(cb.m AS INT) * {sd} + i] - cent[i])))
                   * 1000000 + 0.5) AS BIGINT) AS d_micro
        FROM cb CROSS JOIN q
    ),
    dists AS (
        SELECT cand.vec_id, cb.m, cb.k,
               list_sum(list_transform(range(1, {sd} + 1),
                   i -> (cand.vec[CAST(cb.m AS INT) * {sd} + i] - cent[i])
                      * (cand.vec[CAST(cb.m AS INT) * {sd} + i] - cent[i])))
                   AS dist
        FROM cand CROSS JOIN cb
    ),
    codes AS (
        SELECT vec_id, m, k
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                           ORDER BY dist, k) AS rn
              FROM dists)
        WHERE rn = 1
    ),
    adc AS (
        SELECT c.vec_id, CAST(SUM(l.d_micro) AS BIGINT) AS adc_micro
        FROM codes c JOIN lut l ON c.m = l.m AND c.k = l.k
        GROUP BY c.vec_id
    ),
    short AS (
        SELECT cand.vec_id, cand.label, cand.bucket, cand.vec, adc.adc_micro,
               ROW_NUMBER() OVER (ORDER BY adc.adc_micro, cand.vec_id) AS srn
        FROM cand JOIN adc USING (vec_id)
    )
    SELECT s.vec_id, s.label, s.bucket, s.adc_micro,
           ROUND({cos_sq}, 4) + 0.0 AS cos_sim
    FROM short s CROSS JOIN q
    WHERE s.srn <= {IVFPQ_SHORTLIST}
    ORDER BY cos_sim DESC, s.vec_id
    LIMIT 5
    """


@register(
    "q_ivfpq_search",
    oracle=_ivfpq_oracle(),
    doc="IVF-PQ composed ANN search — the FAISS IVFADC shape (Jegou et "
    "al. 2011) every 100 TB embedding store runs in production, built "
    "from this engine's two green halves: q_ann_ivf's coarse inverted-"
    "file quantizer and q_pq_encode's product-quantization codebook. "
    "Stages: (1) coarse-assign every vector to its max-cosine cell via "
    "the SHARED ivf_assign stage (8 deterministic seed centroids, one "
    "Lloyd refinement round rounded to 6 decimals, zero-shuffle "
    "broadcast-matrix argmax — bit-identical cells to q_ann_ivf's, so "
    "this search inherits plain IVF's measured cell recall); (2) rank "
    "the query's cells and probe the top 2 — candidates are ~n_probe/K "
    "of the corpus, filtered BEFORE any scoring; (3) score candidates by "
    "ASYMMETRIC DISTANCE: the query's M x K = 128-entry LUT of "
    "micro-floored squared-L2 subvector distances is driver-computed "
    "model state (the classic ADC table), each candidate PQ-encodes "
    "map-side (argmin per subspace, the q_pq_encode expression) and its "
    "approximate distance is the integer SUM of 8 LUT lookups — exact "
    "cross-engine bigint arithmetic, no float summation order anywhere; "
    "(4) bounded-heap shortlist of IVFPQ_SHORTLIST=32 by (adc_micro, "
    "vec_id), then EXACT cosine re-rank of the shortlist, top-5 out. "
    "The PQ codebook is SAMPLE-INIT (the oracle's cb CTE): corpus "
    "vectors vec_ids 200-215 sliced into PQ_M sub-centroids, identical "
    "on both engines — NOT q_pq_encode's random literals. "
    "Plan: two TakeOrderedAndProject heaps, zero wide shuffles — the "
    "corpus is touched by exactly one map-shaped pass over the probed "
    "cells; at 100 TB codes live in the index and step (3) reads "
    "8 bytes/vector, never the vectors. Driver-side collects are model "
    "state only (8 centroids + 1 query vector); Python replicates the "
    "oracle's in-order IEEE folds so probes/LUT agree bit-exactly. "
    "recall@5 vs brute force pinned in tests/test_llm.py. Reference "
    "parity note: the reference engine has no vector operators; "
    "north-star surface per SURVEY.md SS2B.",
)
def q_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, assign, centroids = ivf_assign(spark, sf_dir, lloyd=True, drop_null=True)
    # Query vector and sample codebook vectors are model state: one
    # bounded collect off the RAW scan projection (17 rows max), never
    # off ``assign`` — the assignment subtree computes a bucket this
    # collect would throw away.
    cb_lo, cb_hi = IVFPQ_CODEBOOK_IDS
    model_rows = (
        base.filter(
            (F.col("vec_id") == 0) | F.col("vec_id").between(cb_lo, cb_hi)
        )
        .select("vec_id", "vec")
        .collect()
    )
    qvecs = [r.vec for r in model_rows if r.vec_id == 0]
    sample = sorted(
        (int(r.vec_id) - cb_lo, [float(x) for x in r.vec])
        for r in model_rows
        if r.vec_id != 0
    )
    if not qvecs or not centroids or not sample:
        # No query vector, no seeds, or no codebook sample vectors in
        # this fixture: the oracle's CROSS JOIN q (or its empty cb CTE
        # propagating through the codes->adc->short joins) yields zero
        # rows; emit the same empty relation.
        return spark.createDataFrame(
            [], "vec_id bigint, label int, bucket int, adc_micro bigint, cos_sim double"
        )
    qvec = [float(x) for x in qvecs[0]]
    # The SAMPLE-INIT PQ codebook (matching the oracle's cb CTE): the 16
    # corpus vectors vec_ids 200..215, each sliced into PQ_M sub-centroids.
    # codebook[m][j] is the m-th subvector of the j-th sample in k-order
    # (k = vec_id - 200); positions are monotone in k, so positional
    # argmin tie-breaks and LUT lookups agree with the oracle's
    # (dist, k) ordering and (m, k) join even if some ids are absent.
    codebook = [
        [vec[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM] for _, vec in sample]
        for m in range(PQ_M)
    ]

    # Driver-side query planning (model-state-sized, like the seed
    # collects elsewhere in this module): probe ranking and the ADC LUT
    # use the same in-order Python folds as the oracle's list_sum over
    # the same refined-centroid doubles (rounded to IVF_ROUND on both
    # engines), so the selected cells and LUT integers agree bit-exactly.
    probe_order = sorted(
        (b for b, _ in centroids),
        key=lambda b: (-_py_cos(qvec, dict(centroids)[b]), b),
    )
    probes = [int(b) for b in probe_order[:IVF_N_PROBE]]
    lut = _pq_adc_lut_micro(qvec, codebook)

    cand = assign.filter(
        (F.col("vec_id") != 0) & F.col("bucket").isin(probes)
    )

    def best_in_subspace(m: int) -> Column:
        # q_pq_encode's indexed-transform argmin (one matrix transform
        # per subspace keeps the tree inside codegen's method budget),
        # but over the SAMPLE-INIT codebook — the same sub-centroids the
        # oracle's cb CTE slices out of vec_ids 200..215, NOT the random
        # PQ_CODEBOOK literals q_pq_encode demonstrates against.
        sub = F.slice(F.col("vec"), m * PQ_SUBDIM + 1, PQ_SUBDIM)
        cb = F.array(
            *[lit_double_array(cent) for cent in codebook[m]]
        )
        return F.array_min(
            F.transform(
                cb,
                lambda cent, k: F.struct(
                    F.aggregate(
                        F.zip_with(sub, cent, lambda x, c: (x - c) * (x - c)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    k.alias("k"),
                ),
            )
        )

    staged2 = cand.select(
        "vec_id",
        "label",
        "bucket",
        "vec",
        *[best_in_subspace(m).alias(f"b{m}") for m in range(PQ_M)],
    )
    adc_total = F.lit(0).cast("bigint")
    for m in range(PQ_M):
        lutarr = lit_long_array(lut[m])
        adc_total = adc_total + F.element_at(
            lutarr, F.col(f"b{m}.k").cast("int") + 1
        )
    scored = staged2.select(
        "vec_id", "label", "bucket", "vec", adc_total.alias("adc_micro")
    )
    short = scored.orderBy(F.asc("adc_micro"), F.asc("vec_id")).limit(
        IVFPQ_SHORTLIST
    )
    qlit = lit_double_array(qvec)
    return (
        short.select(
            "vec_id",
            "label",
            "bucket",
            "adc_micro",
            (F.round(cosine(F.col("vec"), qlit), 4) + F.lit(0.0)).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


def _ivf_cell_stats_oracle() -> str:
    """Reuses the exact assignment CTE chain of the IVFADC oracle (seed
    centroids -> one Lloyd round rounded to IVF_ROUND -> reassign), then
    rolls up per cell."""
    cos_vc = _COS_SQL.format(a="v.vec", b="c.cvec")
    cos_vr = _COS_SQL.format(a="v.vec", b="r.cvec")
    lo, hi = IVF_CENTROID_IDS
    return f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    cents AS (
        SELECT CAST(vec_id - {lo} AS INT) AS bucket, vec AS cvec FROM v
        WHERE vec_id BETWEEN {lo} AND {hi}
    ),
    sc1 AS (
        SELECT v.vec_id, v.vec, c.bucket, {cos_vc} AS csim
        FROM v CROSS JOIN cents c
    ),
    assign1 AS (
        SELECT vec_id, vec, bucket
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY csim DESC, bucket) AS rn
              FROM sc1)
        WHERE rn = 1
    ),
    exploded AS (
        SELECT bucket, unnest(range(1, len(vec) + 1)) AS pos, vec FROM assign1
    ),
    dims AS (
        SELECT bucket, pos, ROUND(AVG(vec[pos]), {IVF_ROUND}) AS m
        FROM exploded GROUP BY bucket, pos
    ),
    refined AS (
        SELECT bucket, list(m ORDER BY pos) AS cvec FROM dims GROUP BY bucket
    ),
    sc2 AS (
        SELECT v.vec_id, v.vec, r.bucket, {cos_vr} AS csim
        FROM v CROSS JOIN refined r
    ),
    assign AS (
        SELECT vec_id, bucket
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY csim DESC, bucket) AS rn
              FROM sc2)
        WHERE rn = 1
    ),
    g AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM assign GROUP BY bucket
    )
    SELECT bucket, n_vecs,
           CAST((n_vecs * 1000000)
                // CAST(SUM(n_vecs) OVER () AS BIGINT) AS BIGINT)
               AS frac_ppm,
           CAST((n_vecs * CAST(COUNT(*) OVER () AS BIGINT) * 1000000)
                // CAST(SUM(n_vecs) OVER () AS BIGINT) AS BIGINT)
               AS load_ppm
    FROM g
    """


@register(
    "q_ivf_cell_stats",
    oracle=_ivf_cell_stats_oracle(),
    doc="IVF index-health audit — the cell-balance report every "
    "deployed inverted-file index is checked against before (and "
    "while) serving: per coarse cell, the member count, its corpus "
    "fraction in exact integer ppm, and its LOAD FACTOR (n_vecs x "
    "n_cells x 1e6 div total — 1e6 = perfectly balanced; a hot cell's "
    "load factor is the multiplier on that cell's probe latency and "
    "the signal to split it or re-train the quantizer). Runs the "
    "SHARED ivf_assign stage (bit-identical cells to q_ann_ivf / "
    "q_ivfpq_search, so this audit describes exactly the index those "
    "queries probe) plus ONE bucket-keyed rollup and a K-row window — "
    "at 100 TB the audit costs one map-shaped assignment pass over "
    "the corpus and an O(K) rollup, and is the cheap recurring check "
    "that keeps multi-probe latency predictable as the corpus drifts "
    "from the centroids. All arithmetic is exact bigint div, "
    "engine-identical.",
)
def q_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, assign, cents = ivf_assign(spark, sf_dir, lloyd=True, drop_null=True)
    g = assign.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
    wall = Window.partitionBy()
    return (
        g.withColumn("tot", F.sum("n_vecs").over(wall).cast("bigint"))
        .withColumn("ncells", F.count(F.lit(1)).over(wall).cast("bigint"))
        .select(
            "bucket",
            "n_vecs",
            F.expr("CAST((n_vecs * 1000000) div tot AS BIGINT)").alias(
                "frac_ppm"
            ),
            F.expr(
                "CAST((n_vecs * ncells * 1000000) div tot AS BIGINT)"
            ).alias("load_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Exact-integer embedding covariance (distributed Gram matrix)
# --------------------------------------------------------------------------

#: Quantization grid for the covariance pass: embeddings are snapped to
#: exact MILLI units (floor(x*1000 + 0.5)) so every moment is integer
#: arithmetic. With |x| <= ~0.6 and d = 64, int64 holds the corpus
#: numerator n*Sxy - Sx*Sy up to ~5e6 vectors; past that the sums
#: upgrade to DECIMAL(38,0) / HUGEINT with no other change.
COV_QUANT = 1000

_COV_PARTIAL_SCHEMA = "dim_i bigint, dim_j bigint, sxy bigint"


def _gram_partials(batches):
    """Per-Arrow-batch partial Gram matrices: each pandas batch of
    quantized vectors V contributes V^T V (one exact int64 numpy matmul)
    as d*(d+1)/2 upper-triangle rows. This is the canonical distributed
    second-moment shape — per-partition O(d^2) model-state output
    instead of exploding d^2 rows per VECTOR (a 2080x row blowup) or
    shipping vectors to the driver; the final reduce is a 2080-group
    hash agg. Arrow-batched and numpy-vectorized end to end (no per-row
    Python)."""
    import numpy as np
    import pandas as pd

    iu = None
    dim = None
    for pdf in batches:
        vecs = [v for v in pdf["embedding"] if v is not None]
        if not vecs:
            continue
        # The Gram matrix is only defined over a fixed-width corpus:
        # np.stack would raise an opaque shape error on a ragged batch,
        # and silently reusing a cached triangle index across batches of
        # different widths would emit a truncated/mis-indexed triangle
        # (the unnest-based oracle, by contrast, quietly tolerates
        # ragged arrays — a divergence, not a crash). Refuse loudly,
        # naming the offending lengths (round-12 ADVICE fix).
        lens = {len(v) for v in vecs}
        if dim is not None:
            lens.add(dim)
        if len(lens) > 1:
            raise ValueError(
                "q_embed_covariance: mixed embedding dimensionalities "
                f"{sorted(lens)} in one partition — the distributed Gram "
                "matrix needs a fixed-width embedding column; filter or "
                "re-embed the off-width vectors upstream."
            )
        dim = lens.pop()
        V = np.stack(
            [
                np.floor(
                    np.asarray(v, dtype=np.float64) * COV_QUANT + 0.5
                ).astype(np.int64)
                for v in vecs
            ]
        )
        G = V.T @ V
        if iu is None:
            iu = np.triu_indices(G.shape[0])
        yield pd.DataFrame(
            {"dim_i": iu[0] + 1, "dim_j": iu[1] + 1, "sxy": G[iu]}
        )


@register(
    "q_embed_covariance",
    oracle=f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * {COV_QUANT} + 0.5)
                             AS BIGINT)) AS q
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    e AS (
        SELECT vec_id, unnest(q) AS x,
               generate_subscripts(q, 1) AS pos
        FROM v
    ),
    g AS (
        SELECT a.pos AS dim_i, b.pos AS dim_j,
               CAST(SUM(a.x * b.x) AS BIGINT) AS sxy
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        GROUP BY 1, 2
    ),
    s AS (
        SELECT pos AS dim, CAST(SUM(x) AS BIGINT) AS sx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY pos
    )
    SELECT CAST(g.dim_i AS BIGINT) AS dim_i,
           CAST(g.dim_j AS BIGINT) AS dim_j,
           si.n AS n,
           si.n * g.sxy - si.sx * sj.sx AS cov_num
    FROM g
    JOIN s si ON g.dim_i = si.dim
    JOIN s sj ON g.dim_j = sj.dim
    ORDER BY dim_i, dim_j
    """,
    doc="Exact-integer embedding covariance — the distributed Gram "
    "matrix that feeds whitening / PCA / ZCA preprocessing of an "
    "embedding corpus (and the drift monitor's multivariate upgrade): "
    "vectors are snapped to exact milli units, and the upper triangle "
    "of the second-moment matrix is computed as PER-PARTITION partial "
    "Gram matrices via mapInPandas (one int64 numpy matmul per Arrow "
    "batch, emitting d(d+1)/2 = 2080 model-state rows per batch) "
    "reduced by a 2080-group hash agg — the one operator family where "
    "an Arrow-batched vectorized UDF IS the right tool: the built-in "
    "alternative explodes d^2 rows per vector (2080x shuffle volume), "
    "and a driver-side collect isn't distributed at all. First moments "
    "and n ride a 64-row JVM posexplode agg broadcast onto the "
    "triangle. Output is the exact integer numerator n*Sxy - Sx*Sy per "
    "dim pair (divide by n(n-1)*10^6 for the sample covariance): no "
    "division, no floats, hash-stable across engines — the DuckDB "
    "oracle reproduces it by brute-force pair unnesting. At 100 TB the "
    "map side does one BLAS-shaped matmul per batch and ships KBs per "
    "partition; int64 holds to ~5e6 vectors at this dimension/scale "
    "(the documented DECIMAL(38,0)/HUGEINT upgrade covers the rest). "
    "NULL embeddings are scoped out on both engines.",
)
def q_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_compactor_spark.llm.text import spread_scan

    e = spread_scan(
        load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    )
    g = (
        e.select("embedding")
        .mapInPandas(_gram_partials, schema=_COV_PARTIAL_SCHEMA)
        .groupBy("dim_i", "dim_j")
        .agg(F.sum("sxy").alias("sxy"))
    )
    quant = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * COV_QUANT + 0.5).cast("bigint"),
    )
    s = (
        e.select(F.posexplode(quant).alias("pos", "x"))
        .select((F.col("pos") + 1).cast("bigint").alias("dim"), "x")
        .groupBy("dim")
        .agg(
            F.sum("x").cast("bigint").alias("sx"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    si = F.broadcast(s.select(F.col("dim").alias("dim_i"), F.col("sx").alias("sx_i"), "n"))
    sj = F.broadcast(s.select(F.col("dim").alias("dim_j"), F.col("sx").alias("sx_j")))
    return (
        g.join(si, "dim_i")
        .join(sj, "dim_j")
        .select(
            "dim_i",
            "dim_j",
            "n",
            (F.col("n") * F.col("sxy") - F.col("sx_i") * F.col("sx_j")).alias(
                "cov_num"
            ),
        )
        .orderBy("dim_i", "dim_j")
    )


# --------------------------------------------------------------------------
# Incremental IVF index maintenance (frozen-centroid shard refresh)
# --------------------------------------------------------------------------

#: The deterministic "new shard" membership for q_ivf_refresh: vec_ids
#: with last digit 8/9 (20% of the corpus). The ANN-family seed ids
#: 100..107 all land in the OLD partition by construction, so the
#: frozen index is always buildable.
IVF_REFRESH_MOD = 10
IVF_REFRESH_NEW_MIN = 8


def _ivf_refresh_oracle() -> str:
    cos_vc = _COS_SQL.format(a="vo.vec", b="c.cvec")
    cos_or = _COS_SQL.format(a="vo.vec", b="r.cvec")
    cos_nr = _COS_SQL.format(a="vn.vec", b="r.cvec")
    m, lo = IVF_REFRESH_MOD, IVF_REFRESH_NEW_MIN
    return f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    vo AS (SELECT * FROM v WHERE vec_id % {m} < {lo}),
    vn AS (SELECT * FROM v WHERE vec_id % {m} >= {lo}),
    cents AS (
        SELECT CAST(vec_id - 100 AS INT) AS bucket, vec AS cvec FROM vo
        WHERE vec_id BETWEEN 100 AND 107
    ),
    sc1 AS (
        SELECT vo.vec_id, vo.vec, c.bucket, {cos_vc} AS csim
        FROM vo CROSS JOIN cents c
    ),
    assign1 AS (
        SELECT vec_id, vec, bucket
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY csim DESC, bucket) AS rn
              FROM sc1)
        WHERE rn = 1
    ),
    exploded AS (
        SELECT bucket, unnest(range(1, len(vec) + 1)) AS pos, vec FROM assign1
    ),
    dims AS (
        SELECT bucket, pos, ROUND(AVG(vec[pos]), {IVF_ROUND}) AS m
        FROM exploded GROUP BY bucket, pos
    ),
    refined AS (
        SELECT bucket, list(m ORDER BY pos) AS cvec FROM dims GROUP BY bucket
    ),
    ao AS (
        SELECT vec_id, bucket
        FROM (SELECT vo.vec_id, r.bucket,
                     ROW_NUMBER() OVER (PARTITION BY vo.vec_id
                                        ORDER BY {cos_or} DESC, r.bucket) AS rn
              FROM vo CROSS JOIN refined r)
        WHERE rn = 1
    ),
    an AS (
        SELECT vec_id, bucket
        FROM (SELECT vn.vec_id, r.bucket,
                     ROW_NUMBER() OVER (PARTITION BY vn.vec_id
                                        ORDER BY {cos_nr} DESC, r.bucket) AS rn
              FROM vn CROSS JOIN refined r)
        WHERE rn = 1
    ),
    co AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_old FROM ao GROUP BY bucket),
    cn AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_new FROM an GROUP BY bucket),
    j AS (
        SELECT COALESCE(co.bucket, cn.bucket) AS bucket,
               COALESCE(n_old, 0) AS n_old,
               COALESCE(n_new, 0) AS n_new
        FROM co FULL OUTER JOIN cn ON co.bucket = cn.bucket
    ),
    t AS (SELECT SUM(n_old) AS so, SUM(n_old) + SUM(n_new) AS sa FROM j)
    SELECT bucket, n_old, n_new,
           CAST((n_old * 1000000) // so AS BIGINT) AS old_ppm,
           CAST(((n_old + n_new) * 1000000) // sa AS BIGINT) AS merged_ppm,
           CAST(((n_old + n_new) * 1000000) // sa
                - (n_old * 1000000) // so AS BIGINT) AS drift_ppm
    FROM j, t
    """


@register(
    "q_ivf_refresh",
    oracle=_ivf_refresh_oracle(),
    doc="Incremental IVF index maintenance — the production ANN-refresh "
    "shape (mirroring q_minhash_incremental's new-vs-old discipline): "
    "the index centroids are built and Lloyd-refined on the OLD corpus "
    "only (vec_id % 10 < 8) and then FROZEN; a new shard (vec_id % 10 "
    ">= 8) is assigned against the frozen state without re-clustering "
    "or re-assigning the old corpus, and the query emits the per-cell "
    "balance drift the refresh causes: n_old/n_new members, old vs "
    "merged occupancy in exact ppm, and drift_ppm = merged - old — the "
    "number an index operator watches to decide when accumulated "
    "shards force a re-train. At 100 TB: the frozen K x dim centroid "
    "matrix broadcasts to the new shard's scan (a map, zero shuffle "
    "beyond the K-row count agg), the old corpus is NOT rescanned in "
    "production (its baseline counts live in the stored index; this "
    "query recomputes them only so the DuckDB oracle can check both "
    "sides), and the two count aggs meet in a K-row full outer join.",
)
def q_ivf_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_compactor_spark.llm.cluster import per_dim_means
    from parquet_compactor_spark.llm.text import spread_scan

    raw = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )

    def project(df: DataFrame) -> DataFrame:
        p = df.select(
            "vec_id",
            F.transform(
                F.col("embedding"), lambda x: x.cast("double")
            ).alias("vec"),
        )
        return p.withColumn("_vnorm", l2_norm(F.col("vec")))

    is_new = F.pmod(F.col("vec_id"), F.lit(IVF_REFRESH_MOD)) >= F.lit(
        IVF_REFRESH_NEW_MIN
    )
    old_raw, new_raw = raw.filter(~is_new), raw.filter(is_new)
    # Seeds off the raw pushdown-friendly OLD projection (the
    # round-12 ivf_assign rule: model collects never cross a spread
    # exchange) — riding IN-PLAN since r15 (inplan_seed_cents): only
    # the FROZEN refined matrix below is consumed driver-side, so the
    # former seed collect was a pure extra driver job.
    lo, hi = IVF_CENTROID_IDS
    cents0 = inplan_seed_cents(
        project(old_raw).filter(F.col("vec_id").between(lo, hi)),
        F.col("vec_id") - F.lit(lo),
    )
    old = project(spread_scan(old_raw))
    new = project(spread_scan(new_raw))
    staged, sims, ids = centroid_cosines_df(old, cents0)
    assign1 = staged.select(_argmax_bucket(sims, ids).alias("cluster"), "vec")
    means = per_dim_means(assign1, ndigits=IVF_ROUND)
    frozen = sorted((int(r.cluster), [float(x) for x in r.cvec]) for r in means)

    def cell_counts(df: DataFrame, out: str) -> DataFrame:
        st, sm, ii = centroid_cosines(df, frozen)
        return (
            st.select(_argmax_bucket(sm, ii).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    j = (
        cell_counts(old, "n_old")
        .join(cell_counts(new, "n_new"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
        )
    )
    wall = Window.partitionBy()
    return (
        j.withColumn("so", F.sum("n_old").over(wall))
        .withColumn("sa", (F.sum("n_old").over(wall) + F.sum("n_new").over(wall)))
        .select(
            "bucket",
            "n_old",
            "n_new",
            F.expr("CAST((n_old * 1000000) div so AS BIGINT)").alias("old_ppm"),
            F.expr(
                "CAST(((n_old + n_new) * 1000000) div sa AS BIGINT)"
            ).alias("merged_ppm"),
            F.expr(
                "CAST(((n_old + n_new) * 1000000) div sa"
                " - (n_old * 1000000) div so AS BIGINT)"
            ).alias("drift_ppm"),
        )
    )
