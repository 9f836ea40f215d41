"""Graph-centrality operators over relational tables.

Web-corpus curation ranks pages by link-graph importance before
sampling (Common Crawl's harmonic-centrality ranking; OpenWebText's
karma threshold is the same shape). The engine expresses the inner
loop — iterative sparse matrix-vector products — as DataFrame
join+agg rounds over an edge table, the Pregel/GraphX dataflow
without the RDD API.

Reference parity note: the reference engine (parquet_compactor.py,
516 LoC of listing/merge logic) has no graph operators — this is
north-star surface per SURVEY.md SS2B, same bar as llm/dedup.py's
connected components.

All arithmetic is INTEGER micro-units so every aggregation is an
order-independent bigint sum: the same fixed-point result on any
partitioning, any engine — the repo's established floor-form
convention (see q_lang_temperature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_compactor_spark.registry import load, register

#: PageRank constants in parts-per-micro: rank mass starts at 1e6 per
#: node; teleport = 0.15, damping = 0.85 (Brin & Page 1998).
_R0_MICRO = 1_000_000
_TELEPORT_MICRO = 150_000
_DAMP_PERMILLE = 850
_ITERATIONS = 3


def pagerank_micro(edges: DataFrame, iterations: int = _ITERATIONS) -> DataFrame:
    """Fixed-iteration integer PageRank over directed (src, dst) edges.

    Returns (node, rank_micro). Exact integer fixed-point: each round,
    contribution = rank div out_degree (bigint division), new rank =
    150000 + (850 * sum(contribs)) div 1000 — sums of bigints are
    order-independent, so the result is identical on any shuffle
    layout and bit-identical to the DuckDB oracle's unrolled CTEs.

    Scale shape: the out-degree is attached to every edge up front
    with ONE window count over the src-partitioned edge shuffle (no
    degree join) — callers that already carry a ``d`` column (see
    ``q_pagerank``'s fused dedup+degree build) skip that pass — and
    the (src, dst, d) table is cached ONCE via
    persist_tracked so every round's join reads the materialized
    edge table instead of re-running the candidate-generation plan —
    and so the harness's release_guard_caches() frees it between
    timed runs (a localCheckpoint would linger until async
    ContextCleaner GC and double edge-table memory across
    back-to-back runs; unlike connected_components' convergence
    loop, a FIXED iteration count has no self-referencing lineage,
    so the eager checkpoint isn't needed). Each round is then a
    SINGLE edges-to-ranks equi-join plus one partial-aggregated sum
    keyed by dst: O(iterations x |E|) shuffle traffic, never
    node-pairs, no driver-side state. Nodes with no out-edges are
    absent from a symmetric co-occurrence graph by construction
    (callers with genuinely dangling nodes should add the standard
    dangling-mass term before the teleport).
    """
    from pyspark.sql import Window

    from parquet_compactor_spark.llm.text import persist_tracked

    if "d" in edges.columns:
        e = persist_tracked(edges.select("src", "dst", "d"))
    else:
        e = persist_tracked(
            edges.select("src", "dst").withColumn(
                "d", F.count(F.lit(1)).over(Window.partitionBy("src"))
            )
        )
    ranks = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(_R0_MICRO).cast("bigint").alias("r")
    )
    for _ in range(iterations):
        # SHUFFLE_HASH on the rank side (r15): ranks is unique-keyed by
        # node, so per-partition hash builds are uniform — skips the
        # SMJ sort passes each round (same A/B-measured win as the
        # connected_components round joins; median 3.04 -> 2.73 s at
        # sf0.1, identical integer ranks).
        contrib = e.join(ranks.hint("SHUFFLE_HASH"), e.src == ranks.node).select(
            "dst", F.expr("r div d").alias("c")
        )
        ranks = contrib.groupBy("dst").agg(
            (
                F.lit(_TELEPORT_MICRO)
                + F.expr(f"({_DAMP_PERMILLE} * sum(c)) div 1000")
            ).alias("r")
        ).select(F.col("dst").alias("node"), F.col("r").cast("bigint").alias("r"))
    return ranks.select("node", F.col("r").alias("rank_micro"))


@register(
    "q_pagerank",
    oracle="""
    WITH su AS (
        SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
    ),
    edges AS (
        SELECT DISTINCT a.s AS src, b.s AS dst
        FROM su a JOIN su b ON a.ok = b.ok AND a.s <> b.s
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
    i1 AS (
        SELECT e.dst AS node,
               CAST(150000 + (850 * CAST(SUM(r.r // g.d) AS BIGINT)) // 1000
                    AS BIGINT) AS r
        FROM edges e JOIN r0 r ON r.node = e.src JOIN deg g ON g.src = e.src
        GROUP BY e.dst
    ),
    i2 AS (
        SELECT e.dst AS node,
               CAST(150000 + (850 * CAST(SUM(r.r // g.d) AS BIGINT)) // 1000
                    AS BIGINT) AS r
        FROM edges e JOIN i1 r ON r.node = e.src JOIN deg g ON g.src = e.src
        GROUP BY e.dst
    ),
    i3 AS (
        SELECT e.dst AS node,
               CAST(150000 + (850 * CAST(SUM(r.r // g.d) AS BIGINT)) // 1000
                    AS BIGINT) AS r
        FROM edges e JOIN i2 r ON r.node = e.src JOIN deg g ON g.src = e.src
        GROUP BY e.dst
    )
    SELECT node AS suppkey, r AS rank_micro
    FROM i3 ORDER BY rank_micro DESC, suppkey LIMIT 20
    """,
    doc="PageRank centrality (3 fixed iterations, damping 0.85) over the "
    "supplier co-purchase graph: suppliers are linked when they supply "
    "the same order (the item-item co-occurrence graph of Amazon-style "
    "recommenders; for corpus curation the identical plan ranks pages "
    "over a link graph). Edges are DISTINCT per ordered pair, so the "
    "graph is symmetric and dangling-node-free by construction. All "
    "rank arithmetic is integer micro-units (rank div degree "
    "contributions, bigint sums), so the fixed point is engine- and "
    "partitioning-exact; the DuckDB oracle unrolls the same three "
    "rounds as CTEs. Plan: the edge table is a persist_tracked guard "
    "cache released by release_guard_caches() (localCheckpoint was "
    "rejected — see pagerank_micro's docstring), then each round is an "
    "edge-keyed equi-join + "
    "partial-aggregated sum — O(iterations x |E|), never node pairs; "
    "per-order co-supplier fan-out is bounded by order size (<= 7 "
    "lineitems in TPC-H), so |E| is O(orders), linear in the lake. "
    "Top-20 is TakeOrderedAndProject (bounded heap), ties broken by "
    "suppkey.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # Per-order co-supplier pairs WITHOUT a self-join (r14): collect the
    # <=7-element supplier set per order in one partially-aggregated
    # shuffle, expand ordered pairs (x, y != x) as an array expression,
    # then dedup pairs. Identical edge set to the former
    # distinct-then-self-join-then-distinct plan (collect_set dedups
    # (ok, s) within the order; the pair expansion is exactly the a.ok =
    # b.ok AND a.s <> b.s product) at 2 shuffles instead of 4 and no
    # join — guide §2.4.
    pair_sets = li.groupBy(F.col("l_orderkey")).agg(
        F.collect_set("l_suppkey").alias("ss")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x: F.transform(
                F.filter(F.col("ss"), lambda y: y != x),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    # Global pair dedup AND out-degree in ONE groupBy(src) shuffle
    # (r15): collect_set(dst) per src IS the distinct edge set, and its
    # size IS the degree the former separate distinct + window pair
    # recomputed (2 edge-table exchanges -> 1; identical (src, dst, d)
    # rows — integer ranks unchanged, oracle differential). Skew
    # posture is unchanged too: the window form already put all of one
    # src's rows on a single WindowExec task.
    edges = (
        pair_sets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .groupBy("src")
        .agg(F.collect_set("dst").alias("ds"))
        .select("src", F.size("ds").alias("d"), F.explode("ds").alias("dst"))
    )
    ranks = pagerank_micro(edges)
    return (
        ranks.select(F.col("node").alias("suppkey"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), F.col("suppkey").asc())
        .limit(20)
    )
