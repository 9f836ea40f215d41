"""Capture .explain("formatted") for every registered query + plan stats.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python3 tools/capture_plans.py OUTDIR [names...]

Writes OUTDIR/<name>.txt per query and OUTDIR/_stats.json with per-query
plan-shape counters (exchanges, joins, python-eval nodes, scans, pushed
filters, construction/plan wall time) — the guide §1/§7.2 measurement
pass for the optimization rounds.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def plan_string(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def plan_stats(plan: str) -> dict:
    def count(pat: str) -> int:
        return len(re.findall(pat, plan))

    return {
        "exchanges": count(r"\bExchange\b|\bExchange hashpartitioning|\(\d+\) Exchange"),
        "exchange_nodes": count(r"^\s*\(\d+\) Exchange", ),
        "smj": count(r"SortMergeJoin"),
        "bhj": count(r"BroadcastHashJoin"),
        "shj": count(r"ShuffledHashJoin"),
        "bnlj": count(r"BroadcastNestedLoopJoin"),
        "cartesian": count(r"CartesianProduct"),
        "python": count(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas"),
        "scans": count(r"Scan parquet|FileScan parquet"),
        "inmem": count(r"InMemoryTableScan"),
        "window": count(r"\(\d+\) Window"),
        "sorts": count(r"\(\d+\) Sort "),
        "aqe": count(r"AdaptiveSparkPlan"),
        "generate": count(r"\(\d+\) Generate"),
        "pushed_empty": count(r"PushedFilters: \[\]"),
        "pushed_nonempty": count(r"PushedFilters: \[[^\]]"),
        "plan_lines": plan.count("\n"),
    }


def main() -> None:
    outdir = Path(sys.argv[1])
    outdir.mkdir(parents=True, exist_ok=True)
    only = set(sys.argv[2:])

    from parquet_compactor_spark.llm.text import release_guard_caches
    from parquet_compactor_spark.registry import all_queries
    from parquet_compactor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pcs-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    names = sorted(only & set(queries)) if only else sorted(queries)
    stats: dict[str, dict] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            df = queries[name].fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            plan = plan_string(df)
            t_plan = time.perf_counter() - t1
        except Exception as err:  # noqa: BLE001
            stats[name] = {"error": str(err)[:500]}
            release_guard_caches()
            continue
        (outdir / f"{name}.txt").write_text(plan)
        s = plan_stats(plan)
        s["t_build"] = round(t_build, 3)
        s["t_plan"] = round(t_plan, 3)
        stats[name] = s
        release_guard_caches()
    (outdir / "_stats.json").write_text(json.dumps(stats, indent=1, sort_keys=True))
    print(f"captured {len(stats)} plans -> {outdir}")
    spark.stop()


if __name__ == "__main__":
    main()
