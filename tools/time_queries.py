"""Time a subset of registered queries through the noop sink (guide §1.4).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python3 tools/time_queries.py N name [name...]

Runs each named query N times (fresh construction each run, guard caches
released between runs — identical methodology to bench.py) and prints
per-run seconds + min/median. Min over repeats is the host-jitter-robust
comparator for before/after A/B (BASELINE.md documents ±2-3x VM jitter on
single readings).
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    n = int(sys.argv[1])
    names = sys.argv[2:]

    from parquet_compactor_spark.llm.text import release_guard_caches
    from parquet_compactor_spark.registry import all_queries
    from parquet_compactor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pcs-time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Same warm-up as bench.py: JVM + parquet footer caches.
    queries["q_agg_pricing"].fn(spark, sf_dir).count()

    for name in names:
        runs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            queries[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
            release_guard_caches()
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: runs={[round(r, 3) for r in runs]} "
            f"min={min(runs):.3f} median={statistics.median(runs):.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
