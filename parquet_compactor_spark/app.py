"""Entry point: config → SparkSession → LakeCompactor.compact().

Reference parity: app.py:22-46 (main() wires Configurator →
S3ParquetCompactor → compact()). Run as:

    python -m parquet_compactor_spark.app

with LAKE_ROOT (or REQUESTED_BUCKET [+ S3_ENDPOINT/keys]) in the env.
"""

from __future__ import annotations

import json
import sys

from parquet_compactor_spark.compactor import LakeCompactor
from parquet_compactor_spark.config import from_env
from parquet_compactor_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    settings = from_env()
    root = settings.resolved_root()
    spark = get_spark(
        app_name="parquet-compactor-spark",
        s3_endpoint=settings.endpoint,
        s3_access_key=settings.access_key,
        s3_secret_key=settings.secret_key,
    )
    compactor = LakeCompactor(spark, root, settings.compaction)
    outcomes = compactor.compact()
    print(json.dumps({"root": root, "leaves": outcomes}))
    # Non-zero exit if any leaf failed (originals were kept — safe to rerun).
    return 1 if any(o == "merge_failed_originals_kept" for o in outcomes.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
