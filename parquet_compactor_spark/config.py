"""Runtime configuration resolution (reference O13/O14 parity).

The reference resolves config through an env-vs-Clowder strategy switch
(configurator.py:8-16) with env getters for endpoint/bucket/keys/prefix
(configurator.py:19-70). Here the same knob surface resolves env-first
with an overridable mapping (the seam where a platform-specific provider
— the Clowder role — would plug in), and the result maps onto SparkConf
via session.get_spark rather than a boto session.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from parquet_compactor_spark.compactor.core import CompactionConfig


@dataclass(frozen=True)
class EngineSettings:
    """Everything app.main needs: where the lake is, how to compact it."""

    bucket: str | None = None
    endpoint: str | None = None
    access_key: str | None = None
    secret_key: str | None = None
    data_prefix: str = "data/parquet"  # reference default (configurator.py:70)
    lake_root: str | None = None  # full URI override (local runs/tests)
    compaction: CompactionConfig = field(default_factory=CompactionConfig)

    def resolved_root(self) -> str:
        """The URI the compactor crawls: explicit root, else s3a bucket+prefix."""
        if self.lake_root:
            return self.lake_root
        if not self.bucket:
            raise ValueError("either LAKE_ROOT or REQUESTED_BUCKET must be set")
        return f"s3a://{self.bucket}/{self.data_prefix}"


def from_env(env: dict[str, str] | None = None) -> EngineSettings:
    """Env-first resolution, same variable names as the reference where
    they exist (REQUESTED_BUCKET, CHUNKED_ROWS, TARGET_FILE_SIZE_GB,
    SKIP_SOURCE_TYPE_CURRENT_MONTH — app.py:26, parquet_compactor.py:20-26).
    """
    e = env if env is not None else dict(os.environ)
    skip = e.get("SKIP_SOURCE_TYPE_CURRENT_MONTH")
    compaction = CompactionConfig(
        target_file_size_gb=float(e.get("TARGET_FILE_SIZE_GB", "0.3")),
        chunked_rows=int(e.get("CHUNKED_ROWS", "1000000")),
        skip_source_types_current_month=(
            [s.strip() for s in skip.split(",") if s.strip()]
            if skip is not None
            else ["AWS", "Azure"]
        ),
        hold_back_days=int(e.get("COMPACTION_HOLD_BACK_DAYS", "5")),
    )
    return EngineSettings(
        bucket=e.get("REQUESTED_BUCKET"),
        endpoint=e.get("S3_ENDPOINT"),
        access_key=e.get("AWS_ACCESS_KEY_ID"),
        secret_key=e.get("AWS_SECRET_ACCESS_KEY"),
        data_prefix=e.get("DATA_PREFIX", "data/parquet"),
        lake_root=e.get("LAKE_ROOT"),
        compaction=compaction,
    )


def resolve(
    env: dict[str, str] | None = None,
    provider_doc: dict | None = None,
    requested_bucket: str = "",
) -> EngineSettings:
    """Strategy-switched resolution (reference configurator.py:8-16):
    object-store fields come from the configurator chosen by
    ``PROVIDER_CONFIG_ENABLED`` (env vs provider document), compaction
    knobs and LAKE_ROOT stay env-resolved as in :func:`from_env`.
    """
    from parquet_compactor_spark.configurator import get_configurator

    e = env if env is not None else dict(os.environ)
    c = get_configurator(e, doc=provider_doc)
    base = from_env(e)
    return EngineSettings(
        bucket=c.get_object_store_bucket(requested_bucket) or None,
        endpoint=c.get_object_store_endpoint(),
        access_key=c.get_object_store_access_key(requested_bucket),
        secret_key=c.get_object_store_secret_key(requested_bucket),
        data_prefix=c.get_data_prefix(),
        lake_root=base.lake_root,
        compaction=base.compaction,
    )
