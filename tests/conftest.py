"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Mock object store (tests/javasupport/MockObjectStoreFileSystem.java):
# compiled once per source change into a stable /tmp location and loaded
# into the shared session's JVM (extraClassPath binds at JVM launch, so
# it must happen at fixture-creation time, not in the test). Physical
# storage for mocks3:// objects lives under MOCKS3_ROOT.
MOCKS3_BUILD_DIR = Path("/tmp/spark-graft-mocks3")
MOCKS3_JAR = MOCKS3_BUILD_DIR / "mocks3-test-fs.jar"
MOCKS3_ROOT = str(MOCKS3_BUILD_DIR / "objects")
MOCKS3_IMPL = "sparkgraft.testfs.MockObjectStoreFileSystem"


def build_mocks3_jar() -> str | None:
    """Compile the mock-object-store FileSystem; None if the toolchain
    (javac/jar, hadoop-client-api) is unavailable in this environment."""
    if shutil.which("javac") is None or shutil.which("jar") is None:
        return None
    import pyspark

    src = Path(__file__).parent / "javasupport" / "MockObjectStoreFileSystem.java"
    hadoop = next(
        (Path(pyspark.__file__).parent / "jars").glob("hadoop-client-api-*.jar"),
        None,
    )
    if hadoop is None or not src.exists():
        return None
    if MOCKS3_JAR.exists() and MOCKS3_JAR.stat().st_mtime >= src.stat().st_mtime:
        return str(MOCKS3_JAR)
    classes = MOCKS3_BUILD_DIR / "classes"
    classes.mkdir(parents=True, exist_ok=True)
    try:
        subprocess.run(
            ["javac", "-encoding", "UTF-8", "-cp", str(hadoop),
             "-d", str(classes), str(src)],
            check=True, capture_output=True,
        )
        subprocess.run(
            ["jar", "cf", str(MOCKS3_JAR), "-C", str(classes), "sparkgraft"],
            check=True, capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        return None
    return str(MOCKS3_JAR)


@pytest.fixture(scope="session")
def spark():
    from parquet_compactor_spark.session import get_spark

    extra_conf = {}
    jar = build_mocks3_jar()
    if jar is not None:
        extra_conf = {
            "spark.driver.extraClassPath": jar,
            "spark.hadoop.fs.mocks3.impl": MOCKS3_IMPL,
            "spark.hadoop.fs.mocks3.root": MOCKS3_ROOT,
        }
    spark = get_spark(app_name="pcs-tests", extra_conf=extra_conf)
    yield spark
    spark.stop()
