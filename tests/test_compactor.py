"""Compaction-core tests: the reference's file-level semantics (FIXTURES.md §B).

Local filesystem stands in for S3 — the HadoopFS code path is identical.
Pure decision logic is tested without Spark; end-to-end merges with it.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta, timezone
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_compactor_spark.compactor import (
    CompactionConfig,
    FileMeta,
    LakeCompactor,
    determine_base_file_name,
    filter_compacted,
    should_skip_compacting,
)

NOW = datetime(2024, 6, 15, 12, 0, 0, tzinfo=timezone.utc)
OLD = NOW - timedelta(days=10)
CFG = CompactionConfig(now=NOW)


def write_small_parquet(path: Path, start: int = 0, rows: int = 100, mtime: datetime = OLD):
    path.parent.mkdir(parents=True, exist_ok=True)
    table = pa.table(
        {"id": list(range(start, start + rows)), "val": [float(i) for i in range(rows)]}
    )
    pq.write_table(table, path)
    ts = mtime.timestamp()
    os.utime(path, (ts, ts))


def read_ids(leaf: Path) -> list[int]:
    ids = []
    for f in sorted(leaf.glob("*.parquet")):
        ids.extend(pq.read_table(f).column("id").to_pylist())
    return sorted(ids)


# --------------------------------------------------------------------------
# Pure decision logic (no Spark)
# --------------------------------------------------------------------------


def test_base_file_name():
    assert determine_base_file_name("s3://b/data/parquet/a/source=AWS/year=2024/") == "AWS"
    assert determine_base_file_name("/lake/acct/source=my-src/month=01/") == "my-src"
    # Fallback when no source= segment (parquet_compactor.py:240-241).
    assert determine_base_file_name("/lake/acct/raw/") == "data"


def test_should_skip_current_month_for_volatile_sources():
    assert should_skip_compacting("/l/source=AWS/year=2024/month=06/", CFG)
    assert should_skip_compacting("/l/source=Azure/year=2024/month=06/", CFG)
    # Substring match anywhere in the path, as in the reference (:256-259).
    assert should_skip_compacting("/l/AWS/year=2024/month=06/", CFG)
    # Wrong month/year or non-volatile source → compact.
    assert not should_skip_compacting("/l/source=AWS/year=2024/month=05/", CFG)
    assert not should_skip_compacting("/l/source=AWS/year=2023/month=06/", CFG)
    assert not should_skip_compacting("/l/source=GCP/year=2024/month=06/", CFG)


def _meta(path: str, days_old: float, size: int = 1000) -> FileMeta:
    return FileMeta(path=path, size=size, modified=NOW - timedelta(days=days_old))


def test_filter_compacted_semantics():
    base = "AWS"
    files = [
        # two prior compaction outputs: only the NEWER one is re-merged
        _meta("/l/AWS_" + "a" * 32 + ".parquet", days_old=20),
        _meta("/l/AWS_" + "b" * 32 + ".parquet", days_old=8),
        # numbered convention also counts as compacted (:280)
        _meta("/l/AWS_123.parquet", days_old=30),
        # new files: old enough → included; fresh → held back (:286-289)
        _meta("/l/part-001.parquet", days_old=6),
        _meta("/l/part-002.parquet", days_old=0.5),
    ]
    result = filter_compacted(base, files, CFG)
    assert result == ["/l/AWS_" + "b" * 32 + ".parquet", "/l/part-001.parquet"]


def test_filter_compacted_no_prior():
    files = [_meta("/l/x.parquet", 6), _meta("/l/y.parquet", 7)]
    assert filter_compacted("AWS", files, CFG) == ["/l/x.parquet", "/l/y.parquet"]


def test_filter_compacted_property_invariants():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def file_lists(draw):
        n = draw(st.integers(0, 20))
        files = []
        for i in range(n):
            kind = draw(st.sampled_from(["new", "hex", "num"]))
            name = {
                "new": f"part-{i}.parquet",
                "hex": "AWS_" + format(i, "032x") + ".parquet",
                "num": f"AWS_{i}.parquet",
            }[kind]
            age = draw(st.floats(0, 30))
            files.append(_meta(f"/l/{name}", days_old=age))
        return files

    @given(file_lists())
    @settings(max_examples=200, deadline=None)
    def check(files):
        result = filter_compacted("AWS", files, CFG)
        by_path = {f.path: f for f in files}
        prior = [f for f in files if "/AWS_" in f.path]
        new = [p for p in result if "/AWS_" not in p]
        # At most one prior compacted output is re-merged — the newest.
        included_prior = [p for p in result if "/AWS_" in p]
        assert len(included_prior) <= 1
        if prior:
            assert included_prior == [max(prior, key=lambda f: f.modified).path]
            assert result[0] == included_prior[0]  # and it leads the list
        # No fresh file (inside the hold-back window) is ever included.
        for p in new:
            assert by_path[p].modified.date() < (
                CFG.utcnow() - __import__("datetime").timedelta(days=5)
            ).date()

    check()


def test_filter_compacted_gcp_property_invariants():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_compactor_spark.compactor import filter_compacted_gcp

    DATES = ["2024-01-10", "2024-01-11", "2024-01-12"]

    @st.composite
    def gcp_file_lists(draw):
        n = draw(st.integers(0, 20))
        files = []
        for i in range(n):
            date = draw(st.sampled_from(DATES))
            if draw(st.booleans()):  # prior compacted output
                name = f"202401_{date}_{format(i, '032x')}.parquet"
            else:  # new raw file
                name = f"202401_{date}_{i}raw.parquet"
            files.append(_meta(f"/l/{name}", days_old=draw(st.floats(0, 30))))
        return files

    @given(gcp_file_lists())
    @settings(max_examples=200, deadline=None)
    def check(files):
        from parquet_compactor_spark.compactor.core import GCP_PRIOR_RE

        result = filter_compacted_gcp(files, CFG)
        by_path = {f.path: f for f in files}
        assert len(result) == len(set(result))
        assert set(result) <= set(by_path)
        priors = [f for f in files if GCP_PRIOR_RE.search(f.path)]
        new_included = [p for p in result if not GCP_PRIOR_RE.search(p)]
        # New files obey the hold-back, exactly as the non-GCP filter.
        for p in new_included:
            assert by_path[p].modified.date() < (
                CFG.utcnow() - timedelta(days=5)
            ).date()
        # A prior appears iff its date has new files to merge, and then
        # only the newest prior OF THAT DATE appears.
        for date in DATES:
            date_priors = [f for f in priors if date in f.path]
            included = [p for p in result if GCP_PRIOR_RE.search(p) and date in p]
            if date_priors and any(date in p for p in new_included):
                assert included == [
                    max(date_priors, key=lambda f: f.modified).path
                ]
            else:
                assert included == []

    check()


def test_filter_compacted_hold_back_is_date_granular():
    # Exactly at the boundary date → NOT included (strict <, date compare).
    boundary = FileMeta(
        path="/l/z.parquet",
        size=10,
        modified=(NOW - timedelta(days=5)).replace(hour=0, minute=0),
    )
    assert filter_compacted("AWS", [boundary], CFG) == []


# --------------------------------------------------------------------------
# End-to-end compaction (Spark)
# --------------------------------------------------------------------------


@pytest.fixture()
def lake(tmp_path):
    return tmp_path / "data" / "parquet"


def compactor(spark, lake: Path) -> LakeCompactor:
    return LakeCompactor(spark, str(lake), CompactionConfig(now=NOW))


def test_many_small_merged_and_originals_deleted(spark, lake):
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(8):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    before = read_ids(leaf)

    outcomes = compactor(spark, lake).compact()
    assert list(outcomes.values()) == ["compacted_8_files"]

    outputs = list(leaf.glob("*.parquet"))
    assert len(outputs) == 1  # few KB in → one target-size file out
    # Output follows the {base}_{32hex}.parquet marker convention.
    import re

    assert re.fullmatch(r"OCP_[0-9a-f]{32}\.parquet", outputs[0].name)
    assert read_ids(leaf) == before  # row multiset preserved


def test_idempotence_second_run_noop(spark, lake):
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(4):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    c = compactor(spark, lake)
    c.compact()
    first = {p.name for p in leaf.glob("*.parquet")}
    outcomes = c.compact()
    assert list(outcomes.values()) == ["nothing_to_compact"]
    assert {p.name for p in leaf.glob("*.parquet")} == first


def test_already_big_file_excluded(spark, lake):
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=02"
    cfg = CompactionConfig(now=NOW, target_file_size_gb=3e-6)  # ~3.2 KB threshold
    for i in range(3):
        write_small_parquet(leaf / f"small-{i}.parquet", start=i * 10, rows=10)
    write_small_parquet(leaf / "big.parquet", start=1000, rows=5000)  # > threshold

    c = LakeCompactor(spark, str(lake), cfg)
    c.compact()
    names = {p.name for p in leaf.glob("*.parquet")}
    assert "big.parquet" in names  # untouched, not merged, not deleted
    assert not any(n.startswith("small-") for n in names)


def test_recompact_only_newest_prior_output(spark, lake):
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=03"
    old_hex, new_hex = "c" * 32, "d" * 32
    write_small_parquet(leaf / f"OCP_{old_hex}.parquet", start=0, mtime=NOW - timedelta(days=20))
    write_small_parquet(leaf / f"OCP_{new_hex}.parquet", start=100, mtime=NOW - timedelta(days=8))
    write_small_parquet(leaf / "new-1.parquet", start=200)
    write_small_parquet(leaf / "new-2.parquet", start=300)

    compactor(spark, lake).compact()
    names = {p.name for p in leaf.glob("*.parquet")}
    # Older compacted output untouched; newest + new files merged into a new one.
    assert f"OCP_{old_hex}.parquet" in names
    assert f"OCP_{new_hex}.parquet" not in names
    assert not any(n.startswith("new-") for n in names)
    merged = [n for n in names if n != f"OCP_{old_hex}.parquet"]
    assert len(merged) == 1
    # Rows from newest prior + new files all present; old output's rows separate.
    assert read_ids(leaf) == sorted(list(range(0, 100)) + list(range(100, 200)) + list(range(200, 300)) + list(range(300, 400)))


def test_fresh_files_held_back(spark, lake):
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=04"
    write_small_parquet(leaf / "f1.parquet", start=0, mtime=NOW - timedelta(days=1))
    write_small_parquet(leaf / "f2.parquet", start=100, mtime=NOW - timedelta(days=2))
    outcomes = compactor(spark, lake).compact()
    assert list(outcomes.values()) == ["nothing_to_compact"]
    assert {p.name for p in leaf.glob("*.parquet")} == {"f1.parquet", "f2.parquet"}


def test_single_file_short_circuit(spark, lake):
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=05"
    write_small_parquet(leaf / "only.parquet")
    outcomes = compactor(spark, lake).compact()
    assert list(outcomes.values()) == ["nothing_to_compact"]
    assert {p.name for p in leaf.glob("*.parquet")} == {"only.parquet"}


def test_skip_current_month_aws(spark, lake):
    leaf = lake / "acct1" / "source=AWS" / "year=2024" / "month=06"
    for i in range(3):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    outcomes = compactor(spark, lake).compact()
    assert list(outcomes.values()) == ["skipped_current_month"]
    assert len(list(leaf.glob("*.parquet"))) == 3


def test_gcp_per_date_grouping(spark, lake):
    leaf = lake / "acct1" / "source=GCP" / "year=2024" / "month=01"
    for d, date in enumerate(["2024-01-10", "2024-01-11"]):
        for i in range(3):
            write_small_parquet(
                leaf / f"202401_{date}_{d}{i}x.parquet", start=(d * 3 + i) * 100
            )
    before = read_ids(leaf)

    outcomes = compactor(spark, lake).compact()
    assert list(outcomes.values()) == ["compacted_6_files"]
    names = sorted(p.name for p in leaf.glob("*.parquet"))
    assert len(names) == 2  # one output per date
    import re

    for date in ["2024-01-10", "2024-01-11"]:
        assert any(
            re.fullmatch(rf"202401_{date}_[0-9a-f]{{32}}\.parquet", n) for n in names
        )
    assert read_ids(leaf) == before


def test_gcp_recompaction_is_idempotent(spark, lake):
    """Prior {invoice_month}_{date}_<32hex> outputs are recognized, so a
    steady-state GCP leaf is a no-op — an idempotence extension over the
    reference, which re-merges GCP outputs on every run."""
    leaf = lake / "acct1" / "source=GCP" / "year=2024" / "month=01"
    for d, date in enumerate(["2024-01-10", "2024-01-11"]):
        for i in range(3):
            write_small_parquet(
                leaf / f"202401_{date}_{d}{i}x.parquet", start=(d * 3 + i) * 100
            )
    compactor(spark, lake).compact()
    after_first = sorted(p.name for p in leaf.glob("*.parquet"))
    # Aged outputs (past hold-back) must still be treated as compacted.
    for p in leaf.glob("*.parquet"):
        ts = OLD.timestamp()
        os.utime(p, (ts, ts))

    outcomes = compactor(spark, lake).compact()
    assert list(outcomes.values()) == ["nothing_to_compact"]
    assert sorted(p.name for p in leaf.glob("*.parquet")) == after_first


def test_gcp_incremental_merges_new_files_with_dates_prior(spark, lake):
    """New files for one date re-merge with that date's newest prior
    output only; the other date's output is left untouched."""
    leaf = lake / "acct1" / "source=GCP" / "year=2024" / "month=01"
    for d, date in enumerate(["2024-01-10", "2024-01-11"]):
        for i in range(3):
            write_small_parquet(
                leaf / f"202401_{date}_{d}{i}x.parquet", start=(d * 3 + i) * 100
            )
    compactor(spark, lake).compact()
    before = read_ids(leaf)
    for p in leaf.glob("*.parquet"):
        ts = OLD.timestamp()
        os.utime(p, (ts, ts))
    untouched = next(p.name for p in leaf.glob("202401_2024-01-11_*.parquet"))

    write_small_parquet(leaf / "202401_2024-01-10_late0.parquet", start=900)
    outcomes = compactor(spark, lake).compact()
    assert list(outcomes.values()) == ["compacted_2_files"]
    names = sorted(p.name for p in leaf.glob("*.parquet"))
    assert untouched in names  # 01-11 output not rewritten
    assert len(names) == 2
    assert read_ids(leaf) == sorted(before + list(range(900, 1000)))


def test_partial_rename_failure_cleans_merged_outputs(spark, lake):
    """If renaming merged parts fails mid-loop, the already-renamed
    outputs must be deleted so the kept originals are not duplicated."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=02"
    for i in range(6):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    before = read_ids(leaf)

    # Tiny target size forces multiple output files so the rename loop
    # has a mid-point to fail at.
    c = LakeCompactor(spark, str(lake), CompactionConfig(now=NOW, target_file_size_gb=2e-6))
    real_rename = c.fs.rename
    calls = {"n": 0}

    def flaky_rename(src, dst):
        calls["n"] += 1
        if calls["n"] >= 2:
            return False
        return real_rename(src, dst)

    c.fs.rename = flaky_rename
    outcomes = c.compact()
    assert list(outcomes.values()) == ["merge_failed_originals_kept"]
    assert calls["n"] >= 2
    # Only the originals remain — no partial merged output left behind.
    assert sorted(p.name for p in leaf.glob("*.parquet")) == [
        f"in-{i}.parquet" for i in range(6)
    ]
    assert read_ids(leaf) == before


def test_write_failure_keeps_originals(spark, lake):
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=07"
    for i in range(2):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    corrupt = leaf / "in-corrupt.parquet"
    corrupt.write_bytes(b"this is not parquet")
    ts = OLD.timestamp()
    os.utime(corrupt, (ts, ts))

    outcomes = compactor(spark, lake).compact()
    assert list(outcomes.values()) == ["merge_failed_originals_kept"]
    assert {p.name for p in leaf.glob("*.parquet")} == {
        "in-0.parquet",
        "in-1.parquet",
        "in-corrupt.parquet",
    }


def test_schema_evolution_merge(spark, lake):
    """With merge_schema=True, files whose schemas evolved (added column)
    merge by name; missing values become nulls. (The reference assumes
    compatibility and would produce whatever pyarrow does — we make the
    choice explicit and tested.)"""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=08"
    write_small_parquet(leaf / "old-schema.parquet", start=0, rows=10)
    # New-schema file: extra column.
    path = leaf / "new-schema.parquet"
    table = pa.table(
        {
            "id": list(range(100, 110)),
            "val": [float(i) for i in range(10)],
            "extra": ["x"] * 10,
        }
    )
    pq.write_table(table, path)
    ts = OLD.timestamp()
    os.utime(path, (ts, ts))

    cfg = CompactionConfig(now=NOW, merge_schema=True)
    outcomes = LakeCompactor(spark, str(lake), cfg).compact()
    assert list(outcomes.values()) == ["compacted_2_files"]
    merged = pq.read_table(next(leaf.glob("OCP_*.parquet")))
    assert set(merged.column_names) == {"id", "val", "extra"}
    extras = merged.column("extra").to_pylist()
    assert extras.count(None) == 10 and extras.count("x") == 10


def test_base_name_fallback_no_source_segment(spark, lake):
    leaf = lake / "acct1" / "raw"
    for i in range(2):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    compactor(spark, lake).compact()
    outputs = [p.name for p in leaf.glob("*.parquet")]
    import re

    assert len(outputs) == 1 and re.fullmatch(r"data_[0-9a-f]{32}\.parquet", outputs[0])


def test_compaction_with_clustering_produces_disjoint_files(spark, lake):
    """cluster_by on CompactionConfig range-sorts the merged output so
    each file covers a disjoint id range (data-skipping layout)."""
    from tests.test_sources import _file_ranges

    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=03"
    for i in range(6):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    before = read_ids(leaf)

    cfg = CompactionConfig(now=NOW, target_file_size_gb=2e-6, cluster_by=("id",))
    outcomes = LakeCompactor(spark, str(lake), cfg).compact()
    assert list(outcomes.values()) == ["compacted_6_files"]
    assert read_ids(leaf) == before
    ranges = _file_ranges(leaf, "id")
    assert len(ranges) >= 2
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next


def test_compaction_with_zorder_layout(spark, lake):
    """zorder_by merges through the Morton-key path: rows and idempotence
    preserved end-to-end (the multi-column stats-tightening proof lives in
    tests/test_sources.py::test_zorder_tightens_all_clustered_columns)."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=03"
    for i in range(8):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    before = read_ids(leaf)

    cfg = CompactionConfig(now=NOW, zorder_by=("id", "val"))
    c = LakeCompactor(spark, str(lake), cfg)
    outcomes = c.compact()
    assert list(outcomes.values()) == ["compacted_8_files"]
    assert read_ids(leaf) == before  # row multiset preserved
    # Second run: outputs recognized as prior compactions -> no-op.
    assert list(c.compact().values()) == ["nothing_to_compact"]


def test_lake_report_ranks_leaves_by_reclaimable_files(spark, lake):
    """The metadata-only report: a leaf of many small files shows a high
    small_file_ratio and a positive reclaimable count; after compaction
    the same leaf reports nothing reclaimable. No data files are read —
    only the listing feeds the report."""
    from parquet_compactor_spark.compactor import lake_report

    messy = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(6):
        write_small_parquet(messy / f"in-{i}.parquet", start=i * 100)

    rep = {r.leaf: r for r in lake_report(spark, str(lake)).collect()}
    (leaf_stats,) = rep.values()
    assert leaf_stats.n_files == 6
    assert leaf_stats.small_files == 6
    assert leaf_stats.small_file_ratio == 1.0
    assert leaf_stats.ideal_files == 1  # few KB -> one target-size file
    assert leaf_stats.reclaimable_files == 5

    compactor(spark, lake).compact()
    rep2 = {r.leaf: r for r in lake_report(spark, str(lake)).collect()}
    (after,) = rep2.values()
    assert after.n_files == 1
    assert after.reclaimable_files == 0


def test_lake_report_empty_root_schema_matches_nonempty(spark, tmp_path, lake):
    """The empty-root branch must return the SAME schema as the non-empty
    branch (int vs bigint drift breaks unions of per-root reports;
    nullability flags are reconciled by union and may differ)."""
    from parquet_compactor_spark.compactor import lake_report

    df = lake_report(spark, str(tmp_path / "nothing"))
    assert df.count() == 0
    write_small_parquet(lake / "a" / "source=OCP" / "in-0.parquet")
    nonempty = lake_report(spark, str(lake))
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in nonempty.schema.fields
    ]


def test_lake_report_ignores_non_parquet_sidecars(spark, lake):
    """_SUCCESS / .crc sidecars on Spark-written leaves are not merge
    inputs and must not count as (small) files."""
    from parquet_compactor_spark.compactor import lake_report

    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(3):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    (leaf / "_SUCCESS").write_text("")
    (leaf / ".in-0.parquet.crc").write_bytes(b"x" * 8)

    (stats,) = lake_report(spark, str(lake)).collect()
    assert stats.n_files == 3
    assert stats.small_files == 3


def test_compact_processes_worst_leaf_first(spark, lake):
    """Interrupted or time-budgeted runs must reclaim the most files per
    unit of work: the leaf with the most merge candidates compacts first
    (path order breaks ties deterministically)."""
    small = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    big = lake / "acct2" / "source=OCP" / "year=2024" / "month=01"
    for i in range(2):
        write_small_parquet(small / f"in-{i}.parquet", start=i * 100)
    for i in range(6):
        write_small_parquet(big / f"in-{i}.parquet", start=i * 100)

    outcomes = compactor(spark, lake).compact()
    first, second = list(outcomes)
    assert "acct2" in first and "acct1" in second
    assert sorted(outcomes.values()) == [
        "compacted_2_files",
        "compacted_6_files",
    ]


def test_merge_child_session_inherits_runtime_confs(spark, lake):
    """The shuffle-free merge re-reads the leaf through spark.newSession();
    a fresh session does NOT inherit the caller's *runtime* SQL confs, so a
    leaf that reads differently under a caller-set conf (here:
    spark.sql.parquet.binaryAsString promoting binary->string) would be
    merged under the DEFAULT semantics and silently write the wrong
    schema. The merge must copy the parent's runtime confs into the child.
    (Builder-level confs like session.py's nanosAsLong are already in the
    shared SparkConf and inherit for free; only runtime sets are at risk.)
    """
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    leaf.mkdir(parents=True, exist_ok=True)
    for i in range(4):
        table = pa.table(
            {
                "id": list(range(i * 10, i * 10 + 10)),
                "payload": pa.array([b"blob-%d" % j for j in range(10)]),
            }
        )
        path = leaf / f"in-{i}.parquet"
        pq.write_table(table, path, store_schema=False)
        t = OLD.timestamp()
        os.utime(path, (t, t))

    spark.conf.set("spark.sql.parquet.binaryAsString", "true")
    try:
        outcomes = compactor(spark, lake).compact()
    finally:
        spark.conf.unset("spark.sql.parquet.binaryAsString")
    assert list(outcomes.values()) == ["compacted_4_files"]
    outputs = list(leaf.glob("*.parquet"))
    assert len(outputs) == 1
    merged = pq.read_table(outputs[0])
    # Written under the parent's semantics: payload is string, not binary.
    assert pa.types.is_string(merged.schema.field("payload").type) or pa.types.is_large_string(
        merged.schema.field("payload").type
    ), merged.schema
    assert sorted(merged.column("id").to_pylist()) == list(range(40))


def test_compact_ignores_hidden_and_sidecar_files(spark, lake):
    """Planning must only consider files a parquet merge can READ:
    _SUCCESS / .crc sidecars and _/.-hidden parquet files are skipped by
    spark.read.parquet, so treating them as candidates either fails the
    merge or deletes a file whose rows were never merged."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(4):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    (leaf / "_SUCCESS").write_text("")
    # Hidden dotfile sidecar; named after no data file so Hadoop's
    # ChecksumFileSystem never tries to validate a real read against it.
    (leaf / ".orphan.crc").write_bytes(b"x" * 8)
    write_small_parquet(leaf / "_hidden.parquet", start=9000)
    old = OLD.timestamp()
    for f in leaf.iterdir():
        os.utime(f, (old, old))

    outcomes = compactor(spark, lake).compact()
    assert list(outcomes.values()) == ["compacted_4_files"]
    # Sidecars and the hidden parquet file survive untouched; the merged
    # output carries exactly the 4 readable files' rows.
    assert (leaf / "_SUCCESS").exists()
    assert (leaf / ".orphan.crc").exists()
    assert (leaf / "_hidden.parquet").exists()
    visible = [p for p in leaf.glob("*.parquet") if not p.name.startswith("_")]
    assert len(visible) == 1
    assert sorted(pq.read_table(visible[0]).column("id").to_pylist()) == list(range(400))


def test_distributed_listing_decodes_uri_escapes(spark, tmp_path):
    """binaryFile returns URI-encoded paths (space -> %20); the Hadoop
    Path APIs (rename/delete/read) treat %xx literally. The distributed
    listing must decode so both modes name the same file (ADVICE r4)."""
    from parquet_compactor_spark.compactor.fs import HadoopFS

    d = tmp_path / "odd names"
    d.mkdir()
    write_small_parquet(d / "with space.parquet", start=0, rows=5)
    fs = HadoopFS(spark, str(tmp_path))
    iter_paths = {f.path for f in fs.list_files(str(tmp_path))}
    dist_paths = {f.path for f in fs.list_files(str(tmp_path), distributed=True)}
    assert iter_paths == dist_paths
    (path,) = dist_paths
    assert "%20" not in path and "with space.parquet" in path
    # The decoded path round-trips through the Hadoop Path API.
    assert fs.exists(path)


def test_distributed_listing_preserves_literal_percent(spark, tmp_path):
    """A file literally named with %xx must still resolve after decode —
    pin the trade-off: %-literal names are decoded too, so both modes
    must agree on the same (decoded) spelling or neither."""
    from parquet_compactor_spark.compactor.fs import _decode_uri_path

    assert _decode_uri_path("file:/a/b%20c.parquet") == "file:/a/b c.parquet"
    assert _decode_uri_path("/plain/no scheme.parquet") == "/plain/no scheme.parquet"
    # Authority (host:port) is never decoded.
    assert (
        _decode_uri_path("s3a://bucket/k%2By.parquet") == "s3a://bucket/k+y.parquet"
    )


def test_driver_mem_respects_cgroup_limit(tmp_path, monkeypatch):
    """Inside a memory-limited container on a big host, the heap must be
    sized from the cgroup limit, not host RAM (ADVICE r4)."""
    import parquet_compactor_spark.session as sess

    limit_file = tmp_path / "memory.max"
    limit_file.write_text(str(4 * 1024**3))  # 4 GiB container
    monkeypatch.setattr(sess, "_CGROUP_PATHS", (str(limit_file),))
    assert sess._default_driver_mem() == "2g"  # half of 4 GiB, not host/2

    limit_file.write_text("max")  # v2 unlimited → fall back to sysconf
    host_half = sess._default_driver_mem()
    assert host_half.endswith("g") and int(host_half[:-1]) >= 1

    limit_file.write_text(str(1 << 62))  # v1 "unlimited" sentinel
    assert sess._default_driver_mem() == host_half


def test_failed_delete_surfaced_in_outcome(spark, lake, capsys):
    """A delete returning False leaves an original whose rows duplicate
    on every scan — it must be logged and visible in the leaf outcome."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(4):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    c = compactor(spark, lake)
    real_delete = c.fs.delete

    def flaky_delete(path, recursive=False):
        if path.endswith("in-0.parquet"):
            return False  # simulate object-store delete refusal
        return real_delete(path, recursive)

    c.fs.delete = flaky_delete
    outcomes = c.compact()
    assert list(outcomes.values()) == ["compacted_4_files_1_deletes_failed"]
    assert "in-0.parquet" in capsys.readouterr().out
    assert (leaf / "in-0.parquet").exists()


# --------------------------------------------------------------------------
# Direct (object-store) commit mode
# --------------------------------------------------------------------------


def test_direct_commit_merges_without_renaming_data_files(spark, lake):
    """direct_commit writes merged output once under a job-unique
    ``merged-<hex>-*`` basename and never renames a data file — the
    zero-copy commit for s3a, where a rename is a server-side COPY of
    every byte. The unique basename positively identifies this job's
    outputs, so a concurrent upstream part-file can never be mistaken
    for one (it lands in neither the manifest nor the delete list)."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(8):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    before = read_ids(leaf)

    c = LakeCompactor(spark, str(lake), CompactionConfig(now=NOW, direct_commit=True))
    renames = []
    real_rename = c.fs.rename
    c.fs.rename = lambda src, dst: (renames.append((src, dst)), real_rename(src, dst))[1]

    outcomes = c.compact()
    assert list(outcomes.values()) == ["compacted_8_files"]
    # Zero engine-side renames of parquet data files (the manifest
    # sidecar's atomic tmp+rename is metadata, not data).
    assert not [r for r in renames if r[0].endswith(".parquet")]

    outputs = [p for p in leaf.glob("*.parquet") if not p.name.startswith("_")]
    assert len(outputs) == 1
    assert outputs[0].name.startswith("merged-")
    assert read_ids(leaf) == before  # row multiset preserved
    # Manifest records exactly the committed outputs.
    manifest = (leaf / "_compacted.manifest").read_text().splitlines()
    assert manifest == [outputs[0].name]


def test_direct_commit_idempotent_second_run(spark, lake):
    """Direct-commit outputs must be recognized as prior compactions via
    the manifest — NOT via name patterns (upstream producers may write
    arbitrary names, including Spark part-names)."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(4):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    cfg = CompactionConfig(now=NOW, direct_commit=True)
    c = LakeCompactor(spark, str(lake), cfg)
    c.compact()
    first = {p.name for p in leaf.glob("*.parquet")}
    outcomes = c.compact()
    assert list(outcomes.values()) == ["nothing_to_compact"]
    assert {p.name for p in leaf.glob("*.parquet")} == first


def test_direct_commit_incremental_new_files_merge_with_newest_prior(spark, lake):
    """New (old-enough) files re-merge together with the newest manifest
    output; the merged-away prior is deleted and pruned from the manifest."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(4):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    cfg = CompactionConfig(now=NOW, direct_commit=True)
    c = LakeCompactor(spark, str(lake), cfg)
    c.compact()
    (prior,) = [p for p in leaf.glob("merged-*.parquet")]
    # age the prior output past the hold-back window (it is manifest-
    # recognized, so age only matters for new files; set anyway for realism)
    old = OLD.timestamp()
    os.utime(prior, (old, old))
    write_small_parquet(leaf / "late-0.parquet", start=9000)

    outcomes = c.compact()
    assert list(outcomes.values()) == ["compacted_2_files"]
    assert not prior.exists()  # newest prior was re-merged and deleted
    outputs = [p for p in leaf.glob("merged-*.parquet")]
    assert len(outputs) == 1
    assert read_ids(leaf) == sorted(list(range(400)) + list(range(9000, 9100)))
    manifest = (leaf / "_compacted.manifest").read_text().splitlines()
    assert manifest == [outputs[0].name]


def test_direct_commit_upstream_part_files_are_still_merged(spark, lake):
    """An upstream producer writing part-*.parquet names must NOT be
    mistaken for prior compaction output — only manifest entries are."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=02"
    write_small_parquet(leaf / "part-00000-deadbeef-c000.snappy.parquet", start=0)
    write_small_parquet(leaf / "part-00001-deadbeef-c000.snappy.parquet", start=100)
    cfg = CompactionConfig(now=NOW, direct_commit=True)
    outcomes = LakeCompactor(spark, str(lake), cfg).compact()
    assert list(outcomes.values()) == ["compacted_2_files"]
    names = {p.name for p in leaf.glob("*.parquet")}
    assert "part-00000-deadbeef-c000.snappy.parquet" not in names
    assert read_ids(leaf) == sorted(list(range(100)) + list(range(100, 200)))


def test_direct_commit_gcp_leaf_falls_back_to_rename_convention(spark, lake):
    """GCP leaves keep the {invoice_month}_{date}_{uuid} rename commit —
    their filename micro-schema cannot be expressed in part-names."""
    import re

    leaf = lake / "acct1" / "GCP" / "source=gcp1" / "year=2024" / "month=03"
    for i in range(2):
        write_small_parquet(leaf / f"202403_2024-03-10_{i}x.parquet", start=i * 100)
    cfg = CompactionConfig(now=NOW, direct_commit=True)
    outcomes = LakeCompactor(spark, str(lake), cfg).compact()
    assert list(outcomes.values()) == ["compacted_2_files"]
    (out,) = [p for p in leaf.glob("*.parquet")]
    assert re.fullmatch(r"202403_2024-03-10_[0-9a-f]{32}\.parquet", out.name)


def test_object_store_confs_bind_magic_committer():
    """The direct-commit companion confs bind the S3A magic committer and
    the cloud commit protocol (zero-copy task commit on object stores)."""
    from parquet_compactor_spark.session import object_store_confs

    confs = object_store_confs()
    assert confs["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert "PathOutputCommitProtocol" in confs["spark.sql.sources.commitProtocolClass"]
    assert "S3ACommitterFactory" in confs[
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a"
    ]


def test_orphan_tmp_dir_never_planned_and_gc_is_age_gated(spark, lake):
    """A hard crash (OOM-kill) skips _write_merged's finally-cleanup and
    strands a ``{leaf}_compact_tmp_<hex>`` dir. Planning must never treat
    it as a data leaf (its part-files would be compacted as data), and
    the GC sweep must reclaim only STALE orphans — a dir whose newest
    file is recent belongs to a concurrently-running merge."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(4):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    before = read_ids(leaf)

    # The REAL orphan location: leaf paths end with "/", so the tmp dir
    # _write_merged creates is a hidden CHILD of the leaf named
    # `_compact_tmp_<hex>` — reproduce exactly what a killed merge leaves.
    stale_tmp = leaf / ("_compact_tmp_" + "a" * 32)
    fresh_tmp = leaf / ("_compact_tmp_" + "b" * 32)
    write_small_parquet(stale_tmp / "part-0.parquet", start=9000, mtime=OLD)
    write_small_parquet(
        fresh_tmp / "part-0.parquet", start=9500, mtime=NOW - timedelta(hours=1)
    )
    # Age the DIRECTORIES too: the sweep takes max(dir mtime, file
    # mtimes) — a live merge bumps its dir mtime with every added file,
    # and a genuinely-crashed run's dir is as old as its files.
    os.utime(stale_tmp, (OLD.timestamp(), OLD.timestamp()))
    fresh_ts = (NOW - timedelta(hours=1)).timestamp()
    os.utime(fresh_tmp, (fresh_ts, fresh_ts))

    comp = compactor(spark, lake)
    # Planning: the tmp dirs are invisible — exactly one real leaf
    # (candidate keys are FS URIs; compare on the path suffix).
    leaves = set(comp.candidate_leaves())
    assert {lf.split(":", 1)[-1] for lf in leaves} == {str(leaf) + "/"}

    outcomes = comp.compact()
    assert list(outcomes.values()) == ["compacted_4_files"]
    # The stale orphan (10 days old) was reclaimed; the fresh one (1 h,
    # under the 24 h gate) survived for its still-running owner.
    assert not stale_tmp.exists()
    assert fresh_tmp.exists()
    # The real leaf's data was never contaminated by tmp part-files.
    assert read_ids(leaf) == before


def test_gc_orphan_tmp_can_be_disabled(spark, lake):
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    write_small_parquet(leaf / "in-0.parquet")
    stale_tmp = leaf / ("_compact_tmp_" + "c" * 32)
    write_small_parquet(stale_tmp / "part-0.parquet", start=9000, mtime=OLD)
    os.utime(stale_tmp, (OLD.timestamp(), OLD.timestamp()))

    cfg = CompactionConfig(now=NOW, gc_orphan_tmp_hours=None)
    LakeCompactor(spark, str(lake), cfg).compact()
    assert stale_tmp.exists()


def test_gc_deep_sweep_reaches_dataless_leaves(spark, lake):
    """gc_orphan_tmp_dirs(leaves=None) walks the lake with the hidden-
    inclusive iterator listing, so it reclaims an orphan in a leaf whose
    visible data files were deleted after the crash — a leaf planning no
    longer returns."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    orphan = leaf / ("_compact_tmp_" + "d" * 32)
    write_small_parquet(orphan / "part-0.parquet", start=9000, mtime=OLD)
    os.utime(orphan, (OLD.timestamp(), OLD.timestamp()))
    # No visible data files in the leaf at all.
    comp = compactor(spark, lake)
    assert comp.candidate_leaves() == {}  # planning can't see it
    deleted, failed = comp.gc_orphan_tmp_dirs(24.0)  # deep sweep
    assert len(deleted) == 1 and not failed
    assert not orphan.exists()


def test_failed_delete_quarantined_never_remerged_then_healed(spark, lake):
    """A merged-away original whose delete fails must NEVER re-enter a
    merge (its rows are already in the committed output — re-merging
    would bake the duplication in permanently). It is recorded in the
    pending-deletes sidecar, excluded from subsequent merges, retried
    each pass, and the sidecar clears once the delete finally works."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(4):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    original_ids = read_ids(leaf)

    c = compactor(spark, lake)
    blocked = {"active": True}
    real_delete = c.fs.delete

    def flaky_delete(path, recursive=False):
        if blocked["active"] and path.endswith("in-0.parquet"):
            return False
        return real_delete(path, recursive)

    c.fs.delete = flaky_delete

    outcomes = c.compact()
    assert list(outcomes.values()) == ["compacted_4_files_1_deletes_failed"]
    sidecar = leaf / "_pending_deletes.manifest"
    assert sidecar.read_text().splitlines() == ["in-0.parquet"]
    # Duplication is live (leftover + output) until remediated.
    assert read_ids(leaf) == sorted(original_ids + list(range(100)))

    # A new file arrives; delete still broken. The pass retries (fails),
    # EXCLUDES in-0 from the merge, and merges prior output + new file.
    write_small_parquet(leaf / "late-0.parquet", start=9000)
    outcomes = c.compact()
    assert list(outcomes.values()) == ["compacted_2_files_1_deletes_pending"]
    assert sidecar.read_text().splitlines() == ["in-0.parquet"]
    # Still duplicated exactly ONCE — the re-merge did not amplify it.
    assert read_ids(leaf) == sorted(
        original_ids + list(range(100)) + list(range(9000, 9100))
    )

    # Delete starts working: the next pass heals and clears the sidecar.
    blocked["active"] = False
    outcomes = c.compact()
    assert list(outcomes.values()) == ["nothing_to_compact"]
    assert not sidecar.exists()
    assert read_ids(leaf) == sorted(original_ids + list(range(9000, 9100)))


def test_gc_reclaims_stale_committer_temporary_litter(spark, lake):
    """A crashed direct-commit merge leaves {leaf}/_temporary/... —
    the sweep reclaims it once stale, same age gate as _compact_tmp."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    write_small_parquet(leaf / "in-0.parquet")
    litter = leaf / "_temporary" / "0" / "_temporary" / "attempt_x"
    write_small_parquet(litter / "part-0.parquet", start=5000, mtime=OLD)
    for d in (litter, litter.parent, litter.parent.parent, leaf / "_temporary"):
        os.utime(d, (OLD.timestamp(), OLD.timestamp()))

    comp = compactor(spark, lake)
    deleted, failed = comp.gc_orphan_tmp_dirs(24.0, leaves=[str(leaf) + "/"])
    assert len(deleted) == 1 and not failed
    assert not (leaf / "_temporary").exists()


def test_gc_deep_sweep_reclaims_empty_orphan_dir(spark, lake):
    """Crash after mkdir but before any part file: the dir is empty, so
    no file listing can find it — the deep sweep's dir walk must."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    write_small_parquet(leaf / "in-0.parquet")
    empty_orphan = leaf / ("_compact_tmp_" + "f" * 32)
    empty_orphan.mkdir(parents=True)
    os.utime(empty_orphan, (OLD.timestamp(), OLD.timestamp()))

    deleted, failed = compactor(spark, lake).gc_orphan_tmp_dirs(24.0)
    assert deleted and not failed and not empty_orphan.exists()


def test_direct_commit_manifest_prunes_stale_entries(spark, lake):
    """Manifest lines whose files no longer exist (retry-deleted on a
    later pass, or removed out-of-band) are pruned — the sidecar must
    not grow one stale line per event forever."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(3):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    cfg = CompactionConfig(now=NOW, direct_commit=True)
    c = LakeCompactor(spark, str(lake), cfg)
    c.compact()
    manifest_path = leaf / "_compacted.manifest"
    (real_entry,) = manifest_path.read_text().splitlines()
    # Inject a stale line for a file that does not exist — through the
    # compactor's own writer (a raw pathlib write would orphan the
    # Hadoop checksum sidecar and fail the next read).
    leaf_uri = str(leaf) + "/"
    c._write_manifest(
        leaf_uri, {real_entry, f"ghost-{'0' * 32}-c000.snappy.parquet"}
    )
    c.compact()
    assert c._read_manifest(leaf_uri) == {real_entry}


def test_manifest_prune_keeps_live_above_target_output(spark, lake):
    """Manifest pruning must compute liveness from an UNFILTERED leaf
    listing: a prior merged output at/above the size target is dropped
    from the candidate list by candidate_leaves (O3) but is still LIVE —
    pruning its manifest entry would strip the prior-compaction marker
    and re-merge it (churn) if file_size_bytes is later raised."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(4):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    cfg = CompactionConfig(now=NOW, direct_commit=True)
    LakeCompactor(spark, str(lake), cfg).compact()
    (prior,) = leaf.glob("merged-*.parquet")
    os.utime(prior, (OLD.timestamp(), OLD.timestamp()))
    # Two fresh tiny files; a target at exactly the prior's size excludes
    # the prior from candidates (strict <) while keeping the tiny files.
    write_small_parquet(leaf / "late-0.parquet", start=9000, rows=5)
    write_small_parquet(leaf / "late-1.parquet", start=9100, rows=5)
    assert (leaf / "late-0.parquet").stat().st_size < prior.stat().st_size
    small_cfg = CompactionConfig(
        now=NOW,
        direct_commit=True,
        target_file_size_gb=prior.stat().st_size / 2**30,
    )
    outcomes = LakeCompactor(spark, str(lake), small_cfg).compact()
    assert list(outcomes.values()) == ["compacted_2_files"]
    assert prior.exists()
    manifest = set((leaf / "_compacted.manifest").read_text().splitlines())
    outputs = {p.name for p in leaf.glob("merged-*.parquet")}
    assert prior.name in manifest  # the above-target output stays marked
    assert manifest == outputs


def test_in_pass_gc_reclaim_failure_reaches_outcomes(spark, lake):
    """A failed orphan-tmp reclaim during a normal compact() pass must
    surface in the pass outcomes (and through them main()'s non-zero
    exit), not just stdout — previously only the standalone ``gc``
    subcommand honored the alerting contract."""
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(3):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    orphan = leaf / ("_compact_tmp_" + "9" * 32)
    write_small_parquet(orphan / "part-0.parquet", start=0, mtime=OLD)
    os.utime(orphan, (OLD.timestamp(), OLD.timestamp()))

    c = compactor(spark, lake)
    real_delete = c.fs.delete

    def flaky_delete(path, recursive=False):
        if orphan.name in path:
            return False  # emulate an object-store delete denial
        return real_delete(path, recursive=recursive)

    c.fs.delete = flaky_delete
    outcomes = c.compact()
    assert outcomes.pop("__gc_orphan_tmp__") == "gc_1_reclaim_failed"
    assert list(outcomes.values()) == ["compacted_3_files"]
    assert orphan.exists()  # the litter is still there — hence the alert


# --------------------------------------------------------------------------
# Lake integrity audit (read-only)
# --------------------------------------------------------------------------


def test_audit_clean_lake_reports_nothing(spark, lake):
    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(4):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    c = compactor(spark, lake)
    c.compact()
    report = c.audit()
    summary = report.pop("__summary__")
    assert report == {}  # no findings on a healthy just-compacted lake
    assert summary["leaves_with_findings"] == 0
    assert summary["leaves"] == 1 and summary["files"] >= 1


def test_audit_flags_drift_and_mutates_nothing(spark, lake):
    import os

    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(4):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    c = compactor(spark, lake)
    c.compact()

    # Plant all three drift classes:
    # 1. a manifest that records a committed output that is gone;
    (leaf / "_compacted.manifest").write_text(
        "merged-" + "a" * 32 + "-part-00000.parquet\n"
    )
    # 2. a pending-delete entry whose file is still present (duplicate
    #    rows live until the retry delete succeeds);
    write_small_parquet(leaf / "stale-original.parquet", start=900)
    (leaf / "_pending_deletes.manifest").write_text("stale-original.parquet\n")
    # 3. crash-orphaned merge temp litter.
    orphan = leaf / ("_compact_tmp_" + "b" * 32)
    orphan.mkdir()
    (orphan / "part-00000.parquet").write_bytes(b"junk")

    before = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(lake)
        for f in fs
    )
    report = c.audit()
    after = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(lake)
        for f in fs
    )
    assert after == before  # READ-ONLY: the audit never touches the lake

    (finding,) = [v for k, v in report.items() if k != "__summary__"]
    assert finding["manifest_missing"] == [
        "merged-" + "a" * 32 + "-part-00000.parquet"
    ]
    assert finding["pending_present"] == ["stale-original.parquet"]
    assert len(finding["orphan_tmp_dirs"]) == 1
    assert ("_compact_tmp_" + "b" * 32) in finding["orphan_tmp_dirs"][0]
    assert report["__summary__"]["leaves_with_findings"] == 1


def test_audit_cli_exit_codes(spark, lake, monkeypatch, capsys):
    import json as _json

    from parquet_compactor_spark import app

    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(2):
        write_small_parquet(leaf / f"in-{i}.parquet", start=i * 100)
    compactor(spark, lake).compact()
    monkeypatch.setenv("LAKE_ROOT", str(lake))
    assert app.main(["audit"]) == 0
    # Plant one drift class -> non-zero exit (the alerting contract).
    (leaf / "_compacted.manifest").write_text("gone.parquet\n")
    assert app.main(["audit"]) == 1
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = _json.loads(out)
    assert payload["report"]["__summary__"]["leaves_with_findings"] == 1


# --------------------------------------------------------------------------
# Row-group-level audit (distributed footer scan)
# --------------------------------------------------------------------------


def test_scan_parquet_footers_matches_duckdb_metadata(spark):
    """Differential: the distributed pyarrow footer map must agree with
    DuckDB's parquet_metadata() (an independent footer reader) on every
    row group of the sf0.001 fixture — rows, uncompressed bytes
    (footer total_byte_size == DuckDB row_group_bytes), summed
    column-chunk compressed bytes, and column count."""
    import glob

    import duckdb

    from parquet_compactor_spark.compactor import scan_parquet_footers

    paths = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))
    assert len(paths) >= 10
    got = {
        (r.path, r.row_group_id): (
            r.n_rows,
            r.compressed_bytes,
            r.uncompressed_bytes,
            r.n_columns,
            r.error,
        )
        for r in scan_parquet_footers(spark, paths).collect()
    }
    con = duckdb.connect()
    want = {
        (f, rid): (nr, comp, unc, nc, None)
        for f, rid, nr, comp, unc, nc in con.execute(
            """
            SELECT file_name, row_group_id,
                   any_value(row_group_num_rows),
                   sum(total_compressed_size)::BIGINT,
                   any_value(row_group_bytes),
                   any_value(row_group_num_columns)
            FROM parquet_metadata('/root/testdata/sf0.001/*.parquet')
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    con.close()
    assert got == want


def test_scan_parquet_footers_degrades_row_wise(spark, tmp_path):
    """A corrupt file and an unreadable scheme each yield ONE loud error
    row (row_group_id -1) while healthy files in the same batch still
    resolve — an audit over 100k files must never die on one of them."""
    from parquet_compactor_spark.compactor import scan_parquet_footers

    good = tmp_path / "good.parquet"
    write_small_parquet(good, rows=50)
    corrupt = tmp_path / "corrupt.parquet"
    corrupt.write_bytes(b"not a parquet file at all PAR1?")
    remote = "s3a://bucket/key.parquet"

    rows = {
        r.path: r
        for r in scan_parquet_footers(
            spark, [str(good), str(corrupt), remote]
        ).collect()
    }
    assert rows[str(good)].error is None and rows[str(good)].n_rows == 50
    assert rows[str(corrupt)].row_group_id == -1
    assert rows[str(corrupt)].error  # pyarrow exception text
    assert rows[remote].error.startswith("unsupported filesystem scheme")


def test_rowgroup_report_flags_tiny_rowgroups(spark, lake):
    """The pathology lake_report cannot see: one right-sized file built
    of tiny row groups is flagged; a healthy single-group file is not.
    The report reads footers only (a corrupt data page would not even be
    noticed — metadata-level audit by design)."""
    from parquet_compactor_spark.compactor import rowgroup_report

    tiny = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    tiny.mkdir(parents=True, exist_ok=True)
    table = pa.table({"id": list(range(1000)), "val": [0.0] * 1000})
    pq.write_table(table, tiny / "in-0.parquet", row_group_size=100)

    healthy = lake / "acct1" / "source=GCP" / "year=2024" / "month=01"
    write_small_parquet(healthy / "in-0.parquet", rows=1000)

    rep = {
        r.leaf.rstrip("/").rsplit("/", 3)[-3]: r
        for r in rowgroup_report(
            spark, str(lake), min_rowgroup_rows=500
        ).collect()
    }
    bad = rep["source=OCP"]
    assert bad.n_files == 1 and bad.n_row_groups == 10
    assert bad.tiny_row_groups == 10 and bad.files_with_tiny_rgs == 1
    assert bad.tiny_rg_ratio == 1.0 and bad.avg_rg_rows == 100
    ok = rep["source=GCP"]
    assert ok.n_row_groups == 1 and ok.tiny_row_groups == 0
    assert ok.n_rows == 1000 and ok.error_files == 0


def test_scan_parquet_schemas_fingerprints_and_degrades(spark, tmp_path):
    """Same-schema files share a fingerprint, any column or type change
    breaks it, and corrupt/foreign-scheme files degrade to loud error
    rows — the grouping invariant schema_drift_report is built on."""
    from parquet_compactor_spark.compactor import scan_parquet_schemas

    a1 = tmp_path / "a1.parquet"
    a2 = tmp_path / "a2.parquet"
    write_small_parquet(a1, rows=5)
    write_small_parquet(a2, start=100, rows=50)  # same schema, other data
    extra = tmp_path / "extra.parquet"
    pq.write_table(
        pa.table({"id": [1], "val": [1.0], "extra": ["x"]}), extra
    )
    retyped = tmp_path / "retyped.parquet"
    pq.write_table(
        pa.table({"id": [1], "val": ["now a string"]}), retyped
    )
    corrupt = tmp_path / "corrupt.parquet"
    corrupt.write_bytes(b"PAR1 this is not really parquet")

    rows = {
        r.path: r
        for r in scan_parquet_schemas(
            spark,
            [str(a1), str(a2), str(extra), str(retyped), str(corrupt),
             "s3a://elsewhere/x.parquet"],
        ).collect()
    }
    assert rows[str(a1)].schema_fp == rows[str(a2)].schema_fp
    assert rows[str(a1)].columns == "id:int64\nval:double"
    assert rows[str(extra)].schema_fp != rows[str(a1)].schema_fp
    assert rows[str(retyped)].schema_fp != rows[str(a1)].schema_fp
    assert rows[str(retyped)].columns == "id:int64\nval:string"
    assert rows[str(corrupt)].error is not None
    assert rows[str(corrupt)].n_columns == -1
    assert "scheme" in rows["s3a://elsewhere/x.parquet"].error


def test_scan_parquet_schemas_matches_duckdb_schema(spark):
    """Differential vs DuckDB's parquet_schema() (an independent footer
    reader) on the sf0.001 fixture: per file, the same column NAME set
    and count — and files DuckDB reports as column-identical share a
    fingerprint."""
    import glob

    import duckdb

    from parquet_compactor_spark.compactor import scan_parquet_schemas

    paths = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))
    got = {
        r.path: r for r in scan_parquet_schemas(spark, paths).collect()
    }
    con = duckdb.connect()
    # DESCRIBE gives the TOP-LEVEL column view (parquet_schema flattens
    # nested list nodes to their leaves, which is not what a merge
    # compatibility check compares).
    want: dict[str, list[str]] = {
        f: [
            r[0]
            for r in con.execute(
                "DESCRIBE SELECT * FROM read_parquet(?)", [f]
            ).fetchall()
        ]
        for f in paths
    }
    con.close()
    assert set(got) == set(want)
    for f, names in want.items():
        mine = [c.split(":", 1)[0] for c in got[f].columns.split("\n")]
        assert sorted(mine) == sorted(names), f
        assert got[f].n_columns == len(names)
        assert got[f].error is None


def test_schema_drift_report_flags_mixed_leaves(spark, lake):
    """A leaf whose files disagree (added column + type change) is
    flagged with its drift columns; a uniform leaf reads clean."""
    from parquet_compactor_spark.compactor import schema_drift_report

    clean = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(2):
        write_small_parquet(clean / f"c{i}.parquet", start=i * 10)
    drifty = lake / "acct1" / "source=OCP" / "year=2024" / "month=02"
    write_small_parquet(drifty / "d0.parquet")
    pq.write_table(
        pa.table({"id": [1], "val": [1.0], "extra": ["x"]}),
        drifty / "d1.parquet",
    )
    pq.write_table(
        pa.table({"id": [1], "val": ["s"]}), drifty / "d2.parquet"
    )

    rows = {
        r.leaf.rstrip("/").rsplit("/", 1)[-1]: r
        for r in schema_drift_report(spark, str(lake)).collect()
    }
    c = rows["month=01"]
    assert (c.n_schemas, c.drifted_files, c.n_drift_columns) == (1, 0, 0)
    assert c.drift_columns == ""
    d = rows["month=02"]
    assert d.n_files == 3 and d.n_schemas == 3
    # majority is any of the three singleton schemas; two files drift
    assert d.majority_files == 1 and d.drifted_files == 2
    # 'extra' differs by presence, 'val' by type (two tokens), 'id' by
    # presence only in the two-column file? No: id:int64 is in all
    # three. So drift columns are exactly {extra, val}.
    assert d.drift_columns == "extra,val" and d.n_drift_columns == 2


def test_compact_schema_gate_skips_drifted_leaf(spark, lake):
    """With skip_schema_drift=True (and no merge_schema policy), a
    drifted leaf is left untouched with a loud outcome while a uniform
    leaf in the same pass compacts normally; setting merge_schema=True
    declares the evolution policy and the gate stands down."""
    drifty = lake / "acct1" / "source=AWS" / "year=2024" / "month=01"
    write_small_parquet(drifty / "in-0.parquet", start=0)
    path = drifty / "in-1.parquet"
    pq.write_table(
        pa.table(
            {
                "id": list(range(100, 110)),
                "val": [float(i) for i in range(10)],
                "extra": ["x"] * 10,
            }
        ),
        path,
    )
    ts = OLD.timestamp()
    os.utime(path, (ts, ts))
    clean = lake / "acct1" / "source=OCP" / "year=2024" / "month=01"
    for i in range(2):
        write_small_parquet(clean / f"in-{i}.parquet", start=i * 100)

    cfg = CompactionConfig(now=NOW, skip_schema_drift=True)
    outcomes = LakeCompactor(spark, str(lake), cfg).compact()
    drift_key = next(k for k in outcomes if "source=AWS" in k)
    clean_key = next(k for k in outcomes if "source=OCP" in k)
    assert outcomes[drift_key] == "skipped_schema_drift_2_schemas_0_unreadable"
    assert outcomes[clean_key] == "compacted_2_files"
    assert {p.name for p in drifty.glob("*.parquet")} == {
        "in-0.parquet",
        "in-1.parquet",
    }

    # merge_schema=True: the gate is documented to stand down.
    cfg2 = CompactionConfig(now=NOW, skip_schema_drift=True, merge_schema=True)
    outcomes2 = LakeCompactor(spark, str(lake), cfg2).compact()
    assert outcomes2[drift_key] == "compacted_2_files"
    merged = pq.read_table(next(drifty.glob("AWS_*.parquet")))
    assert set(merged.column_names) == {"id", "val", "extra"}


def test_schema_drift_tokens_survive_commas_inside_type_strings(spark, lake):
    """pyarrow type strings legally contain commas (decimal128(10, 2),
    struct<a: int64, b: string>) — the drift tokenization must not
    split inside them: a drifting decimal/struct column reports its
    NAME cleanly, never type fragments."""
    import decimal

    from parquet_compactor_spark.compactor import schema_drift_report

    leaf = lake / "acct1" / "source=OCP" / "year=2024" / "month=03"
    leaf.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "id": [1],
                "price": pa.array(
                    [decimal.Decimal("1.23")], pa.decimal128(10, 2)
                ),
                "meta": pa.array(
                    [{"a": 1, "b": "x"}],
                    pa.struct([("a", pa.int64()), ("b", pa.string())]),
                ),
            }
        ),
        leaf / "rich.parquet",
    )
    pq.write_table(pa.table({"id": [2]}), leaf / "plain.parquet")

    rows = {r.leaf: r for r in schema_drift_report(spark, str(lake)).collect()}
    (row,) = rows.values()
    assert row.n_schemas == 2 and row.drifted_files == 1
    assert row.drift_columns == "meta,price" and row.n_drift_columns == 2
