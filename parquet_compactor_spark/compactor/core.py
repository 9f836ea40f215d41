"""Compaction semantics + Spark-backed executor.

Faithfully reproduces the reference's behavior (cited per function from
/root/reference/parquet-compactor/parquet_compactor.py) while replacing
its mechanics with Spark:

- pandas 1M-row chunk loop            → DataFrame read + repartition/
                                        maxRecordsPerFile output sizing
- boto3 recursive prefix pagination   → one recursive Hadoop FS listing
- awswrangler writes + deletes        → DataFrame writer + FS rename/delete

The decision logic (what to skip, what to merge, what to delete) is pure
Python over file metadata — same altitude as the reference keeps it — and
is unit-testable without Spark. Only ``LakeCompactor`` touches the cluster.
"""

from __future__ import annotations

import math
import re
import threading
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from pyspark.sql import SparkSession

from parquet_compactor_spark.compactor.fs import HadoopFS, ListedFile


@dataclass(frozen=True)
class FileMeta:
    """The reference's catalog triple (parquet_compactor.py:111-120)."""

    path: str
    size: int
    modified: datetime  # UTC


@dataclass
class CompactionConfig:
    """Knobs mirroring parquet_compactor.py:20-26 and configurator defaults."""

    target_file_size_gb: float = 0.3  # TARGET_FILE_SIZE_GB (:21)
    chunked_rows: int = 1_000_000  # CHUNKED_ROWS (:20)
    skip_source_types_current_month: list[str] = field(
        default_factory=lambda: ["AWS", "Azure"]  # (:24-26)
    )
    hold_back_days: int = 5  # relativedelta(days=-5) (:275)
    now: datetime | None = None  # injectable clock for tests (utcnow at :275)
    # The reference ASSUMES schema compatibility across merged files
    # (SURVEY.md §1.2 — never checked). merge_schema=True makes evolution
    # explicit: Spark unions by name, missing columns become nulls.
    merge_schema: bool = False
    # Optional clustering columns: merged output is range-partitioned and
    # sorted on these, so each output file carries a disjoint value range
    # and parquet min/max statistics prune later filtered scans (the
    # write-side half of predicate pushdown). Empty = plain repartition,
    # reference parity.
    cluster_by: tuple[str, ...] = ()
    # Multi-column variant: Z-order (Morton) clustering — tight file
    # stats on ALL listed columns at once (sources/io.py write_zordered
    # rationale). Mutually exclusive with cluster_by; zorder_by wins.
    zorder_by: tuple[str, ...] = ()
    # Object-store commit mode. The default commit writes to a temp dir
    # and renames outputs to the reference's ``{base}_{32hex}.parquet``
    # convention — correct everywhere, but on s3a each rename is a
    # server-side COPY, so a 100 TB rewrite pays every byte twice.
    # ``direct_commit=True`` writes the merged output ONCE, directly into
    # the leaf under a job-unique ``merged-<32hex>-*.parquet`` basename
    # (mapreduce.output.basename), and records
    # committed outputs in a hidden ``_compacted.manifest`` sidecar that
    # replaces the filename marker for idempotence (SURVEY §7 anticipated
    # exactly this trade: widen the "already compacted" test symmetrically
    # with the naming change). Engine-side data-file renames: zero. On
    # s3a, pair with the magic committer (fs.s3a.committer.name=magic) so
    # Spark's task commit is a multipart-upload completion, not a copy —
    # then every data byte is written exactly once. GCP leaves fall back
    # to the rename commit (their outputs must encode invoice_month/date
    # in the filename micro-schema).
    #
    # Default None = DISPATCH BY URI SCHEME: object-store schemes
    # (s3/s3a/gs/abfs/... — where rename is a server-side byte copy and
    # three rounds of phase data show the rename term dominating the
    # compaction wall clock) get the direct commit; file/hdfs (where
    # rename is a metadata op) keep the rename commit and its
    # zero-manifest simplicity. Explicit True/False overrides either
    # way. See OBJECT_STORE_SCHEMES / commit_mode_is_direct.
    direct_commit: bool | None = None
    # Pre-merge schema gate (nothing like it exists in the reference —
    # it merges on faith; SURVEY §1.2 records that compatibility is
    # "assumed, not checked", and awswrangler surfaces a mismatch only
    # as a caught mid-merge ArrowException). When True and merge_schema
    # is False, each leaf's merge set is fingerprint-checked first
    # (metadata-only footer reads, distributed via
    # report.scan_parquet_schemas) and a leaf whose files disagree on
    # columns/types — or contains a genuinely CORRUPT footer — is SKIPPED
    # with outcome "skipped_schema_drift..." instead of producing a
    # sampled-schema union that NULL-fills or drops columns depending
    # on which file Spark samples. Ignored when merge_schema=True:
    # explicit union-by-name IS the evolution policy there. Files whose
    # URI scheme the executor-side pyarrow cannot open at all (the
    # cannot-CHECK class, e.g. object-store lakes in an fsspec-less
    # sandbox) never veto: those leaves merge as if ungated.
    skip_schema_drift: bool = False
    # Orphan temp-dir GC: a hard crash (OOM-kill) skips the merge's
    # finally-cleanup and leaves a ``*_compact_tmp_<32hex>`` dir behind.
    # Each compact() pass reclaims orphans whose NEWEST file is at least
    # this many hours old (protecting a concurrently-running merge,
    # whose tmp files are seconds old). None disables the sweep.
    gc_orphan_tmp_hours: float | None = 24.0

    @property
    def file_size_bytes(self) -> int:
        return int(self.target_file_size_gb * 2**30)  # (:22)

    def utcnow(self) -> datetime:
        return self.now or datetime.now(timezone.utc)


# --------------------------------------------------------------------------
# Pure decision logic (reference parity, unit-testable without Spark)
# --------------------------------------------------------------------------


#: URI schemes where rename is a server-side byte COPY (object stores),
#: so the direct commit is the right default. hdfs/file are absent on
#: purpose: their rename is an O(1) metadata op and the rename commit's
#: marker-free idempotence is simpler to operate. mocks3 is the test
#: object-store FileSystem (tests/javasupport), which emulates
#: rename-as-copy and must dispatch like a real store.
OBJECT_STORE_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss",
     "cos", "cosn", "swift", "mocks3"}
)


def commit_mode_is_direct(direct_commit: bool | None, path: str) -> bool:
    """Resolve the commit mode for ``path``: an explicit config wins;
    None dispatches by URI scheme (object store -> direct, else rename).
    Scheme-less paths (bare POSIX paths) are local -> rename."""
    if direct_commit is not None:
        return direct_commit
    scheme = path.split("://", 1)[0].lower() if "://" in path else ""
    return scheme in OBJECT_STORE_SCHEMES


def determine_base_file_name(path: str) -> str:
    """Base output name from the 'source=' path segment, fallback 'data'.

    Parity: parquet_compactor.py:236-244.
    """
    m = re.search(r"source=([^/]+)", path)
    return m.group(1) if m else "data"


def should_skip_compacting(path: str, config: CompactionConfig) -> bool:
    """Skip volatile current-month partitions for overwritten source types.

    Parity: parquet_compactor.py:246-260 — current year AND month appear as
    ``year=YYYY``/``month=MM`` path segments, and any skip source type
    appears anywhere in the path (plain substring, as in the reference).
    On a partition-discovered lake this same predicate is expressible as a
    partition-pruned filter (SURVEY.md §4 R2).
    """
    now = config.utcnow()
    is_current_month = f"year={now:%Y}" in path and f"month={now:%m}" in path
    is_skippable = any(t in path for t in config.skip_source_types_current_month)
    return is_current_month and is_skippable


def filter_compacted(
    basename: str,
    files: list[FileMeta],
    config: CompactionConfig,
    manifest: set[str] | None = None,
) -> list[str]:
    """Incremental/idempotence filter. Parity: parquet_compactor.py:262-293.

    - files named ``{base}_<32 hex>.parquet`` or ``{base}_<digits>.parquet``
      are prior compaction outputs: only the most recently modified one is
      re-merged (its trailing chunk is probably short);
    - other ("new") files are merged only if modified more than
      ``hold_back_days`` ago (date granularity — still-being-written data);
    - everything else is left untouched.

    ``manifest``: basenames the direct-commit path has recorded as
    committed outputs (``merged-<32hex>-*`` Spark task names — but name
    patterns must NOT be treated as markers: upstream producers choose
    their own names, including Spark part-names, and those are exactly
    the new files compaction exists to merge). A basename in the
    manifest is a prior output regardless of its name — the symmetric
    widening of the "already compacted" test that the naming change
    requires.
    """
    check_date = (config.utcnow() - timedelta(days=config.hold_back_days)).date()
    compacted_re = re.compile(rf"/{re.escape(basename)}_[0-9a-f]{{32}}\.parquet")
    numbered_re = re.compile(rf"/{re.escape(basename)}_[0-9]+\.parquet")
    manifest = manifest or set()

    new_files: list[str] = []
    prior: list[FileMeta] = []
    for f in files:
        if (
            compacted_re.search(f.path)
            or numbered_re.search(f.path)
            or f.path.rsplit("/", 1)[-1] in manifest
        ):
            prior.append(f)
        elif f.modified.date() < check_date:
            new_files.append(f.path)
    if prior:
        newest = max(prior, key=lambda f: f.modified)
        return [newest.path] + new_files
    return new_files


GCP_PRIOR_RE = re.compile(r"/[^/_]+_([^/_]+)_[0-9a-f]{32}\.parquet$")


def filter_compacted_gcp(files: list[FileMeta], config: CompactionConfig) -> list[str]:
    """GCP twin of :func:`filter_compacted` — an idempotence EXTENSION
    over the reference, which re-merges prior GCP outputs forever: its
    filter only knows ``{base}_`` patterns, while GCP outputs are named
    ``{invoice_month}_{date}_<32hex>.parquet``
    (parquet_compactor.py:205-208). The output convention is
    repo-controlled, so here prior outputs are recognized and a steady
    -state leaf returns nothing instead of rewriting every run.

    - ``{invoice_month}_{date}_<32 hex>.parquet`` files are prior per-date
      compaction outputs: the newest one FOR A DATE is re-merged only when
      that date also has new files (its trailing chunk is probably short);
      otherwise prior outputs are left untouched;
    - new files observe the same ``hold_back_days`` rule as
      :func:`filter_compacted`. Date membership is by substring, matching
      :func:`group_gcp_files`.
    """
    check_date = (config.utcnow() - timedelta(days=config.hold_back_days)).date()
    prior_per_date: dict[str, list[FileMeta]] = {}
    new_files: list[str] = []
    for f in files:
        m = GCP_PRIOR_RE.search(f.path)
        if m:
            prior_per_date.setdefault(m.group(1), []).append(f)
        elif f.modified.date() < check_date:
            new_files.append(f.path)
    newest = [
        max(fs, key=lambda f: f.modified).path
        for date, fs in sorted(prior_per_date.items())
        if any(date in p for p in new_files)
    ]
    return newest + new_files


def group_gcp_files(file_list: list[str]) -> tuple[str, dict[str, list[str]]]:
    """GCP filename micro-schema grouping. Parity: parquet_compactor.py:183-193.

    Filenames encode ``{invoice_month}_{date}_...``; returns the invoice
    month (from the first file) and files grouped per date — membership by
    date-substring, exactly as the reference does it.
    """
    invoice_month = file_list[0].rsplit("/", 1)[-1].split("_")[0]
    dates = sorted({f.rsplit("/", 1)[-1].split("_")[1] for f in file_list})
    return invoice_month, {d: [f for f in file_list if d in f] for d in dates}


def plan_output_files(total_bytes: int, config: CompactionConfig) -> int:
    """Output partition count: enough files to hit the target size."""
    return max(1, math.ceil(total_bytes / config.file_size_bytes))


#: A merge's temp output dir: ``{leaf}_compact_tmp_{uuid4.hex}`` — since
#: the leaf path ends with ``/``, an underscore-prefixed (hidden) CHILD
#: of the leaf. A hard crash (OOM-kill, SIGKILL) skips _write_merged's
#: finally-cleanup, so these can survive as orphans. Hidden names mean
#: Spark's readers and the distributed planning listing never see them;
#: the explicit ``_in_tmp_dir`` planning guard defends the iterator-mode
#: listing (which DOES surface hidden files), and gc_orphan_tmp_dirs
#: reclaims stale orphans via per-leaf listStatus probes.
TMP_DIR_RE = re.compile(r"_compact_tmp_[0-9a-f]{32}(/|$)")


def _in_tmp_dir(path: str) -> bool:
    return TMP_DIR_RE.search(path) is not None


def _is_mergeable_data_file(path: str) -> bool:
    """True for files a parquet merge would actually read: ``*.parquet``
    with a non-hidden basename (Spark's readers skip ``_``/``.`` prefixed
    files; sidecars like _SUCCESS/.crc are not parquet at all)."""
    base = path.rsplit("/", 1)[-1]
    return base.endswith(".parquet") and not base.startswith(("_", "."))


def group_by_leaf(files: list[ListedFile]) -> dict[str, list[FileMeta]]:
    """Group a flat recursive listing by parent directory.

    Replaces the reference's per-directory recursion (O2,
    parquet_compactor.py:80-99) with one grouping over a single listing.
    """
    leaves: dict[str, list[FileMeta]] = {}
    for f in files:
        leaf, _, _ = f.path.rpartition("/")
        leaves.setdefault(leaf + "/", []).append(
            FileMeta(
                path=f.path,
                size=f.size,
                modified=datetime.fromtimestamp(f.modified, tz=timezone.utc),
            )
        )
    return leaves


# --------------------------------------------------------------------------
# Spark-backed executor
# --------------------------------------------------------------------------


class LakeCompactor:
    """Crawl a Parquet lake and compact small files per leaf directory.

    Orchestration parity: parquet_compactor.py:295-328 (compact()). The
    driver loop stays driver-side (it is file-metadata work); each leaf's
    merge is a Spark job. Write-then-delete ordering preserved (R6): the
    originals are removed only after the merged output is fully committed.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        config: CompactionConfig | None = None,
    ):
        self.spark = spark
        self.root = root.rstrip("/") + "/"
        self.config = config or CompactionConfig()
        self.fs = HadoopFS(spark, self.root)
        #: Cumulative wall-clock seconds per pass phase (listing / plan /
        #: write / commit / delete), accumulated across leaves and passes
        #: on this instance. Observability only — never consulted by the
        #: compaction logic. Lock-guarded so concurrent leaf threads
        #: (compact(max_concurrency>1)) don't lose increments; under
        #: concurrency the per-phase SUMS remain exact but overlap in
        #: wall time, so they no longer add up to the pass duration.
        self.phase_timings: dict[str, float] = {}
        self._phase_lock = threading.Lock()

    @contextmanager
    def _phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._phase_lock:
                self.phase_timings[name] = self.phase_timings.get(name, 0.0) + dt

    # -- planning ----------------------------------------------------------

    def candidate_leaves(self) -> dict[str, list[FileMeta]]:
        """List the lake once; group by leaf; drop already-big files (O3).

        The planning scan is lake-wide, so it uses the distributed
        listing (one Spark metadata job, one collect) instead of the
        per-file py4j iterator — the difference between seconds and
        hours on a million-object lake.

        Planning considers only what a merge can READ: ``*.parquet``
        files whose basename is not hidden (``_``/``.`` prefixed).
        ``spark.read.parquet`` skips hidden files and cannot parse
        sidecars (_SUCCESS, .crc), so treating them as candidates
        either fails the merge or — worse — deletes a file whose rows
        were never merged. This also makes both ``list_files`` modes
        equivalent for planning (the distributed file index drops
        hidden files on its own; the iterator does not).
        """
        with self._phase("listing"):
            listing = self.fs.list_files(self.root, distributed=True)
        leaves = group_by_leaf(
            [
                f
                for f in listing
                if _is_mergeable_data_file(f.path) and not _in_tmp_dir(f.path)
            ]
        )
        return {
            leaf: [f for f in files if f.size < self.config.file_size_bytes]
            for leaf, files in leaves.items()
        }

    # -- execution ---------------------------------------------------------

    def _write_merged(
        self, file_list: list[str], leaf: str, name_fn, sizes: dict[str, int]
    ) -> bool:
        """Merge ``file_list`` into ≈target-size files inside ``leaf``.

        Spark equivalent of merge_files_in_dataframe
        (parquet_compactor.py:153-181): the multi-file read IS the merge;
        output sizing via repartition(ceil(bytes/target)) +
        maxRecordsPerFile (the 1M-row chunk rule). Writes go to a temp
        subdir, then part-files are renamed to the reference's
        ``{base}_{uuid4.hex}.parquet`` convention — the filename marker that
        makes re-runs incremental (filter_compacted's regex must match our
        own outputs or idempotence breaks).

        ``sizes`` comes from the planning listing — re-listing the leaf
        here would pay the per-file py4j iterator cost a second time for
        metadata the planner already holds.
        """
        total_bytes = sum(sizes.get(p, 0) for p in file_list)
        n_out = plan_output_files(total_bytes, self.config)

        tmp_dir = f"{leaf}_compact_tmp_{uuid.uuid4().hex}"
        renamed: list[str] = []
        try:
            with self._phase("plan"):
                df = self._plan_merge_df(file_list, sizes, total_bytes, n_out)
            with self._phase("write"):
                (
                    df
                    .write.option("compression", "snappy")
                    .option("maxRecordsPerFile", self.config.chunked_rows)
                    .mode("overwrite")
                    .parquet(tmp_dir)
                )
            with self._phase("commit"):
                written = [
                    f.path
                    for f in self.fs.list_files(tmp_dir)
                    if f.path.endswith(".parquet")
                ]
            # Commit = N renames. Parallel (py4j is thread-safe, a
            # connection per thread): a 400-output merge commits in one
            # rename-latency instead of 400 — on an object store each
            # rename is a remote round trip and the sequential loop is
            # the slowest part of the job. Failures don't short-circuit:
            # every completed rename is recorded so the except-branch can
            # roll back ALL of them.
            pairs = [(src, f"{leaf}{name_fn()}") for src in written]

            def _rename(pair: tuple[str, str]) -> bool:
                src, dst = pair
                ok = self.fs.rename(src, dst)
                if ok:
                    renamed.append(dst)  # list.append is thread-safe
                return ok

            with self._phase("commit"):
                if not all(self._fs_parallel(_rename, pairs)):
                    raise IOError(f"rename failed in {leaf}")
            return True
        except Exception as err:  # failure → keep originals (R6)
            # A mid-loop rename failure must not leave partial merged
            # outputs next to the kept originals (their rows would be
            # read twice, and the next run's incremental filter would
            # trust the newest partial output as a valid compaction).
            for dst in renamed:
                self.fs.delete(dst, recursive=False)
            print(f"compaction merge failed for {leaf}: {err}")
            return False
        finally:
            self.fs.delete(tmp_dir, recursive=True)

    def _plan_merge_df(
        self, file_list: list[str], sizes: dict[str, int], total_bytes: int, n_out: int
    ):
        """Build the merged DataFrame (shared by both commit modes)."""
        reader = self.spark.read
        if self.config.merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*file_list)
        if self.config.zorder_by:
            from parquet_compactor_spark.sources.io import zorder_key

            z = zorder_key(df, list(self.config.zorder_by))
            df = (
                df.withColumn("_zkey", z)
                .repartitionByRange(n_out, "_zkey")
                .sortWithinPartitions("_zkey")
                .drop("_zkey")
            )
        elif self.config.cluster_by:
            df = df.repartitionByRange(
                n_out, *self.config.cluster_by
            ).sortWithinPartitions(*self.config.cluster_by)
        else:
            # Shuffle-free merge. repartition(n) is a full shuffle of
            # the leaf — at lake scale the compactor would shuffle
            # EVERYTHING it rewrites just to resize files. Instead,
            # size the READ splits so each scan task holds ≈ one
            # output file's worth, and write straight through: the
            # plan is scan → write, zero exchanges, parallelism =
            # output file count. Row density is uniform within a
            # leaf, so byte-sized splits track the 1M-row chunk rule;
            # targeting 90% of the cap keeps maxRecordsPerFile (the
            # hard cap below) from splitting off remainder files.
            #
            # Row count: extrapolated from a 3-file footer sample,
            # not a full metadata count() — a leaf of thousands of
            # files pays one footer open PER FILE for an exact count
            # whose only use is split sizing, and the same uniform-
            # density assumption this sizing already rests on makes
            # the sample equivalent. maxRecordsPerFile stays the
            # exact, per-task hard cap either way, so an estimate
            # error changes file sizes slightly, never correctness.
            stride = max(1, len(file_list) // 3)
            sample = file_list[::stride][:3]
            sample_rows = self.spark.read.parquet(*sample).count()
            sample_bytes = sum(sizes.get(p, 0) for p in sample)
            rows = (
                math.ceil(total_bytes * sample_rows / sample_bytes)
                if sample_bytes
                else 0
            )
            n_chunks = max(
                n_out, math.ceil(rows / (0.9 * self.config.chunked_rows)), 1
            )
            open_cost = 65536
            split = (total_bytes + len(file_list) * open_cost) // n_chunks + 1
            # Isolated child session: same SparkContext/executors,
            # PRIVATE SQLConf — concurrent leaf merges (compact's
            # max_concurrency > 1 thread pool) each tune their own
            # split size without racing on session-wide confs.
            # newSession() does NOT inherit the parent's *runtime*
            # SQL confs (parquet rebase modes, nanosAsLong,
            # caseSensitive, ...), so a leaf readable via the
            # caller's session could fail — or read differently — in
            # the child, and the except-branch below would turn that
            # conf mismatch into a silent skip. Copy the parent's
            # modified confs first, then override the split sizing.
            sess = self.spark.newSession()
            # isModifiable (not try/except) skips static confs: a
            # blanket except would also swallow a transient failure
            # on a genuinely modifiable conf — the exact class this
            # copy exists to propagate.
            for key, value in self.spark.conf.getAll.items():
                if sess.conf.isModifiable(key):
                    sess.conf.set(key, value)
            sess.conf.set("spark.sql.files.maxPartitionBytes", str(split))
            sess.conf.set("spark.sql.files.openCostInBytes", str(open_cost))
            sess.conf.set("spark.sql.files.minPartitionNum", "1")
            reader = sess.read
            if self.config.merge_schema:
                reader = reader.option("mergeSchema", "true")
            df = reader.parquet(*file_list)
        return df

    # Hidden sidecar recording direct-commit outputs (one basename per
    # line). Hidden name → invisible to planning and to spark.read.
    MANIFEST_NAME = "_compacted.manifest"
    # Hidden sidecar recording originals whose rows are already committed
    # in merged outputs but whose post-merge delete FAILED. Without it,
    # the next run's incremental filter re-merges the leftover alongside
    # the newest prior output — permanently baking the duplicate rows
    # into the new output. Pending files are excluded from every future
    # merge and their deletes retried each pass until they succeed.
    PENDING_DELETES_NAME = "_pending_deletes.manifest"

    def _read_manifest(self, leaf: str) -> set[str]:
        path = f"{leaf}{self.MANIFEST_NAME}"
        if not self.fs.exists(path):
            return set()
        return {ln for ln in self.fs.read_text(path).splitlines() if ln}

    def _write_manifest(self, leaf: str, names: set[str]) -> None:
        with self._phase("commit"):
            self.fs.write_text(
                f"{leaf}{self.MANIFEST_NAME}", "\n".join(sorted(names))
            )

    def _read_pending_deletes(self, leaf: str) -> set[str]:
        path = f"{leaf}{self.PENDING_DELETES_NAME}"
        if not self.fs.exists(path):
            return set()
        return {ln for ln in self.fs.read_text(path).splitlines() if ln}

    def _write_pending_deletes(self, leaf: str, names: set[str]) -> None:
        path = f"{leaf}{self.PENDING_DELETES_NAME}"
        if names:
            self.fs.write_text(path, "\n".join(sorted(names)))
        elif self.fs.exists(path):
            self.fs.delete(path, recursive=False)

    def _retry_pending_deletes(self, leaf: str) -> tuple[set[str], set[str]]:
        """Retry deletes recorded by a previous pass.

        Returns (pending_at_start, still_pending). Callers must exclude
        EVERYTHING in pending_at_start from this pass's merge — a
        successfully retried file was just deleted AFTER the planning
        listing snapshotted it, so merging it would fail on a missing
        input (and a still-pending one must never be re-merged at all).
        """
        pending = self._read_pending_deletes(leaf)
        if not pending:
            return set(), set()
        still: set[str] = set()
        for name in sorted(pending):
            path = f"{leaf}{name}"
            if self.fs.exists(path) and not self.fs.delete(path, recursive=False):
                still.add(name)
                print(f"retry delete still failing (rows duplicate): {path}")
        self._write_pending_deletes(leaf, still)
        return pending, still

    def _write_merged_direct(
        self, file_list: list[str], leaf: str, sizes: dict[str, int]
    ) -> tuple[bool, set[str]]:
        """Object-store commit: write merged output ONCE, straight into the
        leaf, under a job-unique ``merged-<hex>-*`` basename — zero
        engine-side renames of data files, so no rename-as-copy tax on s3a
        (pair with the
        magic committer there and each data byte is written exactly once;
        the reference writes once with final names too,
        parquet_compactor.py:161-171). Idempotence moves from the filename
        marker to the ``_compacted.manifest`` sidecar. Returns
        (success, basenames written). Crash window parity with the rename
        commit: outputs committed but originals not yet deleted → the next
        run re-merges the originals alongside the newest prior output,
        exactly the reference's documented temporary-duplication semantics
        (SURVEY §3.3)."""
        total_bytes = sum(sizes.get(p, 0) for p in file_list)
        n_out = plan_output_files(total_bytes, self.config)
        target = leaf.rstrip("/")
        # A unique output basename POSITIVELY identifies this job's files
        # (``{basename}-00000-{taskUUID}-c000.snappy.parquet``). The
        # earlier before/after listing diff was racy: a part-file an
        # upstream producer dropped into the leaf DURING the merge would
        # land in the manifest as a compaction output and be excluded
        # from compaction forever. ``mapreduce.output.basename`` rides
        # the per-write hadoop conf (newHadoopConfWithOptions), so
        # concurrent merges in one session don't clobber each other.
        basename = f"merged-{uuid.uuid4().hex}"
        try:
            with self._phase("plan"):
                df = self._plan_merge_df(file_list, sizes, total_bytes, n_out)
            with self._phase("write"):
                (
                    df
                    .write.option("compression", "snappy")
                    .option("maxRecordsPerFile", self.config.chunked_rows)
                    .option("mapreduce.output.basename", basename)
                    .mode("append")
                    .parquet(target)
                )
            with self._phase("commit"):
                written = {
                    name
                    for f in self.fs.list_files(leaf)
                    if (name := f.path.rsplit("/", 1)[-1]).startswith(basename)
                    and name.endswith(".parquet")
                }
            return True, written
        except Exception as err:  # failure → keep originals (R6)
            print(f"compaction merge failed for {leaf}: {err}")
            return False, set()

    @staticmethod
    def _fs_parallel(fn, items, max_workers: int = 16) -> list:
        """Run independent metadata ops (rename/delete) concurrently."""
        if len(items) <= 1:
            return [fn(x) for x in items]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(max_workers, len(items))) as ex:
            return list(ex.map(fn, items))

    def merge_files(
        self, leaf: str, base_name: str, file_list: list[str], sizes: dict[str, int]
    ) -> bool:
        return self._write_merged(
            file_list,
            leaf,
            lambda: f"{base_name}_{uuid.uuid4().hex}.parquet",
            sizes,
        )

    def merge_files_gcp(
        self, leaf: str, file_list: list[str], sizes: dict[str, int]
    ) -> bool:
        """Per-date grouped merge for GCP leaves (parquet_compactor.py:183-228)."""
        invoice_month, per_date = group_gcp_files(file_list)
        success = True
        for date, files in per_date.items():
            ok = self._write_merged(
                files,
                leaf,
                lambda: f"{invoice_month}_{date}_{uuid.uuid4().hex}.parquet",
                sizes,
            )
            success = success and ok
        return success

    def remove_uncompacted_files(self, file_list: list[str]) -> list[str]:
        """Delete merged-away originals (parquet_compactor.py:230-234).

        Parallel: thousands of sequential per-object deletes would stall
        the driver for round-trip-latency × N on an object store.

        Returns the paths whose delete returned False (and logs them): a
        leftover original sits next to the committed merged output and its
        rows are read twice by every subsequent scan until a later pass's
        delete retry succeeds (_compact_leaf records failures in the
        pending-deletes sidecar, which quarantines the file from ever
        being re-MERGED — re-merging it alongside the output that already
        holds its rows would make the duplication permanent).
        """
        with self._phase("delete"):
            results = self._fs_parallel(
                lambda path: self.fs.delete(path, recursive=False), file_list
            )
        failed = [p for p, ok in zip(file_list, results) if not ok]
        for p in failed:
            print(f"delete of compacted-away original failed (rows will duplicate): {p}")
        return failed

    def _compact_leaf(self, leaf: str, files: list[FileMeta]) -> str:
        """Plan + execute one leaf; returns its outcome string."""
        if should_skip_compacting(leaf, self.config):
            return "skipped_current_month"
        base = determine_base_file_name(leaf)
        # First, retry deletes a previous pass failed to complete; any
        # file STILL pending has its rows already committed in a merged
        # output, so it must never re-enter a merge (that would bake the
        # duplication in permanently).
        pending_at_start, still_pending = self._retry_pending_deletes(leaf)
        if pending_at_start:
            files = [
                f for f in files if f.path.rsplit("/", 1)[-1] not in pending_at_start
            ]
        # GCP leaves always use the rename commit: their outputs must
        # encode {invoice_month}_{date} in the filename micro-schema.
        use_direct = (
            commit_mode_is_direct(self.config.direct_commit, leaf)
            and "GCP" not in leaf
        )
        manifest = self._read_manifest(leaf) if use_direct else set()
        if use_direct and manifest:
            # Prune entries whose files no longer exist (e.g. a prior
            # output whose failed delete succeeded on a LATER pass's
            # retry — that path prunes pending but not the manifest).
            # Without this the sidecar grows one stale line per such
            # event forever. The live set must come from an UNFILTERED
            # leaf listing: ``files`` already dropped at/above-target
            # files (candidate_leaves, O3), and a merged output that
            # grew past the size target is still live — pruning it
            # would strip its prior-compaction marker and re-merge it
            # if file_size_bytes is later raised (churn, not loss).
            live = {
                f.path.rsplit("/", 1)[-1]
                for f in self.fs.list_files(leaf)
                if _is_mergeable_data_file(f.path) and not _in_tmp_dir(f.path)
            }
            if manifest - live:
                manifest &= live
                self._write_manifest(leaf, manifest)
        if "GCP" in leaf:
            file_list = filter_compacted_gcp(files, self.config)
        else:
            file_list = filter_compacted(base, files, self.config, manifest=manifest)
        if len(file_list) <= 1:
            if still_pending:
                return f"nothing_to_compact_{len(still_pending)}_deletes_pending"
            return "nothing_to_compact"
        if self.config.skip_schema_drift and not self.config.merge_schema:
            from parquet_compactor_spark.compactor.report import (
                SCHEME_UNREADABLE_PREFIX,
                scan_parquet_schemas,
            )

            with self._phase("schema_check"):
                fp_rows = (
                    scan_parquet_schemas(self.spark, file_list)
                    .select("schema_fp", "error")
                    .collect()
                )
            # The gate acts only on EVIDENCE: drifting fingerprints or a
            # genuinely corrupt footer. The cannot-check class (pyarrow
            # lacks the filesystem for this URI scheme — every file of an
            # object-store lake in a sandbox without fsspec) must NOT
            # veto the merge, or the gate would skip the entire lake it
            # was meant to protect; those leaves merge as if ungated.
            n_corrupt = sum(
                1
                for r in fp_rows
                if r.error is not None
                and not r.error.startswith(SCHEME_UNREADABLE_PREFIX)
            )
            fps = {r.schema_fp for r in fp_rows if r.error is None}
            if n_corrupt or len(fps) > 1:
                return (
                    f"skipped_schema_drift_{len(fps)}_schemas_"
                    f"{n_corrupt}_unreadable"
                )
        sizes = {f.path: f.size for f in files}
        written: set[str] = set()
        if "GCP" in leaf:
            success = self.merge_files_gcp(leaf, file_list, sizes)
        elif use_direct:
            success, written = self._write_merged_direct(file_list, leaf, sizes)
        else:
            success = self.merge_files(leaf, base, file_list, sizes)
        if success and use_direct:
            # Record outputs BEFORE deleting inputs: if the delete (or a
            # crash) intervenes, outputs are at worst re-merged as inputs
            # next run — reference's temporary-duplication semantics —
            # whereas unrecorded outputs would never be recognized as
            # prior compactions.
            self._write_manifest(leaf, manifest | written)
        if success:
            failed = self.remove_uncompacted_files(file_list)
            if use_direct:
                # Prune deleted inputs (e.g. the re-merged newest prior
                # output) so the manifest tracks only live files.
                deleted = {p.rsplit("/", 1)[-1] for p in file_list} - {
                    p.rsplit("/", 1)[-1] for p in failed
                }
                self._write_manifest(leaf, (manifest | written) - deleted)
            if failed:
                # Quarantine the leftovers from future merges and retry
                # their deletes every subsequent pass.
                self._write_pending_deletes(
                    leaf,
                    still_pending | {p.rsplit("/", 1)[-1] for p in failed},
                )
                return (
                    f"compacted_{len(file_list)}_files_"
                    f"{len(failed)}_deletes_failed"
                )
            if still_pending:
                return (
                    f"compacted_{len(file_list)}_files_"
                    f"{len(still_pending)}_deletes_pending"
                )
            return f"compacted_{len(file_list)}_files"
        return "merge_failed_originals_kept"

    def gc_orphan_tmp_dirs(
        self, min_age_hours: float = 24.0, leaves: list[str] | None = None
    ) -> tuple[list[str], list[str]]:
        """Reclaim merge temp dirs orphaned by a hard crash.

        ``_write_merged`` deletes its ``{leaf}_compact_tmp_{hex}`` dir in
        a finally-block, but a killed JVM never runs it; the orphan then
        sits in the lake forever. Because the leaf path ends with ``/``,
        the tmp dir is an UNDERSCORE-PREFIXED CHILD of the leaf — hidden
        from Spark's readers and from the distributed listing alike (so
        a merge can never read it as data, but a distributed sweep can
        never find it either). The sweep therefore probes each leaf's
        immediate children with one py4j listStatus (``fs.list_dirs``):
        cost is one metadata call per leaf — proportional to the pass's
        existing work, never a second lake-wide listing.

        A tmp dir is deleted only when nothing under it (nor the dir
        itself) is newer than ``min_age_hours`` by the injectable clock —
        an actively-writing merge touches its files continuously, so the
        age gate makes the sweep safe beside live jobs. Returns the
        deleted dir paths; failed deletes are reported, not silently
        dropped (same discipline as remove_uncompacted_files).

        Besides ``_compact_tmp_<hex>`` dirs, the sweep reclaims stale
        ``_temporary`` committer litter — a crashed direct-commit merge
        leaves the FileOutputCommitter's ``{leaf}/_temporary/...`` tree
        behind the same way (on real s3a with the magic committer, pair
        this with an abort-incomplete-multipart-uploads lifecycle rule,
        which no filesystem listing can reclaim).

        ``leaves``: the leaf dirs to probe (compact() passes the set it
        already computed, paying one listStatus per leaf). ``leaves=None``
        is the DEEP sweep for a maintenance run: a recursive DIRECTORY
        walk from the root (listStatus DFS — the only traversal that
        finds EMPTY orphan dirs and orphans in leaves whose data files
        have since been deleted, both invisible to any file listing).
        """
        cutoff = self.config.utcnow() - timedelta(hours=min_age_hours)
        newest: dict[str, datetime] = {}

        def _reclaimable(dir_path: str) -> bool:
            name = dir_path.rstrip("/").rsplit("/", 1)[-1]
            return name == "_temporary" or bool(TMP_DIR_RE.search(name))

        def _newest_under(d) -> datetime:
            files = self.fs.list_files(d.path)
            if not files and d.modified <= 0:
                # Object stores may report directory mtime as 0/unknown
                # (S3A keeps no dir mtime). An EMPTY dir with an unknown
                # mtime could be a live merge's just-created staging dir
                # — treat unknown as fresh and never reclaim it here
                # (once a file lands, file mtimes take over).
                return self.config.utcnow()
            ts = datetime.fromtimestamp(max(d.modified, 0), tz=timezone.utc)
            for f in files:
                fts = datetime.fromtimestamp(f.modified, tz=timezone.utc)
                if fts > ts:
                    ts = fts
            return ts

        if leaves is None:
            # Deep sweep: recursive dir DFS. Matched dirs are evaluated
            # and not descended into; lake depth is a handful of levels,
            # dir count ~ leaf count — fine for a maintenance command.
            stack = [self.root.rstrip("/")]
            while stack:
                cur = stack.pop()
                for d in self.fs.list_dirs(cur):
                    if _reclaimable(d.path):
                        newest[d.path] = _newest_under(d)
                    else:
                        stack.append(d.path)
        else:
            # Per-leaf probes, parallel like the rename/delete fan-outs —
            # sequential py4j listStatus per leaf would stall the driver
            # for minutes on a 100k-leaf lake just to usually find nothing.
            def _probe(leaf: str) -> list[tuple[str, datetime]]:
                return [
                    (d.path, _newest_under(d))
                    for d in self.fs.list_dirs(leaf)
                    if _reclaimable(d.path)
                ]

            for probed in self._fs_parallel(_probe, list(leaves)):
                for path, ts in probed:
                    newest[path] = ts

        deleted: list[str] = []
        failed: list[str] = []
        for d in sorted(p for p, ts in newest.items() if ts < cutoff):
            if self.fs.delete(d, recursive=True):
                deleted.append(d)
            else:
                failed.append(d)
                print(f"orphan tmp gc: delete returned False for {d}")
        return deleted, failed

    def compact(self, max_concurrency: int = 1) -> dict[str, str]:
        """Run one compaction pass. Returns {leaf: outcome} for observability.

        ``max_concurrency > 1`` submits independent leaf jobs from a driver
        thread pool (Spark job submission is thread-safe; per-leaf jobs
        share the cluster via the scheduler). On a listing-bound lake with
        thousands of small leaves, this keeps executors saturated instead
        of serializing one small job per leaf — the scale knob SURVEY.md
        §7 step 6 calls for. Default 1 mirrors the reference's sequential
        orchestration (parquet_compactor.py:295-328).

        Leaves are processed WORST-FIRST (most candidate files first,
        path as deterministic tiebreak): if a run is interrupted or
        time-budgeted, the files reclaimed per minute are maximized —
        the scheduling order lake_report would recommend. The reference
        iterates in listing order, so an interrupted run can spend its
        budget on leaves that barely need work.
        """
        leaves = sorted(
            self.candidate_leaves().items(),
            key=lambda kv: (-len(kv[1]), kv[0]),
        )
        gc_failed: list[str] = []
        if self.config.gc_orphan_tmp_hours is not None:
            # Reuses the leaf set this pass already listed — the sweep
            # adds one listStatus per leaf, never a second lake listing.
            _, gc_failed = self.gc_orphan_tmp_dirs(
                self.config.gc_orphan_tmp_hours, leaves=[lf for lf, _ in leaves]
            )
        if max_concurrency <= 1:
            outcomes = {leaf: self._compact_leaf(leaf, files) for leaf, files in leaves}
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
                results = pool.map(lambda lf: self._compact_leaf(*lf), leaves)
                outcomes = {
                    leaf: outcome for (leaf, _), outcome in zip(leaves, results)
                }
        if gc_failed:
            # A reclaim failure must reach the pass outcomes (and through
            # them main()'s exit code) — stdout-only reporting left the
            # in-pass sweep outside the alerting contract the standalone
            # ``gc`` subcommand honors.
            outcomes["__gc_orphan_tmp__"] = (
                f"gc_{len(gc_failed)}_reclaim_failed"
            )
        return outcomes

    def audit(self) -> dict[str, dict]:
        """Read-only lake integrity audit — the drift detector between
        what the commit sidecars CLAIM and what the lake actually holds.
        Mutates nothing (the remediation paths already exist: the pass's
        pending-delete retry, the age-gated orphan GC); this is the
        check an operator runs BEFORE trusting a lake handed over from
        another system, and on a schedule to catch external interference
        (lifecycle rules, manual deletes) early.

        Per-leaf findings (only leaves WITH findings are returned, plus
        a ``__summary__`` row):

        - ``manifest_missing`` — basenames the direct-commit manifest
          records as committed outputs whose FILE IS GONE: rows the lake
          claims to hold exist nowhere (external delete or data loss;
          the one finding with no self-healing path).
        - ``pending_present`` — pending-delete basenames still on disk:
          rows duplicated between an original and its merged output,
          awaiting the next pass's retry delete. Transient after a
          delete failure; alarming if it persists across passes.
        - ``orphan_tmp_dirs`` — ``_compact_tmp_*`` / ``_temporary``
          crash litter the age-gated GC will reclaim on its next pass.

        Cost: ONE distributed lake listing + one listStatus and two
        sidecar probes per leaf — the candidate_leaves() cost envelope,
        safe on a live lake. A leaf whose data files were ALL externally
        deleted no longer appears in the file listing, so a stranded
        manifest there is out of scope for the per-leaf walk (the deep
        ``gc`` directory sweep visits such leaves).
        """
        with self._phase("listing"):
            listing = self.fs.list_files(self.root, distributed=True)
        leaves = group_by_leaf(
            [f for f in listing if not _in_tmp_dir(f.path)]
        )
        report: dict[str, dict] = {}
        summary = {"leaves": 0, "files": 0, "bytes": 0, "leaves_with_findings": 0}
        for leaf, files in sorted(leaves.items()):
            summary["leaves"] += 1
            summary["files"] += len(files)
            summary["bytes"] += sum(f.size for f in files)
            names = {f.path.rsplit("/", 1)[-1] for f in files}
            finding: dict[str, list[str]] = {}
            missing = sorted(self._read_manifest(leaf) - names)
            if missing:
                finding["manifest_missing"] = missing
            present = sorted(self._read_pending_deletes(leaf) & names)
            if present:
                finding["pending_present"] = present
            orphans = sorted(
                d.path
                for d in self.fs.list_dirs(leaf)
                if (lambda n: n == "_temporary" or TMP_DIR_RE.search(n))(
                    d.path.rstrip("/").rsplit("/", 1)[-1]
                )
            )
            if orphans:
                finding["orphan_tmp_dirs"] = orphans
            if finding:
                report[leaf] = finding
                summary["leaves_with_findings"] += 1
        report["__summary__"] = summary
        return report
