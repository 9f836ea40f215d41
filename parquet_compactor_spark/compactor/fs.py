"""Hadoop FileSystem helpers (py4j) — one API for file://, s3a://, hdfs://.

The reference talks to S3 through boto3 pagination
(parquet_compactor.py:68-99) and deletes via awswrangler
(parquet_compactor.py:230-234). Spark's JVM already carries the Hadoop
FileSystem abstraction for every store it can read, so we use it for
listing/rename/delete — no second S3 client, and local-filesystem tests
exercise the identical code path as a production object store.

A single recursive ``listFiles`` call replaces the reference's
O(directories) paginated round-trips: object stores implement it as a flat
key-prefix scan, which is the scalable way to enumerate a 100 TB lake.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import unquote, urlsplit, urlunsplit

from pyspark.sql import SparkSession


def _decode_uri_path(uri: str) -> str:
    """Decode %xx escapes in the *path component* of a file URI.

    Spark's binaryFile source returns ``path`` in URI-encoded form
    (space -> %20), while Hadoop Path-based rename/delete/read and the
    py4j listFiles iterator treat %xx literally. Without decoding, a lake
    path containing URI-escaping characters would fail every merge read
    (AnalysisException) and silently never compact. Only the path segment
    is decoded — scheme/authority are left untouched.
    """
    if "://" not in uri:
        return unquote(uri)
    parts = urlsplit(uri)
    return urlunsplit(
        (parts.scheme, parts.netloc, unquote(parts.path), parts.query, parts.fragment)
    )


@dataclass(frozen=True)
class ListedFile:
    path: str  # fully-qualified URI
    size: int  # bytes
    modified: float  # epoch seconds


class HadoopFS:
    """Thin wrapper over org.apache.hadoop.fs.FileSystem for one root URI."""

    def __init__(self, spark: SparkSession, root: str):
        self._spark = spark
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._root = self.jpath(root)
        self._fs = self._root.getFileSystem(self._conf)

    def jpath(self, uri: str):
        return self._jvm.org.apache.hadoop.fs.Path(uri)

    def qualified(self, uri: str) -> str:
        """Fully-qualified URI string (scheme + authority), matching the
        form listing entries carry — for path comparisons."""
        return str(self._fs.makeQualified(self.jpath(uri)))

    def list_files(self, prefix: str, distributed: bool = False) -> list[ListedFile]:
        """Recursively list all files under ``prefix`` (one scan, not a DFS).

        Mirrors get_common_prefixes_recursive + convert_results
        (parquet_compactor.py:80-122) in a single FileSystem call.

        ``distributed=True`` lists through Spark's binaryFile source
        (metadata columns only — content is pruned, no data is read) and
        collects the result in ONE round trip. The default py4j iterator
        costs ~5 JVM round trips PER FILE (hasNext/next/getters) — fine
        for a few hundred files, minutes of driver stalling for a
        million-object lake. Lake-wide scans (planning, reporting) should
        always pass distributed=True; leaf-scoped listings stay on the
        iterator to avoid per-call Spark job overhead (~0.3 s).

        Mode divergence callers must know: Spark's file index SKIPS
        hidden files (basename starting ``_`` or ``.``) and everything
        under hidden directories, while the iterator lists them. Spark's
        own readers skip the same set, so for planning what a merge/scan
        will touch the distributed view is the truthful one; callers
        needing sidecars (_SUCCESS, .crc) must use the iterator.
        """
        out: list[ListedFile] = []
        p = self.jpath(prefix)
        if not self._fs.exists(p):
            return out
        if distributed:
            from pyspark.sql import functions as F

            df = (
                self._spark.read.format("binaryFile")
                .option("recursiveFileLookup", "true")
                .load(prefix)
                # unix_micros: epoch extracted JVM-side from the instant.
                # Collecting the timestamp and calling .timestamp() on the
                # naive local datetime would resolve a DST fall-back fold
                # to the wrong hour on DST-observing hosts.
                .select("path", "length", F.unix_micros("modificationTime").alias("mtime_us"))
            )
            return [
                ListedFile(
                    path=_decode_uri_path(r.path),
                    size=int(r.length),
                    modified=r.mtime_us / 1_000_000.0,
                )
                for r in df.collect()
            ]
        it = self._fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            out.append(
                ListedFile(
                    path=st.getPath().toString(),
                    size=int(st.getLen()),
                    modified=st.getModificationTime() / 1000.0,
                )
            )
        return out

    def list_dirs(self, path: str) -> list[ListedFile]:
        """Immediate CHILD DIRECTORIES of ``path`` (one listStatus call),
        hidden ones included — the py4j surface the orphan-tmp sweep
        needs, since Spark's distributed listing skips hidden dirs by
        design. ``modified`` is the directory's own mtime."""
        p = self.jpath(path)
        if not self._fs.exists(p):
            return []
        out: list[ListedFile] = []
        for st in self._fs.listStatus(p):
            if st.isDirectory():
                out.append(
                    ListedFile(
                        path=st.getPath().toString(),
                        size=0,
                        modified=st.getModificationTime() / 1000.0,
                    )
                )
        return out

    def rename(self, src: str, dst: str) -> bool:
        return bool(self._fs.rename(self.jpath(src), self.jpath(dst)))

    def delete(self, path: str, recursive: bool = False) -> bool:
        return bool(self._fs.delete(self.jpath(path), recursive))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self.jpath(path)))

    def mkdirs(self, path: str) -> bool:
        return bool(self._fs.mkdirs(self.jpath(path)))

    def read_text(self, path: str) -> str:
        """Read a small sidecar file (state/manifest) as UTF-8 text."""
        stream = self._fs.open(self.jpath(path))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()

    def read_bytes(self, path: str) -> bytes:
        """Read one file fully as bytes (header sniffing, small sidecars).

        Goes through commons-io's toByteArray so the payload crosses
        py4j ONCE as a byte[] return value — iterating a JavaArray
        byte-by-byte would be a py4j round-trip per byte.
        """
        stream = self._fs.open(self.jpath(path))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        """Atomically replace a small sidecar file (write-new + rename)."""
        tmp = self.jpath(f"{path}.tmp")
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        dst = self.jpath(path)
        if self._fs.exists(dst):
            self._fs.delete(dst, False)
        self._fs.rename(tmp, dst)
