"""Distributed Avro WRITE without spark-avro — the write half of the
``sources/avro_fallback.py`` gate, closing the last format asymmetry
(reads have been distributed since round 5; writes previously raised an
actionable ImportError from ``write_table``).

Spark-first shape: a custom Python DataSource WRITER (Spark 4), the
same two-phase-commit protocol as ``sources/jsonl_sink.py`` —
``write()`` runs once per partition ON THE EXECUTORS and streams that
partition's rows into one Avro Object Container File; a single driver
``commit()`` renames every task's uuid-named ``.tmp`` to its final name
and drops ``_SUCCESS``. No data bytes touch the driver; parallelism is
one container file per partition, exactly spark-avro's layout. The
reference's write path is a single-threaded pandas-to-S3 loop
(parquet_compactor.py:161-171) — this is the distributed re-expression.

Encoding reuses ``avro_fallback``'s spec-complete binary encoder
(zigzag varints, length-prefixed bytes, IEEE little-endian floats);
this module adds the three pieces a WRITER needs that a reader doesn't:

- ``avro_schema_of``: SparkType → Avro schema JSON (the inverse of
  ``spark_schema_ddl``), nullable columns → ``[null, T]`` unions,
  date/timestamp → the same logical types the fallback reader decodes
  (``date``/``timestamp-micros``), nested structs → uniquely-named
  records (Avro requires distinct record names within one schema).
- row converters: Python worker values (datetime/date/Row/bytearray)
  → the raw ints/dicts ``_encode`` expects. Timestamps convert with
  the exact integer inverse of the reader's decode
  (``(v - _EPOCH) // 1µs``), so a write→read round trip is
  value-identical whatever the session timezone.
- block framing: rows buffer into ~1 MiB blocks (count + size +
  compressed payload + sync marker per the container spec), so task
  memory is O(block), not O(partition).

Codecs: ``deflate`` (raw zlib, the pure-Python default) and ``null``;
``snappy`` needs python-snappy (install-policy-blocked here) and is
transparently downgraded to deflate by ``write_table`` — the chosen
codec is declared in the file metadata, so ANY avro reader handles the
output. Decimal columns are refused actionably (the fallback reader has
no decimal logical type; add spark-avro for decimal lakes).

Streaming: ``AvroStreamWriter`` commits per micro-batch with
``batch-<id>-`` prefixed names and idempotent epoch-replay sweep,
mirroring the jsonl sink's crash-replay discipline.

Scope: executor-local filesystem paths (plain ``open`` in the Python
worker), like the jsonl sink. On an object store the rename-commit
becomes a multipart complete; the two-phase protocol is unchanged.
"""

from __future__ import annotations

import io
import json
import os
import re
import uuid
import zlib
from dataclasses import dataclass
from datetime import date, datetime, timedelta
from typing import Callable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql import types as T
from pyspark.sql.types import StructType

from parquet_compactor_spark.sources.avro_fallback import (
    MAGIC,
    _encode,
    _write_bytes,
    _write_long,
)

_EPOCH = datetime(1970, 1, 1)
_EPOCH_DATE = date(1970, 1, 1)
_US = timedelta(microseconds=1)

#: Flush a block once its raw (pre-compression) payload passes this —
#: bounds task memory at O(block) while keeping per-block overhead
#: (26 bytes of framing + codec reset) negligible.
_BLOCK_BYTES = 1 << 20

#: Avro name grammar (spec 1.11 "Names"): strict readers reject a
#: container file whose schema declares names outside it, so refuse at
#: plan time — same discipline as the DECIMAL refusal.
_AVRO_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _check_avro_name(name: str, where: str) -> str:
    if not _AVRO_NAME_RE.match(name):
        raise NotImplementedError(
            f"avro fallback writer: {where} {name!r} is not a valid Avro "
            "name ([A-Za-z_][A-Za-z0-9_]*); rename the column "
            "(withColumnRenamed) or add spark-avro"
        )
    return name


_PRIMITIVE_AVRO: dict[type, str] = {
    T.ByteType: "int",
    T.ShortType: "int",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BooleanType: "boolean",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def avro_schema_of(schema: StructType, name: str = "topLevelRecord") -> dict:
    """Spark StructType → Avro record schema (JSON-able dict).

    The inverse of ``avro_fallback.spark_schema_ddl`` over the supported
    type subset. Nested record names are derived from the field path
    (``topLevelRecord.addr.geo`` → record ``r_addr_geo``) because Avro
    requires every record name in a schema to be unique.
    """

    def _avro_type(dt, path: str):
        for cls, prim in _PRIMITIVE_AVRO.items():
            if isinstance(dt, cls):
                return prim
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            # NTZ also maps to timestamp-micros: the fallback reader
            # (and spark-avro ≤3.x) has no local-timestamp logical
            # type, so NTZ round-trips back as TIMESTAMP with the same
            # wall clock — documented, never silently shifted.
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DecimalType):
            raise NotImplementedError(
                "avro fallback writer does not support DECIMAL columns "
                "(the fallback reader has no decimal logical type); "
                "cast to double/string or add spark-avro"
            )
        if isinstance(dt, T.ArrayType):
            item = _avro_type(dt.elementType, path + "_item")
            return {
                "type": "array",
                "items": ["null", item] if dt.containsNull else item,
            }
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise NotImplementedError(
                    "avro maps require string keys "
                    f"(got {dt.keyType.simpleString()} at {path})"
                )
            val = _avro_type(dt.valueType, path + "_value")
            return {
                "type": "map",
                "values": ["null", val] if dt.valueContainsNull else val,
            }
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": f"r_{path}" if path else name,
                "fields": [
                    {
                        "name": _check_avro_name(f.name, "field name"),
                        "type": (
                            ["null", _avro_type(f.dataType, f"{path}_{f.name}".lstrip("_"))]
                            if f.nullable
                            else _avro_type(f.dataType, f"{path}_{f.name}".lstrip("_"))
                        ),
                    }
                    for f in dt.fields
                ],
            }
        raise NotImplementedError(
            f"avro fallback writer: unsupported Spark type {dt.simpleString()} at {path!r}"
        )

    top = _avro_type(schema, "")
    top["name"] = _check_avro_name(name, "record name")
    return top


def _check_plan(schema: StructType, codec: str) -> None:
    """Plan-time refusals shared by the batch AND streaming writers:
    invalid Avro names / unsupported types / codecs must fail on the
    driver before any task (or micro-batch) runs. One helper so the two
    __init__s cannot drift apart."""
    avro_schema_of(schema)
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"avro fallback writer codec {codec!r} (null/deflate supported)"
        )


def _converter(dt) -> Callable:
    """Compile a Spark type → a converter taking the Python-worker value
    to the raw form ``avro_fallback._encode`` expects. Logical types
    convert with the exact integer inverse of the reader's decoders, so
    write→read round trips are value-identical in any session timezone.
    """
    if isinstance(dt, T.DateType):
        return lambda v: None if v is None else (v - _EPOCH_DATE).days
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return lambda v: None if v is None else (v - _EPOCH) // _US
    if isinstance(dt, T.BinaryType):
        return lambda v: None if v is None else bytes(v)
    if isinstance(dt, T.ArrayType):
        elem = _converter(dt.elementType)
        return lambda v: None if v is None else [elem(x) for x in v]
    if isinstance(dt, T.MapType):
        val = _converter(dt.valueType)
        return lambda v: None if v is None else {k: val(x) for k, x in v.items()}
    if isinstance(dt, T.StructType):
        convs = [(f.name, _converter(f.dataType)) for f in dt.fields]

        def conv_struct(v, convs=convs):
            if v is None:
                return None
            d = v.asDict() if hasattr(v, "asDict") else dict(v)
            return {n: c(d.get(n)) for n, c in convs}

        return conv_struct
    return lambda v: v


class _BlockFileWriter:
    """Stream rows into one Avro Object Container File, block-buffered."""

    def __init__(self, fh, avro_schema: dict, codec: str) -> None:
        if codec not in ("null", "deflate"):
            raise NotImplementedError(
                f"avro fallback writer codec {codec!r} (null/deflate supported)"
            )
        self.fh = fh
        self.schema = avro_schema
        self.codec = codec
        self.sync = uuid.uuid4().bytes  # 16-byte random sync marker
        self.buf = io.BytesIO()
        self.count = 0
        header = io.BytesIO()
        header.write(MAGIC)
        meta = {
            b"avro.schema": json.dumps(avro_schema).encode("utf-8"),
            b"avro.codec": codec.encode("ascii"),
        }
        _write_long(header, len(meta))
        for k, v in meta.items():
            _write_bytes(header, k)
            _write_bytes(header, v)
        _write_long(header, 0)
        header.write(self.sync)
        fh.write(header.getvalue())

    def append(self, record: dict) -> None:
        _encode(self.schema, record, self.buf)
        self.count += 1
        if self.buf.tell() >= _BLOCK_BYTES:
            self.flush_block()

    def flush_block(self) -> None:
        if not self.count:
            return
        raw = self.buf.getvalue()
        if self.codec == "deflate":
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = comp.compress(raw) + comp.flush()
        frame = io.BytesIO()
        _write_long(frame, self.count)
        _write_long(frame, len(raw))
        self.fh.write(frame.getvalue())
        self.fh.write(raw)
        self.fh.write(self.sync)
        self.buf = io.BytesIO()
        self.count = 0

    def close(self) -> None:
        self.flush_block()


@dataclass
class _Committed(WriterCommitMessage):
    tmp_names: tuple


def _write_partition(
    path: str,
    schema: StructType,
    codec: str,
    max_records: int | None,
    iterator: Iterator,
) -> _Committed:
    """One task: stream this partition's rows into uuid-named
    ``_part-*.avro.tmp`` container files the driver commit will rename,
    rolling to a new file every ``max_records`` rows (the
    maxRecordsPerFile contract — bounds worst-case file size exactly
    like Spark's built-in sinks).

    The staging names are UNDERSCORE-prefixed, not just
    ``.tmp``-suffixed: Spark file listings (binaryFile, spark-avro,
    every FileIndex) prune ``_``/``.``-prefixed names, so an
    uncommitted or crashed task's file is invisible to ANY reader of
    the directory — unlike jsonl, avro readers match files regardless
    of extension."""
    os.makedirs(path, exist_ok=True)
    avro_schema = avro_schema_of(schema)
    convs = [(f.name, _converter(f.dataType)) for f in schema.fields]
    tmp_names: list[str] = []
    fh = None
    w = None
    n_in_file = 0

    def _roll():
        nonlocal fh, w, n_in_file
        if fh is not None:
            w.close()
            fh.close()
        name = f"_part-{uuid.uuid4().hex}.avro.tmp"
        tmp_names.append(name)
        fh = open(os.path.join(path, name), "wb")
        w = _BlockFileWriter(fh, avro_schema, codec)
        n_in_file = 0

    try:
        for row in iterator:
            if fh is None or (max_records and n_in_file >= max_records):
                _roll()
            d = row.asDict()
            w.append({n: c(d.get(n)) for n, c in convs})
            n_in_file += 1
        if fh is None:
            _roll()  # empty partition: header-only file keeps the schema discoverable
        w.close()
    finally:
        # Close on ANY exit — a mid-partition converter error or full
        # disk must not leak the handle (the staged tmps themselves are
        # swept by abort()/the age-gated overwrite sweep).
        if fh is not None:
            fh.close()
    return _Committed(tmp_names=tuple(tmp_names))


def _remove_tmps(path: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        for name in m.tmp_names:
            tmp = os.path.join(path, name)
            if os.path.exists(tmp):
                os.remove(tmp)


def _max_records_opt(options: dict) -> int | None:
    v = options.get("maxrecordsperfile") or options.get("maxRecordsPerFile")
    # Spark's maxRecordsPerFile contract: zero-or-negative means NO
    # limit (callers port -1 configs); a naive positive check would
    # roll one file per record instead.
    return int(v) if v and int(v) > 0 else None


class AvroWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avrosink requires a save path")
        self.schema = schema
        self.codec = options.get("codec", "deflate")
        self.max_records = _max_records_opt(options)
        self.overwrite = overwrite
        _check_plan(schema, self.codec)

    def write(self, iterator: Iterator) -> _Committed:
        return _write_partition(
            self.path, self.schema, self.codec, self.max_records, iterator
        )

    #: Same age-gate discipline as the jsonl sink / compactor GC: a
    #: .tmp this much older than the sweeping commit is crashed-job
    #: litter, never a concurrent live job's staged file.
    TMP_LITTER_AGE_S = 3600.0

    def commit(self, messages) -> None:
        """Rename staged tmps to final names; on overwrite, truncate first.

        Overwrite semantics match spark-avro's (InsertIntoHadoopFsRelation
        deletes the output directory): every non-hidden entry goes —
        including data files a previous job wrote in ANOTHER format.
        Policy shared with the jsonl sink:
        :func:`sink_common.truncate_for_overwrite` (spares hidden
        entries, this job's own staging, and ANY format's fresh tmp —
        the age gate, not the suffix, separates live staging from
        crashed-job litter).
        """
        from parquet_compactor_spark.sources.sink_common import (
            truncate_for_overwrite,
        )

        # A zero-task job (empty/zero-partition frame) reaches commit
        # without any task having created the directory.
        os.makedirs(self.path, exist_ok=True)
        if self.overwrite:
            own = {n for m in messages if m is not None for n in m.tmp_names}
            truncate_for_overwrite(self.path, own, self.TMP_LITTER_AGE_S)
        for m in messages:
            if m is None:
                continue
            for name in m.tmp_names:
                final = name.lstrip("_")[: -len(".tmp")]
                os.rename(
                    os.path.join(self.path, name), os.path.join(self.path, final)
                )
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        _remove_tmps(self.path, messages)


class AvroStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch two-phase commit with idempotent epoch replay,
    mirroring ``JsonlStreamWriter``."""

    def __init__(self, options: dict, schema: StructType) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avrosink requires a path option")
        self.schema = schema
        self.codec = options.get("codec", "deflate")
        self.max_records = _max_records_opt(options)
        _check_plan(schema, self.codec)

    def write(self, iterator: Iterator) -> _Committed:
        return _write_partition(
            self.path, self.schema, self.codec, self.max_records, iterator
        )

    def commit(self, messages, batchId: int) -> None:
        os.makedirs(self.path, exist_ok=True)  # zero-task micro-batch
        prefix = f"batch-{batchId}-"
        for name in os.listdir(self.path):
            if name.startswith(prefix) and name.endswith(".avro"):
                os.remove(os.path.join(self.path, name))  # replayed epoch
        for m in messages:
            if m is None:
                continue
            for name in m.tmp_names:
                final = prefix + name.lstrip("_")[: -len(".tmp")]
                os.rename(
                    os.path.join(self.path, name), os.path.join(self.path, final)
                )

    def abort(self, messages, batchId: int) -> None:
        _remove_tmps(self.path, messages)


class AvroSinkDataSource(DataSource):
    """``spark.dataSource.register(AvroSinkDataSource)`` then
    ``df.write.format("avrosink").mode(...).save(path)``."""

    @classmethod
    def name(cls) -> str:
        return "avrosink"

    def writer(self, schema: StructType, overwrite: bool) -> AvroWriter:
        return AvroWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> AvroStreamWriter:
        return AvroStreamWriter(self.options, schema)


def register(spark) -> None:
    """Register the sink on a session. Unconditional: re-registering the
    same name is a cheap overwrite, while any driver-side cache keyed on
    the session object (or its id(), which CPython recycles) would
    silently skip a FRESH session and fail the save with 'Failed to
    find data source'."""
    spark.dataSource.register(AvroSinkDataSource)


def write_avro_fallback(
    df,
    path: str,
    mode: str = "overwrite",
    codec: str = "deflate",
    max_records_per_file: int | None = None,
) -> None:
    """Distributed avro write via the two-phase-commit sink."""
    register(df.sparkSession)
    writer = df.write.format("avrosink").mode(mode).option("codec", codec)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)
