"""Pure-Python Avro Object Container File reader — the no-classpath
fallback behind ``read_table(..., fmt="avro")``.

Spark's avro support lives in the external ``spark-avro`` package; in an
environment that cannot add jars (air-gapped clusters, this sandbox) the
format was previously a hard ImportError. This module opens that gate
with a Spark-FIRST fallback: the driver sniffs ONE file header for the
embedded writer schema (schema resolution is driver-side metadata, KBs),
then the files themselves are read DISTRIBUTED via the binaryFile source
and decoded executor-side in Arrow-batched ``mapInPandas`` — no data
bytes ever reach the driver, and decode parallelism is one task per
file-split exactly like any other source.

Implements the public Avro 1.11 spec (container format + binary
encoding): magic ``Obj\\x01``, avro-encoded metadata map carrying
``avro.schema``/``avro.codec``, 16-byte sync markers, zigzag-varint
longs, IEEE little-endian floats, length-prefixed bytes/strings, and the
full type subset a lake actually stores: primitives, records, enums,
fixed, arrays, maps, named-type references, ``[null, T]`` unions →
nullable columns, and the timestamp-micros/millis + date logical types.
Codecs: null and deflate (raw zlib); snappy needs python-snappy and
raises actionably when absent.

Scale notes: binaryFile loads a whole file per row, so decode memory is
O(largest file) per task — the normal Avro-on-Spark contract (spark-avro
splits blocks, this fallback splits files; Avro lakes are many-file by
construction). The embedded writer schema of the FIRST listed file
defines the session schema; files written with a different schema fail
loudly at decode, never silently coerce.

Writes: a driver-side writer (``write_avro_records``) exists for
fixtures and small sidecar exports; the DISTRIBUTED write path is
``avro_sink.py`` — a two-phase-commit Python DataSource sink reusing
this module's binary encoder, wired into ``write_table(fmt="avro")``
as the no-classpath fallback.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from datetime import date, datetime, timedelta

MAGIC = b"Obj\x01"
_EPOCH = datetime(1970, 1, 1)
_EPOCH_DATE = date(1970, 1, 1)


# --------------------------------------------------------------------------
# binary decoding primitives (Avro spec §"Binary encoding")
# --------------------------------------------------------------------------


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b


def _read_long(c: _Cursor) -> int:
    """Zigzag varint (int and long share the encoding)."""
    shift = 0
    acc = 0
    while True:
        byte = c.buf[c.pos]
        c.pos += 1
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(c: _Cursor) -> bytes:
    return c.take(_read_long(c))


def _read_map_of_bytes(c: _Cursor) -> dict[bytes, bytes]:
    """The file-metadata map: map<string, bytes> with block counts."""
    out: dict[bytes, bytes] = {}
    while True:
        n = _read_long(c)
        if n == 0:
            return out
        if n < 0:  # negative count → a byte size follows (skippable form)
            n = -n
            _read_long(c)
        for _ in range(n):
            key = _read_bytes(c)
            out[key] = _read_bytes(c)


# --------------------------------------------------------------------------
# schema → decoder and Spark type
# --------------------------------------------------------------------------

_PRIMITIVES = {
    "null": (lambda c: None, "void"),
    "boolean": (lambda c: c.take(1) == b"\x01", "boolean"),
    "int": (_read_long, "int"),
    "long": (_read_long, "long"),
    "float": (lambda c: struct.unpack("<f", c.take(4))[0], "float"),
    "double": (lambda c: struct.unpack("<d", c.take(8))[0], "double"),
    "bytes": (_read_bytes, "binary"),
    "string": (lambda c: _read_bytes(c).decode("utf-8"), "string"),
}


def _register_named(named: dict, schema: dict, ns: str | None, entry: tuple) -> None:
    """Register an enum/fixed under its simple AND qualified names
    (records do this inline; same-simple-name definitions in different
    namespaces shadow on the simple key — qualified references stay
    unambiguous)."""
    eff_ns = schema.get("namespace", ns)
    named[schema["name"]] = entry
    if eff_ns:
        named[f"{eff_ns}.{schema['name']}"] = entry


#: Type marker for a reference hit while its record is still compiling —
#: a recursive schema. Decoding recursive records to nested dicts works
#: fine (the decoder closure is lazy); only the SPARK COLUMN TYPE is
#: unrepresentable, so the marker propagates through the type algebra
#: (array<...>, struct fields) and spark_schema_ddl rejects it at the
#: point the DDL is actually needed.
_RECURSIVE = "<<recursive>>"
_IN_PROGRESS = object()


def _logical(schema: dict):
    """Return (decoder, spark_type) for a recognized logical type, else None."""
    lt = schema.get("logicalType")
    t = schema.get("type")
    if lt == "timestamp-micros" and t == "long":
        return (lambda c: _EPOCH + timedelta(microseconds=_read_long(c)), "timestamp")
    if lt == "timestamp-millis" and t == "long":
        return (lambda c: _EPOCH + timedelta(milliseconds=_read_long(c)), "timestamp")
    if lt == "date" and t == "int":
        return (lambda c: _EPOCH_DATE + timedelta(days=_read_long(c)), "date")
    return None


def _compile(schema, named: dict[str, tuple], ns: str | None = None) -> tuple:
    """Recursively build (decoder(cursor) -> value, spark_ddl_type).

    ``named`` registers record/enum/fixed definitions under BOTH their
    simple and namespace-qualified full names, so later references in
    either spelling resolve (the spec allows inline or by-name, and
    nested definitions inherit the enclosing namespace ``ns``).
    """
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _PRIMITIVES[schema]
        # Spec resolution order: a bare name resolves against the
        # namespace in effect FIRST — the simple key is shadowable by a
        # same-named definition in another namespace.
        qualified = f"{ns}.{schema}" if ns and "." not in schema else schema
        key = qualified if qualified in named else schema
        if key in named:
            dec, typ = named[key]
            if typ is _IN_PROGRESS:
                # Reference to a record still being compiled — a recursive
                # schema (legal Avro). The decoder works (lazy closure);
                # mark the type so only DDL consumers reject it.
                return dec, _RECURSIVE
            return dec, typ
        raise NotImplementedError(f"unresolved avro type reference: {schema}")

    if isinstance(schema, list):  # union
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1 or len(schema) > 2:
            raise NotImplementedError(
                f"only [null, T] unions are supported, got {schema}"
            )
        dec, typ = _compile(branches[0], named, ns)
        null_index = schema.index("null") if "null" in schema else -1

        def union_dec(c, dec=dec, null_index=null_index):
            idx = _read_long(c)
            if idx == null_index:
                return None
            return dec(c)

        return union_dec, typ

    t = schema["type"]
    log = _logical(schema)
    if log:
        return log
    if t in _PRIMITIVES:
        return _PRIMITIVES[t]

    if t == "record":
        rec_ns = schema.get("namespace", ns)
        fullname = (f"{rec_ns}." if rec_ns else "") + schema["name"]
        fields: list[tuple] = []

        def rec_dec(c, fields=fields):
            return {name: d(c) for name, d, _ in fields}

        # Pre-register with an IN-PROGRESS sentinel type: a reference hit
        # while the record is still compiling marks its type _RECURSIVE
        # (decode stays possible; Spark DDL production rejects it).
        named[fullname] = (rec_dec, _IN_PROGRESS)
        named[schema["name"]] = named[fullname]
        for f in schema["fields"]:
            # Nested definitions inherit this record's namespace (spec).
            d, typ = _compile(f["type"], named, rec_ns)
            fields.append((f["name"], d, typ))
        ddl = "struct<" + ",".join(f"{n}:{typ}" for n, _, typ in fields) + ">"
        named[fullname] = (rec_dec, ddl)
        named[schema["name"]] = named[fullname]
        return rec_dec, ddl

    if t == "enum":
        symbols = schema["symbols"]
        dec = lambda c, s=symbols: s[_read_long(c)]  # noqa: E731
        _register_named(named, schema, ns, (dec, "string"))
        return dec, "string"

    if t == "fixed":
        size = schema["size"]
        dec = lambda c, n=size: c.take(n)  # noqa: E731
        _register_named(named, schema, ns, (dec, "binary"))
        return dec, "binary"

    if t == "array":
        item_dec, item_typ = _compile(schema["items"], named, ns)

        def arr_dec(c, item_dec=item_dec):
            out = []
            while True:
                n = _read_long(c)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(c)
                for _ in range(n):
                    out.append(item_dec(c))

        return arr_dec, f"array<{item_typ}>"

    if t == "map":
        val_dec, val_typ = _compile(schema["values"], named, ns)

        def map_dec(c, val_dec=val_dec):
            out = {}
            while True:
                n = _read_long(c)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(c)
                for _ in range(n):
                    # NB: assignment would evaluate the RHS before the key
                    # subscript — read the key into a local first.
                    key = _read_bytes(c).decode("utf-8")
                    out[key] = val_dec(c)

        return map_dec, f"map<string,{val_typ}>"

    raise NotImplementedError(f"unsupported avro type: {t}")


# --------------------------------------------------------------------------
# container file parsing
# --------------------------------------------------------------------------


def parse_header(buf: bytes) -> tuple[dict, str, bytes, int]:
    """-> (schema_json, codec, sync_marker, body_offset)."""
    c = _Cursor(buf)
    if c.take(4) != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta = _read_map_of_bytes(c)
    schema = json.loads(meta[b"avro.schema"].decode("utf-8"))
    codec = meta.get(b"avro.codec", b"null").decode("ascii")
    sync = c.take(16)
    return schema, codec, sync, c.pos


def _decompress(data: bytes, codec: str) -> bytes:
    if codec == "null":
        return data
    if codec == "deflate":
        return zlib.decompress(data, -15)
    if codec == "snappy":
        try:
            import snappy  # type: ignore
        except ImportError as err:  # pragma: no cover - env-dependent
            raise ImportError(
                "avro file uses the snappy codec; pip install python-snappy "
                "or rewrite the lake with deflate/null"
            ) from err
        return snappy.decompress(data[:-4])  # trailing CRC32 per spec
    raise NotImplementedError(f"unsupported avro codec: {codec}")


def iter_file_records(buf: bytes):
    """Decode every record of one container file (executor-side)."""
    schema, codec, sync, pos = parse_header(buf)
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise NotImplementedError("top-level avro schema must be a record")
    dec, _ = _compile(schema, {})
    c = _Cursor(buf, pos)
    while c.pos < len(buf):
        count = _read_long(c)
        size = _read_long(c)
        block = _Cursor(_decompress(c.take(size), codec))
        for _ in range(count):
            yield dec(block)
        if c.take(16) != sync:
            raise ValueError("avro block sync mismatch (corrupt file)")


def spark_schema_ddl(schema: dict) -> str:
    """Top-level record schema → Spark DDL column list.

    Raises NotImplementedError for recursive record schemas: the
    pure-Python decoder handles them (nested dicts), but no finite Spark
    column type exists for them.
    """
    _, ddl = _compile(schema, {})
    if _RECURSIVE in ddl:
        raise NotImplementedError(
            "recursive avro record schemas are not representable as Spark "
            "column types (iter_file_records can still decode them)"
        )
    # struct<a:int,b:string> → "a int, b string" at the top level.
    assert ddl.startswith("struct<") and ddl.endswith(">")
    inner = ddl[len("struct<") : -1]
    cols = []
    depth = 0
    start = 0
    for i, ch in enumerate(inner + ","):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            name, typ = inner[start:i].split(":", 1)
            cols.append(f"`{name}` {typ}")
            start = i + 1
    return ", ".join(cols)


# --------------------------------------------------------------------------
# the Spark-facing read path
# --------------------------------------------------------------------------


def read_avro_fallback(spark, path: str, **options: str):
    """Distributed Avro read without spark-avro.

    Driver: sniff the first file's header for the writer schema.
    Executors: binaryFile rows → mapInPandas pure-Python block decode.
    """
    import fnmatch

    from parquet_compactor_spark.compactor.fs import HadoopFS

    fs = HadoopFS(spark, path)
    # The sniff MUST see the same file set binaryFile will read, or the
    # session schema could come from a file the executors never decode:
    # honor pathGlobFilter, restrict to direct children of the load path
    # unless recursiveFileLookup, and prune files under HIDDEN
    # DIRECTORIES (Spark's file index prunes whole hidden dirs; the py4j
    # iterator surfaces their contents).
    glob = options.get("pathGlobFilter")
    if glob and any(ch in glob for ch in "{}^"):
        # fnmatch has no {a,b} alternation, and class negation is [!x]
        # not [^x] — refusing beats silently diverging from Hadoop's
        # GlobFilter semantics.
        raise NotImplementedError(
            "avro fallback supports only *, ?, and [!...] classes in "
            f"pathGlobFilter (got {glob!r}); add spark-avro for full "
            "Hadoop glob syntax"
        )
    recursive = str(options.get("recursiveFileLookup", "")).lower() == "true"
    # Qualify the base through the SAME FileSystem that produced the
    # listing, so parent comparisons are URI-vs-URI (a bare /data path
    # vs hdfs://nn:8020/data listing entries would never match on
    # string suffixes).
    base = fs.qualified(path.rstrip("/"))

    def _visible(p: str) -> bool:
        name = p.rsplit("/", 1)[-1]
        if name.startswith(("_", ".")):
            return False
        if glob and not fnmatch.fnmatch(name, glob):
            return False
        parent = p[: p.rfind("/")]
        if not recursive:
            if parent != base and p != base:
                return False  # nested file; binaryFile won't read it
        elif parent.startswith(base + "/"):
            rel_dirs = parent[len(base) + 1 :].split("/")
            if any(seg.startswith(("_", ".")) for seg in rel_dirs):
                return False  # Spark prunes whole hidden directories
        return True

    listed = [f for f in fs.list_files(path) if _visible(f.path)]
    if not listed:
        raise FileNotFoundError(f"no avro files under {path}")
    header_buf = fs.read_bytes(sorted(f.path for f in listed)[0])
    schema, _codec, _sync, _pos = parse_header(header_buf)
    ddl = spark_schema_ddl(schema)
    col_names = [f["name"] for f in schema["fields"]]

    binary_opts = {
        k: v for k, v in options.items() if k in ("pathGlobFilter", "recursiveFileLookup")
    }
    blobs = (
        spark.read.format("binaryFile").options(**binary_opts).load(path)
        .select("content")
    )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(iter_file_records(bytes(blob)))
                yield pd.DataFrame(
                    {n: [r[n] for r in rows] for n in col_names},
                    columns=col_names,
                )

    return blobs.mapInPandas(decode, schema=ddl)


# --------------------------------------------------------------------------
# binary encoder + driver-side fixture writer (the DISTRIBUTED write
# path is avro_sink.py, which reuses _encode/_write_* from here)
# --------------------------------------------------------------------------


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _encode(schema, value, out: io.BytesIO, named: dict | None = None, ns: str | None = None) -> None:
    named = named if named is not None else {}
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        # Resolve record/enum/fixed references, simple or fullname —
        # qualified-by-effective-namespace first, mirroring the reader.
        qualified = f"{ns}.{schema}" if ns and "." not in schema else schema
        key = qualified if qualified in named else schema
        if key in named:
            schema = named[key]
    if isinstance(schema, list):  # [null, T]
        branches = [b for b in schema if b != "null"]
        if value is None:
            _write_long(out, schema.index("null"))
            return
        _write_long(out, schema.index(branches[0]))
        _encode(branches[0], value, out, named, ns)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        rec_ns = schema.get("namespace", ns)
        _register_named(named, schema, ns, schema)
        for f in schema["fields"]:
            _encode(f["type"], value[f["name"]], out, named, rec_ns)
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(schema["items"], v, out, named, ns)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out, named, ns)
        _write_long(out, 0)
    elif t == "enum":
        _register_named(named, schema, ns, schema)
        _write_long(out, schema["symbols"].index(value))
    elif t == "fixed":
        _register_named(named, schema, ns, schema)
        out.write(value)
    elif t in ("int", "long"):
        _write_long(out, value)
    elif t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t == "float":
        out.write(struct.pack("<f", value))
    elif t == "double":
        out.write(struct.pack("<d", value))
    elif t == "bytes":
        _write_bytes(out, value)
    elif t == "string":
        _write_bytes(out, value.encode("utf-8"))
    elif t == "null":
        pass
    else:
        raise NotImplementedError(f"writer: unsupported type {t}")


def write_avro_records(
    path: str, schema: dict, records: list[dict], codec: str = "deflate"
) -> None:
    """Write one container file driver-side (test fixtures, tiny exports)."""
    sync = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        b"avro.schema": json.dumps(schema).encode("utf-8"),
        b"avro.codec": codec.encode("ascii"),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k)
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    body = io.BytesIO()
    for r in records:
        _encode(schema, r, body)
    raw = body.getvalue()
    if codec == "deflate":
        compressor = zlib.compressobj(9, zlib.DEFLATED, -15)
        raw = compressor.compress(raw) + compressor.flush()
    elif codec != "null":
        raise NotImplementedError(f"writer codec: {codec}")
    _write_long(out, len(records))
    _write_long(out, len(raw))
    out.write(raw)
    out.write(sync)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())
