"""Avro Object Container Files — read and write WITHOUT spark-avro.

The sandbox's Spark classpath ships orc-core but not the spark-avro
datasource, so Avro support is hand-rolled from the PUBLIC Apache Avro
specification (container format + binary encoding), the same stance as the
media codecs in operators/multimodal.py: pure Python/stdlib byte work,
Arrow-batched through Spark, loud on anything out of scope.

Format (spec, "Object Container Files"): magic ``Obj\\x01``; a file-metadata
map (``avro.schema`` JSON, ``avro.codec``); a 16-byte sync marker; then data
blocks of ``(row_count long, byte_size long, payload, sync)``. Binary
encoding: zigzag-varint ints/longs, little-endian IEEE float/double,
length-prefixed bytes/strings, 1-byte booleans, union = branch index then
value, record = fields in declared order. Codecs: ``null`` and ``deflate``
(raw RFC-1951, zlib wbits=-15) — the two the spec requires.

Scope: primitive types, ``["null", T]`` unions, records, and the
``timestamp-micros`` / ``timestamp-millis`` logical types — the tabular
subset. Arrays/maps/enums/fixed/recursive records raise loudly rather than
decode wrong.

Scale shape:

- **Read**: ``binaryFile`` source (one task per file — deflate-compressed
  Avro is not block-splittable, so per-file parallelism is what spark-avro
  itself gets) → ``mapInPandas`` walks blocks and yields Arrow batches.
  Nothing is collected; a 100 TB Avro estate is many files and the scan
  parallelizes across them.
- **Write**: ``mapInPandas`` over the source — each partition encodes its
  rows into one ``part-<pid>.avro`` under the target directory and yields
  a one-row manifest (path, rows). Distributed, no driver funnel.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC = b"sparkgraftavrosy"  # deterministic 16-byte sync marker for our writer
assert len(SYNC) == 16

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------

def _zz_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.p = 0

    def long(self) -> int:
        shift, acc = 0, 0
        while True:
            byte = self.b[self.p]
            self.p += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag

    def raw(self, n: int) -> bytes:
        out = self.b[self.p:self.p + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.p += n
        return out

    def eof(self) -> bool:
        return self.p >= len(self.b)


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------

def _field_decoder(sch):
    """Return fn(_Reader) -> python value for one schema node."""
    if isinstance(sch, dict) and sch.get("type") in _PRIMITIVES and "logicalType" not in sch:
        sch = sch["type"]
    if isinstance(sch, str):
        if sch == "null":
            return lambda r: None
        if sch == "boolean":
            return lambda r: r.raw(1) != b"\x00"
        if sch in ("int", "long"):
            return lambda r: r.long()
        if sch == "float":
            return lambda r: struct.unpack("<f", r.raw(4))[0]
        if sch == "double":
            return lambda r: struct.unpack("<d", r.raw(8))[0]
        if sch == "bytes":
            return lambda r: r.raw(r.long())
        if sch == "string":
            return lambda r: r.raw(r.long()).decode("utf-8")
        raise NotImplementedError(f"avro type {sch!r} outside the tabular subset")
    if isinstance(sch, list):  # union
        decoders = [_field_decoder(s) for s in sch]

        def du(r, d=decoders):
            return d[r.long()](r)

        return du
    if isinstance(sch, dict):
        t = sch.get("type")
        lt = sch.get("logicalType")
        if lt in ("timestamp-micros", "timestamp-millis") and t == "long":
            import datetime as _dt

            unit = 1_000_000 if lt == "timestamp-micros" else 1_000
            epoch = _dt.datetime(1970, 1, 1)

            def dts(r, unit=unit, epoch=epoch):
                v = r.long()
                return epoch + _dt.timedelta(microseconds=v * (1_000_000 // unit))

            return dts
        if lt is not None and isinstance(t, str) and t in _PRIMITIVES:
            return _field_decoder(t)  # unhandled logical type: raw base type
        if t == "record":
            fields = [(f["name"], _field_decoder(f["type"])) for f in sch["fields"]]

            def dr(r, fields=fields):
                return {name: dec(r) for name, dec in fields}

            return dr
        raise NotImplementedError(f"avro complex type {t!r} outside the tabular subset")
    raise NotImplementedError(f"unrecognized avro schema node: {sch!r}")


def parse_container(data: bytes):
    """(writer_schema dict, codec str, iterator of decoded row dicts)."""
    r = _Reader(data)
    if r.raw(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # block with byte size prefix
            n = -n
            r.long()
        for _ in range(n):
            k = r.raw(r.long()).decode("utf-8")
            meta[k] = r.raw(r.long())
    sync = r.raw(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} (spec requires null/deflate)")
    if schema.get("type") != "record":
        raise NotImplementedError("only record-typed container files")
    dec = _field_decoder(schema)

    def rows():
        while not r.eof():
            cnt = r.long()
            size = r.long()
            payload = r.raw(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            br = _Reader(payload)
            for _ in range(cnt):
                yield dec(br)
            if r.raw(16) != sync:
                raise ValueError("avro sync marker mismatch (corrupt block)")

    return schema, codec, rows()


# ---------------------------------------------------------------------------
# schema-driven encode
# ---------------------------------------------------------------------------

def _field_encoder(sch):
    if isinstance(sch, dict) and sch.get("type") in _PRIMITIVES and "logicalType" not in sch:
        sch = sch["type"]
    if isinstance(sch, str):
        if sch == "null":
            return lambda v: b""
        if sch == "boolean":
            return lambda v: b"\x01" if v else b"\x00"
        if sch in ("int", "long"):
            return lambda v: _zz_encode(int(v))
        if sch == "float":
            return lambda v: struct.pack("<f", float(v))
        if sch == "double":
            return lambda v: struct.pack("<d", float(v))
        if sch == "bytes":
            return lambda v: _zz_encode(len(v)) + bytes(v)
        if sch == "string":
            return lambda v: _zz_encode(len(v.encode("utf-8"))) + v.encode("utf-8")
        raise NotImplementedError(f"avro type {sch!r} outside the tabular subset")
    if isinstance(sch, list):  # union: null goes to the null branch
        encs = [_field_encoder(s) for s in sch]
        null_ix = sch.index("null") if "null" in sch else None
        other_ix = next((i for i, s in enumerate(sch) if s != "null"), None)

        def eu(v, encs=encs, null_ix=null_ix, other_ix=other_ix):
            if v is None:
                if null_ix is None:
                    raise ValueError("None for a union without a null branch")
                return _zz_encode(null_ix)
            return _zz_encode(other_ix) + encs[other_ix](v)

        return eu
    if isinstance(sch, dict):
        t = sch.get("type")
        lt = sch.get("logicalType")
        if lt in ("timestamp-micros", "timestamp-millis") and t == "long":
            import datetime as _dt

            unit = 1_000_000 if lt == "timestamp-micros" else 1_000
            epoch = _dt.datetime(1970, 1, 1)

            def ets(v, unit=unit, epoch=epoch):
                if hasattr(v, "to_pydatetime"):
                    v = v.to_pydatetime()
                if hasattr(v, "tzinfo") and v.tzinfo is not None:
                    v = v.replace(tzinfo=None)
                micros = round((v - epoch).total_seconds() * 1_000_000)
                return _zz_encode(micros * unit // 1_000_000)

            return ets
        if lt is not None and isinstance(t, str) and t in _PRIMITIVES:
            return _field_encoder(t)
        if t == "record":
            encs = [(f["name"], _field_encoder(f["type"])) for f in sch["fields"]]

            def er(row, encs=encs):
                return b"".join(enc(row[name]) for name, enc in encs)

            return er
        raise NotImplementedError(f"avro complex type {t!r} outside the tabular subset")
    raise NotImplementedError(f"unrecognized avro schema node: {sch!r}")


def write_container(path: str, schema: dict, rows, codec: str = "deflate",
                    block_rows: int = 4096) -> int:
    """Encode ``rows`` (iterable of dicts) into one container file; returns
    the row count. Deterministic output for deterministic input order."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    enc = _field_encoder(schema)
    total = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema, sort_keys=True).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        }
        f.write(_zz_encode(len(meta)))
        for k in sorted(meta):
            kb = k.encode("utf-8")
            f.write(_zz_encode(len(kb)) + kb)
            f.write(_zz_encode(len(meta[k])) + meta[k])
        f.write(_zz_encode(0))
        f.write(SYNC)

        buf, cnt = io.BytesIO(), 0

        def flush():
            nonlocal buf, cnt, total
            if not cnt:
                return
            payload = buf.getvalue()
            if codec == "deflate":
                c = zlib.compressobj(6, zlib.DEFLATED, -15)
                payload = c.compress(payload) + c.flush()
            f.write(_zz_encode(cnt) + _zz_encode(len(payload)) + payload + SYNC)
            total += cnt
            buf, cnt = io.BytesIO(), 0

        for row in rows:
            buf.write(enc(row))
            cnt += 1
            if cnt >= block_rows:
                flush()
        flush()
    return total


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def spark_schema_to_avro(df) -> dict:
    """Map a (flat) Spark schema to the Avro record schema we write.
    Every field is ``["null", T]`` — Spark columns are nullable by
    default and the union costs one varint per value."""
    from pyspark.sql import types as T

    m = {
        T.LongType: "long", T.IntegerType: "int", T.DoubleType: "double",
        T.FloatType: "float", T.StringType: "string", T.BooleanType: "boolean",
        T.BinaryType: "bytes",
    }
    fields = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            at = {"type": "long", "logicalType": "timestamp-micros"}
        else:
            prim = m.get(type(f.dataType))
            if prim is None:
                raise NotImplementedError(
                    f"column {f.name!r}: {f.dataType} outside the avro tabular subset"
                )
            at = prim
        fields.append({"name": f.name, "type": ["null", at]})
    return {"type": "record", "name": "row", "fields": fields}


def write_avro(df, out_dir: str, codec: str = "deflate"):
    """Distributed Avro sink: each partition writes one container file.
    Returns a small manifest DataFrame (file, n_rows) — the action that
    materializes it performs the writes.

    Runs over ``mapInArrow``, not ``mapInPandas``: Arrow keeps SQL NULL
    (validity bitmap) and IEEE NaN (value payload) distinct in float
    columns, so ``to_pylist()`` yields ``None`` only for genuine nulls
    and ``float('nan')`` for NaN — NaN round-trips as an encoded IEEE
    NaN double (the spark-avro behavior) instead of being silently
    mapped to the union's null branch, which a pandas float64 column
    (where nulls and NaN are the same bit pattern) cannot express."""
    import pyarrow as pa

    schema = spark_schema_to_avro(df)
    os.makedirs(out_dir, exist_ok=True)

    def write_parts(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows_iter = (row for rb in batches for row in rb.to_pylist())
        path = os.path.join(out_dir, f"part-{pid:05d}.avro")
        n = write_container(path, schema, rows_iter, codec=codec)
        if n == 0:
            os.remove(path)  # spec-valid but pointless empty container
        yield pa.RecordBatch.from_pydict({"file": [path], "n_rows": [n]})

    return df.mapInArrow(write_parts, "file string, n_rows long")


def read_avro(spark, path_glob: str, result_schema: str):
    """Distributed Avro scan: ``binaryFile`` lists + loads each container
    (one task per file — the same parallelism unit spark-avro has for
    deflate files), mapInArrow decodes blocks into Arrow batches.
    ``result_schema`` is the Spark DDL for the decoded columns.

    Arrow batches (not pandas frames) on the way back for the same
    reason write_avro uses them: a decoded IEEE NaN double must reach
    Spark as a NaN VALUE, and the pandas→Arrow hop treats float64 NaN
    as null — the Arrow path keeps validity and payload distinct."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    arrow_schema = to_arrow_schema(StructType.fromDDL(result_schema))
    files = spark.read.format("binaryFile").load(path_glob).select("content")

    def decode(batches):
        for rb in batches:
            for v in rb.column(0):
                _, _, rows = parse_container(v.as_py())
                chunk = []
                for rec in rows:
                    chunk.append(rec)
                    if len(chunk) >= 8192:
                        yield pa.RecordBatch.from_pylist(chunk, schema=arrow_schema)
                        chunk = []
                if chunk:
                    yield pa.RecordBatch.from_pylist(chunk, schema=arrow_schema)

    return files.mapInArrow(decode, result_schema)
