"""Minimal Avro Object Container File reader/writer (pure Python,
public Avro 1.x spec) + a distributed ingest stage.

The reference ingests Avro features through its converter family
(geomesa-convert/README.md; Avro serialization of features at
geomesa-features/.../SerializationType.scala:12-16). This engine's
container ships no spark-avro module jar, so ingest uses a spec-
compliant pure-Python decoder: files arrive via the `binaryFile`
source (one task per file — parallelism by file count, the natural
unit for OCF) and each task decodes its blocks with zigzag-varint
primitives. Supported: null/boolean/int/long/float/double/bytes/
string, records (nested -> struct), arrays, maps, unions with null
(-> nullable); codecs null and deflate.

NOTE: per-record Python decode is a *boundary adapter*, not a hot
path — on a cluster with the spark-avro module available, swap
`avro_ingest` for `spark.read.format("avro")` and keep the same
ConvertSpec; the declarative transform layer does not change.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------


def _decoder(schema):
    """Compile an Avro schema (parsed JSON) into a decode closure."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return lambda buf: None
        if t == "boolean":
            return lambda buf: buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long
        if t == "float":
            return lambda buf: struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return lambda buf: struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes
        if t == "string":
            return lambda buf: _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unsupported avro type {t!r}")
    if isinstance(schema, list):  # union — [null, T] and friends
        subs = [_decoder(s) for s in schema]

        def du(buf):
            return subs[_read_long(buf)](buf)

        return du
    t = schema["type"]
    if t == "record":
        fields = [(f["name"], _decoder(f["type"])) for f in schema["fields"]]

        def dr(buf):
            return {name: dec(buf) for name, dec in fields}

        return dr
    if t == "array":
        item = _decoder(schema["items"])

        def da(buf):
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)  # block byte size, unused
                    n = -n
                out.extend(item(buf) for _ in range(n))

        return da
    if t == "map":
        val = _decoder(schema["values"])

        def dm(buf):
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    # key MUST decode before the value: Python
                    # evaluates the assignment RHS first, which would
                    # reverse the wire order
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = val(buf)

        return dm
    if t in ("enum",):
        symbols = schema["symbols"]
        return lambda buf: symbols[_read_long(buf)]
    if t == "fixed":
        size = schema["size"]
        return lambda buf: buf.read(size)
    return _decoder(t)  # {"type": "string"} wrapper form


def read_avro_bytes(data: bytes) -> tuple[dict, list[dict]]:
    """Decode one OCF byte blob -> (schema_json, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    dec = _decoder(schema)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n_rec = _read_long(buf)
        blob = _read_bytes(buf)
        if codec == "deflate":
            blob = zlib.decompress(blob, -15)
        bbuf = io.BytesIO(blob)
        for _ in range(n_rec):
            records.append(dec(bbuf))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records


# ---------------------------------------------------------------------------
# schema-driven encode (test/fixture writer)
# ---------------------------------------------------------------------------


def _encoder(schema):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return lambda out, v: None
        if t == "boolean":
            return lambda out, v: out.write(b"\x01" if v else b"\x00")
        if t in ("int", "long"):
            return lambda out, v: _write_long(out, int(v))
        if t == "float":
            return lambda out, v: out.write(struct.pack("<f", v))
        if t == "double":
            return lambda out, v: out.write(struct.pack("<d", v))
        if t == "bytes":
            def eb(out, v):
                _write_long(out, len(v))
                out.write(v)
            return eb
        if t == "string":
            def es(out, v):
                b = v.encode("utf-8")
                _write_long(out, len(b))
                out.write(b)
            return es
        raise ValueError(f"unsupported avro type {t!r}")
    if isinstance(schema, list):
        subs = [(_encoder(s), s) for s in schema]

        def eu(out, v):
            for i, (enc, s) in enumerate(subs):
                if (v is None) == (s == "null"):
                    _write_long(out, i)
                    enc(out, v)
                    return

        return eu
    t = schema["type"]
    if t == "record":
        fields = [(f["name"], _encoder(f["type"])) for f in schema["fields"]]

        def er(out, v):
            for name, enc in fields:
                enc(out, v[name])

        return er
    if t == "array":
        item = _encoder(schema["items"])

        def ea(out, v):
            if v:
                _write_long(out, len(v))
                for x in v:
                    item(out, x)
            _write_long(out, 0)

        return ea
    if t == "map":
        val = _encoder(schema["values"])

        def em(out, v):
            if v:
                _write_long(out, len(v))
                for k, x in v.items():
                    kb = k.encode("utf-8")
                    _write_long(out, len(kb))
                    out.write(kb)
                    val(out, x)
            _write_long(out, 0)

        return em
    if t == "enum":
        symbols = schema["symbols"]
        return lambda out, v: _write_long(out, symbols.index(v))
    if t == "fixed":
        size = schema["size"]

        def ef(out, v):
            if len(v) != size:
                raise ValueError(f"fixed size {size} != {len(v)}")
            out.write(v)

        return ef
    return _encoder(t)


def write_avro_file(
    path: str, schema: dict, records: list[dict], codec: str = "null"
) -> None:
    """Write records as one OCF block (fixture/test writer)."""
    sync = bytes(range(16))
    enc = _encoder(schema)
    body = io.BytesIO()
    for r in records:
        enc(body, r)
    blob = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        blob = co.compress(blob) + co.flush()
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        }
        out = io.BytesIO()
        _write_long(out, len(meta))
        for k, v in meta.items():
            kb = k.encode("utf-8")
            _write_long(out, len(kb))
            out.write(kb)
            _write_long(out, len(v))
            out.write(v)
        _write_long(out, 0)
        f.write(out.getvalue())
        f.write(sync)
        blk = io.BytesIO()
        _write_long(blk, len(records))
        _write_long(blk, len(blob))
        blk.write(blob)
        f.write(blk.getvalue())
        f.write(sync)


# ---------------------------------------------------------------------------
# Spark type mapping
# ---------------------------------------------------------------------------


def avro_to_spark_type(schema):
    """Avro schema -> Spark DataType (the GeoMesaSparkSql.scala:
    187-226 mapping generalized to Avro primitives)."""
    from pyspark.sql import types as T

    if isinstance(schema, str):
        return {
            "null": T.NullType(),
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }[schema]
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError("only [null, T] unions supported")
        return avro_to_spark_type(non_null[0])
    t = schema["type"]
    if t == "record":
        from pyspark.sql import types as T

        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark_type(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    if t == "array":
        from pyspark.sql import types as T

        return T.ArrayType(avro_to_spark_type(schema["items"]), True)
    if t == "map":
        from pyspark.sql import types as T

        return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]), True)
    if t == "enum":
        from pyspark.sql import types as T

        return T.StringType()
    if t == "fixed":
        from pyspark.sql import types as T

        return T.BinaryType()
    return avro_to_spark_type(t)
