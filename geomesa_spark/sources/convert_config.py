"""Converter *config* front-end: parse the reference's converter
definition files (HOCON subset) and transform DSL into a
:class:`~geomesa_spark.sources.convert.ConvertSpec`.

Reference: geomesa-convert/README.md defines a converter as a HOCON
block::

    converter = {
      type     = "delimited-text",
      format   = "CSV",
      id-field = "md5(string2bytes($0))",
      fields = [
        { name = "phrase", transform = "concatenate($1, $2)" },
        { name = "lat",    transform = "$4::double" },
        { name = "geom",   transform = "point($lon, $lat)" }
      ]
    }

with transform expressions drawn from the function registry in
geomesa-convert-common/.../Transformers.scala (585 LoC; names listed
in README.md "Transformation Functions").  Here each transform
compiles to a Spark SQL expression string (whole-stage codegen, no
Python in the row path), field-to-field references (``$lon``) are
inlined at compile time, and the resulting ``ConvertSpec`` is the
same declarative layer already used by hand-written ingest.

Semantics deltas vs the reference (documented, not silent):

* strict casts (``::int`` etc.): the reference fails the *record*;
  here they compile to ``try_cast`` and yield NULL (pass
  ``drop_invalid=True`` to ``delimited_config_ingest`` to drop rows
  where any strictly-cast SFT field came out NULL from non-NULL
  input — the closest distributed analog).
* ``uuid()`` is nondeterministic in both engines.
* ``lineNo()``/``lineNumber()`` have no distributed equivalent and
  raise at compile time.
"""

from __future__ import annotations

import csv
import io
import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_spark.sources.convert import ConvertSpec

# ---------------------------------------------------------------------------
# HOCON-subset parser (objects, arrays, "=" or ":", optional commas,
# quoted + unquoted scalars, # and // comments).  The reference uses
# Typesafe Config; converter files only exercise this subset.
# ---------------------------------------------------------------------------

_HOCON_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*|//[^\n]*)
  | (?P<brace>[{}\[\],])
  | (?P<assign>[=:])
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<bare>[^\s{}\[\],=:"]+)
    """,
    re.VERBOSE,
)


def _hocon_tokens(text: str) -> list[str]:
    out, pos = [], 0
    while pos < len(text):
        m = _HOCON_TOKEN.match(text, pos)
        if m is None:
            raise ValueError(f"bad converter config at char {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            out.append(m.group())
    return out


class _HoconParser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def parse_value(self):
        tok = self.next()
        if tok == "{":
            return self.parse_object()
        if tok == "[":
            return self.parse_array()
        if tok.startswith('"'):
            return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        low = tok.lower()
        if low in ("true", "false"):
            return low == "true"
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            pass
        return tok  # unquoted string

    def parse_object(self) -> dict:
        # '{' already consumed
        obj = {}
        while True:
            tok = self.peek()
            if tok is None:
                raise ValueError("unterminated object in converter config")
            if tok == "}":
                self.next()
                return obj
            if tok == ",":
                self.next()
                continue
            key = self.next()
            if key.startswith('"'):
                key = key[1:-1]
            if self.peek() in ("=", ":"):
                self.next()
            obj[key] = self.parse_value()

    def parse_array(self) -> list:
        arr = []
        while True:
            tok = self.peek()
            if tok is None:
                raise ValueError("unterminated array in converter config")
            if tok == "]":
                self.next()
                return arr
            if tok == ",":
                self.next()
                continue
            arr.append(self.parse_value())


def parse_hocon(text: str) -> dict:
    """Parse a converter config file into a plain dict.

    Accepts either a bare object (``{...}``) or top-level
    ``key = value`` pairs (the README's ``converter = {...}`` form).
    """
    toks = _hocon_tokens(text)
    p = _HoconParser(toks)
    if p.peek() == "{":
        p.next()
        return p.parse_object()
    # top-level key = value pairs, no surrounding braces
    obj = {}
    while p.peek() is not None:
        if p.peek() == ",":
            p.next()
            continue
        key = p.next()
        if key.startswith('"'):
            key = key[1:-1]
        if p.peek() in ("=", ":"):
            p.next()
        obj[key] = p.parse_value()
    return obj


# ---------------------------------------------------------------------------
# Transform-expression compiler.  Grammar (Transformers.scala parser):
#     expr   := atom ('::' TYPE)*
#     atom   := NAME '(' args ')' | '$' REF | STRING | NUMBER
# Output is a Spark SQL expression string.
# ---------------------------------------------------------------------------

_EXPR_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<cast>::[a-zA-Z]+)
  | (?P<ref>\$(?:[0-9]+|[A-Za-z_][A-Za-z0-9_]*))
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<number>-?[0-9]+(?:\.[0-9]+)?[LlFfDd]?)
  | (?P<paren>[(),])
    """,
    re.VERBOSE,
)


def _sq(val: str) -> str:
    """SQL single-quoted literal."""
    return "'" + val.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _joda_to_spark_fmt(fmt: str) -> str:
    """Translate the Joda-time patterns converter configs use into
    Spark (java.time) patterns: YYYY(year-of-era) -> yyyy, ZZ -> XXX."""
    return fmt.replace("YYYY", "yyyy").replace("ZZ", "XXX")


def _point_sql(args: list[str]) -> str:
    if len(args) == 2:  # point(lon, lat) — lon first, README "Ordering"
        return (
            f"named_struct('lon', cast({args[0]} as double), "
            f"'lat', cast({args[1]} as double))"
        )
    # point($wkt): parse 'POINT (x y)' into the lon/lat struct
    x = args[0]
    pat = r"(?i)POINT\\s*\\(\\s*(-?[0-9.]+)\\s+(-?[0-9.]+)\\s*\\)"
    return (
        f"named_struct('lon', cast(regexp_extract({x}, '{pat}', 1) as double), "
        f"'lat', cast(regexp_extract({x}, '{pat}', 2) as double))"
    )


def _parse_list_sql(args: list[str]) -> str:
    typ = args[0].strip("'").lower()
    delim = args[2] if len(args) > 2 else "','"
    sql_t = _PRIM_SQL.get(typ, "string")
    if sql_t == "string":
        return f"transform(split({args[1]}, {delim}), v -> trim(v))"
    return f"transform(split({args[1]}, {delim}), v -> try_cast(trim(v) as {sql_t}))"


def _parse_map_sql(args: list[str]) -> str:
    kv = args[0].strip("'").lower()  # e.g. 'int -> string'
    k_t, v_t = (s.strip() for s in kv.split("->"))
    delim = args[2] if len(args) > 2 else "','"
    kvdelim = args[3] if len(args) > 3 else "'->'"
    base = f"str_to_map({args[1]}, {delim}, {kvdelim})"
    k_sql, v_sql = _PRIM_SQL.get(k_t, "string"), _PRIM_SQL.get(v_t, "string")
    if k_sql != "string":
        base = f"transform_keys({base}, (k, v) -> try_cast(trim(k) as {k_sql}))"
    else:
        base = f"transform_keys({base}, (k, v) -> trim(k))"
    if v_sql != "string":
        base = f"transform_values({base}, (k, v) -> try_cast(trim(v) as {v_sql}))"
    else:
        base = f"transform_values({base}, (k, v) -> trim(v))"
    return base


_PRIM_SQL = {
    "int": "int",
    "integer": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "bool": "boolean",
    "string": "string",
}

_CAST_SQL = {
    "::int": "int",
    "::integer": "int",
    "::long": "bigint",
    "::float": "float",
    "::double": "double",
    "::boolean": "boolean",
    "::bool": "boolean",
}

_UNSUPPORTED = {"lineNo", "lineNumber"}

# function name -> SQL builder over already-compiled arg SQL strings.
# Names and arities follow geomesa-convert/README.md + Transformers.scala.
_FUNCS: dict = {
    "try": lambda a: f"coalesce({a[0]}, {a[1]})",
    "stripQuotes": lambda a: f"regexp_replace({a[0]}, '\"', '')",
    "length": lambda a: f"length({a[0]})",
    "strlen": lambda a: f"length({a[0]})",
    "stringLength": lambda a: f"length({a[0]})",
    "trim": lambda a: f"trim({a[0]})",
    "capitalize": lambda a: f"initcap({a[0]})",
    "lowercase": lambda a: f"lower({a[0]})",
    "uppercase": lambda a: f"upper({a[0]})",
    # regexReplace(pattern, replacement, input) — README arg order
    "regexReplace": lambda a: f"regexp_replace({a[2]}, {a[0]}, {a[1]})",
    "concat": lambda a: f"concat({', '.join(a)})",
    "concatenate": lambda a: f"concat({', '.join(a)})",
    # substring(x, start, end): 0-based, end-exclusive in the reference
    "substring": lambda a: f"substring({a[0]}, ({a[1]}) + 1, ({a[2]}) - ({a[1]}))",
    "substr": lambda a: f"substring({a[0]}, ({a[1]}) + 1, ({a[2]}) - ({a[1]}))",
    "toString": lambda a: f"cast({a[0]} as string)",
    "now": lambda a: "current_timestamp()",
    "dateTime": lambda a: f"try_to_timestamp({a[0]})",
    "datetime": lambda a: f"try_to_timestamp({a[0]})",
    "isodatetime": lambda a: f"try_to_timestamp({a[0]})",
    "isodate": lambda a: f"try_to_timestamp({a[0]}, 'yyyyMMdd')",
    "basicDate": lambda a: f"try_to_timestamp({a[0]}, 'yyyyMMdd')",
    "basicDateTime": lambda a: (
        f"try_to_timestamp(regexp_replace({a[0]}, 'Z$', '+0000'), "
        f'"yyyyMMdd\'T\'HHmmss.SSSZ")'
    ),
    "basicDateTimeNoMillis": lambda a: (
        f"try_to_timestamp(regexp_replace({a[0]}, 'Z$', '+0000'), "
        f'"yyyyMMdd\'T\'HHmmssZ")'
    ),
    "dateHourMinuteSecondMillis": lambda a: (
        f"try_to_timestamp(regexp_replace({a[0]}, 'Z$', ''), "
        f'"yyyy-MM-dd\'T\'HH:mm:ss.SSS")'
    ),
    "millisToDate": lambda a: f"timestamp_millis(cast({a[0]} as bigint))",
    "secsToDate": lambda a: f"timestamp_seconds(cast({a[0]} as bigint))",
    "point": _point_sql,
    "linestring": lambda a: f"cast({a[0]} as string)",
    "polygon": lambda a: f"cast({a[0]} as string)",
    "geometry": lambda a: f"cast({a[0]} as string)",
    "stringToBytes": lambda a: f"encode({a[0]}, 'UTF-8')",
    "string2bytes": lambda a: f"encode({a[0]}, 'UTF-8')",
    "bytes": lambda a: f"encode({a[0]}, 'UTF-8')",
    "md5": lambda a: f"md5({a[0]})",
    "uuid": lambda a: "uuid()",
    "base64": lambda a: f"base64({a[0]})",
    "stringToInt": lambda a: f"coalesce(try_cast({a[0]} as int), {a[1]})",
    "stringToInteger": lambda a: f"coalesce(try_cast({a[0]} as int), {a[1]})",
    "stringToLong": lambda a: f"coalesce(try_cast({a[0]} as bigint), {a[1]})",
    "stringToFloat": lambda a: f"coalesce(try_cast({a[0]} as float), {a[1]})",
    "stringToDouble": lambda a: f"coalesce(try_cast({a[0]} as double), {a[1]})",
    "stringToBool": lambda a: f"coalesce(try_cast({a[0]} as boolean), {a[1]})",
    "stringToBoolean": lambda a: f"coalesce(try_cast({a[0]} as boolean), {a[1]})",
    "parseList": _parse_list_sql,
    "parseMap": _parse_map_sql,
}


class TransformCompiler:
    """Compile one reference transform expression to Spark SQL.

    ``resolve_ref`` maps a ``$ref`` (number or name, '$' stripped) to
    a SQL fragment; field-name refs are inlined from previously
    compiled fields by the caller.
    """

    def __init__(self, resolve_ref):
        self.resolve_ref = resolve_ref

    def compile(self, expr: str) -> str:
        self.toks = self._tokenize(expr)
        self.i = 0
        sql = self._expr()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens in transform {expr!r}")
        return sql

    @staticmethod
    def _tokenize(expr: str) -> list[tuple[str, str]]:
        out, pos = [], 0
        while pos < len(expr):
            m = _EXPR_TOKEN.match(expr, pos)
            if m is None:
                raise ValueError(f"bad transform expression at {expr[pos:pos+20]!r}")
            pos = m.end()
            if m.lastgroup != "ws":
                out.append((m.lastgroup, m.group()))
        return out

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def _expr(self) -> str:
        sql = self._atom()
        while self._peek()[0] == "cast":
            _, tok = self._next()
            low = tok.lower()
            if low == "::r":  # regex literal marker — identity here
                continue
            sql_t = _CAST_SQL.get(low)
            if sql_t is None:
                raise ValueError(f"unsupported cast {tok!r}")
            sql = f"try_cast({sql} as {sql_t})"
        return sql

    def _atom(self) -> str:
        kind, tok = self._next()
        if kind == "ref":
            return self.resolve_ref(tok[1:])
        if kind == "string":
            # unescape ONLY the DSL's own escapes (\' \" \\): a bare
            # re.sub(r"\\(.)") would also strip the backslash from
            # regex literals like '\d+'::r, silently turning "digit
            # run" into the literal text "d+"
            return _sq(re.sub(r"\\(['\"\\])", r"\1", tok[1:-1]))
        if kind == "number":
            if tok[-1] in "LlFfDd":
                tok = tok[:-1]
            return tok
        if kind == "name":
            name = tok
            if name in _UNSUPPORTED:
                raise ValueError(
                    f"{name}() has no distributed equivalent (reference "
                    "Transformers.scala line-number functions)"
                )
            if name == "date":  # date(fmt, x): fmt must be a literal
                args = self._args(raw_first=True)
                fmt = _joda_to_spark_fmt(args[0].strip("'\""))
                return f"try_to_timestamp({args[1]}, {_sq(fmt)})"
            fn = _FUNCS.get(name)
            if fn is None:
                raise ValueError(f"unknown transform function {name!r}")
            return fn(self._args())
        raise ValueError(f"unexpected token {tok!r} in transform")

    def _args(self, raw_first: bool = False) -> list[str]:
        kind, tok = self._next()
        if tok != "(":
            raise ValueError(f"expected '(' after function, got {tok!r}")
        args: list[str] = []
        if self._peek()[1] == ")":
            self._next()
            return args
        while True:
            if raw_first and not args and self._peek()[0] == "string":
                _, s = self._next()
                args.append(s)  # keep quotes; caller strips
            else:
                args.append(self._expr())
            kind, tok = self._next()
            if tok == ")":
                return args
            if tok != ",":
                raise ValueError(f"expected ',' or ')' in args, got {tok!r}")


# ---------------------------------------------------------------------------
# SimpleFeatureType schema strings: "phrase:String,dtg:Date,geom:Point:srid=4326"
# ---------------------------------------------------------------------------

_SFT_SQL_TYPES = {
    "string": "string",
    "integer": "int",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "date": "timestamp",
    "uuid": "string",
    "bytes": "binary",
}


def parse_sft(sft: str) -> list[tuple[str, str | None]]:
    """Parse an SFT schema string into [(name, sql_type|None)].

    Geometry types (Point/LineString/Polygon/Geometry/...) and
    List/Map types map to None — the transform's own output type is
    kept as-is (lon/lat struct for points, WKT string otherwise).
    Leading '*' (default-geometry marker) and ':srid='/':index='
    hints are accepted and ignored.
    """
    out = []
    for part in sft.split(","):
        bits = part.strip().split(":")
        name = bits[0].lstrip("*")
        typ = bits[1].strip() if len(bits) > 1 else "String"
        out.append((name, _SFT_SQL_TYPES.get(typ.lower())))
    return out


# ---------------------------------------------------------------------------
# Config -> ConvertSpec compilation + ingest front-ends
# ---------------------------------------------------------------------------


@dataclass
class ConverterConfig:
    type: str
    fields: list[dict]
    id_field: str | None = None
    format: str = "CSV"
    feature_path: str | None = None
    options: dict = dc_field(default_factory=dict)

    @classmethod
    def from_text(cls, text: str) -> "ConverterConfig":
        cfg = parse_hocon(text)
        if "converter" in cfg:
            cfg = cfg["converter"]
        return cls(
            type=cfg.get("type", "delimited-text"),
            fields=cfg.get("fields", []),
            id_field=cfg.get("id-field"),
            format=cfg.get("format", "CSV"),
            feature_path=cfg.get("feature-path"),
            options=cfg.get("options", {}),
        )


def _compile_fields(
    cfg: ConverterConfig,
    sft: str,
    resolve_positional,
    fid_col: str = "fid",
) -> ConvertSpec:
    """Shared compile: inline $field refs, apply SFT casts, prepend fid."""
    compiled: dict[str, str] = {}

    def resolve(ref: str) -> str:
        if ref.isdigit():
            return resolve_positional(int(ref), None)
        if ref in compiled:
            return f"({compiled[ref]})"
        raise ValueError(
            f"transform references ${ref} before it is defined "
            "(reference converters also require definition order)"
        )

    tc = TransformCompiler(resolve)
    for fld in cfg.fields:
        name = fld["name"]
        if "transform" in fld:
            # $0 inside a path-bearing field means the extracted value
            if "path" in fld:
                extracted = resolve_positional(0, fld)
                inner = TransformCompiler(
                    lambda r, _e=extracted: _e if r == "0" else resolve(r)
                )
                compiled[name] = inner.compile(fld["transform"])
            else:
                compiled[name] = tc.compile(fld["transform"])
        elif "path" in fld:
            compiled[name] = resolve_positional(0, fld)
        else:
            raise ValueError(f"field {name!r} has neither transform nor path")

    sft_fields = parse_sft(sft)
    missing = [n for n, _ in sft_fields if n not in compiled]
    if missing:
        raise ValueError(f"SFT fields with no converter field: {missing}")

    out: list[tuple[str, str]] = []
    if cfg.id_field:
        out.append((fid_col, tc.compile(cfg.id_field)))
    for name, sql_t in sft_fields:
        expr = compiled[name]
        if sql_t is not None:
            expr = f"cast(({expr}) as {sql_t})"
        out.append((name, expr))
    return ConvertSpec(fields=out)


def _delimiter_for(fmt: str) -> str:
    return {"CSV": ",", "TSV": "\t", "TDV": "\t"}.get(fmt.upper(), ",")


def delimited_config_ingest(
    spark: SparkSession,
    path: str,
    config_text: str,
    sft: str,
    drop_invalid: bool = False,
    **read_options,
) -> DataFrame:
    """Ingest delimited text using a reference converter config.

    Reads raw lines (so ``$0`` is the byte-exact record, as in
    DelimitedTextConverter.scala) and parses columns JVM-side with
    ``from_csv`` — the column count is fixed by peeking at one line
    (a bounded driver decision, same pattern as avro_ingest's header
    peek).  ``$N`` (1-based) maps to the N-th parsed column.
    """
    cfg = ConverterConfig.from_text(config_text)
    if cfg.type != "delimited-text":
        raise ValueError(f"config type {cfg.type!r} is not delimited-text")
    delim = _delimiter_for(cfg.format)

    raw = spark.read.options(**read_options).text(path)
    first = raw.limit(1).collect()
    if not first:
        ncols = 0
    else:
        ncols = len(next(csv.reader(io.StringIO(first[0].value), delimiter=delim)))
    csv_schema = ", ".join(f"c{i} string" for i in range(1, ncols + 1))

    def resolve_positional(i: int, fld) -> str:
        if i == 0:
            return "value"
        if i > ncols:
            raise ValueError(f"${i} out of range: record has {ncols} columns")
        return f"__rec.c{i}"

    spec = _compile_fields(cfg, sft, resolve_positional)
    parsed = raw.withColumn(
        "__rec",
        F.from_csv("value", csv_schema, {"delimiter": delim}) if ncols else F.lit(None),
    )
    out = spec.apply(parsed)
    if drop_invalid:
        strict = [
            n for n, t in parse_sft(sft) if t not in (None, "string", "timestamp")
        ]
        for name in strict:
            out = out.filter(F.col(name).isNotNull())
    return out


def _json_path_to_col(path: str, root: str | None) -> str:
    """'$.physical.weight' -> root-qualified nested col ref."""
    if not path.startswith("$"):
        raise ValueError(f"unsupported json path {path!r}")
    parts = [p for p in path[1:].split(".") if p]
    ref = root if root else ""
    for p in parts:
        ref = f"{ref}.{p}" if ref else p
    return ref


def json_config_ingest(
    spark: SparkSession,
    path: str,
    config_text: str,
    sft: str,
    **read_options,
) -> DataFrame:
    """Ingest JSON using a reference converter config (geomesa-convert-json).

    ``feature-path = "$.Features[*]"`` explodes that array into one
    row per feature; field ``path`` selectors become nested column
    references on the exploded struct.  Documents are read multiLine
    (one JSON document per file, the reference's model); drop the
    feature-path for newline-delimited JSON.
    """
    cfg = ConverterConfig.from_text(config_text)
    if cfg.type != "json":
        raise ValueError(f"config type {cfg.type!r} is not json")

    raw = spark.read.options(multiLine=True, **read_options).json(path)
    root = None
    if cfg.feature_path:
        fp = cfg.feature_path
        if not fp.endswith("[*]"):
            raise ValueError(f"feature-path must end with [*]: {fp!r}")
        arr_col = _json_path_to_col(fp[:-3], None)
        raw = raw.select(F.explode(F.col(arr_col)).alias("__feat"))
        root = "__feat"

    def resolve_positional(i: int, fld) -> str:
        if fld is None or "path" not in fld:
            raise ValueError("json transforms use $0 only inside path fields")
        col = _json_path_to_col(fld["path"], root)
        jt = fld.get("json-type", "string").lower()
        sql_t = _PRIM_SQL.get(jt)
        if sql_t and sql_t != "string":
            return f"try_cast({col} as {sql_t})"
        if jt == "geometry":
            return _geojson_sql(raw, col)
        return f"cast({col} as string)"

    spec = _compile_fields(cfg, sft, resolve_positional)
    return spec.apply(raw)


def _geojson_sql(df: DataFrame, col: str) -> str:
    """GeoJSON-or-WKT geometry column -> lon/lat struct (points) or
    WKT string, decided from the inferred schema at compile time."""
    try:
        dtype = df.selectExpr(col).schema[0].dataType
    except Exception:
        return f"cast({col} as string)"
    if dtype.typeName() == "struct":
        names = {f.name for f in dtype.fields}
        if "coordinates" in names:
            return (
                f"named_struct('lon', cast({col}.coordinates[0] as double), "
                f"'lat', cast({col}.coordinates[1] as double))"
            )
    return f"cast({col} as string)"
