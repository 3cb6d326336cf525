"""Ingest converters: delimited text / JSON / XML / Avro /
fixed-width -> typed feature tables via a declarative
field-transform mapping.

Reference: the geomesa-convert DSL (geomesa-convert/README.md;
function registry geomesa-convert-common/src/main/scala/org/
locationtech/geomesa/convert/Transformers.scala, 585 LoC) declares a
converter as (source format, list of {field, transform-expression}).
Here the same declaration maps onto `spark.read.*` + one
`select(F.expr(...))` — every DSL function has a Spark SQL builtin
equivalent (SURVEY.md §2.8), so converted ingest runs entirely in
whole-stage codegen at scan speed.

`DSL_EQUIV` documents the function-by-function mapping; transforms
in a `ConvertSpec` are written directly in Spark SQL using those
builtins (the reference's `$1, $2...` column refs become `_c0,
_c1...` for headerless CSV).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference DSL function -> Spark SQL equivalent (Transformers.scala)
DSL_EQUIV = {
    "stripQuotes": "regexp_replace(x, '\"', '')",
    "trim": "trim(x)",
    "capitalize": "initcap(x)",
    "lowercase": "lower(x)",
    "uppercase": "upper(x)",
    "regexReplace": "regexp_replace(x, pat, rep)",
    "concatenate": "concat(a, b)",
    "substring": "substring(x, i, j)",
    "length": "length(x)",
    "toString": "cast(x as string)",
    "now": "current_timestamp()",
    "date": "to_timestamp(x, fmt)",
    "dateTime": "to_timestamp(x)",  # ISO-8601
    "basicDate": "to_timestamp(x, 'yyyyMMdd')",
    "basicDateTime": "to_timestamp(x, \"yyyyMMdd'T'HHmmss.SSSZ\")",
    "millisToDate": "timestamp_millis(x)",
    "dateToLong": "unix_millis(x)",
    "point": "named_struct('lon', x, 'lat', y)",
    "geometry": "x  -- WKT carried as string; lon/lat derived",
    "stringToBytes": "encode(x, 'UTF-8')",
    "md5": "md5(x)",
    "uuid": "uuid()",
    "base64": "base64(x)",
    "::int": "cast(x as int)",
    "::long": "cast(x as bigint)",
    "::float": "cast(x as float)",
    "::double": "cast(x as double)",
    "::boolean": "cast(x as boolean)",
    "try": "try_cast / coalesce(expr, fallback)",
}


@dataclass
class ConvertSpec:
    """Declarative converter: [(output field, Spark SQL expr)].

    The expr may reference source columns (`_c0`... for headerless
    delimited, JSON field names for json) and use any §2.8 builtin.
    """

    fields: list[tuple[str, str]] = field(default_factory=list)

    def apply(self, raw: DataFrame) -> DataFrame:
        return raw.select(
            *[F.expr(expr).alias(name) for name, expr in self.fields]
        )


def delimited_ingest(
    spark: SparkSession,
    path: str,
    spec: ConvertSpec,
    delimiter: str = ",",
    header: bool = False,
    **options,
) -> DataFrame:
    """DelimitedTextConverter analog (geomesa-convert-text/
    .../DelimitedTextConverter.scala): CSV/TSV -> typed features."""
    raw = spark.read.options(delimiter=delimiter, header=header, **options).csv(path)
    return spec.apply(raw)


def json_ingest(
    spark: SparkSession, path: str, spec: ConvertSpec, **options
) -> DataFrame:
    """JSON converter analog (geomesa-convert-json): json-path field
    selectors become nested column refs in the expr."""
    raw = spark.read.options(**options).json(path)
    return spec.apply(raw)


def xml_ingest(
    spark: SparkSession,
    path: str,
    spec: ConvertSpec | None,
    row_tag: str,
    **options,
) -> DataFrame:
    """XML converter analog (geomesa-convert's XML family): Spark 4's
    built-in XML data source parses repeated `row_tag` elements into
    rows; element/attribute selectors become column refs in the
    transform exprs (attributes surface as `_attrname`)."""
    raw = (
        spark.read.format("xml").option("rowTag", row_tag).options(**options)
        .load(path)
    )
    return spec.apply(raw) if spec else raw


def avro_ingest(
    spark: SparkSession,
    path: str,
    spec: ConvertSpec | None = None,
    avro_schema: dict | None = None,
) -> DataFrame:
    """Avro converter analog (geomesa-convert's Avro family;
    feature serialization SerializationType.scala:12-16).

    This container has no spark-avro module jar, so Object Container
    Files are ingested via the `binaryFile` source (one task per
    file — OCF's natural parallel unit) and decoded per-block by the
    pure-Python spec reader in sources/avro.py. On clusters shipping
    the module, replace with `spark.read.format("avro")` — the
    ConvertSpec layer is unchanged. `avro_schema` (parsed JSON dict)
    fixes the output schema; when omitted it is inferred by peeking
    at one file's header.
    """
    import pandas as pd

    from geomesa_spark.sources import avro as AV

    if avro_schema is None:
        peek = spark.read.format("binaryFile").load(path).select("content")
        first = peek.limit(1).collect()
        if not first:
            raise ValueError(f"no avro files at {path}")
        avro_schema, _ = AV.read_avro_bytes(bytes(first[0].content))
    spark_schema = AV.avro_to_spark_type(avro_schema)
    names = [f.name for f in spark_schema.fields]

    def gen(batches):
        for pdf in batches:
            for content in pdf["content"]:
                _, recs = AV.read_avro_bytes(bytes(content))
                yield pd.DataFrame(recs, columns=names)

    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(gen, schema=spark_schema)
    )
    return spec.apply(raw) if spec else raw


def fixed_width_ingest(
    spark: SparkSession,
    path: str,
    widths: list[tuple[str, int, int]],
    spec: ConvertSpec | None = None,
) -> DataFrame:
    """Fixed-width converter analog: `widths` = [(col, start-1based,
    len)]; slices become substring exprs (pure column ops)."""
    raw = spark.read.text(path)
    cols = [
        F.substring(F.col("value"), start, length).alias(name)
        for name, start, length in widths
    ]
    out = raw.select(*cols)
    return spec.apply(out) if spec else out
