"""Export sinks: CSV / TSV / JSON / GeoJSON (+ BIN in analytics).

Reference: geomesa-tools exporters (geomesa-tools/src/main/scala/org/
locationtech/geomesa/tools/FeatureExporter.scala:35-64; format list
Utils.scala:44-79 — CSV, TSV, SHP, JSON, GeoJSON, GML, BIN). SHP/GML
are omitted (binary sidecar formats needing geo libs this container
lacks); GeoJSON is produced with pure column ops (`to_json` over a
Feature struct), so exports run at write speed with no Python.

Complex columns (the `spans` array) are serialized with to_json for
the text formats — lossless round-trip via from_json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flatten_complex(df: DataFrame) -> DataFrame:
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def export_csv(df: DataFrame, path: str, delimiter: str = ",", header: bool = True) -> None:
    _flatten_complex(df).write.mode("overwrite").options(
        delimiter=delimiter, header=header
    ).csv(path)


def export_tsv(df: DataFrame, path: str, header: bool = True) -> None:
    export_csv(df, path, delimiter="\t", header=header)


def export_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def geojson_feature_col(
    df: DataFrame, lon_col: str = "lon", lat_col: str = "lat",
    id_col: str = "doc_id", props: list[str] | None = None,
):
    """One GeoJSON Feature string per row (pure column ops)."""
    if props is None:
        props = [
            c for c in df.columns
            if c not in (lon_col, lat_col, id_col)
        ]
    prop_struct = F.struct(*[F.col(c) for c in props]) if props else F.struct()
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.col(id_col).cast("string").alias("id"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col(lon_col), F.col(lat_col)).alias("coordinates"),
        ).alias("geometry"),
        prop_struct.alias("properties"),
    )
    return F.to_json(feature)


def export_geojson(
    df: DataFrame, path: str, lon_col: str = "lon", lat_col: str = "lat",
    id_col: str = "doc_id", props: list[str] | None = None,
) -> None:
    """Newline-delimited GeoJSON Features (the streaming-friendly
    variant of a FeatureCollection; `jq -s` re-wraps if needed)."""
    df.select(
        geojson_feature_col(df, lon_col, lat_col, id_col, props).alias("value")
    ).write.mode("overwrite").text(path)
