"""Export sinks: CSV / TSV / JSON / GeoJSON / SHP / GML (+ BIN in
analytics) — the reference's full exporter format list.

Reference: geomesa-tools exporters (geomesa-tools/src/main/scala/org/
locationtech/geomesa/tools/FeatureExporter.scala:35-64; format list
Utils.scala:44-79 — CSV, TSV, SHP, JSON, GeoJSON, GML, BIN).
Text formats and GeoJSON are pure column ops (`to_json` over a
Feature struct) written distributed; SHP (.shp/.shx/.dbf, public
ESRI + dBase III specs) and GML 2 are client-side single-file sinks
written by pure-Python spec writers — the same client-side split the
reference's GeoTools exporters use.

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


# ---------------------------------------------------------------------------
# SHP / GML — client-side sinks (pure-Python writers, public formats)
# ---------------------------------------------------------------------------
#
# The reference exports SHP/GML through GeoTools on the CLIENT
# (FeatureExporter.scala:35-64) — both are inherently single-file
# formats, so this engine does the same: rows stream to the driver
# via toLocalIterator (one partition in memory at a time) and a
# spec-compliant writer emits the files. Driver-side bound = the
# final exported artifact size, exactly like the reference's
# client-side export.


def _dbf_fields(df: DataFrame, skip: set[str]):
    """(column, short_name, type, length, decimals) per attribute
    (DBF field names cap at 11 bytes; the column name keys the Row)."""
    out = []
    for f in df.schema.fields:
        if f.name in skip:
            continue
        short = f.name[:11]
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType,
                                   T.LongType)):
            out.append((f.name, short, "N", 18, 0))
        elif isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            out.append((f.name, short, "N", 18, 6))
        else:
            out.append((f.name, short, "C", 64, 0))
    return out


def export_shp(
    df: DataFrame,
    path_base: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> None:
    """ESRI point Shapefile sink: writes `<base>.shp`, `.shx`, `.dbf`
    per the public spec (no geo libraries). Attribute columns ride
    the dBase III sidecar (strings as C, numerics as N)."""
    import struct

    fields = _dbf_fields(df, skip={lon_col, lat_col})
    shp_recs = []
    dbf_recs = []
    xmin = ymin = float("inf")
    xmax = ymax = float("-inf")
    for row in df.toLocalIterator():
        x, y = float(row[lon_col]), float(row[lat_col])
        xmin, xmax = min(xmin, x), max(xmax, x)
        ymin, ymax = min(ymin, y), max(ymax, y)
        shp_recs.append(struct.pack("<idd", 1, x, y))
        rec = b" "
        for (col, _short, typ, length, dec) in fields:
            v = row[col]
            if typ == "N":
                s = ("" if v is None else
                     f"{float(v):.{dec}f}" if dec else str(int(v)))
                rec += s.rjust(length)[:length].encode("ascii", "replace")
            else:
                s = "" if v is None else str(v)
                rec += s.encode("utf-8", "replace")[:length].ljust(length)
        dbf_recs.append(rec)
    n = len(shp_recs)
    if n == 0:
        xmin = ymin = xmax = ymax = 0.0

    def shp_header(total_words: int, shape_type: int) -> bytes:
        return (
            struct.pack(">i20xi", 9994, total_words)
            + struct.pack("<ii", 1000, shape_type)
            + struct.pack("<4d", xmin, ymin, xmax, ymax)
            + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
        )

    rec_words = 10  # point record content: 20 bytes
    shp_len_words = (100 + n * (8 + 20)) // 2
    with open(f"{path_base}.shp", "wb") as f:
        f.write(shp_header(shp_len_words, 1))
        for i, content in enumerate(shp_recs):
            f.write(struct.pack(">ii", i + 1, rec_words))
            f.write(content)
    with open(f"{path_base}.shx", "wb") as f:
        f.write(shp_header((100 + n * 8) // 2, 1))
        off = 50  # words
        for _ in range(n):
            f.write(struct.pack(">ii", off, rec_words))
            off += 4 + rec_words
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(length for _, _, _, length, _ in fields)
    with open(f"{path_base}.dbf", "wb") as f:
        f.write(struct.pack("<B3BIHH20x", 0x03, 95, 1, 1, n, hdr_size, rec_size))
        for (_col, short, typ, length, dec) in fields:
            f.write(
                short.encode("ascii", "replace").ljust(11, b"\x00")
                + typ.encode("ascii")
                + b"\x00" * 4
                + struct.pack("<BB", length, dec)
                + b"\x00" * 14
            )
        f.write(b"\x0d")
        for rec in dbf_recs:
            f.write(rec)
        f.write(b"\x1a")


def export_gml(
    df: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "doc_id",
    type_name: str = "feature",
) -> None:
    """GML 2 FeatureCollection sink (public OGC schema, pure text)."""
    from xml.sax.saxutils import escape

    props = [c for c in df.columns if c not in (lon_col, lat_col, id_col)]
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write(
            '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml" '
            'xmlns:gs="urn:geomesa-spark:features">\n'
        )
        for row in df.toLocalIterator():
            fid = escape(str(row[id_col]))
            f.write(f'  <gml:featureMember>\n    <gs:{type_name} fid="{fid}">\n')
            f.write(
                "      <gs:geom><gml:Point srsName=\"EPSG:4326\">"
                f"<gml:coordinates>{row[lon_col]},{row[lat_col]}"
                "</gml:coordinates></gml:Point></gs:geom>\n"
            )
            for p in props:
                v = row[p]
                f.write(
                    f"      <gs:{p}>{escape('' if v is None else str(v))}"
                    f"</gs:{p}>\n"
                )
            f.write(f"    </gs:{type_name}>\n  </gml:featureMember>\n")
        f.write("</gml:FeatureCollection>\n")
