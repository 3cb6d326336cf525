"""Streaming windowed aggregations with watermarks.

The reference has no window semantics (TTL is its only time notion —
SURVEY.md §2.9); these are the Structured Streaming generalizations
of the batch analytics that a live feed needs:

- `streaming_temporal_density` — the streaming form of
  analytics.temporal_density (TemporalDensityIterator analog):
  tumbling/sliding event-time windows + watermark for late data.
- `streaming_density` — the streaming 2-D heatmap: grid snap is the
  same pure-column expression as the batch operator, grouped by
  (window, i, j).

Both return streaming DataFrames; write with `outputMode("update")`
(or "append" after the watermark closes windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_temporal_density(
    stream: DataFrame,
    window_sec: int,
    slide_sec: int | None = None,
    watermark_sec: int = 600,
    dtg_col: str = "dtg",
) -> DataFrame:
    """Event-time histogram over tumbling (or sliding) windows.

    Late rows beyond `watermark_sec` are dropped — the streaming
    replacement for the reference's client-side series merge.
    Returns (window.start, window.end, n).
    """
    w = F.window(
        F.col(dtg_col),
        f"{window_sec} seconds",
        f"{slide_sec or window_sec} seconds",
    )
    return (
        stream.withWatermark(dtg_col, f"{watermark_sec} seconds")
        .groupBy(w.alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("start"),
            F.col("win.end").alias("end"),
            "n",
        )
    )


def streaming_density(
    stream: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    window_sec: int,
    watermark_sec: int = 600,
    lon_col: str = "lon",
    lat_col: str = "lat",
    dtg_col: str = "dtg",
) -> DataFrame:
    """Per-window 2-D heatmap (grid snap identical to the batch
    density operator, Z3DensityIterator analog)."""
    from geomesa_spark.functions import cells as C

    xmin, ymin, xmax, ymax = bbox
    i, j = C.grid_snap_cols(F.col(lon_col), F.col(lat_col), bbox, width, height)
    return (
        stream.filter(
            F.col(lon_col).between(F.lit(xmin), F.lit(xmax))
            & F.col(lat_col).between(F.lit(ymin), F.lit(ymax))
        )
        .withWatermark(dtg_col, f"{watermark_sec} seconds")
        .groupBy(
            F.window(F.col(dtg_col), f"{window_sec} seconds").alias("win"),
            i.alias("i"),
            j.alias("j"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("start"), "i", "j", "n")
    )
