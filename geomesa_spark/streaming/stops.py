"""Streaming stop (dwell) detection over a point-track stream.

The streaming twin of ``operators/tracks.stop_detect`` — loitering /
port-call / dwell alerts as they CLOSE, plus a "dwelling right now"
live view, instead of a nightly batch scan.  Same foreachBatch +
versioned-snapshot architecture as ``streaming/geofence.py``:

- WITHIN a micro-batch, the batch operator's gaps-and-islands shape
  runs over batch-local sequence numbers (one track window, one
  same-key aggregate).
- ACROSS micro-batches, ONE carried row per track stitches the
  boundary: the track's last seen point (the leg into the next
  batch's first point is computed against it) plus the OPEN
  segment's running aggregate (start, count, bbox).  A batch whose
  first point stays within `radius` of the carried point CONTINUES
  the open segment (aggregates merge); one that jumps CLOSES it —
  the carried segment is emitted (if it meets `min_duration_s`) with
  its carried end time.
- A stop is emitted in exactly one micro-batch, WHEN IT CLOSES; the
  still-open segments are the live state (``read_dwelling_now``).
  ``flush_open_stops`` converts the final state to emissions so
  closed + flushed == the batch twin (the parity pytest contract).
- State and stops are ``ParquetVersionedIO`` directories: replayed
  micro-batches overwrite their version (idempotent, the
  ingest/geofence convention).

Ordering contract: batches arrive in event-time order per track
(the per-key-ordered topic shape, same as geofence_stream).  State
is O(active tracks); per-batch joins are bounded by batch size or
state size; no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geomesa_spark.operators.tracks import _leg_dist, stop_center_sql

__all__ = ["stop_stream", "read_stops", "read_dwelling_now",
           "flush_open_stops"]

_STATE_COLS = [
    "track", "last_es", "last_lon", "last_lat",
    "seg_start", "seg_n", "lo_x", "hi_x", "lo_y", "hi_y",
    # IDL straddle support (min positive / max negative lon, NULL
    # when that side is empty) — the batch twin's stop_center_sql
    # inputs, carried so cross-batch straddling stops center exactly
    # like stop_detect's
    "lo_pos", "hi_neg",
]


def _stop_row(prefix=""):
    c = F.col
    return [
        c(f"{prefix}seg_start").cast("long").alias("start_ts"),
        c(f"{prefix}last_es").cast("long").alias("end_ts"),
        (c(f"{prefix}last_es") - c(f"{prefix}seg_start"))
        .cast("long").alias("duration_s"),
        c(f"{prefix}seg_n").cast("long").alias("n_points"),
        F.expr(stop_center_sql(
            f"{prefix}lo_x", f"{prefix}hi_x",
            f"{prefix}lo_pos", f"{prefix}hi_neg",
        )).alias("center_lon"),
        ((c(f"{prefix}lo_y") + c(f"{prefix}hi_y")) / F.lit(2.0))
        .alias("center_lat"),
    ]


def _batch_stops(
    batch: DataFrame,
    state: DataFrame | None,
    radius: float,
    min_duration_s: int,
    track_col: str,
    ts_col: str,
    lon_col: str,
    lat_col: str,
    metric: str,
    tiebreak_col: str | None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One micro-batch step -> (stops, new_state, shared).

    stops: closed dwell segments meeting min_duration_s; new_state:
    one row per active track (_STATE_COLS). `shared` is the
    persisted window/aggregate base — caller unpersists it after
    materializing both outputs."""
    order = [F.col("_ts").asc()]
    if tiebreak_col is not None:
        order.append(F.col("_tb").asc())
    w = Window.partitionBy("track").orderBy(*order)
    es = (
        F.unix_timestamp(F.col(ts_col))
        if dict(batch.dtypes)[ts_col].startswith("timestamp")
        else F.col(ts_col).cast("long")
    )
    pts = batch.select(
        F.col(track_col).alias("track"),
        F.col(ts_col).alias("_ts"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
        es.alias("es"),
        F.col(lon_col).alias("lon"),
        F.col(lat_col).alias("lat"),
    )
    carried = state if state is not None else None
    if carried is not None:
        pts = pts.join(
            carried.select(
                "track",
                F.col("last_lon").alias("_clon"),
                F.col("last_lat").alias("_clat"),
            ),
            "track", "left",
        )
    else:
        pts = pts.withColumn("_clon", F.lit(None).cast("double")).withColumn(
            "_clat", F.lit(None).cast("double")
        )
    seq = F.row_number().over(w)
    plon = F.coalesce(F.lag("lon").over(w), F.col("_clon"))
    plat = F.coalesce(F.lag("lat").over(w), F.col("_clat"))
    leg = _leg_dist(metric, plon, plat, F.col("lon"), F.col("lat"))
    anchor = F.when(
        plon.isNull() | (leg > F.lit(float(radius))), F.lit(1)
    ).otherwise(F.lit(0))
    anchored = pts.withColumn("_seq", seq).withColumn(
        "_anchor", anchor
    ).withColumn(
        "_seg",
        F.sum("_anchor").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    # seg 0 = the batch head run that CONTINUES the carried open
    # segment (only possible when carried state exists and the first
    # point's leg vs the carried point is within radius)
    segs = (
        anchored.groupBy("track", "_seg")
        .agg(
            F.min("es").cast("long").alias("b_start"),
            F.max("es").cast("long").alias("b_end"),
            F.count("*").cast("long").alias("b_n"),
            F.min("lon").alias("b_lo_x"),
            F.max("lon").alias("b_hi_x"),
            F.min(F.when(F.col("lon") >= 0, F.col("lon")))
            .alias("b_lo_pos"),
            F.max(F.when(F.col("lon") < 0, F.col("lon")))
            .alias("b_hi_neg"),
            F.min("lat").alias("b_lo_y"),
            F.max("lat").alias("b_hi_y"),
        )
        .withColumn(
            "_max_seg", F.max("_seg").over(Window.partitionBy("track"))
        )
        .persist()
    )
    shared = segs
    if carried is not None:
        cst = carried.select(
            "track",
            F.col("last_es").alias("c_last_es"),
            F.col("seg_start").alias("c_seg_start"),
            F.col("seg_n").alias("c_seg_n"),
            F.col("lo_x").alias("c_lo_x"), F.col("hi_x").alias("c_hi_x"),
            F.col("lo_y").alias("c_lo_y"), F.col("hi_y").alias("c_hi_y"),
            F.col("lo_pos").alias("c_lo_pos"),
            F.col("hi_neg").alias("c_hi_neg"),
        )
    else:
        cst = None

    # 1) closed batch-local segments: _seg >= 1 and not the open one
    closed_local = segs.filter(
        (F.col("_seg") >= 1) & (F.col("_seg") < F.col("_max_seg"))
    ).select(
        "track",
        F.col("b_start").cast("long").alias("start_ts"),
        F.col("b_end").cast("long").alias("end_ts"),
        (F.col("b_end") - F.col("b_start")).cast("long").alias("duration_s"),
        F.col("b_n").alias("n_points"),
        F.expr(stop_center_sql(
            "b_lo_x", "b_hi_x", "b_lo_pos", "b_hi_neg"
        )).alias("center_lon"),
        ((F.col("b_lo_y") + F.col("b_hi_y")) / F.lit(2.0)).alias("center_lat"),
    )
    stops = closed_local
    # 2) the seg-0 run (continues carried). If it is NOT the open
    #    segment, the MERGED carried+batch segment closes here.
    if cst is not None:
        merged0 = segs.filter(F.col("_seg") == 0).join(cst, "track")
        closed_merged = merged0.filter(
            F.col("_seg") < F.col("_max_seg")
        ).select(
            "track",
            F.col("c_seg_start").cast("long").alias("start_ts"),
            F.col("b_end").cast("long").alias("end_ts"),
            (F.col("b_end") - F.col("c_seg_start")).cast("long")
            .alias("duration_s"),
            (F.col("b_n") + F.col("c_seg_n")).cast("long").alias("n_points"),
            F.expr(stop_center_sql(
                "least(b_lo_x, c_lo_x)", "greatest(b_hi_x, c_hi_x)",
                "least(b_lo_pos, c_lo_pos)",
                "greatest(b_hi_neg, c_hi_neg)",
            )).alias("center_lon"),
            ((F.least("b_lo_y", "c_lo_y") + F.greatest("b_hi_y", "c_hi_y"))
             / F.lit(2.0)).alias("center_lat"),
        )
        # 3) carried segment closed by a batch that OPENS with an
        #    anchor (no seg-0 run): emit it with its carried extent
        present = segs.select("track").distinct()
        has_seg0 = segs.filter(F.col("_seg") == 0).select("track")
        closed_carried = (
            cst.join(present, "track", "left_semi")
            .join(has_seg0, "track", "left_anti")
            .select(
                "track",
                F.col("c_seg_start").cast("long").alias("start_ts"),
                F.col("c_last_es").cast("long").alias("end_ts"),
                (F.col("c_last_es") - F.col("c_seg_start")).cast("long")
                .alias("duration_s"),
                F.col("c_seg_n").cast("long").alias("n_points"),
                F.expr(stop_center_sql(
                    "c_lo_x", "c_hi_x", "c_lo_pos", "c_hi_neg"
                )).alias("center_lon"),
                ((F.col("c_lo_y") + F.col("c_hi_y")) / F.lit(2.0))
                .alias("center_lat"),
            )
        )
        stops = stops.unionByName(closed_merged).unionByName(closed_carried)
    stops = stops.filter(
        F.col("duration_s") >= F.lit(int(min_duration_s))
    )

    # new state: the OPEN segment per track present in this batch
    desc_order = [F.col("_ts").desc()]
    if tiebreak_col is not None:
        desc_order.append(F.col("_tb").desc())
    last_pt = anchored.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("track").orderBy(*desc_order)
        ),
    ).filter(F.col("_rn") == 1).select(
        "track",
        F.col("es").alias("last_es"),
        F.col("lon").alias("last_lon"),
        F.col("lat").alias("last_lat"),
    )
    open_segs = segs.filter(F.col("_seg") == F.col("_max_seg"))
    if cst is not None:
        open_segs = open_segs.join(cst, "track", "left")
        start = F.when(
            F.col("_seg") == 0, F.col("c_seg_start")
        ).otherwise(F.col("b_start"))
        n_ = F.when(
            F.col("_seg") == 0, F.col("b_n") + F.col("c_seg_n")
        ).otherwise(F.col("b_n"))
        lo_x = F.when(F.col("_seg") == 0, F.least("b_lo_x", "c_lo_x")
                      ).otherwise(F.col("b_lo_x"))
        hi_x = F.when(F.col("_seg") == 0, F.greatest("b_hi_x", "c_hi_x")
                      ).otherwise(F.col("b_hi_x"))
        lo_y = F.when(F.col("_seg") == 0, F.least("b_lo_y", "c_lo_y")
                      ).otherwise(F.col("b_lo_y"))
        hi_y = F.when(F.col("_seg") == 0, F.greatest("b_hi_y", "c_hi_y")
                      ).otherwise(F.col("b_hi_y"))
        # least/greatest skip NULLs, matching min/max over the union
        lo_pos = F.when(
            F.col("_seg") == 0, F.least("b_lo_pos", "c_lo_pos")
        ).otherwise(F.col("b_lo_pos"))
        hi_neg = F.when(
            F.col("_seg") == 0, F.greatest("b_hi_neg", "c_hi_neg")
        ).otherwise(F.col("b_hi_neg"))
    else:
        start, n_ = F.col("b_start"), F.col("b_n")
        lo_x, hi_x = F.col("b_lo_x"), F.col("b_hi_x")
        lo_y, hi_y = F.col("b_lo_y"), F.col("b_hi_y")
        lo_pos, hi_neg = F.col("b_lo_pos"), F.col("b_hi_neg")
    present_state = open_segs.select(
        "track",
        start.cast("long").alias("seg_start"),
        n_.cast("long").alias("seg_n"),
        lo_x.alias("lo_x"), hi_x.alias("hi_x"),
        lo_y.alias("lo_y"), hi_y.alias("hi_y"),
        lo_pos.alias("lo_pos"), hi_neg.alias("hi_neg"),
    ).join(last_pt, "track")
    present_state = present_state.select(*_STATE_COLS)
    if cst is not None:
        absent = (
            state.join(
                batch.select(F.col(track_col).alias("track")).distinct(),
                "track", "left_anti",
            ).select(*_STATE_COLS)
        )
        new_state = present_state.unionByName(absent)
    else:
        new_state = present_state
    return stops, new_state, shared


def stop_stream(
    stream: DataFrame,
    radius: float,
    min_duration_s: int,
    stops_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    track_col: str,
    ts_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    metric: str = "haversine",
    tiebreak_col: str | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
    io=None,
    stops_io=None,
):
    """Run the continuous dwell detector; returns the
    StreamingQuery. Closed stops land as versioned parquet under
    `stops_dir` (``read_stops``); the dwelling-right-now live view is
    ``read_dwelling_now``; ``flush_open_stops`` finalizes at stream
    end (closed + flushed == the batch twin, parity-tested)."""
    from geomesa_spark.sources.tableio import ParquetVersionedIO

    spark = stream.sparkSession
    if io is None:
        io = ParquetVersionedIO(spark, state_dir)
    if stops_io is None:
        stops_io = ParquetVersionedIO(spark, stops_dir)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        state = io.read_latest(before=batch_id)
        stops, new_state, shared = _batch_stops(
            batch_df, state, radius, min_duration_s,
            track_col, ts_col, lon_col, lat_col, metric, tiebreak_col,
        )
        try:
            stops_io.write_version(stops, batch_id)
            io.write_version(new_state, batch_id)
        finally:
            shared.unpersist()

    writer = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_stops(spark: SparkSession, stops_dir: str) -> DataFrame:
    """Union of every committed stop version (each stop closes in
    exactly one micro-batch)."""
    from functools import reduce

    from geomesa_spark.sources.tableio import ParquetVersionedIO

    io = ParquetVersionedIO(spark, stops_dir)
    frames = [io.read_version(v) for v in io.versions()]
    if not frames:
        raise ValueError(f"no committed stop versions under {stops_dir}")
    return reduce(lambda a, b: a.unionByName(b), frames)


def read_dwelling_now(spark: SparkSession, state_dir: str) -> DataFrame:
    """The live view: per active track, its OPEN dwell segment
    (seg_start, seg_n, bbox) and last seen point."""
    from geomesa_spark.sources.tableio import ParquetVersionedIO

    state = ParquetVersionedIO(spark, state_dir).read_latest()
    if state is None:
        raise ValueError(f"no committed state under {state_dir}")
    return state


def flush_open_stops(
    spark: SparkSession, state_dir: str, min_duration_s: int
) -> DataFrame:
    """Finalize the open segments (end-of-stream): the state rows as
    stop rows, min-duration filtered — union with ``read_stops`` to
    match the batch twin exactly."""
    st = read_dwelling_now(spark, state_dir)
    return st.select("track", *_stop_row()).filter(
        F.col("duration_s") >= F.lit(int(min_duration_s))
    )
