"""Streaming co-travel: continuous convoy detection over a
point-track stream.

The streaming twin of ``operators/cooccur.co_travel``: pairs of
tracks co-located on >= `min_shared` aligned time-grid ticks, with
the ALERT emitted in the micro-batch where the pair first crosses
the threshold — the live "these two are moving together" signal the
batch operator only produces after the fact.  Same foreachBatch +
versioned-snapshot architecture as geofence/stops:

- Tick ownership makes streaming exact: batch ticks are produced by
  the ``track_resample`` single-owner rule (a segment owns the grid
  ticks in (es_i, es_{i+1}]) over the batch points PLUS one carried
  row per track (its last raw fix).  The carried point contributes
  only as a segment START — its own tick was owned by the batch
  that delivered it — so every grid tick materializes in EXACTLY
  one micro-batch and per-pair counts add across batches with no
  dedup pass.
- WITHIN the batch, pairs come from the co_travel per-tick eps-join
  (the single-meeting-cell trick with the tick in the key).  Two
  tracks can materialize the SAME tick in different batches (their
  next fixes straddle a boundary), so the join's right side also
  carries the recent ticks of earlier batches (a `lag_horizon_s`
  window — state bounded by tracks x horizon/step); a pair is
  counted exactly once because at least one side of every pair is
  new, and new x new pairs order by id while new x carried pairs
  don't need to (the carried tick can never meet another carried
  tick: when the later one was new, the earlier one was already
  carried).  Inter-track lag beyond the horizon is the documented
  divergence from the batch twin.
- ACROSS batches, (track_a, track_b) count state accumulates
  (n_shared, first/last tick, alerted flag); a pair crossing
  min_shared in this batch emits ONE alert row.  State is bounded
  by pairs that have EVER co-occurred on a tick (radius-bounded),
  not tracks².

Ordering contract: event-time-ordered batches per track (the
geofence/stops contract).  ``read_pair_counts`` is the live view —
for an in-order stream it equals the batch twin's (n_shared,
first_ts, last_ts) per pair (parity-tested), with alerts =
pairs at n_shared >= min_shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["cotravel_stream", "read_alerts", "read_pair_counts"]

_LAST_COLS = ["track", "last_ts", "last_lon", "last_lat"]
_PAIR_COLS = ["track_a", "track_b", "n_shared", "first_ts", "last_tick",
              "alerted"]


def _batch_ticks(
    batch: DataFrame,
    last_state: DataFrame | None,
    step_s: int,
    track_col: str,
    ts_col: str,
    lon_col: str,
    lat_col: str,
    tiebreak_col: str | None,
) -> tuple[DataFrame, DataFrame]:
    """New grid ticks owned by this batch + the new last-point state.

    Mirrors track_resample's ownership rule with one change: a
    CARRIED row never owns its own aligned tick (it did when it was
    a live batch point)."""
    es = (
        F.unix_timestamp(F.col(ts_col))
        if dict(batch.dtypes)[ts_col].startswith("timestamp")
        else F.col(ts_col).cast("long")
    )
    pts = batch.select(
        F.col(track_col).alias("track"),
        es.alias("es"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
        F.lit(False).alias("_carried"),
    )
    if tiebreak_col is None:
        pts = pts.withColumn("_tb", F.lit(0).cast("long"))
    if last_state is not None:
        carried = last_state.select(
            "track",
            F.col("last_ts").alias("es"),
            F.col("last_lon").alias("lon"),
            F.col("last_lat").alias("lat"),
            F.lit(None).cast(dict(pts.dtypes)["_tb"]).alias("_tb"),
            F.lit(True).alias("_carried"),
        ).join(
            batch.select(F.col(track_col).alias("track")).distinct(),
            "track", "left_semi",  # carried rows only help where the
        )                           # track actually has new points
        pts = pts.unionByName(carried)
    # carried rows sort FIRST at their timestamp (asc_nulls_first on
    # the tiebreak) — they are the predecessor of any same-ts point
    w = Window.partitionBy("track").orderBy(
        F.col("es").asc(), F.col("_tb").asc_nulls_first()
    )
    seg = pts.select(
        "track", "es", "lon", "lat", "_carried",
        F.row_number().over(w).alias("_seq"),
        F.lead("es").over(w).alias("_nes"),
        F.lead("lon").over(w).alias("_nlon"),
        F.lead("lat").over(w).alias("_nlat"),
    )
    step = F.lit(int(step_s))
    lo = F.floor(F.col("es") / step) + F.lit(1)
    hi = F.floor(F.col("_nes") / step)
    own_first = (
        (F.col("_seq") == 1)
        & ~F.col("_carried")
        & (F.pmod(F.col("es"), step) == 0)
    )
    ticks_arr = F.when(
        F.col("_nes").isNull() | (hi < lo),
        F.array().cast("array<bigint>"),
    ).otherwise(F.sequence(lo.cast("long"), hi.cast("long")))
    ticks_arr = F.when(
        own_first,
        F.concat(F.array((F.col("es") / step).cast("long")), ticks_arr),
    ).otherwise(ticks_arr)
    ex = seg.select(
        "track", "es", "_nes", "lon", "lat", "_nlon", "_nlat",
        F.explode(ticks_arr).alias("_k"),
    ).withColumn("_t", F.col("_k") * step)
    frac = F.when(F.col("_t") == F.col("es"), F.lit(0.0)).otherwise(
        (F.col("_t") - F.col("es")).cast("double")
        / (F.col("_nes") - F.col("es")).cast("double")
    )

    def interp(p, nxt):
        return F.when(frac == 0.0, F.col(p)).otherwise(
            F.col(p) + (F.col(nxt) - F.col(p)) * frac
        )

    ticks = ex.select(
        "track",
        F.col("_t").alias("tick_ts"),
        interp("lon", "_nlon").alias("lon"),
        interp("lat", "_nlat").alias("lat"),
    )
    wd = Window.partitionBy("track").orderBy(
        F.col("es").desc(), F.col("_tb").desc_nulls_last()
    )
    new_last = (
        pts.filter(~F.col("_carried"))
        .withColumn("_rn", F.row_number().over(wd))
        .filter(F.col("_rn") == 1)
        .select(
            "track",
            F.col("es").alias("last_ts"),
            F.col("lon").alias("last_lon"),
            F.col("lat").alias("last_lat"),
        )
    )
    if last_state is not None:
        absent = last_state.join(
            batch.select(F.col(track_col).alias("track")).distinct(),
            "track", "left_anti",
        ).select(*_LAST_COLS)
        new_last = new_last.unionByName(absent)
    return ticks, new_last


def _tick_pairs(
    new_ticks: DataFrame, all_ticks: DataFrame, dist_deg: float
) -> DataFrame:
    """Per-tick eps pairs: LEFT = this batch's NEW ticks, RIGHT =
    new + carried recent ticks (`_carried` flag). Each qualifying
    pair counts exactly once: new x new requires track_a < track_b;
    new x carried pairs once by construction (see module
    docstring)."""
    from geomesa_spark.functions import geometry_sql as GS

    nx = max(1, int(360.0 // dist_deg))
    if 360.0 / nx < dist_deg:
        nx -= 1
    nx = max(1, nx)
    ny = max(1, int(180.0 // dist_deg))
    if 180.0 / ny < dist_deg:
        ny -= 1
    ny = max(1, ny)

    def keyed(ticks):
        return ticks.withColumns(
        {
            "cx": F.least(
                F.lit(nx - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("lon") + F.lit(180.0)) / F.lit(360.0 / nx)),
                ),
            ).cast("long"),
            "cy": F.least(
                F.lit(ny - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("lat") + F.lit(90.0)) / F.lit(180.0 / ny)),
                ),
            ).cast("long"),
            }
        )

    lbase = keyed(new_ticks)
    rbase = keyed(all_ticks)
    left = lbase.select(
        F.col("track").alias("track_a"),
        F.col("lon").alias("lon_a"), F.col("lat").alias("lat_a"),
        F.col("tick_ts").alias("tk"),
        F.explode(
            F.array(*[
                F.struct(
                    F.pmod(F.col("cx") + F.lit(dx), F.lit(nx)).alias("kx"),
                    (F.col("cy") + F.lit(dy)).alias("ky"),
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ])
        ).alias("k"),
    ).select(
        "track_a", "lon_a", "lat_a", "tk",
        F.col("k.kx").alias("kx"), F.col("k.ky").alias("ky"),
    )
    right = rbase.select(
        F.col("track").alias("track_b"),
        F.col("lon").alias("lon_b"), F.col("lat").alias("lat_b"),
        F.col("tick_ts").alias("tk"),
        F.col("_carried").alias("_rc"),
        F.col("cx").alias("kx"), F.col("cy").alias("ky"),
    )
    d2 = GS.point_dist2_col(
        F.col("lon_a"), F.col("lat_a"), F.col("lon_b"), F.col("lat_b")
    )
    once = F.when(
        F.col("_rc"), F.col("track_a") != F.col("track_b")
    ).otherwise(F.col("track_a") < F.col("track_b"))
    out = (
        left.join(right, ["kx", "ky", "tk"], "inner")
        .filter(once)
        .filter(d2 <= F.lit(float(dist_deg) ** 2))
        .select(
            F.least("track_a", "track_b").alias("track_a"),
            F.greatest("track_a", "track_b").alias("track_b"),
            "tk",
        )
    )
    return out.distinct() if nx < 3 else out


def cotravel_stream(
    stream: DataFrame,
    dist_deg: float,
    step_s: int,
    min_shared: int,
    alerts_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    track_col: str,
    ts_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    tiebreak_col: str | None = None,
    lag_horizon_s: int | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Run the continuous convoy detector; returns the
    StreamingQuery. Alerts (one row per pair, in the batch it
    crosses min_shared) land under `alerts_dir`; the accumulating
    pair counts + per-track last points + recent ticks are the
    state (``read_pair_counts``). `lag_horizon_s` (default
    4·step_s) bounds how far apart two tracks' fix cadences may
    straddle batch boundaries while their shared ticks still pair."""
    from geomesa_spark.sources.tableio import ParquetVersionedIO

    spark = stream.sparkSession
    horizon = int(lag_horizon_s if lag_horizon_s is not None
                  else 4 * step_s)
    last_io = ParquetVersionedIO(spark, f"{state_dir}/last")
    pair_io = ParquetVersionedIO(spark, f"{state_dir}/pairs")
    tick_io = ParquetVersionedIO(spark, f"{state_dir}/ticks")
    alert_io = ParquetVersionedIO(spark, alerts_dir)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        last_state = last_io.read_latest(before=batch_id)
        pair_state = pair_io.read_latest(before=batch_id)
        tick_state = tick_io.read_latest(before=batch_id)
        ticks, new_last = _batch_ticks(
            batch_df, last_state, step_s,
            track_col, ts_col, lon_col, lat_col, tiebreak_col,
        )
        ticks = ticks.persist()
        try:
            new_flagged = ticks.withColumn("_carried", F.lit(False))
            if tick_state is not None:
                all_ticks = new_flagged.unionByName(
                    tick_state.withColumn("_carried", F.lit(True))
                )
            else:
                all_ticks = new_flagged
            inc = _tick_pairs(new_flagged, all_ticks, dist_deg).groupBy(
                "track_a", "track_b"
            ).agg(
                F.count("*").cast("long").alias("d_n"),
                F.min("tk").cast("long").alias("d_first"),
                F.max("tk").cast("long").alias("d_last"),
            )
            if pair_state is not None:
                merged = pair_state.join(
                    inc, ["track_a", "track_b"], "full_outer"
                ).select(
                    "track_a", "track_b",
                    (F.coalesce(F.col("n_shared"), F.lit(0))
                     + F.coalesce(F.col("d_n"), F.lit(0)))
                    .cast("long").alias("n_shared"),
                    F.least(
                        F.col("first_ts"), F.col("d_first")
                    ).alias("first_ts"),
                    F.greatest(
                        F.col("last_tick"), F.col("d_last")
                    ).alias("last_tick"),
                    F.coalesce(F.col("alerted"), F.lit(False))
                    .alias("_was_alerted"),
                )
            else:
                merged = inc.select(
                    "track_a", "track_b",
                    F.col("d_n").alias("n_shared"),
                    F.col("d_first").alias("first_ts"),
                    F.col("d_last").alias("last_tick"),
                    F.lit(False).alias("_was_alerted"),
                )
            merged = merged.withColumn(
                "alerted",
                F.col("_was_alerted")
                | (F.col("n_shared") >= F.lit(int(min_shared))),
            )
            alerts = merged.filter(
                ~F.col("_was_alerted") & F.col("alerted")
            ).select(
                "track_a", "track_b", "n_shared", "first_ts",
                F.col("last_tick").alias("alert_tick"),
            )
            alert_io.write_version(alerts, batch_id)
            pair_io.write_version(merged.select(*_PAIR_COLS), batch_id)
            last_io.write_version(new_last, batch_id)
            # recent-tick buffer: everything within the lag horizon
            # of the newest event time seen (bounded state)
            wm = new_last.agg(F.max("last_ts")).collect()[0][0] or 0
            keep = all_ticks.filter(
                F.col("tick_ts") >= F.lit(int(wm) - horizon)
            ).select("track", "tick_ts", "lon", "lat")
            tick_io.write_version(keep, batch_id)
        finally:
            ticks.unpersist()

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


def read_alerts(spark: SparkSession, alerts_dir: str) -> DataFrame:
    from functools import reduce

    from geomesa_spark.sources.tableio import ParquetVersionedIO

    io = ParquetVersionedIO(spark, alerts_dir)
    frames = [io.read_version(v) for v in io.versions()]
    if not frames:
        raise ValueError(f"no committed alert versions under {alerts_dir}")
    return reduce(lambda a, b: a.unionByName(b), frames)


def read_pair_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """Live view: accumulated (track_a, track_b, n_shared, first_ts,
    last_tick, alerted) — equals the batch twin's co_travel counts
    for an in-order stream (with min_shared applied by the caller)."""
    from geomesa_spark.sources.tableio import ParquetVersionedIO

    state = ParquetVersionedIO(spark, f"{state_dir}/pairs").read_latest()
    if state is None:
        raise ValueError(f"no committed pair state under {state_dir}")
    return state
