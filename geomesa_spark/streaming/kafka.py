"""Kafka source construction seam for the streaming changelog paths.

The reference consumes GeoMessages (CreateOrUpdate / Delete / Clear)
from a Kafka topic and applies them in log order
(LiveKafkaConsumerFeatureSource.scala:116-191 dispatch loop;
ReplayKafkaConsumerFeatureSource.scala replay view). The engine's
changelog semantics (`upsert.apply_changelog`, TTL, replay,
tombstones) are implemented and tested over file/rate changelogs;
this module supplies the missing construction seam so the ONLY
unexercised piece in a broker-less environment is the socket I/O:

- `kafka_reader_options` — the exact option map a production reader
  needs, as a pure function (unit-testable without a broker or the
  kafka connector jar).
- `kafka_raw_reader`     — `spark.readStream.format("kafka")` wired
  with those options (requires the spark-sql-kafka connector on the
  classpath and a reachable broker).
- `kafka_changelog`      — Kafka wire frame -> changelog projection:
  value JSON -> (op, id, ts, payload...) with `seq` taken from the
  partition offset (log order, exactly the reference's per-partition
  application order). Pure DataFrame function: feed it the real
  `kafka_raw_reader()` output in production or any frame with the
  Kafka wire schema (`KAFKA_WIRE_SCHEMA`) in tests — the projection,
  schema, and downstream upsert fold are identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The fixed schema Spark's kafka source emits (Structured Streaming
#: + Kafka integration guide) — test doubles must match it.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_reader_options(
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = None,
    group_id_prefix: str | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Option map for the kafka source (pure, broker-free).

    `fail_on_data_loss=False` mirrors the reference's tolerance of
    expired/compacted offsets on replay
    (ReplayKafkaConsumerFeatureSource reads a retention-bounded
    window); `max_offsets_per_trigger` bounds micro-batch size so the
    upsert fold's state versions stay uniform at high ingest rates.
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if group_id_prefix is not None:
        opts["groupIdPrefix"] = group_id_prefix
    if extra:
        opts.update(extra)
    return opts


def kafka_raw_reader(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    **kwargs,
) -> DataFrame:
    """The production reader: streaming Kafka wire frames.

    Requires the spark-sql-kafka connector jar and a reachable
    broker; everything downstream (`kafka_changelog` -> the upsert /
    TTL / replay machinery) is broker-independent and fully tested
    against `KAFKA_WIRE_SCHEMA` doubles.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(topic, bootstrap_servers, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_changelog(
    raw: DataFrame,
    payload_schema: T.StructType,
    op_field: str = "op",
    ts_field: str = "ts",
) -> DataFrame:
    """Kafka wire frames -> the changelog shape `apply_changelog`
    consumes: (op, <payload columns>, ts, seq).

    - `value` is UTF-8 JSON holding at least `op_field` plus the
      payload columns (the GeoMessage body); rows whose value fails
      to parse are dropped (corrupt-record tolerance, matching the
      reference's skip-on-decode-failure consumer loop).
    - `ts` comes from the payload when `ts_field` is in
      `payload_schema`, else from the broker log-append timestamp.
    - `seq` is `(partition << 48) | offset` — within one partition it
      preserves log order exactly (the reference's per-partition
      application order, LiveKafkaConsumerFeatureSource.scala:116-123),
      and across partitions it never COLLIDES, so apply_changelog's
      (ts, seq) tiebreak stays deterministic even on a multi-partition
      topic. Keyed topics still must route a feature id to ONE
      partition (the default id-hash partitioner does) for per-key
      order to be total; the encoding makes a violation reproducible
      instead of silently nondeterministic. 48 offset bits hold ~281T
      messages per partition; Kafka caps partitions well under 2^15.
    """
    fields = [f.name for f in payload_schema.fields]
    if "seq" in fields or op_field == "seq" or ts_field == "seq":
        # `seq` is reserved for the offset-derived log-order column;
        # a payload/op/ts field of the same name would produce an
        # ambiguous duplicate (or silently clobber the log order)
        # that breaks apply_changelog downstream
        raise ValueError(
            "'seq' is reserved for the Kafka-offset log-order column "
            "— rename the colliding payload/op/ts field"
        )
    if op_field not in fields:
        payload_schema = T.StructType(
            [T.StructField(op_field, T.StringType())] + list(payload_schema.fields)
        )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), payload_schema).alias("_m"),
        F.col("timestamp").alias("_kts"),
        F.shiftleft(F.col("partition").cast("long"), 48)
        .bitwiseOR(F.col("offset"))
        .alias("seq"),
    ).filter(F.col("_m").isNotNull())
    cols = [F.col(f"_m.{f.name}").alias(f.name) for f in payload_schema.fields]
    out = parsed.select(*cols, F.col("_kts"), F.col("seq"))
    if ts_field not in [f.name for f in payload_schema.fields]:
        out = out.withColumn(ts_field, F.col("_kts"))
    return out.drop("_kts")


def kafka_live_view(
    raw: DataFrame,
    payload_schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    op_field: str = "op",
    ts_field: str = "ts",
    ttl_sec: float | None = None,
    processing_time: str | None = "1 second",
    available_now: bool = False,
):
    """The reference's CONTINUOUS live layer, composed end-to-end:
    wire frames -> `kafka_changelog` projection -> keyed upsert fold
    with TTL eviction between micro-batches -> versioned snapshots
    that stay queryable while the stream keeps running
    (LiveKafkaConsumerFeatureSource.scala:136-191 — the in-memory
    LiveFeatureCache + expireAfterWrite + quadtree query surface;
    here the snapshot is an ordinary DataFrame, so any engine
    operator — bbox scan, PIP join, kNN — applies unchanged).

    `raw` is a streaming DataFrame with the Kafka wire schema: the
    production `kafka_raw_reader(...)`, or any test double (e.g. a
    file stream of `KAFKA_WIRE_SCHEMA` parquet). Returns the running
    StreamingQuery; serve mid-run snapshot queries with
    `upsert.read_state(spark, state_dir)` — readers only ever see
    fully-committed versions, never a fold in progress.
    """
    from geomesa_spark.streaming.upsert import upsert_stream

    log = kafka_changelog(
        raw, payload_schema, op_field=op_field, ts_field=ts_field
    )
    if op_field != "op":
        # apply_changelog's contract names the op column 'op'; without
        # this rename a custom op_field dies with an unresolved-column
        # error inside foreachBatch on the first trigger
        log = log.withColumnRenamed(op_field, "op")
    return upsert_stream(
        log,
        state_dir,
        checkpoint_dir,
        id_col=id_col,
        ts_col=ts_field,
        ttl_sec=ttl_sec,
        available_now=available_now,
        processing_time=processing_time,
    )
