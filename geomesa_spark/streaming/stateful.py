"""Stateful live view via applyInPandasWithState.

The foreachBatch materializer (streaming/upsert.py) rebuilds state
from the previous snapshot each micro-batch — simple, replayable,
but the state lives in parquet. This variant keeps the live view in
**Structured Streaming keyed state** (the direct analog of the
reference's in-memory LiveFeatureCache,
LiveKafkaConsumerFeatureSource.scala:136-191):

- one state entry per feature id, last-write-wins by (ts, seq)
- Delete drops the key, TTL expires idle keys via the state timeout
  (Guava expireAfterWrite analog)
- every state change is emitted downstream, so the output stream is
  a compacted changelog that can feed a sink or dashboard.

Pandas/Arrow batched per group — no per-row Python (the handler
sees one DataFrame per key per trigger).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "ts double, seq long, val string"
OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("ts", T.DoubleType()),
        T.StructField("seq", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("live", T.BooleanType()),
    ]
)


def _fold(key, pdfs, state: GroupState, ttl_ms: int):
    doc_id = key[0]
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(
            [{"doc_id": doc_id, "ts": None, "seq": None, "val": None, "live": False}]
        )
        return

    cur = state.get if state.exists else None  # (ts, seq, val)
    best = cur
    deleted = False
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "seq"])  # log order within batch
        for r in pdf.itertuples():
            mark = (float(r.ts), int(r.seq))
            if best is not None and mark < (best[0], best[1]):
                continue  # stale out-of-order op
            if r.op == "delete":
                best = None
                deleted = True
            elif r.op == "upsert":
                best = (float(r.ts), int(r.seq), r.val)
                deleted = False

    if best is None:
        if state.exists:
            state.remove()
        if deleted:
            yield pd.DataFrame(
                [{"doc_id": doc_id, "ts": None, "seq": None, "val": None,
                  "live": False}]
            )
        return
    state.update(best)
    if ttl_ms > 0:
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame(
        [{"doc_id": doc_id, "ts": best[0], "seq": best[1], "val": best[2],
          "live": True}]
    )


def stateful_upsert(
    changelog: DataFrame,
    ttl_ms: int = 0,
) -> DataFrame:
    """Streaming keyed upsert with in-engine state.

    `changelog`: streaming DF (op, doc_id, ts, seq, val). Returns the
    compacted change stream (doc_id, ts, seq, val, live). `ttl_ms`>0
    expires idle keys via the processing-time state timeout.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )

    def fold(key, pdfs, state):
        yield from _fold(key, pdfs, state, ttl_ms)

    return changelog.groupBy("doc_id").applyInPandasWithState(
        fold,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
