"""Stateful live view via applyInPandasWithState.

The foreachBatch materializer (streaming/upsert.py) rebuilds state
from the previous snapshot each micro-batch — simple, replayable,
but the state lives in parquet. This variant keeps the live view in
**Structured Streaming keyed state** (the direct analog of the
reference's in-memory LiveFeatureCache,
LiveKafkaConsumerFeatureSource.scala:136-191):

- one state entry per feature id, last-write-wins by (ts, seq)
- Delete (and Clear, applied per-key at its mark) leaves a (ts, seq)
  tombstone (val=NULL) so stale out-of-order upserts in later
  micro-batches cannot resurrect the key; unknown ops raise
- TTL expires idle keys and tombstones via the state timeout
  measured from the last ACCEPTED write (`wts` in state) — stale
  replays re-register only the remaining time, so they cannot keep
  a key alive past its expireAfterWrite horizon
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

STATE_SCHEMA = "ts double, seq long, val string, wts double"
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

    # state entry (ts, seq, val, wts); val=None is a delete/clear
    # TOMBSTONE that carries its (ts, seq) so an out-of-order upsert
    # with an older mark arriving in a LATER micro-batch cannot
    # resurrect the key with stale data (it loses the same
    # last-write-wins race a retained entry would impose). `wts` is
    # the processing time of the last ACCEPTED write: on a trigger
    # of purely-stale replays the timeout re-registers only the
    # REMAINING time, so stale traffic cannot keep a key alive past
    # its expireAfterWrite horizon. A 'clear' acts as a per-key
    # tombstone at its mark (the per-key projection of
    # apply_changelog's global clear). Unknown ops raise.
    import time as _time

    cur = tuple(state.get) if state.exists else None
    best = cur
    changed = False
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "seq"])  # log order within batch
        for r in pdf.itertuples():
            mark = (float(r.ts), int(r.seq))
            if best is not None and mark < (best[0], best[1]):
                continue  # stale out-of-order op
            if r.op in ("delete", "clear"):
                best = (float(r.ts), int(r.seq), None, None)
                changed = True
            elif r.op == "upsert":
                best = (float(r.ts), int(r.seq), r.val, None)
                changed = True
            else:
                raise ValueError(f"unknown changelog op {r.op!r}")

    if best is None:
        return  # no state and no applicable ops
    now_ms = _time.time() * 1000.0
    if changed:
        best = (best[0], best[1], best[2], now_ms)
        state.update(best)
        if ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)
        live = best[2] is not None
        yield pd.DataFrame(
            [{"doc_id": doc_id, "ts": best[0], "seq": best[1],
              "val": best[2], "live": live}]
        )
        return
    # stale-only trigger: keep the entry but re-register only the
    # time remaining since the last accepted write (the timeout must
    # be re-set on every invocation or it is dropped entirely)
    state.update(best)
    if ttl_ms > 0:
        last_wts = best[3] if best[3] is not None else now_ms
        remaining = max(int(ttl_ms - (now_ms - last_wts)), 1)
        state.setTimeoutDuration(remaining)


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
