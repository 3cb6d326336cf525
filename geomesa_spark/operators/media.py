"""Multimodal (image/audio/video) columns: opaque binary payloads +
typed metadata, with decode / feature-extract / resize / frame-sample
as Arrow-batched `mapInPandas` stages.

The reference stores media only as raster chunks (geomesa-raster);
a training-data pipeline additionally needs per-document media
handling. Design:

- media lives in documents' `kind='media'` spans as a `media_ref`
  URI; bytes are an opaque `binary` column fetched/joined in.
- every stage is a `mapInPandas` over a typed schema: Spark sees
  real columns (partitionable, prunable), Python sees Arrow record
  batches — the 100 TB plumbing is real even where the codec is not.
- actual codec work (JPEG decode, resampling, ffmpeg) is isolated
  behind `decode_media_bytes`; this container has no image/audio
  libs, so the default implementation is a clearly-marked
  deterministic fake (metadata derived from the ref hash). Swap in a
  real decoder by passing `decoder=` — the Spark plumbing does not
  change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ["image", "audio", "video"]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("span_offset", T.IntegerType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def extract_media_refs(docs: DataFrame) -> DataFrame:
    """(doc_id, media_ref, span_offset) for every media span.

    Pure column ops (filter + posexplode of the spans array); the
    parent `docs` rows — and their span-sequence invariant — are
    untouched: this derives a new table, it does not rewrite spans.
    """
    media = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
    return (
        docs.select(F.col("doc_id"), F.explode(media).alias("m"))
        .select(
            "doc_id",
            F.col("m.media_ref").alias("media_ref"),
            F.col("m.offset").alias("span_offset"),
        )
    )


def default_decoder(ref: str, payload: bytes | None) -> dict:
    """DETERMINISTIC FAKE decode — this container ships no codec
    libraries. Metadata/features derive from the ref's md5 so every
    engine and every run agrees. Replace with a real implementation
    (PIL / soundfile / pyav) via the `decoder=` parameter; raise
    NotImplementedError here if fake output is unacceptable.
    """
    h = hashlib.md5(ref.encode()).digest()
    kind = MEDIA_KINDS[h[0] % len(MEDIA_KINDS)]
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    feat = np.resize(rng, FEATURE_DIM) / 255.0
    return {
        "media_kind": kind,
        "width": 16 * (1 + h[1] % 64) if kind != "audio" else 0,
        "height": 16 * (1 + h[2] % 64) if kind != "audio" else 0,
        "n_frames": (1 + h[3] % 240) if kind == "video" else (0 if kind == "audio" else 1),
        "sample_rate": 8000 * (1 + h[4] % 6) if kind == "audio" else 0,
        "feature": [float(x) for x in feat],
    }


def decode_media(
    refs: DataFrame,
    decoder: Callable[[str, bytes | None], dict] = default_decoder,
    payload_col: str | None = None,
) -> DataFrame:
    """Arrow-batched decode/feature-extract stage.

    `refs`: output of `extract_media_refs` (+ optional binary payload
    column). One `mapInPandas` pass: batches arrive as Arrow record
    batches, the decoder runs once per unique ref per batch (dedup
    the refs table beforehand for cross-batch uniqueness), output is
    the typed MEDIA_META_SCHEMA — ready for partitioning/joining at
    scale.
    """
    has_payload = payload_col is not None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # decode once per UNIQUE ref within the batch: deduped
            # assets shared by many documents would otherwise pay a
            # full (real) codec invocation per referencing row
            cache: dict = {}
            rows = []
            for i in range(len(pdf)):
                ref = pdf["media_ref"].iat[i]
                if ref not in cache:
                    payload = pdf[payload_col].iat[i] if has_payload else None
                    cache[ref] = decoder(ref, payload)
                off = pdf["span_offset"].iat[i]
                rows.append(
                    {
                        "doc_id": pdf["doc_id"].iat[i],
                        "media_ref": ref,
                        "span_offset": int(off) if pd.notna(off) else None,
                        **cache[ref],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
            )

    return refs.mapInPandas(gen, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_plan(meta: DataFrame, max_side: int) -> DataFrame:
    """Resize stage (dimension arithmetic is real; pixel resampling
    happens in the decoder swap). Aspect-preserving clamp of the
    longer side to `max_side` — pure column ops."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side))
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return meta.filter(F.col("media_kind") == "image").select(
        "doc_id",
        "media_ref",
        F.greatest(F.round(F.col("width") * scale), F.lit(1)).cast("int").alias("width"),
        F.greatest(F.round(F.col("height") * scale), F.lit(1)).cast("int").alias("height"),
    )


def frame_sample_plan(meta: DataFrame, every_n: int) -> DataFrame:
    """Frame-sampling stage for video: one output row per sampled
    frame index (posexplode of a sequence — JVM-side). Zero-frame
    videos (possible from a real decoder on a corrupt asset) emit no
    rows — without the n_frames >= 1 guard, `sequence(0, -1)` raises
    and one bad asset aborts the whole job."""
    idx = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
    )
    return meta.filter(
        (F.col("media_kind") == "video") & (F.col("n_frames") >= 1)
    ).select(
        "doc_id", "media_ref", F.explode(idx).alias("frame_idx")
    )
