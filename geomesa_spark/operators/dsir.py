"""DSIR-style importance resampling for training-data selection.

Beyond-reference operator (the operators/pack.py family): selects
raw-corpus documents whose hashed n-gram feature distribution looks
like a target corpus — the Data Selection via Importance Resampling
recipe (Xie et al. 2023, public paper): estimate bag-of-hashed-bigram
distributions for the target and the raw/source corpus, weight each
candidate document by its likelihood ratio, and keep the top-k.

Two scoring surfaces, the ``lm_score`` convention:

- **fixed-point (default, oracle-gated)**: per occupied feature
  bucket the smoothed count ratio ``((c_t + 1) * scale) DIV
  (c_s + 1)`` — pure int64 arithmetic, bit-identical in any SQL
  engine — summed per document and divided by the document's feature
  count.  Dropping the distribution normalizers ``(N + B)`` is
  deliberate: under the per-position MEAN every document's score is
  scaled by the same constant ``(N_s + B)/(N_t + B)``, so the
  RANKING (what selection consumes) is unchanged, and no float ever
  enters the result.
- **log-space (``log_space=True``)**: the paper's actual
  log-importance weight ``sum(cnt * (ln p_t - ln p_s))`` with the
  normalizers included, plus optional deterministic Gumbel noise
  (``-ln(-ln u)`` with ``u`` hashed from the doc id, so the
  resample is reproducible across layouts/retries like everything
  in operators/sample.py).  Float ``ln`` is not ULP-portable across
  engines, so this path is numpy-tested rather than hash-gated.

Scale: feature extraction is one explode + one (id, bucket) groupBy
(fan-out bounded by document length); both models collapse to at
most ``buckets`` rows and BROADCAST into the scoring join — no
corpus-side shuffle on the model side; top-k is TakeOrdered (no
global sort).  Models are DataFrames — at warehouse scale they
persist as tables and amortize across selection runs, like the
bigram LM and the bucketed spatial layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.operators.dedup import shingle_hash
from geomesa_spark.operators.text import bigram_pairs

DEFAULT_BUCKETS = 10_000


def hashed_feature_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document hashed-bigram bag: (id, bucket, cnt) long format.

    Documents with <2 tokens produce no rows (callers left-join).
    ``hash_fn`` is the dedup.shingle_hash seam: md5 = oracle-portable,
    xxhash = the faster Spark-only production path."""
    feats = df.select(
        F.col(id_col),
        F.explode(bigram_pairs(F.col(text_col))).alias("bg"),
    ).select(
        id_col,
        F.pmod(
            shingle_hash(
                F.concat_ws(" ", F.col("bg.w1"), F.col("bg.w2")), hash_fn
            ),
            F.lit(buckets),
        ).alias("bucket"),
    )
    return feats.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def dsir_model(
    corpus: DataFrame,
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    hash_fn: str = "md5",
) -> tuple[DataFrame, int, int]:
    """Corpus feature distribution: (counts, total, buckets) where
    ``counts`` has one row per occupied bucket (bucket, c).  One
    explode + one partial-aggregated groupBy on the bucket key —
    the result is <= `buckets` rows regardless of corpus size.
    ``total`` is a single bounded driver scalar (the kNN-round-scalar
    class of decision)."""
    counts = (
        corpus.select(F.explode(bigram_pairs(F.col(text_col))).alias("bg"))
        .select(
            F.pmod(
                shingle_hash(
                    F.concat_ws(" ", F.col("bg.w1"), F.col("bg.w2")), hash_fn
                ),
                F.lit(buckets),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    total = counts.agg(F.sum("c")).collect()[0][0] or 0
    return counts, int(total), buckets


def dsir_weights(
    df: DataFrame,
    target_model: tuple[DataFrame, int, int],
    source_model: tuple[DataFrame, int, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
    scale: int = 1_000_000,
    log_space: bool = False,
) -> DataFrame:
    """Per-document importance score against target vs source models.

    Output: (id, n_feats, score_fp) fixed-point, or (id, n_feats,
    log_weight) when ``log_space=True``.  ``n_feats`` counts feature
    OCCURRENCES (bigram positions); featureless docs keep NULL score
    and n_feats=0."""
    t_counts, t_total, t_buckets = target_model
    s_counts, s_total, s_buckets = source_model
    if t_buckets != s_buckets:
        raise ValueError(
            f"bucket mismatch: target {t_buckets} vs source {s_buckets}"
        )
    feats = hashed_feature_counts(df, text_col, id_col, t_buckets, hash_fn)
    j = feats.join(
        F.broadcast(t_counts.withColumnRenamed("c", "c_t")), "bucket", "left"
    ).join(F.broadcast(s_counts.withColumnRenamed("c", "c_s")), "bucket", "left")
    ct = F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(1)
    cs = F.coalesce(F.col("c_s"), F.lit(0)) + F.lit(1)
    if log_space:
        lp = F.ln(ct.cast("double") / F.lit(float(t_total + t_buckets))) - F.ln(
            cs.cast("double") / F.lit(float(s_total + s_buckets))
        )
        scored = j.groupBy(id_col).agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            F.sum(F.col("cnt") * lp).alias("log_weight"),
        )
        out_cols = [id_col, "n_feats", "log_weight"]
    else:
        # documented op order: ((c_t+1)*scale) DIV (c_s+1), then the
        # per-doc MEAN over feature occurrences (normalizer-free,
        # rank-equivalent — module docstring)
        j = j.withColumn(
            "_r_fp", F.expr(f"((coalesce(c_t, 0) + 1) * {scale}) DIV (coalesce(c_s, 0) + 1)")
        )
        scored = (
            j.groupBy(id_col)
            .agg(
                F.sum("cnt").cast("long").alias("n_feats"),
                F.sum(F.col("cnt") * F.col("_r_fp")).cast("long").alias("_sum_fp"),
            )
            .withColumn(
                "score_fp",
                F.when(
                    F.col("n_feats") > 0, F.expr("_sum_fp DIV n_feats")
                ).cast("long"),
            )
            .drop("_sum_fp")
        )
        out_cols = [id_col, "n_feats", "score_fp"]
    base = df.select(id_col).join(scored, id_col, "left")
    return base.select(
        id_col,
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        *out_cols[2:],
    )


def dsir_sample(
    df: DataFrame,
    target_model: tuple[DataFrame, int, int],
    source_model: tuple[DataFrame, int, int],
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
    scale: int = 1_000_000,
    gumbel: bool = False,
    salt: str = "",
) -> DataFrame:
    """Top-k selection by importance score.

    Deterministic rank: (score DESC, id ASC) — NULL-score
    (featureless) docs sort last and are only taken when k exceeds
    the scored population.  ``gumbel=True`` switches to the paper's
    Gumbel-top-k resample on the log path with hash-derived noise
    (``u = (sample_hash(id, salt) + 0.5)/1e6``), reproducible across
    runs and layouts.  Both are TakeOrdered plans — no global sort,
    no SinglePartition window."""
    if gumbel:
        from geomesa_spark.operators.sample import HASH_BUCKETS, sample_hash

        w = dsir_weights(
            df, target_model, source_model, text_col, id_col, hash_fn,
            scale, log_space=True,
        )
        u = (
            sample_hash(F.col(id_col), salt) + F.lit(0.5)
        ) / F.lit(float(HASH_BUCKETS))
        w = w.withColumn(
            "g_weight", F.col("log_weight") + -F.ln(-F.ln(u))
        )
        return w.orderBy(
            F.col("g_weight").desc_nulls_last(), F.col(id_col)
        ).limit(k)
    w = dsir_weights(
        df, target_model, source_model, text_col, id_col, hash_fn, scale,
        log_space=False,
    )
    return w.orderBy(F.col("score_fp").desc_nulls_last(), F.col(id_col)).limit(k)
