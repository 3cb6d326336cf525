"""Deterministic sampling + sessionization for training pipelines.

Beyond-reference operators (like operators/pack.py): a 100 TB corpus
pipeline needs REPRODUCIBLE sampling — `df.sample()` draws from a
per-partition RNG, so the selected set changes with partitioning,
retries, and cluster size, which breaks resume-from-checkpoint and
train/eval splits. Everything here derives from content hashes, so
the same row is selected on every run, any cluster, any partition
layout — and each operator is expressible in plain SQL for the
DuckDB oracle gates.

Scale notes: hash_sample is a stateless filter (pushdown-friendly, no
shuffle). stratified_sample shuffles once on the stratum key with the
per-stratum work done by a rank window (parallelism = #strata; a
single giant stratum is bounded by the sort of its own rows, the
same cost profile as any per-key top-k). sessionize shuffles once on
the entity key; windows are per-key and never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 1_000_000


def sample_hash(key: F.Column, salt: str = "") -> F.Column:
    """Uniform bucket in [0, 1e6) from md5(salt || key) — portable
    (same value in DuckDB: ('0x' || substr(md5(..),1,8))::BIGINT %
    1000000), independent of partitioning."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(HASH_BUCKETS))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket < fraction * 1e6. Deterministic,
    idempotent (re-running selects the same rows), and disjoint
    across non-overlapping fractions of different salts. A pure
    filter: no shuffle, survives predicate pushdown."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    cut = int(round(fraction * HASH_BUCKETS))
    return df.where(sample_hash(F.col(key_col), salt) < cut)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    quota: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(quota, stratum size) rows per stratum: rank rows
    within each stratum by (hash bucket, key) and keep the first
    `quota` — a deterministic per-stratum uniform draw (the hash
    order is a random permutation independent of layout; the key
    tiebreak makes equal-bucket rows stable). One shuffle on the
    stratum key."""
    if quota <= 0:
        raise ValueError(f"quota must be positive, got {quota}")
    # nulls LAST: a NULL key hashes to a NULL bucket, which default
    # ascending order ranks FIRST — null-keyed rows would silently
    # hog every stratum's quota
    w = Window.partitionBy(stratum_col).orderBy(
        sample_hash(F.col(key_col), salt).asc_nulls_last(),
        F.col(key_col).asc_nulls_last(),
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= quota)
        .drop("__rk")
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weights: dict[str, int],
    total: int,
    salt: str = "",
) -> DataFrame:
    """Sample a corpus down to a target domain MIXTURE: domain d's
    target row count is ``total * weights[d] / sum(weights)``;
    domains absent from `weights` are dropped. The data-mixing step
    of a pretraining pipeline (sample web-heavy raw data to a
    books/code/web recipe).

    The per-domain keep fraction comes from ONE count aggregate
    (driver result bounded by the number of domains) using pure
    integer arithmetic::

        cut_d = min(1e6, (1e6 * total * w_d) // (sum(w) * n_d))

    so any engine derives identical cuts, and the selection itself is
    the `hash_sample` bucket filter — layout/retry independent,
    nested (a smaller `total` with the same weights selects a subset
    of a larger one), and a pure filter on the data path (the only
    shuffle is the partial-aggregated domain count).

    A domain with fewer rows than its target keeps every row (the cut
    saturates): the mixture is best-effort, never fabricating rows.
    Achieved counts are binomial around the target (hash buckets are
    uniform, so stddev ~ sqrt(target)); use `stratified_sample` when
    exact per-stratum quotas matter more than a shuffle-free plan.
    """
    if total <= 0:
        raise ValueError(f"total must be positive, got {total}")
    if not weights:
        raise ValueError("weights must be non-empty")
    for d, w in weights.items():
        if not isinstance(w, int) or w <= 0:
            raise ValueError(f"weight for {d!r} must be a positive int, got {w!r}")
    wsum = sum(weights.values())
    dom = F.col(domain_col)
    counts = dict(
        df.where(dom.isin(list(weights)))
        .groupBy(domain_col)
        .count()
        .collect()
    )
    cuts = {
        d: min(
            HASH_BUCKETS,
            (HASH_BUCKETS * total * weights[d]) // (wsum * counts[d]),
        )
        for d in weights
        if counts.get(d)
    }
    if not cuts:
        return df.where(F.lit(False))
    cut_map = F.create_map(
        *[F.lit(x) for d, c in sorted(cuts.items()) for x in (d, c)]
    )
    return df.where(
        dom.isin(list(cuts)) & (sample_hash(F.col(key_col), salt) < cut_map[dom])
    )


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign each event to a session: a new session starts when the
    gap to the entity's previous event exceeds `gap_seconds`.

    Classic lag + running count of session starts, both over the
    SAME per-entity window (one shuffle on the entity key, then two
    pipelined window phases in the same sort). session_id =
    entity-scoped ordinal from 1, deterministic given unique
    (entity, ts) pairs."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    es = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(es).over(w)
    is_start = F.when(
        prev.isNull() | ((es - prev) > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(entity_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(
        session_col, F.sum(is_start).over(run).cast("long")
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int,
    n_shards: int,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global training-order shuffle: assign every row
    a (shard, position-in-shard) for epoch `seed`.

    The permutation is the hash order ``md5(seed || key)`` — the same
    order on any cluster, any partitioning, any retry (the module's
    reproducibility contract), and a fresh independent order per
    seed/epoch.  Shards are CONTIGUOUS ranges of the hash space
    (``bucket * n_shards DIV 1e6``), so concatenating shards 0..n-1
    replays the full permutation, and a writer can emit one file per
    shard with no extra pass.

    Plan shape: one shuffle on the shard key, then a per-shard
    row_number window — parallelism = n_shards, never a
    SinglePartition collapse (the operators/pack.py discipline; the
    naive global ``row_number() OVER (ORDER BY hash)`` is exactly
    what this refuses to become).  Shard sizes concentrate near
    rows/n_shards (multinomial), so no skew mitigation is needed
    beyond choosing n_shards >= target parallelism."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    bucket = sample_hash(F.col(key_col), salt=f"epoch{seed}:")
    out = df.withColumn("_bucket", bucket).withColumn(
        shard_col,
        F.expr(f"(_bucket * {n_shards}) DIV {HASH_BUCKETS}").cast("int"),
    )
    w = Window.partitionBy(shard_col).orderBy("_bucket", key_col)
    return out.withColumn(pos_col, F.row_number().over(w).cast("long")).drop(
        "_bucket"
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
    est_col: str = "est_weight_fp",
) -> DataFrame:
    """Weighted sample of k rows via priority sampling (Duffield,
    Lund & Thorup, JACM 2007): each row gets priority q = w / u with
    u a uniform in (0, 1]; the k highest-priority rows are the
    sample, and `est_col` carries the Horvitz-Thompson weight
    max(w, tau) — tau the (k+1)-th priority — whose sum over the
    sample unbiasedly estimates ANY subset's total weight (the
    paper's result: optimal variance among k+1-sized schemes).

    Determinism: u = (hash+1)/1e6 from the portable md5 bucket
    (sample_hash), so the sample is reproducible across engines,
    retries, and layouts — df.sample()'s per-partition RNG is not.
    Priorities are exact integer arithmetic, q_fp = (w * 1e12) DIV
    (hash+1), i.e. q in weight units at 6 fixed decimals; `est_col`
    is likewise fixed-point (weight * 1e6 vs tau_fp). Integer
    weights must satisfy w < ~9.2e6 (w * 1e12 must fit int64 —
    validated); rows with w <= 0 are excluded (DLT requires
    positive weights).

    Scale shape: the top-(k+1) is TakeOrderedAndProject —
    per-partition top-k then a bounded driver merge, never a global
    sort; the tau window runs on k+1 rows only (bounded by k, the
    documented pack.py-style exception to the no-SinglePartition
    rule)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    scale = HASH_BUCKETS * 1_000_000  # 1e12: 6 fixed decimals in weight units
    w = F.col(weight_col).cast("long")
    cand = (
        df.where(w > 0)
        .withColumn("__h", sample_hash(F.col(key_col), salt))
        .withColumn(
            "__q",
            F.expr(
                f"CAST((CAST({weight_col} AS BIGINT) * {scale}L)"
                f" DIV (__h + 1) AS BIGINT)"
            ),
        )
    )
    # overflow guard: w * 1e12 must not wrap (non-ANSI mode wraps
    # silently and corrupts the ranking)
    cand = cand.withColumn(
        "__q",
        F.when(w < F.lit((1 << 63) // scale), F.col("__q")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"priority_sample: {weight_col}="),
                    w.cast("string"),
                    F.lit(f" overflows w*{scale}"),
                )
            ).cast("long")
        ),
    )
    top = cand.orderBy(F.col("__q").desc(), F.col(key_col).asc()).limit(k + 1)
    whole = Window.partitionBy()
    rk = Window.orderBy(F.col("__q").desc(), F.col(key_col).asc())
    tau = F.when(
        F.count("*").over(whole) > k, F.min("__q").over(whole)
    ).otherwise(F.lit(0).cast("long"))
    return (
        top.withColumn("__tau", tau)
        .withColumn("__rk", F.row_number().over(rk))
        .where(F.col("__rk") <= k)
        .withColumn(
            est_col, F.greatest(w * F.lit(1_000_000), F.col("__tau"))
        )
        .drop("__h", "__q", "__tau", "__rk")
    )


def spatial_split(
    df: DataFrame,
    test_frac: float,
    bits: int = 6,
    lon_col: str = "lon",
    lat_col: str = "lat",
    salt: str = "spatial-split",
) -> DataFrame:
    """Spatially BLOCKED train/test split: every 2^bits-per-dim grid
    block lands WHOLLY on one side, the block chosen by the portable
    md5 bucket of its Z2 cell id.  A random row split leaks spatial
    signal — near-identical neighboring points straddle the split
    and the model grades itself on memorized geography; blocked
    splitting (spatial/block cross-validation) is the standard
    remedy, and hashing the BLOCK keeps every guarantee of
    ``hash_sample``: deterministic across layouts and retries,
    nested fractions are subsets, pure column expressions (no
    shuffle, pushdown-friendly).

    Size `bits` so a block exceeds the data's spatial
    autocorrelation range (coarser bits = stronger isolation,
    coarser split granularity).

    Adds (split_block, is_test)."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError(f"test_frac must be in [0,1], got {test_frac}")
    from geomesa_spark.functions import cells as C

    cut = int(round(test_frac * HASH_BUCKETS))
    return df.withColumn(
        "split_block", C.z2_cell(F.col(lon_col), F.col(lat_col), bits)
    ).withColumn(
        "is_test", sample_hash(F.col("split_block"), salt) < F.lit(cut)
    )
