"""Approximate-nearest-neighbor search over an embedding column.

Extends the engine's kNN surface (operators/knn.py implements the
reference's geographic kNN, KNNQuery.scala:56-81) to embedding
space for training-data pipelines:

- `cosine_topk`    — brute-force exact top-k (baseline/oracle): one
  broadcast of the query set, narrow per-row dot products via
  higher-order array functions (JVM codegen, zero Python), one
  window top-k partitioned by query id.
- `lsh_buckets` / `lsh_topk` — random-hyperplane LSH: deterministic
  hyperplanes derived from splitmix64 counters, sign-bit bucket key,
  candidates restricted to same/multi-probe buckets, exact re-rank
  inside buckets. The scale path: at 10^12 vectors the bucket key
  becomes the shuffle/partition key and each query touches only
  ~n/2^bits of the corpus per probe.

Dot products use fixed-point int64 arithmetic (dedup.FIXED_SCALE) so
scores are exactly reproducible across engines and partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_spark.operators.dedup import FIXED_SCALE as FIXED
from geomesa_spark.operators.dedup import _dot, _fixed


def _with_fixed(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}id"), _fixed(F.col(vec_col)).alias(f"{prefix}fv")
    ).withColumn(f"{prefix}nrm", _dot(F.col(f"{prefix}fv"), F.col(f"{prefix}fv")))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    `queries` is the small side (broadcast); the corpus is scanned
    once, narrow, with partial top-k done by the window after one
    shuffle on qid. Self-matches (same id) are excluded.
    Returns (qid, vec_id, cos, rank).
    """
    c = _with_fixed(corpus, id_col, vec_col, "c_")
    q = _with_fixed(queries, q_id_col, q_vec_col, "q_")
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("c_id") != F.col("q_id"))
    cos = (
        _dot(F.col("c_fv"), F.col("q_fv"))
        / F.sqrt(F.col("c_nrm").cast("double") * F.col("q_nrm").cast("double"))
    ).alias("cos")
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        joined.select(F.col("q_id").alias("qid"), F.col("c_id").alias("vec_id"), cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplane / sign) — the 100 TB path
# ---------------------------------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-gaussian hyperplanes (counter-based, no
    RNG state): sum of 4 uniforms − 2, from splitmix64 streams."""
    idx = np.arange(dim * n_planes * 4, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    u = (_splitmix64(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    g = u.reshape(n_planes, dim, 4).sum(axis=2) - 2.0
    return g


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Append the sign-bit LSH bucket id (0..2^n_planes-1).

    The projection is a pure column expression: for each plane, an
    `aggregate(zip_with(vec, plane_consts, *), +)` — JVM-side, no
    Python, no shuffle. The bucket id is the natural partition key
    for a bucketed/sorted corpus table at scale.
    """
    H = hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        consts = F.array(*[F.lit(float(c)) for c in H[p]])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), consts, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0)
        )
    return df.withColumn(out_col, bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket or any
    bucket within hamming distance `multiprobe` of it (all bit-flip
    combinations up to that distance). Exact fixed-point re-rank
    inside the candidate set.

    Recall grows with multiprobe; the probe count is
    sum_{r<=multiprobe} C(n_planes, r), so the cost stays
    ~probes/2^n_planes of the brute-force join.
    Returns (qid, vec_id, cos, rank).
    """
    # buckets are computed on the *original* float vectors on both
    # sides (fixed-point floor could flip signs of tiny components);
    # fixed vectors, norms and buckets all come out of ONE narrow
    # select per side — no corpus self-join, no extra shuffle
    def _prep(df, idc, vecc, prefix, bucket_col):
        base = df.select(
            F.col(idc).alias(f"{prefix}id"),
            _fixed(F.col(vecc)).alias(f"{prefix}fv"),
            F.col(vecc).alias("_raw"),
        ).withColumn(
            f"{prefix}nrm", _dot(F.col(f"{prefix}fv"), F.col(f"{prefix}fv"))
        )
        return lsh_buckets(
            base, dim, n_planes, vec_col="_raw", seed=seed, out_col=bucket_col
        ).drop("_raw")

    c = _prep(corpus, id_col, vec_col, "c_", "c_bucket")
    q = _prep(queries, q_id_col, q_vec_col, "q_", "q_bucket")
    # probe set: own bucket + every bucket within hamming distance
    # `multiprobe` (XOR masks from bit-flip combinations)
    from itertools import combinations

    masks = [0]
    for r in range(1, min(multiprobe, n_planes) + 1):
        for combo in combinations(range(n_planes), r):
            masks.append(sum(1 << p for p in combo))
    probes = [
        F.col("q_bucket") if m == 0
        else F.col("q_bucket").bitwiseXOR(F.lit(m).cast("long"))
        for m in masks
    ]
    q = q.withColumn("probe", F.explode(F.array(*probes)))
    joined = c.join(
        F.broadcast(q),
        (F.col("c_bucket") == F.col("probe")) & (F.col("c_id") != F.col("q_id")),
    )
    cos = (
        _dot(F.col("c_fv"), F.col("q_fv"))
        / F.sqrt(F.col("c_nrm").cast("double") * F.col("q_nrm").cast("double"))
    ).alias("cos")
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        joined.select(F.col("q_id").alias("qid"), F.col("c_id").alias("vec_id"), cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) — coarse quantizer + probed exact search
# ---------------------------------------------------------------------------


def _kmeanspp_seeds(
    corpus: DataFrame,
    n_lists: int,
    id_col: str,
    vec_col: str,
    sample_size: int,
    seed: int,
) -> np.ndarray:
    """Deterministic k-means++ seeding on a bounded corpus sample.

    Standard quantizer-training practice (faiss trains its coarse
    quantizer on a sample; Spark MLlib's k-means|| exists for when
    even the candidate set must stay distributed): take the
    `sample_size` vectors with smallest xxhash64(id) — a reproducible
    uniform sample, computed as a distributed top-k — then run D²
    (k-means++) seeding driver-side in numpy. Distances are computed
    on L2-normalized copies so seeding optimizes the same spherical
    geometry as `ivf_assign`'s max-dot assignment. All "random" draws
    come from splitmix64 counters, so the seeds are bit-reproducible
    across runs and partitionings.
    """
    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("h", F.xxhash64(F.col("id")))
        .orderBy("h")
        .limit(sample_size)
        .collect()
    )
    X = np.array([[float(x) for x in r.v] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n = X.shape[0]
    if n <= n_lists:
        return X

    def draw(i: int) -> float:  # deterministic U[0,1) stream
        z = _splitmix64(np.asarray([seed * 2_654_435_761 + i], dtype=np.uint64))
        return float(z[0] >> np.uint64(11)) / float(1 << 53)

    chosen = [int(draw(0) * n)]
    d2 = np.sum((Xn - Xn[chosen[0]]) ** 2, axis=1)
    for i in range(1, n_lists):
        total = float(d2.sum())
        if total <= 0:  # fewer distinct points than lists
            remaining = [j for j in range(n) if j not in set(chosen)]
            chosen.append(remaining[0] if remaining else chosen[-1])
            continue
        # D² sampling: next seed ~ d2/sum(d2)
        target = draw(i) * total
        idx = int(np.searchsorted(np.cumsum(d2), target))
        idx = min(idx, n - 1)
        chosen.append(idx)
        d2 = np.minimum(d2, np.sum((Xn - Xn[idx]) ** 2, axis=1))
    return X[chosen]


def ivf_centroids(
    corpus: DataFrame,
    n_lists: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 2,
    seeding: str = "hash",
    sample_size: int | None = None,
    seed: int = 42,
) -> np.ndarray:
    """Deterministic coarse quantizer: seed centroids (hash sample or
    k-means++, see below), then `refine_iters` Lloyd steps run as
    DataFrame aggregations (assign = argmax dot; update = per-list
    mean) — k-means at scale without collecting the corpus.

    `seeding="hash"`: the vectors with smallest splitmix64(id) — the
    cheapest reproducible sample, oracle-friendly but quality-naive
    (several seeds can land in one natural cluster and Lloyd may not
    separate them in few iters).
    `seeding="kmeans++"`: D² seeding on a bounded deterministic
    sample (`sample_size`, default max(256*n_lists, 4096)) — spreads
    seeds across the data's natural clusters, measurably better
    recall at equal n_probes (see test_ann.py recall tests)."""
    if seeding == "kmeans++":
        C = _kmeanspp_seeds(
            corpus, n_lists, id_col, vec_col,
            sample_size or max(256 * n_lists, 4096), seed,
        )
    elif seeding == "hash":
        seeds = (
            corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .withColumn("h", F.xxhash64(F.col("id")))
            .orderBy("h")
            .limit(n_lists)
            .collect()
        )
        C = np.array([[float(x) for x in r.v] for r in seeds], dtype=np.float64)
    else:
        raise ValueError(f"unknown seeding {seeding!r} (hash | kmeans++)")
    # per-list means via mapInPandas PARTIAL SUMS (one (sum, count)
    # row per list per partition, combined on the driver): a
    # per-element `F.avg(vec[i])` agg would put `dim` expression
    # nodes in the plan — unusable at dim >> 1k, while this path is
    # O(1) plan size at any dim
    psum_schema = T.StructType(
        [
            T.StructField("list_id", T.IntegerType()),
            T.StructField("psum", T.ArrayType(T.DoubleType())),
            T.StructField("cnt", T.LongType()),
        ]
    )
    for _ in range(refine_iters):
        assigned = ivf_assign(corpus, C, vec_col=vec_col).select(
            vec_col, "list_id"
        )

        def partial_sums(batches):
            acc: dict[int, tuple[np.ndarray, int]] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.array(pdf[vec_col].to_list(), dtype=np.float64)
                lids = pdf["list_id"].to_numpy()
                for li in np.unique(lids):
                    m = lids == li
                    s, c = acc.get(int(li), (np.zeros(V.shape[1]), 0))
                    acc[int(li)] = (s + V[m].sum(axis=0), c + int(m.sum()))
            if acc:
                yield pd.DataFrame(
                    {
                        "list_id": [li for li in acc],
                        "psum": [acc[li][0].tolist() for li in acc],
                        "cnt": [acc[li][1] for li in acc],
                    }
                )

        sums: dict[int, np.ndarray] = {}
        cnts: dict[int, int] = {}
        for r in assigned.mapInPandas(partial_sums, psum_schema).collect():
            li = int(r.list_id)
            sums[li] = sums.get(li, np.zeros(dim)) + np.array(r.psum)
            cnts[li] = cnts.get(li, 0) + int(r.cnt)
        for li, c in cnts.items():
            if c > 0:
                C[li] = sums[li] / c
    return C


def normalize_centroids(centroids: np.ndarray) -> np.ndarray:
    return centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )


def _fold_dots(V: np.ndarray, Cn: np.ndarray) -> np.ndarray:
    """(n, dim) x (lists, dim) -> (n, lists) dot products with strict
    left-to-right per-element accumulation (0.0-seeded), vectorized
    across rows. Bit-identical to a SQL/HOF sequential fold, unlike a
    BLAS matmul whose blocked summation order differs — use for
    oracle-parity paths."""
    out = np.zeros((V.shape[0], Cn.shape[0]), dtype=np.float64)
    for i in range(V.shape[1]):
        out += V[:, i:i + 1] * Cn[None, :, i]
    return out


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "list_id",
    normalize: bool = True,
    exact_fold: bool = False,
) -> DataFrame:
    """Append the nearest-centroid list id (max dot on normalized
    centroids, ties to the lowest list id).

    One Arrow-batched `mapInPandas` pass: the centroid matrix rides
    in the task closure as ONE numpy array and each batch is a single
    vectorized matmul. (The previous column-literal `when`-chain form
    put n_lists x dim expression nodes into the plan — Janino/codegen
    death around n_lists*dim ~ 10^5; this path is O(1) plan size at
    any n_lists/dim and is how a 4096-list, 768-dim production
    quantizer must run.)

    `normalize=False` uses the matrix as given (caller pre-folded the
    exact constants — required for cross-engine parity checks);
    `exact_fold=True` trades the matmul for a sequential-fold matmul
    that is bit-identical to SQL/HOF left folds.
    """
    Cn = normalize_centroids(centroids) if normalize else np.asarray(centroids)
    Cn = np.ascontiguousarray(Cn, dtype=np.float64)
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.IntegerType())]
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf[vec_col].to_list(), dtype=np.float64)
            dots = _fold_dots(V, Cn) if exact_fold else V @ Cn.T
            pdf = pdf.copy()
            # argmax returns the FIRST max -> lowest list id on ties
            pdf[out_col] = np.argmax(dots, axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def ivf_probes(
    df: DataFrame,
    centroids: np.ndarray,
    n_probes: int,
    vec_col: str = "embedding",
    out_col: str = "probe_lists",
    normalize: bool = True,
    exact_fold: bool = False,
) -> DataFrame:
    """Append the `n_probes` nearest list ids as array<int> (dot
    desc, ties to the lowest list id — the same order as
    `ivf_assign`'s argmax, extended by a stable argsort).

    The distributed generalization of per-query probe selection: one
    Arrow-batched matmul + argsort per batch, O(1) plan size, no
    driver materialization — query sets of any cardinality stream
    through executors exactly like the corpus side's `ivf_assign`.
    """
    Cn = normalize_centroids(centroids) if normalize else np.asarray(centroids)
    Cn = np.ascontiguousarray(Cn, dtype=np.float64)
    n_probes = min(n_probes, Cn.shape[0])
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.IntegerType()))]
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf[vec_col].to_list(), dtype=np.float64)
            dots = _fold_dots(V, Cn) if exact_fold else V @ Cn.T
            # stable argsort of -dots: highest dot first, ties to the
            # lowest list id (matches ivf_assign's first-max argmax)
            order = np.argsort(-dots, axis=1, kind="stable")[:, :n_probes]
            pdf = pdf.copy()
            pdf[out_col] = [row.astype(np.int32) for row in order]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def _probed_query_side(
    queries: DataFrame,
    q_base: DataFrame,
    Cn: np.ndarray,
    n_probes: int,
    exact_fold: bool,
    broadcast_queries: bool | None,
    broadcast_threshold: int,
) -> DataFrame:
    """Shared by ivf_topk and ivf_pq_topk: distributed probe
    selection over the prepped query frame (`q_base`, carrying the
    `_raw` vector column plus whatever payload the caller needs),
    exploded to one row per (query, probed list) on `c_list`, then
    the auto broadcast-vs-shuffle decision.

    The side actually broadcast is the PROBE-EXPLODED frame —
    min(n_probes, n_lists) rows per query (ivf_probes clamps) — so
    the threshold bounds query_rows * probes, not raw query rows. A
    limit of 0 means even one query explodes past the threshold:
    never broadcast (flooring it to 1 would). The count is
    early-stopping: it scans at most limit+1 query rows and never
    materializes probes to decide."""
    q = (
        ivf_probes(
            q_base, Cn, n_probes, vec_col="_raw", out_col="_probes",
            normalize=False, exact_fold=exact_fold,
        )
        .withColumn("c_list", F.explode(F.col("_probes")))
        .drop("_raw", "_probes")
    )
    if broadcast_queries is None:
        eff_probes = min(max(n_probes, 1), len(Cn))
        limit = broadcast_threshold // eff_probes
        if limit < 1:
            broadcast_queries = False
        else:
            n_q = queries.limit(limit + 1).count()
            broadcast_queries = n_q <= limit
    return F.broadcast(q) if broadcast_queries else q


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    normalize: bool = True,
    exact_fold: bool = False,
    broadcast_queries: bool | None = None,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """Approximate top-k: each query searches its `n_probes` nearest
    inverted lists with the exact fixed-point re-rank. At corpus
    scale the list id is the table's bucket/partition key, so a
    probe reads ~n_probes/n_lists of the data. Probe selection is
    fully distributed (`ivf_probes` — the same Arrow-batched matmul
    as the corpus side), so the query set may be arbitrarily large.

    Join strategy for the post-probe query rows: with
    `broadcast_queries=None` (default) the query side is counted
    (one early-stopping `limit(threshold+1).count()` scan) and
    broadcast only when it is at most `broadcast_threshold` rows —
    a large query set automatically falls back to the shuffle join
    on the list id (the co-location key) instead of OOMing every
    executor with a giant broadcast. Pass True/False to force a
    strategy and skip the count.
    `normalize`/`exact_fold` as in `ivf_assign` (set normalize=False
    + exact_fold=True for cross-engine-reproducible assignments).
    Returns (qid, vec_id, cos, rank)."""
    Cn = normalize_centroids(centroids) if normalize else np.asarray(centroids)
    Cn = np.ascontiguousarray(Cn, dtype=np.float64)
    c = (
        ivf_assign(
            corpus.select(
                F.col(id_col).alias("c_id"),
                _fixed(F.col(vec_col)).alias("c_fv"),
                F.col(vec_col).alias("_raw"),
            ).withColumn("c_nrm", _dot(F.col("c_fv"), F.col("c_fv"))),
            Cn,
            vec_col="_raw",
            out_col="c_list",
            normalize=False,
            exact_fold=exact_fold,
        )
        .drop("_raw")
    )
    # per-query probe lists, computed DISTRIBUTED (ivf_probes): no
    # driver collect, so the query side scales like the corpus side
    q_base = queries.select(
        F.col(q_id_col).alias("q_id"),
        _fixed(F.col(q_vec_col)).alias("q_fv"),
        F.col(q_vec_col).alias("_raw"),
    ).withColumn("q_nrm", _dot(F.col("q_fv"), F.col("q_fv")))
    q_side = _probed_query_side(
        queries, q_base, Cn, n_probes, exact_fold,
        broadcast_queries, broadcast_threshold,
    )
    joined = c.join(q_side, ["c_list"], "inner").filter(
        F.col("c_id") != F.col("q_id")
    )
    cos = (
        _dot(F.col("c_fv"), F.col("q_fv"))
        / F.sqrt(F.col("c_nrm").cast("double") * F.col("q_nrm").cast("double"))
    ).alias("cos")
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        joined.select(F.col("q_id").alias("qid"), F.col("c_id").alias("vec_id"), cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column:
    ``scale = max(|v|)/127`` and ``q_i = round_half_up(v_i/scale)``
    (so values span [-127, 127]) — 4x storage compression for ANN
    candidate generation, with the full-precision re-rank kept on the
    original column.

    A pure narrow map (no shuffle, nothing leaves the JVM). Rounding
    is ``floor(x + 0.5)`` on the float64-widened elements: floor and
    one IEEE division are correctly-rounded everywhere, so quantized
    codes reproduce bit-exactly across engines — `round()` dialects
    (half-even vs half-away) do not. An all-zero vector takes
    scale=1.0 (codes all zero) rather than dividing by zero; a NULL
    vector stays NULL."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    scale = F.when(mx == 0.0, F.lit(1.0)).otherwise(mx / F.lit(127.0))
    df = df.withColumn(scale_col, scale)
    s = F.col(scale_col)
    return df.withColumn(
        q_col,
        F.transform(v, lambda x: F.floor(x / s + F.lit(0.5)).cast("int")),
    )


def dequantize_col(q_col, scale_col) -> F.Column:
    """Reconstruct float64 embeddings from quantized codes:
    ``v_i ~= q_i * scale`` (max abs error scale/2 per element)."""
    s = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    q = F.col(q_col) if isinstance(q_col, str) else q_col
    return F.transform(q, lambda x: x.cast("double") * s)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — codebook compression + ADC search
# ---------------------------------------------------------------------------


def pq_hyperplane_codebooks(
    dim: int, n_sub: int, k: int, seed: int = 42, scale: float = 0.25
) -> np.ndarray:
    """Deterministic fixed-point PQ codebooks with NO training pass:
    per-subspace pseudo-gaussian points (the `hyperplanes` splitmix64
    stream, one seed offset per subspace, scaled toward the data's
    magnitude) quantized onto the dedup.FIXED_SCALE integer lattice.
    Shape (n_sub, k, dim/n_sub), dtype int64 — the same constants are
    inlined verbatim into the SQL oracle, so encode and ADC search
    reproduce bit-exactly on any engine (the `ivf_topk` gate
    convention). For recall-grade codebooks train with `pq_train`."""
    if dim % n_sub != 0:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    ds = dim // n_sub
    books = [
        np.floor(hyperplanes(ds, k, seed=seed + 7919 * m) * scale * FIXED)
        for m in range(n_sub)
    ]
    return np.stack(books).astype(np.int64)


def _subbook_lit(book: np.ndarray) -> F.Column:
    """(k, ds) int64 subspace codebook as an array<array<long>>
    literal column."""
    return F.array(
        *[F.array(*[F.lit(int(v)) for v in cent]) for cent in book]
    )


def _pq_codes_and_dists(fv, codebooks: np.ndarray):
    """Per-subspace L2 distances to every centroid and the argmin
    code, as pure column expressions over a fixed-point vector `fv`.
    Returns (codes array<int>, dists array<array<long>>). Each
    subspace's `transform` runs over ITS OWN (k, ds) literal slice —
    embedding the whole codebook once per subspace would make the
    plan O(n_sub * dim * k) nodes (Janino death at M=96/k=256/
    dim=768); this way it is O(dim * k) total, the size of the
    codebook itself, and everything stays in whole-stage codegen."""
    n_sub, _, ds = codebooks.shape

    def dist_fn(sub):
        # a single-arg closure, NOT `lambda cent, s=sub`: PySpark
        # reads a second Python parameter (even defaulted) as the
        # (element, index) lambda form and binds it to the int index
        def to_cent(cent):
            return F.aggregate(
                F.zip_with(sub, cent, lambda x, c: (x - c) * (x - c)),
                F.lit(0).cast("long"),
                lambda acc, d: acc + d,
            )

        return to_cent

    dist_arrays = []
    for m in range(n_sub):
        sub = F.slice(fv, m * ds + 1, ds)
        dists = F.transform(_subbook_lit(codebooks[m]), dist_fn(sub))
        dist_arrays.append(dists)
    dist_col = F.array(*dist_arrays)
    codes = F.transform(
        dist_col,
        lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"),
    )
    return codes, dist_col


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append PQ codes (array<int>, one centroid index per subspace;
    argmin L2 in the fixed-point lattice, first-index tie-break).
    A narrow per-row map — no shuffle, no Python: at corpus scale the
    codes column is (n_sub bytes)/vector vs 4*dim, the classic
    32-64x ANN compression, and encode runs at parquet-scan speed.

    Like `faiss.IndexPQ.add`; the engine analog of the reference's
    attribute-index write path (a derived compact key persisted next
    to the record, geomesa-accumulo AttributeTable)."""

    def build(fv):
        codes, _ = _pq_codes_and_dists(fv, codebooks)
        return codes

    # let-bind the fixed vector behind a single-element transform so
    # the float->fixed conversion runs once, not once per subspace
    return df.withColumn(
        out_col, F.transform(F.array(_fixed(F.col(vec_col))), build)[0]
    )


def _adc_dist(n_sub: int) -> F.Column:
    """The ADC lookup sum over joined (q_tab, c_codes) columns:
    sum_m q_tab[m][c_codes[m]] — n_sub integer array lookups per
    candidate, zero per-dimension arithmetic."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(n_sub)),
        F.lit(0).cast("long"),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(F.col("q_tab"), m),
            F.element_at(F.col("c_codes"), m) + 1,
        ),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    codes_col: str | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query keeps full
    precision, the corpus is its PQ codes, and each candidate's
    distance is a table lookup sum — `faiss.IndexPQ.search`.

    Per query row the subspace-distance table (n_sub x k int64,
    computed by the same expressions as encode) rides the broadcast;
    each corpus row then costs n_sub array lookups — no per-pair
    arithmetic over dim elements, which is the entire point of ADC:
    the scan is bandwidth-bound on the codes column (n_sub bytes/row)
    instead of compute-bound on 4*dim floats. Exact integer sums, so
    results are engine-exact. Pre-encoded corpora pass their stored
    column via `codes_col` (the warehouse layout: encode once, scan
    many); otherwise codes are derived inline.

    At 10^12 vectors compose with the IVF list key (`ivf_pq_topk`,
    the bucketed stored layout) so each query's ADC scan touches only
    its probed lists; this operator is the in-list scan of that
    composition and the exhaustive baseline on its own. The query
    table is broadcast unconditionally (n_sub*k longs per query —
    fine up to ~10^5 queries); larger query sets belong on
    `ivf_pq_topk`'s auto shuffle path. Returns
    (qid, vec_id, adist, rank) — adist in the FIXED_SCALE^2 lattice.
    """
    n_sub = codebooks.shape[0]
    if codes_col is None:
        enc = pq_encode(corpus, codebooks, vec_col=vec_col, out_col="_pq")
        codes = F.col("_pq")
    else:
        enc = corpus
        codes = F.col(codes_col)
    c = enc.select(F.col(id_col).alias("c_id"), codes.alias("c_codes"))

    def qbuild(fv):
        _, dists = _pq_codes_and_dists(fv, codebooks)
        return dists

    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.transform(F.array(_fixed(F.col(q_vec_col))), qbuild)[0].alias("q_tab"),
    )
    adist = _adc_dist(n_sub)
    w = Window.partitionBy("qid").orderBy(F.col("adist").asc(), F.col("vec_id").asc())
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("qid"),
            F.col("c_id").alias("vec_id"),
            adist.alias("adist"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def pq_train(
    corpus: DataFrame,
    n_sub: int,
    k: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 3,
    seed: int = 42,
) -> np.ndarray:
    """Train PQ codebooks with distributed per-subspace L2 k-means.

    Seeding is the reproducible hash sample (the k vectors with
    smallest splitmix64-grade xxhash64(id), sliced per subspace);
    each Lloyd iteration is ONE corpus pass: `pq_encode` with the
    current codebooks assigns every subspace simultaneously (argmin
    L2 — true k-means assignment, unlike the spherical max-dot of
    `ivf_assign`), then a mapInPandas partial-sum pass accumulates
    (subspace, code) -> (sum, count) with O(n_sub*k) rows per
    partition — O(1) plan size in dim, the `ivf_centroids` pattern.
    Returns (n_sub, k, ds) int64 fixed-point codebooks ready for
    `pq_encode`/`pq_topk`."""
    if dim % n_sub != 0:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    ds = dim // n_sub
    seeds = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("h", F.xxhash64(F.col("id"), F.lit(seed)))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    if not seeds:
        raise ValueError("pq_train requires a non-empty corpus to seed from")
    S = np.array([[float(x) for x in r.v] for r in seeds], dtype=np.float64)
    if S.shape[0] < k:  # tiny corpus: pad by repeating the last seed
        S = np.vstack([S, np.repeat(S[-1:], k - S.shape[0], axis=0)])
    CB = np.stack(
        [np.floor(S[:, m * ds:(m + 1) * ds] * FIXED) for m in range(n_sub)]
    ).astype(np.int64)

    psum_schema = T.StructType(
        [
            T.StructField("m", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
            T.StructField("psum", T.ArrayType(T.DoubleType())),
            T.StructField("cnt", T.LongType()),
        ]
    )
    for _ in range(iters):
        assigned = pq_encode(corpus, CB, vec_col=vec_col).select(vec_col, "codes")

        def partial_sums(batches):
            acc: dict[tuple[int, int], tuple[np.ndarray, int]] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.array(pdf[vec_col].to_list(), dtype=np.float64)
                C = np.array(pdf["codes"].to_list(), dtype=np.int64)
                for m in range(n_sub):
                    sub = V[:, m * ds:(m + 1) * ds]
                    for code in np.unique(C[:, m]):
                        msk = C[:, m] == code
                        s, c = acc.get(
                            (m, int(code)), (np.zeros(ds), 0)
                        )
                        acc[(m, int(code))] = (
                            s + sub[msk].sum(axis=0),
                            c + int(msk.sum()),
                        )
            if acc:
                yield pd.DataFrame(
                    {
                        "m": [mk[0] for mk in acc],
                        "code": [mk[1] for mk in acc],
                        "psum": [acc[mk][0].tolist() for mk in acc],
                        "cnt": [acc[mk][1] for mk in acc],
                    }
                )

        sums: dict[tuple[int, int], np.ndarray] = {}
        cnts: dict[tuple[int, int], int] = {}
        for r in assigned.mapInPandas(partial_sums, psum_schema).collect():
            key = (int(r.m), int(r.code))
            sums[key] = sums.get(key, np.zeros(ds)) + np.array(r.psum)
            cnts[key] = cnts.get(key, 0) + int(r.cnt)
        for (m, code), c in cnts.items():
            if c > 0:
                CB[m][code] = np.floor(sums[(m, code)] / c * FIXED).astype(
                    np.int64
                )
    return CB


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    normalize: bool = True,
    exact_fold: bool = False,
    broadcast_queries: bool | None = None,
    broadcast_threshold: int = 1_000_000,
    list_col: str | None = None,
    codes_col: str | None = None,
) -> DataFrame:
    """IVF x PQ composition — the 10^12-vector ANN architecture
    (`faiss.IndexIVFPQ` with by_residual=False): each query probes
    its `n_probes` nearest inverted lists and scans ONLY those lists'
    PQ codes with the ADC table-lookup distance.

    Why this is the scale answer: the corpus representation per
    vector is one int (list id) + n_sub small ints (codes) — ~40
    bytes instead of 4*dim — and a probe touches ~n_probes/n_lists
    of it, so a query's scan cost is (n_probes/n_lists) * n_sub
    lookups/row over a column that fits in a fraction of the raw
    data's footprint. In the warehouse layout both derived columns
    are materialized once (`pq_encode` + `ivf_assign`, both narrow
    single-pass) and the table is bucketed on the list id, making
    the probe join a zero-Exchange bucket lookup; pass them back via
    `list_col=`/`codes_col=`. Flat (non-residual) PQ: one global
    codebook, so the per-query distance table is computed ONCE, not
    once per probed list — residual encoding would buy recall at the
    cost of an n_probes-times-larger query table and a per-list
    centroid subtraction in the hot scan.

    Probe selection is fully distributed (`ivf_probes`) and the
    query-side join strategy auto-selects broadcast vs shuffle
    exactly like `ivf_topk` (the broadcast side is the
    probe-exploded frame carrying the n_sub x k distance table).
    Distances are exact integer sums (engine-exact); the
    approximation is IVF pruning + PQ quantization. Returns
    (qid, vec_id, adist, rank) — adist in the FIXED_SCALE^2 lattice.
    """
    Cn = normalize_centroids(centroids) if normalize else np.asarray(centroids)
    Cn = np.ascontiguousarray(Cn, dtype=np.float64)
    n_sub = codebooks.shape[0]

    if list_col is not None and codes_col is not None:
        c = corpus.select(
            F.col(id_col).alias("c_id"),
            F.col(list_col).alias("c_list"),
            F.col(codes_col).alias("c_codes"),
        )
    else:
        enc = pq_encode(corpus, codebooks, vec_col=vec_col, out_col="_pq")
        c = ivf_assign(
            enc, Cn, vec_col=vec_col, out_col="c_list",
            normalize=False, exact_fold=exact_fold,
        ).select(
            F.col(id_col).alias("c_id"),
            F.col("c_list"),
            F.col("_pq").alias("c_codes"),
        )

    def qbuild(fv):
        _, dists = _pq_codes_and_dists(fv, codebooks)
        return dists

    q_base = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.transform(F.array(_fixed(F.col(q_vec_col))), qbuild)[0].alias("q_tab"),
        F.col(q_vec_col).alias("_raw"),
    )
    q_side = _probed_query_side(
        queries, q_base, Cn, n_probes, exact_fold,
        broadcast_queries, broadcast_threshold,
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        c.join(q_side, ["c_list"], "inner")
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("qid"),
            F.col("c_id").alias("vec_id"),
            _adc_dist(n_sub).alias("adist"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def rerank_exact(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
) -> DataFrame:
    """Exact-distance re-rank of ANN candidates — the recall-recovery
    stage every production PQ/IVF deployment runs: a candidate
    generator (`pq_topk`/`ivf_pq_topk`/`lsh_topk` with k' > k)
    nominates cheaply, then the final k are ordered by the EXACT
    fixed-point cosine on the full vectors.

    `candidates` is any (qid, vec_id) frame. Cost model at scale:
    the candidate set is |queries| * k' rows — orders of magnitude
    below the corpus — so the full-vector fetch is one equi-join on
    the corpus id (bucketed/sorted corpora make it a pruned lookup),
    the query side rides a broadcast keyed by qid, and the exact
    arithmetic runs only on nominated pairs. No per-pair work ever
    touches non-candidates. Returns (qid, vec_id, cos, rank) —
    identical shape to `cosine_topk`, so a rerank composition is a
    drop-in replacement for the brute-force baseline.

    Candidates are deduplicated on (qid, vec_id) first: ensembled
    generators (lsh_topk UNION ivf_pq_topk) nominate overlapping
    pairs, and without the dedup a doubly-nominated vector would
    occupy two top-k slots and push a real neighbor out."""
    cand = candidates.select("qid", "vec_id").dropDuplicates(["qid", "vec_id"])
    c = _with_fixed(corpus, id_col, vec_col, "c_")
    q = _with_fixed(queries, q_id_col, q_vec_col, "q_")
    joined = (
        cand.join(c, cand["vec_id"] == c["c_id"])
        .join(F.broadcast(q), cand["qid"] == q["q_id"])
    )
    cos = (
        _dot(F.col("c_fv"), F.col("q_fv"))
        / F.sqrt(F.col("c_nrm").cast("double") * F.col("q_nrm").cast("double"))
    ).alias("cos")
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        joined.select(cand["qid"], cand["vec_id"], cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval — reciprocal-rank fusion
# ---------------------------------------------------------------------------

# one fused term: 1/(k + rank), 0 when the list lacks the doc.  The
# CAST-to-double form keeps both engines off their decimal-literal
# parse (1.0/x is DECIMAL division in Spark AND DuckDB).
RRF_TERM_SQL = (
    "coalesce(CAST(1 AS DOUBLE) / CAST({k} + {r} AS DOUBLE),"
    " CAST(0 AS DOUBLE))"
)


def rrf_fuse(
    ranked: list,
    *,
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked
    retrieval lists — the standard hybrid-search combiner for a
    sparse (BM25 `text.bm25_topk`) + dense (`cosine_topk` /
    `ivf_topk`) stack: score(q, d) = Σ_lists 1/(k + rank_list(q, d)),
    summed only over lists that returned the doc.

    Each input frame must carry columns (qid, doc_id, rank) —
    pre-rename upstream (the explicit-contract convention).  Ranks
    are 1-based; duplicate (qid, doc_id) rows within one list fold
    to their best (minimum) rank.

    Exactness: each term is one IEEE division (shared RRF_TERM_SQL)
    and the fused score adds the per-list terms in LIST ORDER — a
    fixed left-to-right expression, not a merge-order aggregate — so
    results are bit-identical under any partitioning and an SQL
    oracle reproduces them exactly.  Ties break on doc_id.

    Scale: one groupBy per list (bounded by that list's top-k
    output), then N-1 full-outer joins on (qid, doc_id) — candidate
    volume is Σ list sizes, never corpus-sized; AQE broadcasts the
    small side.  The final window partitions by qid (the knn
    contract).

    Returns (qid, doc_id, rank_0..rank_{N-1}, rrf, rank) where
    rank_i is the doc's rank in list i (NULL if absent) and rank is
    the fused 1-based order.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked frame")
    if k < 1:
        raise ValueError("k must be >= 1")
    base = None
    for i, df in enumerate(ranked):
        d = (
            df.select(
                F.col("qid"),
                F.col("doc_id"),
                F.col("rank").cast("long").alias(f"rank_{i}"),
            )
            .groupBy("qid", "doc_id")
            .agg(F.min(f"rank_{i}").alias(f"rank_{i}"))
        )
        base = d if base is None else base.join(
            d, ["qid", "doc_id"], "full_outer"
        )
    score = F.expr(RRF_TERM_SQL.format(k=int(k), r="rank_0"))
    for i in range(1, len(ranked)):
        score = score + F.expr(RRF_TERM_SQL.format(k=int(k), r=f"rank_{i}"))
    out = base.select(
        "qid",
        "doc_id",
        *[f"rank_{i}" for i in range(len(ranked))],
        score.alias("rrf"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    out = out.withColumn("rank", F.row_number().over(w).cast("int"))
    if topk is not None:
        out = out.where(F.col("rank") <= int(topk))
    return out
