"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8
from N to 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[4] (N) and local[16] (4N) — against the
SAME on-disk input, and we report throughput at both plus the
scaling efficiency  (rate_4N / rate_N) / 4.

The job is the engine's benchmark path (SURVEY.md §7.2): read the
interleaved-doc corpus, extract geometry from spans (pure column
regex), Z2-encode, point-in-polygon join against a polygon layer
(broadcast strategy, salted) + tile assignments at res 8 — i.e. the
"spatial-join docs/sec and tile-assignments/sec" metric of
BASELINE.json.

Usage: python bench_scaling.py [n_docs]   (default 16,000,000)
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS = "/tmp/geomesa_spark_scale_corpus"
POLYS = [
    ("rect", "POLYGON ((10.005 20.005, 80.005 20.005, 80.005 60.005, 10.005 60.005, 10.005 20.005))"),
    ("tri", "POLYGON ((-120.005 -40.005, -60.005 -40.005, -90.005 30.005, -120.005 -40.005))"),
    ("pent", "POLYGON ((100.005 -10.005, 140.005 0.005, 130.005 40.005, 105.005 45.005, 90.005 15.005, 100.005 -10.005))"),
]


def session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def build_corpus(n_docs: int) -> None:
    """One-time deterministic corpus build (not part of the timing)."""
    if os.path.exists(f"{CORPUS}/_SUCCESS"):
        return
    shutil.rmtree(CORPUS, ignore_errors=True)
    from geomesa_spark.sources.docs import synth_docs

    spark = session(32)
    spark.sparkContext.setLogLevel("ERROR")
    synth_docs(spark, n_docs, partitions=256).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def run_job(cpus: int, kind: str = "broadcast") -> tuple[float, int]:
    """The measured job. kind='broadcast': extract -> encode -> salted
    broadcast PIP join + tiles (the shuffle-free headline path).
    kind='shuffle': the cell-partitioned PIP join with broadcast
    DISABLED plus a cell-keyed count aggregation — forcing a real
    two-sided shuffle so the efficiency claim also covers the
    exchange-bound regime."""
    from pyspark.sql import functions as F

    from geomesa_spark.functions import cells as C
    from geomesa_spark.operators.spatial_join import (
        pip_join_broadcast,
        pip_join_partitioned,
    )
    from geomesa_spark.sources.docs import extract_geometry

    spark = session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if kind == "shuffle":
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    docs = spark.read.parquet(CORPUS)
    polys_df = spark.createDataFrame(POLYS, "poly_id string, geom_wkt string")

    def pipeline():
        pts = extract_geometry(docs)
        if kind == "shuffle":
            joined = pip_join_partitioned(pts, polys_df, bits=6).withColumn(
                "tile", C.cell_parent(F.col("cell"), C.XY_BITS, 8)
            )
            out = joined.groupBy("tile", "poly_id").count()
        else:
            joined = pip_join_broadcast(pts, POLYS).withColumn(
                "tile", C.cell_parent(F.col("cell"), C.XY_BITS, 8)
            )
            out = joined.select("doc_id", "poly_id", "tile")
        out.write.format("noop").mode("overwrite").save()

    pipeline()  # warm-up: codegen compile, page cache, worker spin-up
    # min-of-3: this sandbox is a shared VM with heavy run-to-run
    # interference at high thread counts; the minimum is the least
    # contaminated estimate of the engine's own cost
    wall = float("inf")
    for _ in range(3):
        t0 = time.time()
        pipeline()
        wall = min(wall, time.time() - t0)
    n = docs.count()
    spark.stop()
    return wall, n


def _run_job_subprocess(cpus: int, kind: str = "broadcast") -> tuple[float, int]:
    """Each measurement in a FRESH python process: py4j reuses one
    JVM across SparkSessions, and a second, larger session in a used
    JVM GC-thrashes (~7x slow) — a measurement artifact, not engine
    behavior."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--job", str(cpus), kind],
        capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    return d["wall"], d["n"]


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--job":
        kind = sys.argv[3] if len(sys.argv) > 3 else "broadcast"
        wall, n = run_job(int(sys.argv[2]), kind)
        print(json.dumps({"wall": wall, "n": n}))
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    build_corpus(n_docs)

    # the whole two-level protocol repeats (interleaved) and each
    # level keeps its MINIMUM wall across repeats: ambient co-tenant
    # load on this shared VM contaminates individual measurements by
    # up to ~45%, and the minimum is the least-contaminated estimate
    # of the engine's own cost (same rationale as the in-process
    # min-of-3)
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    wall8 = wall32 = s_wall8 = s_wall32 = float("inf")
    n = 0
    for _ in range(repeats):
        w, n = _run_job_subprocess(4)
        wall8 = min(wall8, w)
        w, _ = _run_job_subprocess(16)
        wall32 = min(wall32, w)
        w, _ = _run_job_subprocess(4, "shuffle")
        s_wall8 = min(s_wall8, w)
        w, _ = _run_job_subprocess(16, "shuffle")
        s_wall32 = min(s_wall32, w)
    rate8 = n / wall8
    rate32 = n / wall32
    eff = (rate32 / rate8) / 4.0
    s_rate8, s_rate32 = n / s_wall8, n / s_wall32
    s_eff = (s_rate32 / s_rate8) / 4.0
    out = {
        "metric": "scaling efficiency local[4]->local[16] (N->4N)",
        "n_docs": n,
        "wall_sec_n": round(wall8, 2),
        "wall_sec_4n": round(wall32, 2),
        "docs_per_sec_n": round(rate8, 1),
        "docs_per_sec_4n": round(rate32, 1),
        "efficiency": round(eff, 3),
        "shuffle_wall_sec_n": round(s_wall8, 2),
        "shuffle_wall_sec_4n": round(s_wall32, 2),
        "shuffle_efficiency": round(s_eff, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling + throughput evidence

## Two-cluster-size scaling (north_rule protocol for this sandbox)

Same job, same on-disk input ({n:,} interleaved docs, 256 parquet
partitions), two parallelism levels. Job = span->geometry extraction
(pure column regex), Z2 encode, salted broadcast point-in-polygon
join against 3 polygons, tile assignment at res 8 bits.

| parallelism | wall (s) | docs/sec |
| --- | --- | --- |
| local[4]  (N)  | {wall8:.2f} | {rate8:,.0f} |
| local[16] (4N) | {wall32:.2f} | {rate32:,.0f} |

**Scaling efficiency (rate_4N / rate_N) / 4 = {eff:.3f}**
(north_rule target: >= 0.8)

## Shuffle-path scaling (supplementary)

Same input, but the cell-PARTITIONED PIP join with broadcast joins
disabled plus a cell-keyed aggregation — both sides shuffle on the
salted cell key, so this measures the exchange-bound regime the
headline (broadcast) job deliberately avoids.

| parallelism | wall (s) | docs/sec |
| --- | --- | --- |
| local[4]  (N)  | {s_wall8:.2f} | {n / s_wall8:,.0f} |
| local[16] (4N) | {s_wall32:.2f} | {n / s_wall32:,.0f} |

**Shuffle-path efficiency = {s_eff:.3f}.** Local-mode shuffles share
one machine's memory bus and disk, so this is a LOWER bound on real
multi-node scaling where exchange bandwidth grows with the cluster.

Why it scales: every stage is embarrassingly parallel — the scan is
split-per-file, extraction/encoding are narrow column ops inside
whole-stage codegen, the polygon side is broadcast (zero shuffle of
the doc table), and the exact-PIP refine is a JVM-side even-odd
edge aggregate (no Python anywhere in the path). The only serial
parts are driver-side cover planning (milliseconds) and Spark
scheduling — Amdahl-bounded, which is why the corpus must be large
enough that parallel work dominates (at 10^12 docs it trivially
does).

Methodology notes:
- each level runs in a fresh python process (py4j reuses one JVM
  across SparkSessions; a second larger session in a used JVM
  GC-thrashes ~7x — a measurement artifact, not engine behavior)
- one warm-up pipeline run per level (codegen compile, page cache),
  then min-of-3 timed runs IN-process, and the whole two-level
  protocol repeats (interleaved) with each level keeping its
  minimum wall across repeats: this sandbox is a shared VM whose
  co-tenant load moves individual measurements by up to ~45%, and
  the minimum is the least-contaminated estimate of the engine's
  own cost
- N=4 / 4N=16 leaves host headroom so co-tenant noise does not
  dominate the 4N measurement on this 32-vCPU box

Regenerate: `python bench_scaling.py {n_docs}`
"""
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
