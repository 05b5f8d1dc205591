"""Settle SURVEY §1.6's CSR-inner-kernel question with a measurement.

The reference's fast path is a scipy CSR SpMV per PageRank iteration
(``networkx/algorithms/link_analysis/pagerank_alg.py:491-493``). SURVEY
§1.6/§2.A hypothesized a Spark twin: per-partition CSR blocks built with
``mapInArrow`` for the contribution step. This script benchmarks three
kernels for the SAME inner loop (10 fixed iterations, identical dangling /
teleport handling, per-iteration lineage truncation) on the same synthetic
crawl edge table:

- ``join``     — production kernel: per-edge rows, ``ranks ⋈ edges`` on src
                 then ``groupBy(dst).sum`` (JVM hash-agg, map-side combine).
- ``explode``  — adjacency-compacted JVM kernel: edges pre-grouped to one
                 row per src ``(src, dsts[], ps[])``; per iteration the rank
                 vector joins ONE row per vertex (smaller join), then
                 ``explode`` + hash-agg.
- ``csr``      — adjacency-compacted Arrow kernel: same pre-grouping; the
                 join output feeds ``mapInArrow``, where numpy does
                 ``np.repeat(rank) * ps`` and a per-batch ``np.unique`` +
                 ``np.bincount`` partial aggregation (the per-partition
                 "CSR block" SpMV), then a final JVM ``groupBy(dst).sum``
                 over the pre-aggregated partials.

Each kernel runs in a fresh JVM (same config as scripts/scaling_pagerank).
Writes BENCH_CSR.json. Usage:

    python scripts/csr_kernel_bench.py [cpus] [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ITERS = 10
PARTS = 64

CHILD = r'''
import sys, time, json, os
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession, functions as F
kernel, cpus, edges_dir = sys.argv[1], sys.argv[2], sys.argv[3]
ITERS = {iters!r}
os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = (SparkSession.builder.master("local[%s]" % cpus)
  .config("spark.sql.shuffle.partitions", {parts!r})
  .config("spark.driver.memory", "24g")
  .config("spark.local.dir", "/dev/shm/spark-local")
  .config("spark.sql.adaptive.enabled", "false")
  .config("spark.sql.autoBroadcastJoinThreshold", "-1")
  .config("spark.sql.join.preferSortMergeJoin", "false")
  .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
  .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

if kernel == "build":
    from linkgraph.io.pages import synthesize_pages, pages_to_edges
    pages = synthesize_pages(spark, int(sys.argv[4]), seed=42, num_partitions={parts!r})
    pages_to_edges(pages).write.mode("overwrite").parquet(edges_dir)
    spark.stop(); sys.exit(0)

ALPHA = 0.85
edges = spark.read.parquet(edges_dir).repartition({parts!r}, "src")
edges = edges.withColumn("weight", F.lit(1.0))

# shared prep: stochastic normalization, dangling flags (mirrors pagerank.py)
out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
norm = (edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("p_edge")))
vertices = (edges.select(F.col("src").alias("id"))
            .unionAll(edges.select(F.col("dst").alias("id"))).distinct()
            .repartition({parts!r}, "id").persist())
n = vertices.count()
inv_n = 1.0 / n
dang = vertices.join(norm.select(F.col("src").alias("id")).distinct(),
                     "id", "left_anti").persist()
n_dang = dang.count()

if kernel == "join":
    A = norm.repartition({parts!r}, "src").persist()
    m = edges.count(); A.count()
    def contrib(x):
        return (A.join(x.withColumnRenamed("id", "src"), "src")
                .select("dst", (F.col("rank") * F.col("p_edge")).alias("c"))
                .groupBy("dst").agg(F.sum("c").alias("c")))
else:
    adj = (norm.groupBy("src").agg(F.collect_list("dst").alias("dsts"),
                                   F.collect_list("p_edge").alias("ps"))
           .repartition({parts!r}, "src").persist())
    m = edges.count(); adj.count()
    if kernel == "explode":
        def contrib(x):
            j = adj.join(x.withColumnRenamed("id", "src"), "src")
            z = j.select("rank", F.explode(F.arrays_zip("dsts", "ps")).alias("e"))
            return (z.select(F.col("e.dsts").alias("dst"),
                             (F.col("rank") * F.col("e.ps")).alias("c"))
                    .groupBy("dst").agg(F.sum("c").alias("c")))
    else:  # csr
        import pyarrow as pa
        import numpy as np
        def spmv(batches):
            for b in batches:
                rank = b.column("rank").to_numpy(zero_copy_only=False)
                dsts = b.column("dsts")
                ps = b.column("ps")
                offs = dsts.offsets.to_numpy(zero_copy_only=False)
                flat_dst = dsts.flatten().to_numpy(zero_copy_only=False)
                flat_p = ps.flatten().to_numpy(zero_copy_only=False)
                reps = np.diff(offs)
                c = np.repeat(rank, reps) * flat_p
                uniq, inv = np.unique(flat_dst, return_inverse=True)
                sums = np.bincount(inv, weights=c)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(uniq, type=pa.int64()), pa.array(sums)],
                    ["dst", "c"])
        def contrib(x):
            j = adj.join(x.withColumnRenamed("id", "src"), "src")
            partial = j.select("rank", "dsts", "ps").mapInArrow(
                spmv, "dst long, c double")
            return partial.groupBy("dst").agg(F.sum("c").alias("c"))

def step(x):
    c = contrib(x)
    joined = vertices.join(c.withColumnRenamed("dst", "id"), "id", "left")
    if n_dang:
        ds = x.join(dang, "id", "left_semi").agg(F.sum("rank").alias("_ds"))
        joined = joined.crossJoin(F.broadcast(ds))
        ds_col = F.coalesce(F.col("_ds"), F.lit(0.0))
    else:
        ds_col = F.lit(0.0)
    return joined.select(
        "id",
        (F.lit(ALPHA) * (F.coalesce("c", F.lit(0.0)) + ds_col * F.lit(inv_n))
         + F.lit((1 - ALPHA) * inv_n)).alias("rank"))

def run(iters):
    x = vertices.select("id", F.lit(inv_n).alias("rank"))
    for _ in range(iters):
        x = step(x).localCheckpoint(eager=True)
    return x

run(1)  # warm-up
t0 = time.time()
x = run(ITERS)
total = x.agg(F.sum("rank")).first()[0]
dt = time.time() - t0
print(json.dumps({{"kernel": kernel, "cpus": int(cpus), "edges": m, "n": n,
                  "sec": round(dt, 2), "rank_sum": round(total, 9),
                  "edges_per_sec_per_iter": round(m * ITERS / dt, 1)}}))
spark.stop()
'''


def run_child(args: list[str]) -> str:
    script = CHILD.format(root=ROOT, parts=PARTS, iters=ITERS)
    out = subprocess.run(
        [sys.executable, "-c", script, *args], capture_output=True, text=True
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(1)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    return lines[-1] if lines else ""


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "8"
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    edges_dir = os.path.join(tempfile.gettempdir(), f"linkgraph-scale-{n_pages}")
    if not os.path.exists(os.path.join(edges_dir, "_SUCCESS")):
        print(f"building {n_pages}-page crawl -> {edges_dir}", flush=True)
        run_child(["build", "32", edges_dir, str(n_pages)])

    results = []
    for kernel in ("join", "explode", "csr"):
        r = json.loads(run_child([kernel, cpus, edges_dir]))
        print(r, flush=True)
        results.append(r)

    base = results[0]["sec"]
    report = {
        "workload": f"pagerank inner-kernel comparison, fixed_iter={ITERS}, "
        f"{results[0]['edges']:,} edges, local[{cpus}], {PARTS} partitions",
        "kernels": results,
        "speedup_vs_join": {
            r["kernel"]: round(base / r["sec"], 3) for r in results
        },
    }
    with open(os.path.join(ROOT, "BENCH_CSR.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["speedup_vs_join"]))


if __name__ == "__main__":
    main()
