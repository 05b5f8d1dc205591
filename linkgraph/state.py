"""Superstep checkpoint store — resumable iterative state.

The north rule requires every iteration's state (ranks/labels DataFrames) to
be checkpointed with per-partition lineage and convergence metrics so a run
can resume mid-iteration. In production this is an Iceberg table (atomic
snapshot commits, partition-level manifests); this sandbox has no Iceberg
runtime jar, so the store writes **parquet snapshots + a JSON manifest per
iteration** with the same contract:

- ``<root>/<name>/iter=<k>/part-*.parquet``  — the state DataFrame
- ``<root>/<name>/iter=<k>/_MANIFEST.json``  — metrics (l1_err, changed,
  edges_processed, wall_ms), schema fingerprint, per-partition row counts
  (the lineage record), written **after** the parquet commit so a complete
  manifest implies a complete snapshot (poor-man's atomicity).

Checkpointing also truncates Spark lineage: each superstep's plan is
re-rooted at a parquet scan, which is what keeps 100-iteration PageRank from
exponential plan growth (SURVEY.md §4 risk 1).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class IterationMetrics:
    iteration: int
    l1_err: Optional[float] = None
    changed: Optional[int] = None
    edges_processed: Optional[int] = None
    wall_ms: Optional[int] = None
    extra: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        d = {
            "iteration": self.iteration,
            "l1_err": self.l1_err,
            "changed": self.changed,
            "edges_processed": self.edges_processed,
            "wall_ms": self.wall_ms,
        }
        d.update(self.extra)
        return d


class CheckpointStore:
    """Parquet-backed superstep state with resume support.

    Usage::

        store = CheckpointStore("/tmp/ckpt", "pagerank_ranks")
        start = store.latest_iteration()          # -1 if fresh
        ranks = store.load(start) if start >= 0 else init_ranks
        ...
        ranks = store.commit(ranks, IterationMetrics(k, l1_err=err))
    """

    def __init__(self, root: str, name: str, spark: Optional[SparkSession] = None):
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)
        self.spark = spark

    # -------------------------------------------------------------- #

    def _iter_dir(self, k: int) -> str:
        return os.path.join(self.dir, f"iter={k:05d}")

    def _manifest_path(self, k: int) -> str:
        return os.path.join(self._iter_dir(k), "_MANIFEST.json")

    def latest_iteration(self) -> int:
        """Highest iteration with a complete (manifest-present) snapshot."""
        best = -1
        if not os.path.isdir(self.dir):
            return best
        for entry in os.listdir(self.dir):
            if entry.startswith("iter="):
                k = int(entry.split("=")[1])
                if os.path.exists(self._manifest_path(k)):
                    best = max(best, k)
        return best

    def commit(self, df: DataFrame, metrics: IterationMetrics) -> DataFrame:
        """Write `df` as iteration `metrics.iteration`, record per-partition
        lineage, and return the re-read (lineage-truncated) DataFrame."""
        t0 = time.monotonic()
        path = self._iter_dir(metrics.iteration)
        data_path = os.path.join(path, "data")
        df.write.mode("overwrite").parquet(data_path)
        spark = df.sparkSession
        reread = spark.read.parquet(data_path)
        # Per-partition lineage from the parquet FOOTERS (file metadata) —
        # zero data scanned, mirroring how an Iceberg manifest carries
        # per-file row counts. (A groupBy(input_file_name) would re-read the
        # whole snapshot once per superstep — doubling checkpoint cost.)
        import pyarrow.parquet as pq

        part_counts = []
        for fname in sorted(os.listdir(data_path)):
            if fname.endswith(".parquet"):
                meta = pq.ParquetFile(os.path.join(data_path, fname)).metadata
                part_counts.append({"file": fname, "rows": meta.num_rows})
        manifest = {
            "metrics": metrics.to_dict(),
            "schema": reread.schema.jsonValue(),
            "partitions": part_counts,
            "committed_unix_ms": int(time.time() * 1000),
            "commit_wall_ms": int((time.monotonic() - t0) * 1000),
        }
        tmp = self._manifest_path(metrics.iteration) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(metrics.iteration))
        return reread

    def update_metrics(self, k: int, **fields) -> None:
        """Amend iteration k's manifest with metrics only known after the
        snapshot was consumed (e.g. the convergence error computed by the
        aggregation that reads the snapshot)."""
        m = self.manifest(k)
        m["metrics"].update(fields)
        tmp = self._manifest_path(k) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path(k))

    def load(self, k: int, spark: Optional[SparkSession] = None) -> DataFrame:
        spark = spark or self.spark
        if spark is None:
            raise ValueError("need a SparkSession to load a checkpoint")
        return spark.read.parquet(os.path.join(self._iter_dir(k), "data"))

    def manifest(self, k: int) -> dict:
        with open(self._manifest_path(k)) as f:
            return json.load(f)

    def metrics_history(self) -> list[dict]:
        out = []
        for k in range(self.latest_iteration() + 1):
            p = self._manifest_path(k)
            if os.path.exists(p):
                out.append(self.manifest(k)["metrics"])
        return out

    def clear(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
        os.makedirs(self.dir, exist_ok=True)
