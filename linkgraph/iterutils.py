"""Superstep lineage management for iterative DataFrame loops.

Iterative Spark has one classic failure mode (SURVEY.md §4 risk 1): each
superstep's plan embeds the previous superstep's plan several times (a rank
vector is joined, aggregated and diffed), so the logical tree grows by a
branching factor per iteration and Catalyst analysis goes exponential after
a few dozen supersteps. ``persist()`` does not help — it caches data but
leaves the logical plan intact — and ``localCheckpoint()`` pins its RDD in
``SparkContext.persistentRdds`` with no public release API, which leaks
executor storage until the JVM OOMs on long runs (observed at ~90
iterations on a 1 GiB driver).

Two truncation modes, picked by durability needs:

- ``mode="local"`` (default): ``df.localCheckpoint(eager=True)`` — the
  logical plan is re-rooted at an RDD scan and the RDD materializes to
  executor-local storage immediately. Measured ~0.6 s/superstep fixed
  cost on local[4] vs 2-7 s for the lazy variant (lazy re-materializes
  under AQE) and unbounded plan growth with no truncation at all. The
  pinned-RDD footprint grows by one small state table per superstep,
  which is fine for the ≤100-iteration loops the algorithms run;
  durable restartable state is not provided here.
- ``mode="parquet"``: write the state DataFrame to a rotating scratch
  directory and read it back (plan = one file scan). Slower (a write job
  per superstep) but leaves nothing pinned; durable, manifest-carrying
  checkpoints with resume are :class:`linkgraph.state.CheckpointStore`'s
  job and replace this mode when requested.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


# Target shuffle-partition payload for iterative loops. Small relative to
# executor memory on purpose: the loops re-shuffle the same state dozens of
# times, so per-task fixed costs (scheduling, block-manager traffic, codegen
# dispatch) dominate long before memory pressure does. On a real cluster the
# session's shuffle.partitions (sized to the cluster) stays the CAP — the
# volume heuristic only shrinks below it for small inputs. The right payload
# depends on per-row work: LPA/Louvain/CC rounds (one cheap agg per row) are
# fastest near 250k rows/partition, while PageRank/HITS rounds (edge join +
# hash agg + dangling branch per row) starve parallelism there — measured
# local[32] optimum ~40k rows/partition on a 634k-edge crawl (11.4s vs 17.9s
# at 250k and 16.6s at thread-count partitions for 10 iterations).
ROWS_PER_PARTITION = 250_000


def loop_partitions(
    n_rows: int, cap: int, rows_per_partition: int = ROWS_PER_PARTITION
) -> int:
    """Shuffle-partition count for an iterative loop over ``n_rows`` state
    rows: one partition per ``rows_per_partition`` rows, at least 1, never
    above ``cap`` (the session/graph setting, which encodes cluster size)."""
    return max(1, min(int(cap), int(n_rows) // int(rows_per_partition) + 1))


def _strip_origin_stats(df: DataFrame) -> DataFrame:
    """Rebuild a checkpointed DataFrame's ``LogicalRDD`` without the origin
    statistics/constraints Spark captures from the plan that produced it.

    ``Dataset.localCheckpoint`` copies the originating plan's estimated
    ``Statistics`` into the new ``LogicalRDD`` (``originStats``). Join size
    estimation multiplies children's ``sizeInBytes``, so in an iterative
    loop that re-checkpoints a state table derived from the previous
    checkpoint via k self-references, the captured BigInt's *bit length*
    grows by ~k× per superstep. Catalyst then does multi-megabit BigInteger
    arithmetic on every later planning pass — measured as per-round cost
    doubling (×2.4) in the Louvain level loop while plan text, task counts
    and row counts stayed constant. Dropping the origin stats resets the
    leaf to the default ``sizeInBytes`` (conservative: too big to
    auto-broadcast, which is what the loops want anyway) and keeps every
    superstep's planning cost flat.

    Best-effort: if the plan isn't a plain ``LogicalRDD`` (or internals
    move), the input is returned unchanged.
    """
    try:
        spark = df.sparkSession
        jvm = spark._jvm
        lr = df._jdf.queryExecution().analyzed()
        if lr.getClass().getName() != "org.apache.spark.sql.execution.LogicalRDD":
            return df
        none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        logical_rdd = getattr(
            getattr(jvm.org.apache.spark.sql.execution, "LogicalRDD$"), "MODULE$"
        )
        new_plan = logical_rdd.apply(
            lr.output(),
            lr.rdd(),
            lr.outputPartitioning(),
            lr.outputOrdering(),
            lr.isStreaming(),
            lr.stream(),
            spark._jsparkSession,
            none,
            none,
        )
        dataset = getattr(
            getattr(jvm.org.apache.spark.sql.classic, "Dataset$"), "MODULE$"
        )
        return DataFrame(dataset.ofRows(spark._jsparkSession, new_plan), spark)
    except Exception:
        return df


class SuperstepCache:
    """Per-superstep lineage truncation (see module docstring)."""

    def __init__(
        self,
        spark: SparkSession,
        truncate_interval: int = 1,
        tmp_root: Optional[str] = None,
        mode: str = "local",
    ):
        self.spark = spark
        self.truncate_interval = max(1, truncate_interval)
        self.mode = mode
        self._own_tmp = tmp_root is None
        self.tmp_root = tmp_root or tempfile.mkdtemp(prefix="linkgraph-superstep-")
        self._n = 0

    def truncate(self, df: DataFrame, retire: Optional[DataFrame] = None) -> DataFrame:
        """Checkpoint ``df``; optionally release a PREVIOUS truncate result
        the caller guarantees nothing will read again. Passing ``retire``
        caps the loop's pinned-RDD footprint at the live generations instead
        of growing by one snapshot per superstep (the leak documented
        above)."""
        if self.mode == "local":
            out = _strip_origin_stats(df.localCheckpoint(eager=True))
            if retire is not None:
                self.release(retire)
            return out
        self._n += 1
        path = os.path.join(self.tmp_root, f"trunc-{self._n:05d}")
        df.write.mode("overwrite").parquet(path)
        prev = os.path.join(self.tmp_root, f"trunc-{self._n - 1:05d}")
        shutil.rmtree(prev, ignore_errors=True)
        return self.spark.read.parquet(path)

    def release(self, dfs) -> None:
        """Unpersist the executor-pinned RDDs backing previously-truncated
        DataFrames (``SparkContext.persistentRdds`` has no public release
        API; the id comes off the checkpointed plan's ``LogicalRDD``).
        Safe on non-checkpointed input (no-op). The released DataFrames
        must never be read again — their blocks are gone."""
        if isinstance(dfs, DataFrame):
            dfs = [dfs]
        jsc = self.spark.sparkContext._jsc
        for d in dfs:
            try:
                rid = d._jdf.queryExecution().analyzed().rdd().id()
            except Exception:
                continue  # not a checkpointed LogicalRDD plan
            try:
                jrdd = jsc.getPersistentRDDs().get(rid)
                if jrdd is not None:
                    jrdd.unpersist(False)
            except Exception:
                pass

    def maybe_truncate(self, df: DataFrame, k: int) -> DataFrame:
        if (k + 1) % self.truncate_interval == 0:
            return self.truncate(df)
        return df

    def close(self, keep_result: bool = False) -> None:
        """With ``keep_result=True`` the latest snapshot directory stays on
        disk until interpreter exit so the caller's returned DataFrame (which
        scans it) remains computable."""
        if not self._own_tmp:
            return
        if keep_result and self._n > 0:
            import atexit

            atexit.register(shutil.rmtree, self.tmp_root, ignore_errors=True)
        else:
            shutil.rmtree(self.tmp_root, ignore_errors=True)
