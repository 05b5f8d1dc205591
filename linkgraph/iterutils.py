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

The robust fix, and the one the engine's resumability story wants anyway, is
to **re-root every superstep at a file scan**: write the (small) state
DataFrame to parquet, read it back. :class:`SuperstepCache` manages a
rotating pair of scratch directories; durable, manifest-carrying checkpoints
are :class:`linkgraph.state.CheckpointStore`'s job.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class SuperstepCache:
    """Rotating parquet-roundtrip truncation for superstep state.

    ``truncate(df)`` materializes `df` to a scratch parquet directory and
    returns the re-read DataFrame (plan = one file scan). The previous
    iteration's directory is deleted after the write succeeds — the write
    itself is the last consumer of the old snapshot.
    """

    def __init__(
        self,
        spark: SparkSession,
        truncate_interval: int = 1,
        tmp_root: Optional[str] = None,
    ):
        self.spark = spark
        self.truncate_interval = max(1, truncate_interval)
        self._own_tmp = tmp_root is None
        self.tmp_root = tmp_root or tempfile.mkdtemp(prefix="linkgraph-superstep-")
        self._n = 0

    def truncate(self, df: DataFrame) -> DataFrame:
        self._n += 1
        path = os.path.join(self.tmp_root, f"trunc-{self._n:05d}")
        df.write.mode("overwrite").parquet(path)
        prev = os.path.join(self.tmp_root, f"trunc-{self._n - 1:05d}")
        shutil.rmtree(prev, ignore_errors=True)
        return self.spark.read.parquet(path)

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
