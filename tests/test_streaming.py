"""Streaming ingest: exactly-once pages→edges micro-batches."""

from pyspark.sql import functions as F

from linkgraph.io.pages import synthesize_pages, pages_to_edges
from linkgraph.streaming import ingest_available


def test_stream_matches_batch_and_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "edges_out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: pages 0..199
    all_pages = synthesize_pages(spark, 200, seed=5).persist()
    all_pages.filter(F.xxhash64("url") % 2 == 0).write.mode("append").parquet(src)
    ingest_available(spark, src, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # re-running without new data must not duplicate anything
    ingest_available(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # batch 2: the remaining pages arrive
    all_pages.filter(F.xxhash64("url") % 2 != 0).write.mode("append").parquet(src)
    ingest_available(spark, src, out, ckpt)

    # streamed edge multiset == batch extraction over the full crawl
    # (before in-crawl filtering, which is a downstream batch join)
    streamed = (
        spark.read.parquet(out)
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
    )
    batch = (
        pages_to_edges(all_pages, in_crawl_only=False)
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
    )
    assert streamed.join(batch, ["src", "dst", "w"], "full_outer").filter(
        F.col("src").isNull() | F.col("dst").isNull()
    ).count() == 0
    assert streamed.count() == batch.count()
