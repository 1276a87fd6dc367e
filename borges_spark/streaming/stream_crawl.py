"""Structured-Streaming variants of the engine's round semantics.

The reference is batch-with-polling (infinite `find_one` loops —
Borges/spiders/ECS/metadata.py:33-37); the batch CrawlEngine models
that directly. These streaming forms exist for continuous-mode
deployments: a parquet-directory stream stands in for the event bus,
`foreachBatch` gives exactly-once round commits, and watermarked
windows give late-data-safe per-window counters (ST7 in SURVEY.md —
no reference counterpart, documented as engine extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    output_mode: str = "append",
    max_files_per_trigger: int | None = None,
    query_name: str = "borges_stream_out",
) -> DataFrame:
    """Watermarked tumbling-window counts over a parquet event stream,
    drained synchronously into a memory sink (local smoke mode).

    Returns a batch DataFrame (window_start, event_type, n, total_value).
    total_value accumulates in DECIMAL so the sum is order-independent
    (parallelism-invariant), then casts back to double.

    output_mode: 'append' (deployment mode — closed windows only, late
    data handled by the watermark) or 'complete' (every window at drain
    time — equals the batch aggregation, which is what the SQL oracle
    checks).

    events_path: a directory of parquet files, or glob-filtered via
    (dir, filename) — file-stream sources require a directory.

    max_files_per_trigger: bound each micro-batch to this many files
    (oldest mod-time first). Watermarks only advance at batch
    BOUNDARIES, so a single-batch drain never closes a window in append
    mode; multi-file inputs + maxFilesPerTrigger=1 is how append-mode
    late-data semantics are actually exercised.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if events_path.endswith(".parquet"):
        import os

        d, fname = os.path.split(events_path)
        stream = reader.option("pathGlobFilter", fname).parquet(d)
    else:
        stream = reader.parquet(events_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    name = query_name
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def streaming_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds_dir: str,
    store_root: str,
    cfg=None,
    rounds_per_batch: int = 2,
) -> None:
    """Continuous-mode crawl: seed files landing in `seeds_dir` drive
    the engine via foreachBatch — each micro-batch folds its seed rows
    into the frontier (seen-set-deduplicated, deterministically
    sequenced) and advances up to `rounds_per_batch` politeness-budgeted
    rounds, committing a snapshot per round. Restarts resume from the
    last committed snapshot — the streaming generalization of the
    reference's resumable flag-state (SURVEY.md §2.9 ST6)."""
    from borges_spark.plans.checkpoint import SnapshotStore
    from borges_spark.plans.engine import CrawlConfig, CrawlEngine

    cfg = cfg or CrawlConfig(max_rounds=1_000_000)
    store = SnapshotStore(store_root)

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine = CrawlEngine(spark, pages, batch_df, store, cfg)
        engine.run(resume=True, seed_batch=batch_df, extra_rounds=rounds_per_batch)

    stream = spark.readStream.schema("url string, seq long").parquet(seeds_dir)
    q = stream.writeStream.foreachBatch(on_batch).trigger(availableNow=True).start()
    q.awaitTermination()


def stream_frontier_rounds(
    spark: SparkSession,
    seeds_path: str,
    on_batch,
    max_batches: int = 3,
) -> None:
    """foreachBatch skeleton: each micro-batch of newly-landed frontier
    rows is handed to `on_batch(df, epoch_id)` — the continuous-mode
    entry point for the round pipeline (fetch/parse/merge)."""
    stream = spark.readStream.schema(
        "url string, seq long"
    ).parquet(seeds_path)
    q = stream.writeStream.foreachBatch(on_batch).trigger(availableNow=True).start()
    q.awaitTermination()
