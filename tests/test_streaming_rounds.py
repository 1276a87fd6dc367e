"""foreachBatch micro-batch skeleton: newly-landed seed files drive
round processing exactly-once per batch."""

from borges_spark.streaming.stream_crawl import stream_frontier_rounds


def test_foreach_batch_sees_all_seeds(spark, tmp_path):
    seeds_dir = str(tmp_path / "seeds_stream")
    spark.createDataFrame(
        [(f"https://s/{i}", i) for i in range(25)], "url string, seq long"
    ).write.parquet(seeds_dir)

    seen: list[tuple[int, int]] = []  # (epoch_id, n_rows)

    def on_batch(df, epoch_id):
        seen.append((int(epoch_id), df.count()))

    stream_frontier_rounds(spark, seeds_dir, on_batch)
    assert sum(n for _, n in seen) == 25
    assert len(seen) >= 1
