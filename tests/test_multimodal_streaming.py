"""Multimodal binary plumbing + Structured Streaming smoke."""

from pyspark.sql import functions as F

from borges_spark.operators.multimodal import extract_features, gen_media
from borges_spark.streaming.stream_crawl import windowed_event_counts


def test_multimodal_features(spark):
    media = gen_media(spark, 48)
    assert media.count() == 48
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 48
    for r in rows:
        assert r["decode_ok"] is True
        assert r["n_bytes"] > 0
        assert r["feature"] is not None and len(r["feature"]) >= 1
    kinds = {r["kind"] for r in rows}
    assert kinds == {"image", "audio", "video"}


def test_multimodal_oversize_routed(spark):
    import borges_spark.operators.multimodal as MM

    media = gen_media(spark, 6)
    old = MM.MAX_BLOB_BYTES
    MM.MAX_BLOB_BYTES = 10  # force the DocumentTooLarge path
    try:
        rows = extract_features(media).collect()
        assert all(r["decode_ok"] is False for r in rows)
        assert all(r["feature"] is None for r in rows)
    finally:
        MM.MAX_BLOB_BYTES = old


def test_streaming_window_counts(spark, tmp_path):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 1, "a", 1.0, "{}"),
            (2, "2024-01-01 00:20:00", 1, "a", 2.0, "{}"),
            (3, "2024-01-01 01:10:00", 2, "b", 3.0, "{}"),
            (4, "2024-01-01 05:10:00", 2, "a", 4.0, "{}"),  # advances watermark
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "events_dir")
    events.write.parquet(path)
    out = windowed_event_counts(spark, path, window="1 hour", watermark="1 hour")
    got = {(r["window_start"].hour, r["event_type"]): (r["n"], r["total_value"]) for r in out.collect()}
    # append mode emits only windows closed by the watermark
    assert got[(0, "a")] == (2, 3.0)
    assert got[(1, "b")] == (1, 3.0)
