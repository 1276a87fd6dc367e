"""applyInPandasWithState: per-host budget persists across micro-batches."""

import time

from borges_spark.streaming.stateful import rate_limited_counts


def test_stateful_rate_limiter(spark, tmp_path):
    src = str(tmp_path / "cand")
    # batch 1: h0 x5, h1 x2
    spark.createDataFrame(
        [("h0", f"u{i}") for i in range(5)] + [("h1", f"v{i}") for i in range(2)],
        "host string, url string",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("host string, url string").parquet(src)
    out = rate_limited_counts(stream, budget_per_host=6)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("limiter_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2 arrives later: h0 x4 -> only 1 token left for h0
        spark.createDataFrame(
            [("h0", f"w{i}") for i in range(4)], "host string, url string"
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM limiter_out").collect()
    by = {}
    for r in rows:
        by.setdefault(r["host"], []).append(r)
    h0 = sorted(by["h0"], key=lambda r: r["total_allowed"])
    assert h0[0]["allowed"] == 5 and h0[0]["deferred"] == 0
    assert h0[-1]["allowed"] == 1 and h0[-1]["deferred"] == 3  # budget exhausted
    assert h0[-1]["total_allowed"] == 6
    assert by["h1"][0]["allowed"] == 2
