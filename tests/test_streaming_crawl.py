"""Continuous-mode crawl: seed batches arriving as a stream drive
engine rounds via foreachBatch; late seed batches fold into the live
frontier without disturbing determinism."""

from pyspark.sql import functions as F

from borges_spark.operators.politeness import PolitenessConfig
from borges_spark.plans.checkpoint import SnapshotStore
from borges_spark.plans.engine import CrawlConfig, CrawlEngine
from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds
from borges_spark.streaming.stream_crawl import streaming_crawl

WEB = WebConfig(n_pages=300, n_hosts=5, out_degree=3, n_seeds=8)
POL = PolitenessConfig(default_delay_s=1.0, round_budget_s=60.0)


def test_streaming_crawl_two_batches(spark, tmp_path):
    pages = gen_pages(spark, WEB)
    seeds = gen_seeds(spark, WEB)
    seeds_dir = str(tmp_path / "seeds_stream")
    store_root = str(tmp_path / "store")

    # batch 1: first half of the seeds
    seeds.filter(F.col("seq") < 4).coalesce(1).write.mode("append").parquet(seeds_dir)
    cfg = CrawlConfig(max_rounds=1_000_000, politeness=POL)
    streaming_crawl(spark, pages, seeds_dir, store_root, cfg, rounds_per_batch=2)

    store = SnapshotStore(store_root)
    after_b1 = store.latest_round()
    assert after_b1 == 1  # two rounds committed

    # batch 2: remaining seeds (plus a duplicate of an already-seen one)
    seeds.filter(F.col("seq") >= 3).coalesce(1).write.mode("append").parquet(seeds_dir)
    streaming_crawl(spark, pages, seeds_dir, store_root, cfg, rounds_per_batch=2)

    assert store.latest_round() == 3
    engine = CrawlEngine(spark, pages, seeds, store, cfg)
    frontier = engine.frontier()
    # every seed present exactly once despite the overlapping batch
    seed_urls = {r["url"] for r in seeds.collect()}
    got = frontier.filter(F.col("url").isin(*seed_urls)).groupBy("url").count().collect()
    assert len(got) == len(seed_urls)
    assert all(r["count"] == 1 for r in got)
    # discovery sequence stays dense and unique
    n = frontier.count()
    assert frontier.select("discovered_seq").distinct().count() == n
    log = engine.crawl_log()
    assert log.filter(F.col("status") == 200).count() > 0
