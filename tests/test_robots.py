"""Robots-rule gating: disallowed prefixes are excluded from selection.

The reference disables robots (settings.py:23 ROBOTSTXT_OBEY=False) but
sets a compliance user agent; the engine implements the gate and keeps
it off by default (robots=None)."""

from borges_spark.operators.politeness import PolitenessConfig
from borges_spark.plans.checkpoint import SnapshotStore
from borges_spark.plans.engine import CrawlConfig, CrawlEngine
from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds

WEB = WebConfig(n_pages=120, n_hosts=4, out_degree=2, n_seeds=4)


def test_robots_blocks_prefix(spark, tmp_path):
    pages = gen_pages(spark, WEB)
    seeds = gen_seeds(spark, WEB)
    robots = spark.createDataFrame(
        [("h0.example.com", ["/p/"])],  # block everything on the hot host
        "host string, disallow_prefixes array<string>",
    )
    cfg = CrawlConfig(
        max_rounds=3,
        politeness=PolitenessConfig(default_delay_s=1.0, round_budget_s=60.0),
    )
    engine = CrawlEngine(
        spark, pages, seeds, SnapshotStore(str(tmp_path / "s")), cfg, robots=robots
    )
    engine.run(resume=False)
    log_hosts = {r["host"] for r in engine.crawl_log().select("host").distinct().collect()}
    assert "h0.example.com" not in log_hosts
    assert len(log_hosts) > 0


def test_no_robots_crawls_all_hosts(spark, tmp_path):
    pages = gen_pages(spark, WEB)
    seeds = gen_seeds(spark, WEB)
    cfg = CrawlConfig(
        max_rounds=3,
        politeness=PolitenessConfig(default_delay_s=1.0, round_budget_s=60.0),
    )
    engine = CrawlEngine(spark, pages, seeds, SnapshotStore(str(tmp_path / "s")), cfg)
    engine.run(resume=False)
    log_hosts = {r["host"] for r in engine.crawl_log().select("host").distinct().collect()}
    assert "h0.example.com" in log_hosts
