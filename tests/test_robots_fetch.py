"""robots.txt parse + fetch plumbing (file:// offline)."""

from borges_spark.operators.robots import fetch_robots_rules, parse_robots_txt

ROBOTS = """
# comment
User-agent: evilbot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 2.5

User-agent: borges-spark
Disallow: /only-for-us/
Crawl-delay: 0.5
"""


def test_parse_wildcard_vs_specific():
    dis, cd = parse_robots_txt(ROBOTS, agent_token="borges-spark")
    assert dis == ["/only-for-us/"] and cd == 0.5  # specific beats '*'
    dis2, cd2 = parse_robots_txt(ROBOTS, agent_token="someother")
    assert dis2 == ["/private/", "/tmp/"] and cd2 == 2.5
    assert parse_robots_txt("", "x") == ([], None)
    # grouped agents share a block
    grouped = "User-agent: a\nUser-agent: *\nDisallow: /x/\n"
    assert parse_robots_txt(grouped, "zzz") == (["/x/"], None)


def test_fetch_robots_rules(spark, tmp_path):
    f = tmp_path / "robots.txt"
    f.write_text(ROBOTS)
    hosts = spark.createDataFrame(
        [("good.com", f"file://{f}"), ("dead.com", f"file://{tmp_path}/missing.txt")],
        "host string, robots_url string",
    )
    out = {r["host"]: r for r in fetch_robots_rules(hosts, url_col="robots_url").collect()}
    good = out["good.com"]
    assert good["fetched"] is True
    assert list(good["disallow_prefixes"]) == ["/only-for-us/"]
    assert good["crawl_delay"] == 0.5
    dead = out["dead.com"]
    assert dead["fetched"] is False and list(dead["disallow_prefixes"]) == []


def test_rules_gate_engine(spark, tmp_path):
    """Fetched rules plug straight into the engine's robots gate."""
    from borges_spark.operators.politeness import PolitenessConfig
    from borges_spark.plans.checkpoint import SnapshotStore
    from borges_spark.plans.engine import CrawlConfig, CrawlEngine
    from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds

    web = WebConfig(n_pages=120, n_hosts=4, out_degree=2, n_seeds=4)
    f = tmp_path / "robots.txt"
    f.write_text("User-agent: *\nDisallow: /p/\n")
    hosts = spark.createDataFrame([("h0.example.com", f"file://{f}")], "host string, u string")
    rules = fetch_robots_rules(hosts, url_col="u").select("host", "disallow_prefixes")
    cfg = CrawlConfig(max_rounds=2, politeness=PolitenessConfig(default_delay_s=1.0, round_budget_s=60.0))
    engine = CrawlEngine(
        spark, gen_pages(spark, web), gen_seeds(spark, web),
        SnapshotStore(str(tmp_path / "s")), cfg, robots=rules,
    )
    engine.run(resume=False)
    hosts_crawled = {r["host"] for r in engine.crawl_log().select("host").distinct().collect()}
    assert "h0.example.com" not in hosts_crawled


def test_budgets_from_robots_matches_budget_for(spark):
    """Distributed robots->budget column math must equal budget_for
    bit-for-bit across the delay regimes (fast, =round, slower-than-
    round, huge)."""
    from borges_spark.operators.politeness import (
        PolitenessConfig,
        budget_for,
        budgets_from_robots,
    )

    cfg = PolitenessConfig(default_delay_s=1.0, round_budget_s=60.0)
    delays = [0.1, 0.5, 1.0, 5.0, 60.0, 90.0, 3600.0]
    rows = [(f"h{i}", True, [], d) for i, d in enumerate(delays)] + [
        ("hnull", True, [], None),  # no Crawl-delay -> no budget row
        ("hzero", True, [], 0.0),   # zero delay -> no budget row (default applies)
    ]
    robots = spark.createDataFrame(
        rows, "host string, fetched boolean, disallow_prefixes array<string>, crawl_delay double"
    )
    got = {r["host"]: (r["k"], r["every_m"]) for r in budgets_from_robots(robots, cfg).collect()}
    assert set(got) == {f"h{i}" for i in range(len(delays))}
    for i, d in enumerate(delays):
        assert got[f"h{i}"] == budget_for(d, cfg.round_budget_s), d


def test_engine_respects_robots_crawl_delay(spark, tmp_path):
    """An engine built with a robots table carrying Crawl-delay must cap
    that host's per-round selection accordingly (config overrides win)."""
    from pyspark.sql import functions as F

    from borges_spark.operators.politeness import PolitenessConfig
    from borges_spark.plans.checkpoint import SnapshotStore
    from borges_spark.plans.engine import CrawlConfig, CrawlEngine
    from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds

    web = WebConfig(n_pages=300, n_hosts=3, out_degree=2, n_seeds=60)
    pages, seeds = gen_pages(spark, web), gen_seeds(spark, web)
    host0 = "h0.example.com"
    robots = spark.createDataFrame(
        [(host0, True, [], 30.0)],  # k = 60/30 = 2 per round
        "host string, fetched boolean, disallow_prefixes array<string>, crawl_delay double",
    )
    cfg = CrawlConfig(
        max_rounds=1,
        politeness=PolitenessConfig(default_delay_s=1.0, round_budget_s=60.0),
    )
    eng = CrawlEngine(spark, pages, seeds, SnapshotStore(str(tmp_path / "s")), cfg, robots=robots)
    eng.run(resume=False)
    per_host = {
        r["host"]: r["n"]
        for r in eng.crawl_log().groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per_host[host0] == 2  # robots Crawl-delay capped it
    assert all(n > 2 for h, n in per_host.items() if h != host0)  # default k=60


def test_robots_budget_merges_with_window_only_host(spark, tmp_path):
    """A host configured ONLY with a time-of-day window must keep the
    window AND take the robots-derived k (a config window must not
    silently discard a robots Crawl-delay); sub-microsecond delays clamp
    instead of overflowing int32."""
    from borges_spark.operators.politeness import (
        PolitenessConfig,
        budget_for,
        budgets_from_robots,
    )
    from borges_spark.plans.checkpoint import SnapshotStore
    from borges_spark.plans.engine import CrawlConfig, CrawlEngine
    from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds

    cfg = PolitenessConfig(
        default_delay_s=1.0, round_budget_s=60.0,
        host_delays=(("explicit.com", 2.0),),
        host_windows=(("h0.example.com", 0, 24),),
    )
    robots = spark.createDataFrame(
        [("h0.example.com", True, [], 30.0),   # window-only host: robots k wins
         ("explicit.com", True, [], 30.0),     # explicit delay: config k wins
         ("tiny.com", True, [], 1e-9)],        # clamp, not int32 overflow
        "host string, fetched boolean, disallow_prefixes array<string>, crawl_delay double",
    )
    # formula parity incl. the clamp
    got = {r["host"]: (r["k"], r["every_m"]) for r in budgets_from_robots(robots, cfg).collect()}
    assert got["tiny.com"] == (1 << 30, 1) == budget_for(1e-9, 60.0)

    web = WebConfig(n_pages=200, n_hosts=2, out_degree=2, n_seeds=40)
    engine = CrawlEngine(
        spark, gen_pages(spark, web), gen_seeds(spark, web),
        SnapshotStore(str(tmp_path / "s")),
        CrawlConfig(max_rounds=1, politeness=cfg),
        robots=robots,
    )
    budgets = {r["host"]: r for r in engine.budgets.collect()}
    h0 = budgets["h0.example.com"]
    assert h0["k"] == 2  # robots-derived (60/30)
    assert (h0["win_start"], h0["win_end"]) == (0, 24)  # window preserved
    assert budgets["explicit.com"]["k"] == 30  # config delay 2.0 beats robots 30.0
    assert budgets["tiny.com"]["k"] == 1 << 30
