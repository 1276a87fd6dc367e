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
