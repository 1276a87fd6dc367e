"""End-to-end engine run in fetch_mode='http' against a file:// web —
the deployment fetch path, offline."""

from pyspark.sql import functions as F

from borges_spark.functions.html import decode_html, extract_text
from borges_spark.operators.politeness import PolitenessConfig
from borges_spark.plans.checkpoint import SnapshotStore
from borges_spark.plans.engine import CrawlConfig, CrawlEngine
from borges_spark.sources.synthetic_web import WebConfig, gen_pages


def test_http_mode_crawl(spark, tmp_path):
    # materialize a small synthetic web as real files
    web = WebConfig(n_pages=40, n_hosts=3, out_degree=2, n_seeds=6)
    rows = gen_pages(spark, web).collect()
    www = tmp_path / "www"
    www.mkdir()
    expected = {}
    seed_rows = []
    for i, r in enumerate(rows[:20]):
        p = www / f"p{i}.html"
        p.write_bytes(bytes(r["html"]))
        url = f"file://{p}"
        expected[url] = r["text"]
        seed_rows.append((url, i))

    seeds = spark.createDataFrame(seed_rows, "url string, seq long")
    cfg = CrawlConfig(
        max_rounds=1,  # links in the html point at https:// hosts; stop after seeds
        fetch_mode="http",
        politeness=PolitenessConfig(default_delay_s=0.1, round_budget_s=60.0),
    )
    engine = CrawlEngine(spark, None, seeds, SnapshotStore(str(tmp_path / "s")), cfg)
    summary = engine.run(resume=False)
    assert summary["rounds_run"] == 1

    log = engine.crawl_log().filter(F.col("status") == 200).collect()
    assert len(log) == 20
    for r in log:
        assert r["text"] == expected[r["url"]]  # byte-identical through live fetch
    # discovered links entered the frontier as pending
    frontier = engine.frontier()
    assert frontier.filter(F.col("state") == "pending").count() > 0
