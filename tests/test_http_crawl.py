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


def test_http_mode_fetches_each_url_exactly_once(spark, tmp_path):
    """The live fetch is a side effect: the concurrent snapshot writers
    (crawl_log/frontier/metrics) must consume ONE materialized fetch, not
    recompute the fetch plan per writer — refetching is a politeness
    violation and lets one committed snapshot mix different fetch
    results. A counting server proves exactly-once."""
    import http.server
    import threading
    from collections import Counter

    hits = Counter()
    lock = threading.Lock()

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            with lock:
                hits[self.path] += 1
            if self.path.startswith("/page/"):
                i = int(self.path.rsplit("/", 1)[1])
                # each page links to the next two, so rounds 2+ exercise
                # discovery -> re-entry -> fetch of non-seed URLs too
                links = "".join(
                    f'<a href="/page/{j}">l</a>' for j in (2 * i + 1, 2 * i + 2) if j < 12
                )
                self.send_response(200)
                self.end_headers()
                self.wfile.write(f"<html><body><p>pg {i}</p>{links}</body></html>".encode())
            else:
                self.send_response(404)
                self.end_headers()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        seeds = spark.createDataFrame([(f"{base}/page/0", 0)], "url string, seq long")
        cfg = CrawlConfig(
            max_rounds=6,
            fetch_mode="http",
            politeness=PolitenessConfig(default_delay_s=0.1, round_budget_s=60.0),
        )
        engine = CrawlEngine(spark, None, seeds, SnapshotStore(str(tmp_path / "s")), cfg)
        engine.run(resume=False)
        fetched = [r["url"] for r in engine.crawl_log().select("url").collect()]
        assert len(fetched) == 12  # the whole 12-page tree was crawled
        for i in range(12):
            assert hits[f"/page/{i}"] == 1, (i, hits[f"/page/{i}"])
    finally:
        srv.shutdown()


def test_http_fetch_exactly_once_survives_total_cache_loss(spark, tmp_path, monkeypatch):
    """Storage-deep exactly-once (round-5): the fetch pin must be the
    round store's `fetch_raw` FILES, not executor memory — a persist()
    survives cache eviction but NOT executor loss, where Spark silently
    recomputes the lost partitions (refetching those URLs and letting
    one snapshot mix two fetches' results). Simulate the worst case a
    lost executor can inflict — every cache gone, every consumer
    recomputing its full plan — by no-op'ing DataFrame.persist/unpersist
    for the whole run. The counting server must still see each URL
    exactly once: consumers re-read files, never the network."""
    import http.server
    import threading
    from collections import Counter

    import pyspark.sql

    hits = Counter()
    lock = threading.Lock()

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            with lock:
                hits[self.path] += 1
            if self.path.startswith("/page/"):
                i = int(self.path.rsplit("/", 1)[1])
                links = "".join(
                    f'<a href="/page/{j}">l</a>' for j in (2 * i + 1, 2 * i + 2) if j < 12
                )
                self.send_response(200)
                self.end_headers()
                self.wfile.write(f"<html><body><p>pg {i}</p>{links}</body></html>".encode())
            else:
                self.send_response(404)
                self.end_headers()

    monkeypatch.setattr(pyspark.sql.DataFrame, "persist", lambda self, *a, **k: self)
    monkeypatch.setattr(pyspark.sql.DataFrame, "unpersist", lambda self, *a, **k: self)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        seeds = spark.createDataFrame([(f"{base}/page/0", 0)], "url string, seq long")
        cfg = CrawlConfig(
            max_rounds=6,
            fetch_mode="http",
            politeness=PolitenessConfig(default_delay_s=0.1, round_budget_s=60.0),
        )
        engine = CrawlEngine(spark, None, seeds, SnapshotStore(str(tmp_path / "s")), cfg)
        engine.run(resume=False)
        fetched = [r["url"] for r in engine.crawl_log().select("url").collect()]
        assert len(fetched) == 12
        for i in range(12):
            assert hits[f"/page/{i}"] == 1, (i, hits[f"/page/{i}"])
    finally:
        srv.shutdown()
