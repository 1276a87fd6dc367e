"""Live fetch stage, offline: file:// URLs exercise the exact code path
(opener, timeout plumbing, size ceiling, error classes) without network."""

import pytest
from pyspark.sql import functions as F

import borges_spark.sources.fetcher as FE
from borges_spark.sources.fetcher import fetch_urls


@pytest.fixture()
def web_dir(tmp_path):
    d = tmp_path / "www"
    d.mkdir()
    (d / "a.html").write_text("<html><body><p>alpha</p></body></html>")
    (d / "b.html").write_text("<html><body><p>beta</p></body></html>")
    (d / "big.html").write_text("x" * 2048)
    return d


def test_fetch_file_urls(spark, web_dir):
    urls = [
        (f"file://{web_dir}/a.html",),
        (f"file://{web_dir}/b.html",),
        (f"file://{web_dir}/missing.html",),  # URLError -> 503 transient
        ("http://[malformed",),  # ValueError -> 400 permanent
    ]
    df = spark.createDataFrame(urls, "url string")
    out = {r["url"]: r for r in fetch_urls(df).collect()}
    a = out[f"file://{web_dir}/a.html"]
    assert a["status"] == 200
    assert b"alpha" in bytes(a["html"])
    assert out[f"file://{web_dir}/missing.html"]["status"] == 503
    assert out[f"file://{web_dir}/missing.html"]["html"] is None
    assert out["http://[malformed"]["status"] == 400


def test_fetch_size_ceiling(spark, web_dir, monkeypatch):
    monkeypatch.setattr(FE, "make_http_fetcher", FE.make_http_fetcher)  # no-op; clarity
    df = spark.createDataFrame([(f"file://{web_dir}/big.html",)], "url string")
    # shrink the ceiling via a custom fetcher
    fetched = df.mapInPandas(
        FE.make_http_fetcher(max_bytes=1024), "url string, status int, html binary"
    )
    row = fetched.collect()[0]
    assert row["status"] == 413  # DocumentTooLarge routing (paper_xml.py:109-120)
    assert row["html"] is None


def test_fetch_carries_extra_columns(spark, web_dir):
    df = spark.createDataFrame(
        [(f"file://{web_dir}/a.html", "h1", 7)], "url string, host string, depth int"
    )
    out = fetch_urls(df).collect()[0]
    assert out["host"] == "h1" and out["depth"] == 7 and out["status"] == 200


def test_fetch_statuses_route_like_engine(spark, web_dir):
    """End-to-end with the engine's outcome router."""
    from borges_spark.operators.frontier import route_fetch_outcomes

    rows = [
        (f"file://{web_dir}/a.html", 1, "h", 0, 1.0, 0, 0, "pending", 0, 0),
        (f"file://{web_dir}/missing.html", 2, "h", 0, 1.0, 1, 0, "pending", 0, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, url_hash long, host string, depth int, priority double, "
        "discovered_seq long, discovered_round int, state string, attempts int, next_allowed_round int",
    )
    fetched = fetch_urls(df)
    routed = {r["url"]: r for r in route_fetch_outcomes(fetched.drop("html"), 0).collect()}
    assert routed[f"file://{web_dir}/a.html"]["state"] == "fetched"
    # 503 transient with attempts remaining -> back to pending w/ cooldown
    miss = routed[f"file://{web_dir}/missing.html"]
    assert miss["state"] == "pending" and miss["next_allowed_round"] == 2
