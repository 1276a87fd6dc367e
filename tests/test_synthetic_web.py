"""Generator determinism + the byte-identical parse invariant.

The parser (pandas-side) run over generated html must recover exactly
the `text` column — the per-row invariant from BASELINE.json input_hint.
"""

from pyspark.sql import functions as F

from borges_spark.functions.html import decode_html, extract_links, extract_text
from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds

CFG = WebConfig(n_pages=500, n_hosts=7, out_degree=3, n_seeds=4)


def test_deterministic(spark):
    a = gen_pages(spark, CFG).orderBy("url").collect()
    b = gen_pages(spark, CFG).orderBy("url").collect()
    assert a == b
    assert len(a) == CFG.n_pages


def test_text_roundtrip_byte_identical(spark):
    rows = gen_pages(spark, CFG).collect()
    assert len(rows) == CFG.n_pages
    n_latin1 = 0
    for r in rows:
        html = decode_html(bytes(r["html"]))
        assert extract_text(html) == r["text"], r["url"]
        if "windows-1252" in html[:100]:
            n_latin1 += 1
            assert "café" in r["text"]
    assert n_latin1 > 0


def test_links_resolve_and_skew(spark):
    pages = gen_pages(spark, CFG)
    urls = {r["url"] for r in pages.select("url").collect()}
    some = pages.limit(20).collect()
    for r in some:
        links = extract_links(r["url"], decode_html(bytes(r["html"])))
        assert len(links) == CFG.out_degree
        # even-position links are absolute true URLs -> always resolvable
        assert links[0] in urls

    by_host = pages.groupBy(F.regexp_extract("url", "https://([^/]+)/", 1).alias("h")).count().collect()
    counts = {r["h"]: r["count"] for r in by_host}
    assert counts["h0.example.com"] >= CFG.n_pages * CFG.hot_frac * 0.9  # hot host skew
    # every configured host actually exists — the r3 LCG host mixer
    # collapsed n_hosts=400 to 20 real hosts via a gcd degeneracy
    assert len(counts) == CFG.n_hosts, sorted(counts)


def test_seeds(spark):
    seeds = gen_seeds(spark, CFG).orderBy("seq").collect()
    assert [r["seq"] for r in seeds] == list(range(CFG.n_seeds))
    urls = {r["url"] for r in gen_pages(spark, CFG).select("url").collect()}
    assert all(r["url"] in urls for r in seeds)
