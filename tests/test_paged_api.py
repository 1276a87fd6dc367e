"""Paginated REST source: accumulate-until-total walks, quota routing,
resume-skip anti-join, and the meta-HTML extractor."""

import json

from borges_spark.functions.publishers import extract_meta_html
from borges_spark.sources.paged_api import index_work_units, paged_walk


def _write_pages(tmp_path, unit: str, n_results: int, per_page: int, quota_at: int = -1):
    urls = []
    n_pages = (n_results + per_page - 1) // per_page
    for p in range(n_pages):
        f = tmp_path / f"{unit}_p{p}.json"
        urls.append(f"file://{f}")
    for p in range(n_pages):
        results = [f"{unit}-r{i}" for i in range(p * per_page, min((p + 1) * per_page, n_results))]
        page = {"results": results, "total": n_results}
        if p + 1 < n_pages:
            page["next"] = urls[p + 1]
        if p == quota_at:
            page = {"quota": True}
        (tmp_path / f"{unit}_p{p}.json").write_text(json.dumps(page))
    return urls[0]


def test_paged_walk(tmp_path):
    first = _write_pages(tmp_path, "u1", n_results=45, per_page=20)
    n_pages, results, quota = paged_walk(first, lambda u: open(u[7:]).read())
    assert n_pages == 3 and len(results) == 45 and not quota
    assert results[0] == "u1-r0" and results[-1] == "u1-r44"


def test_quota_stops_walk(tmp_path):
    first = _write_pages(tmp_path, "u2", n_results=45, per_page=20, quota_at=1)
    n_pages, results, quota = paged_walk(first, lambda u: open(u[7:]).read())
    assert quota and len(results) == 20  # first page collected, then stall


def test_index_units_spark(spark, tmp_path):
    rows = [
        ("journalA:2020", _write_pages(tmp_path, "a2020", 25, 10)),
        ("journalB:2021", _write_pages(tmp_path, "b2021", 7, 10)),
        ("journalC:2022", _write_pages(tmp_path, "c2022", 30, 10, quota_at=2)),
    ]
    units = spark.createDataFrame(rows, "unit_id string, first_url string")
    out = {r["unit_id"]: r for r in index_work_units(units).collect()}
    assert out["journalA:2020"]["n_results"] == 25
    assert out["journalB:2021"]["n_results"] == 7 and out["journalB:2021"]["n_pages"] == 1
    assert out["journalC:2022"]["quota_exhausted"] is True

    # resume-skip (SO2): already-indexed units drop out via anti-join
    done = spark.createDataFrame([("journalA:2020",)], "unit_id string")
    remaining = units.join(done, "unit_id", "left_anti")
    assert {r["unit_id"] for r in remaining.collect()} == {"journalB:2021", "journalC:2022"}


def test_meta_html_extractor():
    html = b"""<html><head>
    <meta name="citation_doi" content="10.1063/1.5000001">
    <meta name="citation_title" content="A Meta Paper">
    <meta name="citation_author" content="Smith, Jane">
    <meta name="citation_author" content="Lee, Min">
    <meta name="citation_journal_title" content="Applied Physics Letters">
    <meta name="citation_publication_date" content="2019-03-04">
    <meta name="citation_issn" content="0003-6951">
    </head><body></body></html>"""
    r = extract_meta_html("m1", html)
    assert r["doi"] == "10.1063/1.5000001"
    assert r["title"] == "A Meta Paper"
    assert r["authors"] == ["Jane Smith", "Min Lee"]
    assert r["journal"] == "Applied Physics Letters"
    assert r["published_year"] == 2019
    assert r["issn"] == "0003-6951"

    r2 = extract_meta_html("m2", b"<html><head></head></html>")
    assert r2["doi"] is None and "missing_doi" in r2["notes"]
