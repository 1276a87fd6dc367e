"""Golden parser fixtures (FIXTURES.md §9): the required cases —
missing DOI, CJK-only author, summary-marker abstract, copyright strip,
title tag-strip, fallback chains, ECS HTML full-text."""

import pytest

from borges_spark.functions.publishers import (
    extract_ecs_html,
    extract_jats,
    has_cjk,
    is_cjk_only,
    parse_documents,
    reorder_author,
)

JATS_FULL = b"""<?xml version="1.0"?>
<article>
 <front>
  <journal-meta>
   <journal-id journal-id-type="publisher-id">jpd</journal-id>
   <journal-title-group><journal-title>Journal of Physics D</journal-title></journal-title-group>
   <issn pub-type="ppub">0022-3727</issn>
   <issn pub-type="epub">1361-6463</issn>
  </journal-meta>
  <article-meta>
   <article-id pub-id-type="doi">10.1000/jpd.2020.123</article-id>
   <title-group><article-title>Growth of <tex-math>x^2</tex-math>thin films<xref>1</xref> on substrates</article-title></title-group>
   <contrib-group>
    <contrib><surname>Smith</surname><given-names>Jane</given-names></contrib>
    <contrib><surname>Tanaka</surname><given-names>Ken</given-names></contrib>
   </contrib-group>
   <pub-date pub-type="ppub"><year>2020</year></pub-date>
   <issue>7</issue>
   <abstract><title>Abstract</title><p>We grow thin films.
   This article is available under the terms of the IOP-Standard License.</p></abstract>
  </article-meta>
 </front>
 <body><p>Full text body here.</p></body>
</article>"""

JATS_NO_DOI = b"""<article><front><article-meta>
 <title-group><article-title>No DOI here</article-title></title-group>
</article-meta></front></article>"""

JATS_FALLBACKS = b"""<article><front>
 <journal-meta>
  <journal-id journal-id-type="publisher-id">fallback-j</journal-id>
  <issn pub-type="epub">9999-0001</issn>
 </journal-meta>
 <article-meta>
  <article-id pub-id-type="doi">10.1/fb</article-id>
  <pub-date pub-type="epub"><year>2019</year></pub-date>
  <contrib-group>
   <contrib><surname>\xe5\xb1\xb1\xe7\x94\xb0</surname><given-names>\xe5\xa4\xaa\xe9\x83\x8e</given-names></contrib>
   <contrib><surname>Lee</surname><given-names>Min</given-names></contrib>
  </contrib-group>
  <abstract><p>Synopsis of the chapter only.</p></abstract>
 </article-meta></front></article>"""

ECS_HTML = b"""<html><head>
<meta name="citation_title" content="An ECS Paper">
</head><body>
<span class="slug-doi">10.1149/2.001</span>
<span class="open-access-marker"></span>
<div class="article fulltext-view"><p>Intro text.</p><p>More text.</p></div>
</body></html>"""


def test_jats_full():
    r = extract_jats("d1", JATS_FULL)
    assert r["doi"] == "10.1000/jpd.2020.123"
    assert r["title"] == "Growth of thin films on substrates"  # tex-math/xref stripped
    assert r["journal"] == "Journal of Physics D"
    assert r["issn"] == "0022-3727"  # ppub preferred
    assert r["published_year"] == 2020
    assert r["issue"] == "7"
    assert r["authors"] == ["Jane Smith", "Ken Tanaka"]
    assert r["abstract"] == "We grow thin films."  # copyright + title stripped
    assert r["contains_body"] is True
    assert r["full_text"] == "Full text body here."


def test_jats_missing_doi_aborts():
    r = extract_jats("d2", JATS_NO_DOI)
    assert r["doi"] is None
    assert "missing_doi" in r["notes"]
    assert r["title"] is None  # abort: nothing else extracted


def test_jats_fallbacks_cjk_and_marker():
    r = extract_jats("d3", JATS_FALLBACKS)
    assert r["journal"] == "fallback-j"
    assert "journal_from_publisher_id" in r["notes"]
    assert r["issn"] == "9999-0001"  # epub fallback
    assert r["published_year"] == 2019  # epub fallback
    assert r["authors"] == ["Min Lee"]  # CJK-only author dropped
    assert "cjk_only_author_dropped" in r["notes"]
    assert r["abstract"] is None  # summary marker rejected
    assert "abstract_rejected_summary_marker" in r["notes"]


def test_ecs_html():
    r = extract_ecs_html("e1", ECS_HTML)
    assert r["doi"] == "10.1149/2.001"
    assert r["title"] == "An ECS Paper"
    assert r["open_access"] is True
    assert r["full_text"] == "Intro text. More text."
    assert r["contains_body"] is True


def test_cjk_helpers():
    assert is_cjk_only("山田")
    assert not is_cjk_only("Smith")
    assert not is_cjk_only("山田 Smith")
    assert has_cjk("x 山 y")
    assert reorder_author("Smith, Jane") == "Jane Smith"
    assert reorder_author("Madonna") == "Madonna"


def test_parse_documents_spark(spark):
    rows = [
        ("d1", "IOP", "jats_xml", bytearray(JATS_FULL)),
        ("d2", "IOP", "jats_xml", bytearray(JATS_NO_DOI)),
        ("e1", "ECS", "html", bytearray(ECS_HTML)),
    ]
    df = spark.createDataFrame(rows, "doc_id string, publisher string, fmt string, body binary")
    out = {r["doc_id"]: r for r in parse_documents(df).collect()}
    assert out["d1"]["doi"] == "10.1000/jpd.2020.123"
    assert out["d1"]["authors"] == ["Jane Smith", "Ken Tanaka"]
    assert out["d2"]["doi"] is None and "missing_doi" in out["d2"]["notes"]
    assert out["e1"]["full_text"] == "Intro text. More text."


# --- RSC article-page extraction (Borges/spiders/RSC/metadata.py:73-118) ---

RSC_ARTICLE = b"""<html><body>
<div class="page-head__vcenter"><span>Analyst</span><span>other</span></div>
<div id="tabissues"><div class="h--heading4">Volume 148 2023, Issue 12</div></div>
<span class="capsule__context">Paper<img src="oa.png"/></span>
<div class="article__title"><h2 class="capsule__title">Sensing of <i>trace</i> metals</h2></div>
<div class="capsule__text">We report a sensor for trace metals.</div>
<dl><dd class="c__24"><a class="text--small">https://doi.org/10.1039/D3AN00001A</a></dd></dl>
<label class="input__label">Jane Smith</label>
<label class="input__label">Ken Tanaka</label>
</body></html>"""

RSC_COVER = b"""<html><body>
<span class="capsule__context">Cover</span>
<div class="article__title"><h2 class="capsule__title">Front cover</h2></div>
<dl><dd class="c__24"><a class="text--small">https://doi.org/10.1039/D3AN90001X</a></dd></dl>
</body></html>"""

RSC_NO_DOI = b"""<html><body>
<span class="capsule__context">Paper</span>
<div class="article__title"><h2 class="capsule__title">No identifier here</h2></div>
<dl><dd class="c__24"><a class="text--small">not-a-doi-url</a></dd></dl>
</body></html>"""


def test_rsc_article_golden():
    from borges_spark.functions.publishers import extract_rsc_html

    out = extract_rsc_html("d1", RSC_ARTICLE)
    # DOI from the displayed doi.org URL, split on '.org/' (metadata.py:94-95)
    assert out["doi"] == "10.1039/D3AN00001A"
    assert out["title"] == "Sensing of trace metals"  # tag-stripped
    assert out["abstract"] == "We report a sensor for trace metals."
    assert out["authors"] == ["Jane Smith", "Ken Tanaka"]
    assert out["journal"] == "Analyst"
    assert out["published_year"] == 2023  # ', 2023,' field, last 4 chars
    assert out["issue"] == "12"
    assert out["open_access"] is True  # img inside the context span
    assert out["notes"] == []


def test_rsc_excluded_type_and_missing_doi():
    from borges_spark.functions.publishers import extract_rsc_html

    cover = extract_rsc_html("d2", RSC_COVER)
    assert "excluded_type" in cover["notes"]  # Cover (metadata.py:34,56)
    assert cover["doi"] == "10.1039/D3AN90001X"
    nodoi = extract_rsc_html("d3", RSC_NO_DOI)
    assert nodoi["doi"] is None
    assert "missing_doi" in nodoi["notes"]


def test_rsc_through_dispatcher(spark):
    rows = [("r1", "RSC", "rsc_html", bytearray(RSC_ARTICLE))]
    df = spark.createDataFrame(rows, "doc_id string, publisher string, fmt string, body binary")
    out = parse_documents(df).collect()[0]
    assert out["publisher"] == "RSC"
    assert out["doi"] == "10.1039/D3AN00001A"
    assert out["authors"] == ["Jane Smith", "Ken Tanaka"]


# --- AIP issue-listing cards (aip_spider.py:95-131) -------------------------

AIP_LISTING = b"""<html><body>
<div class="card-cont">
 <div class="open-access"><span class="access-text">OPEN</span></div>
 <h4 class="hlFld-Title">First <i>paper</i> title</h4>
 <div class="art_title linkable"><a href="/doi/10.1063/5.0001234">x</a></div>
 <span class="hlFld-ContribAuthor"><a>Jane Smith</a></span>
 <span class="hlFld-ContribAuthor"><a>Ken Tanaka</a></span>
 <a class="show-pdf" href="/doi/pdf/10.1063/5.0001234">pdf</a>
</div>
<div class="card-cont">
 <div class="open-access"></div>
 <h4 class="hlFld-Title">Second paper</h4>
 <div class="art_title linkable"><a href="/doi/10.1063/5.0005678">x</a></div>
</div>
</body></html>"""


def test_aip_listing_cards():
    from borges_spark.functions.publishers import extract_aip_listing

    rows = extract_aip_listing("L1", AIP_LISTING)
    assert len(rows) == 2
    a, b = rows
    # DOI = last two path segments of the article link (aip_spider.py:119)
    assert a["doi"] == "10.1063/5.0001234"
    assert a["title"] == "First paper title"
    assert a["authors"] == ["Jane Smith", "Ken Tanaka"]
    assert a["open_access"] is True
    assert b["doi"] == "10.1063/5.0005678"
    assert b["open_access"] is False
    assert b["authors"] is None
    assert [r["doc_id"] for r in rows] == ["L1:0", "L1:1"]


def test_aip_listing_through_dispatcher(spark):
    rows = [("L1", "AIP", "aip_listing", bytearray(AIP_LISTING))]
    df = spark.createDataFrame(rows, "doc_id string, publisher string, fmt string, body binary")
    out = parse_documents(df).orderBy("doc_id").collect()
    assert len(out) == 2  # one listing doc -> two paper rows
    assert out[0]["doi"] == "10.1063/5.0001234"


# --- Springer dc./prism. meta chain (SpringerXMLDataExtractor.py:85-232) ----

SPRINGER_FULL = b"""<html><head>
<meta name="DOI" content="10.1007/s40145-023-0001">
<meta name="dc.publisher" content="SpringerNature">
<meta name="prism.publicationName" content="Journal of Advanced Ceramics">
<meta name="prism.issn" content="2226-4108">
<meta name="prism.number" content="4">
<meta name="dc.date" content="2023-04-01">
<meta name="dc.title" content="Sintering of ceramics">
<meta name="dc.creator" content="Smith, Jane">
<meta name="dc.creator" content="Tanaka, Ken">
<meta name="dc.description" content="We sinter ceramics.">
</head><body></body></html>"""

SPRINGER_PRISM_FALLBACK = b"""<html><head>
<meta name="prism.doi" content="doi:10.1007/s40145-023-0002">
<meta name="dc.date" content="garbage">
<meta name="dc.creator" content="Madonna">
</head><body></body></html>"""


def test_springer_meta_golden():
    from borges_spark.functions.publishers import extract_springer_meta

    r = extract_springer_meta("s1", SPRINGER_FULL)
    assert r["doi"] == "10.1007/s40145-023-0001"
    assert r["journal"] == "Journal of Advanced Ceramics"
    assert r["issn"] == "2226-4108"
    assert r["issue"] == "4"
    assert r["published_year"] == 2023  # dc.date leading 4 digits
    assert r["authors"] == ["Jane Smith", "Ken Tanaka"]  # reordered (:204)
    assert r["abstract"] == "We sinter ceramics."
    assert r["notes"] == []


def test_springer_prism_fallback_chain():
    from borges_spark.functions.publishers import extract_springer_meta

    r = extract_springer_meta("s2", SPRINGER_PRISM_FALLBACK)
    # DOI via prism.doi with 'doi:' stripped (:103-104)
    assert r["doi"] == "10.1007/s40145-023-0002"
    assert r["publisher"] == "SpringerNature"
    assert "publisher_inferred" in r["notes"]  # :118-119
    assert r["published_year"] is None  # non-4-digit date rejected
    # mononym author -> whole list nulled, like the reference (:205-207)
    assert r["authors"] is None
    assert "author_reorder_failed" in r["notes"]


def test_aip_listing_empty_page_through_dispatcher(spark):
    """A listing with zero cards yields zero rows — the batch must still
    conform to PAPER_SCHEMA (empty DataFrame with columns), not crash."""
    rows = [("L0", "AIP", "aip_listing", bytearray(b"<html><body>no cards</body></html>"))]
    df = spark.createDataFrame(rows, "doc_id string, publisher string, fmt string, body binary")
    assert parse_documents(df).count() == 0


def test_meta_attr_order_and_quoting_tolerated():
    """DOM semantics: attribute order and quote style are invisible to a
    real DOM walk (SpringerXMLDataExtractor.py reads tags through a
    parser), so content-before-name and single-quoted attributes must
    parse identically."""
    from borges_spark.functions.publishers import extract_meta_html, extract_springer_meta

    html = b"""<html><head>
    <meta content="10.1007/s40145-023-0009" name="DOI">
    <meta name='dc.title' content='Reordered Title'>
    <meta content='Jane Smith' name='dc.creator'>
    </head><body></body></html>"""
    r = extract_springer_meta("s9", html)
    assert r["doi"] == "10.1007/s40145-023-0009"
    assert r["title"] == "Reordered Title"
    # single-token creator -> reference nulls the list (:205-207); the
    # point here is that the single-quoted tag was SEEN at all
    assert r["authors"] is None
    assert "author_reorder_failed" in r["notes"]

    aip = b"""<html><head>
    <meta content="10.1063/5.0000001" name="citation_doi">
    <meta name='citation_title' content='Quoted Title'>
    </head></html>"""
    m = extract_meta_html("a9", aip)
    assert m["doi"] == "10.1063/5.0000001"
    assert m["title"] == "Quoted Title"


def test_nested_div_abstract_and_fulltext():
    """The reference's DOM selectors return the WHOLE subtree of the
    matched div; a nested <div> inside must not truncate the extraction
    (the old non-greedy regex stopped at the first </div>)."""
    from borges_spark.functions.publishers import extract_ecs_html, extract_rsc_html

    rsc = (
        b'<span class="capsule__context">Paper</span>'
        b'<div class="capsule__text">Start <div class="inner">middle</div> end.</div>'
        b'<dl><dd class="c__24"><a class="text--small">https://doi.org/10.1039/DX</a></dd></dl>'
    )
    r = extract_rsc_html("r9", rsc)
    assert r["abstract"] == "Start middle end."
    assert r["doi"] == "10.1039/DX"

    ecs = (
        b'<html><body><div class="article fulltext-view">alpha '
        b'<div class="figure">beta</div> gamma</div></body></html>'
    )
    e = extract_ecs_html("e9", ecs)
    assert e["full_text"] == "alpha beta gamma"
    assert e["contains_body"] is True
