"""Deterministic synthetic web — the engine's crawlable `pages` table.

Shape is authoritative from BASELINE.json input_hint:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Built entirely from `spark.range(n)` + built-in column expressions —
no driver-side data, no Python UDFs — so the same generator produces a
10^4-row test web or a 10^10-row benchmark web with identical per-row
content (content is a pure function of page id and the config).

Properties engineered in:
  - zipf-ish host skew: host h0 owns `hot_frac` of all pages —
    exercises hot-host salting and AQE skew handling;
  - a deterministic link graph embedded in `html` as <a href> tags,
    half absolute (always resolvable) and half relative (same-host,
    may 404) so fetch-error routing is exercised;
  - `text` is exactly what the parser must recover from `html`
    (the byte-identical-per-url invariant of the reference's
    extractors, e.g. Borges/spiders/ECS/paper_html.py:50);
  - a windows-1252 subset (meta charset declared) exercising the
    reference's decode fallback (Borges/spiders/IOP/
    upload_to_mongodb.py:83-86).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Knuth-style multiplicative constants for the deterministic link graph.
# All mixing reduces `i` mod _PRIME first so products never exceed int64
# (ANSI mode: overflow is an error, not a wrap) even at 10^10 pages.
_PRIME = 1_000_003
_LINK_A = 2654435761
_LINK_B = 40503
_LINK_C = 7


@dataclass(frozen=True)
class WebConfig:
    n_pages: int = 10_000
    n_hosts: int = 20
    out_degree: int = 4
    hot_frac: float = 0.25  # fraction of pages on the single hot host
    n_seeds: int = 8
    latin1_every: int = 17  # every k-th page is windows-1252/'de'
    text_words: int = 24  # filler words per page (bench uses larger, web-realistic pages)


def _mix(i: Column, a: int, c: int) -> Column:
    return F.pmod(i, F.lit(_PRIME)) * F.lit(a) + F.lit(c)


def _host_id(i: Column, cfg: WebConfig) -> Column:
    # xxhash64, not a multiplicative mix: an LCG-style `(i*A + C) % n`
    # silently collapses the host universe whenever gcd(A mod n, n) > 1
    # (the round-3 constants hit gcd 21 at the bench's n_hosts=400,
    # yielding only 20 REAL hosts — politeness budgets then capped every
    # bench round and the selection window ran 20 fat sort tasks). A
    # real hash has no common-factor structure with any n_hosts.
    hot_cut = int(cfg.n_pages * cfg.hot_frac)
    return F.when(i < hot_cut, F.lit(0)).otherwise(
        1 + F.pmod(F.xxhash64(i), F.lit(cfg.n_hosts - 1))
    )


def _url_for(i: Column, cfg: WebConfig) -> Column:
    return F.concat(
        F.lit("https://h"),
        _host_id(i, cfg).cast("string"),
        F.lit(".example.com/p/"),
        i.cast("string"),
    )


def _text_for(i: Column, n_words: int = 24) -> Column:
    # Deterministic pseudo-prose: pure function of page id, ASCII-safe
    # except the windows-1252 marker added by gen_pages.
    bank = F.array(
        *[
            F.lit(w)
            for w in (
                "alpha", "beta", "gamma", "delta", "epsilon", "crawl", "frontier",
                "index", "corpus", "token", "merge", "shard", "the", "quick", "fox",
                "jumps", "over", "lazy", "dog", "and", "of", "stream", "batch",
                "window", "parse", "fetch", "robots", "budget", "snapshot",
            )
        ]
    )
    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda k: F.element_at(bank, (F.pmod(F.pmod(i, F.lit(_PRIME)) * 7 + k * 13 + k, F.lit(29)) + 1).cast("int")),
        ),
        " ",
    )
    return F.concat(F.lit("page"), i.cast("string"), F.lit(" "), filler)


def gen_pages(spark: SparkSession, cfg: WebConfig = WebConfig()) -> DataFrame:
    """Build the deterministic `pages` table."""
    i = F.col("id")
    df = spark.range(cfg.n_pages)

    # Link targets: k-th out-link of page i -> page (i*A + k*B + C) % n.
    ks = F.sequence(F.lit(0), F.lit(cfg.out_degree - 1))
    targets = F.transform(
        ks, lambda k: F.pmod(_mix(i, _LINK_A, _LINK_C) + k * _LINK_B, F.lit(cfg.n_pages))
    )

    # Even k: absolute URL of the true target page (always fetchable).
    # Odd k: relative path (resolves on *this* host; 404 if absent there).
    hrefs = F.transform(
        targets,
        lambda t, k: F.when(
            k % 2 == 0, _url_for(t, cfg)
        ).otherwise(F.concat(F.lit("/p/"), t.cast("string"))),
    )
    anchors = F.array_join(
        F.transform(hrefs, lambda h: F.concat(F.lit('<a href="'), h, F.lit('">link</a>'))),
        "\n",
    )

    is_latin1 = F.pmod(i, F.lit(cfg.latin1_every)) == 0
    lang = F.when(is_latin1, F.lit("de")).otherwise(
        F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("es"), F.lit("fr")),
            (F.pmod(i * 13, F.lit(5)) + 1).cast("int"),
        )
    )
    base_text = _text_for(i, cfg.text_words)
    text = F.when(is_latin1, F.concat(base_text, F.lit(" café"))).otherwise(base_text)
    charset_decl = F.when(is_latin1, F.lit("windows-1252")).otherwise(F.lit("utf-8"))

    html_str = F.concat(
        F.lit('<html><head><meta charset="'),
        charset_decl,
        F.lit('"><title>Page '),
        i.cast("string"),
        F.lit("</title></head><body><p>"),
        text,
        F.lit("</p>\n"),
        anchors,
        F.lit("\n</body></html>"),
    )
    # windows-1252 and ISO-8859-1 agree on every char we emit (0xE9 'é');
    # Spark's encode() only ships ISO-8859-1, which is the compatible
    # stand-in for the declared windows-1252.
    html = F.when(is_latin1, F.encode(html_str, "ISO-8859-1")).otherwise(F.encode(html_str, "UTF-8"))

    warc_ts = F.timestamp_seconds(F.lit(1_700_000_000) + i)

    return df.select(
        _url_for(i, cfg).alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def gen_seeds(spark: SparkSession, cfg: WebConfig = WebConfig()) -> DataFrame:
    """Deterministic seed list in enumeration order — models the
    reference's generated seed lists (RSC/start_url_gen.py:24-35).
    Seeds stride across the page-id space so they land on many hosts
    (a seed list concentrated on one host would leave every other
    politeness bucket idle in round 0)."""
    i = F.col("id")
    stride = max(cfg.n_pages // max(cfg.n_seeds, 1), 1)
    return spark.range(cfg.n_seeds).select(
        _url_for(i * stride, cfg).alias("url"), i.alias("seq")
    )
