"""Fixed StructType schemas for every engine table.

The reference is schemaless Mongo (SURVEY.md §1.3); the rebuild pins
explicit schemas so Parquet/Iceberg scans prune columns and push
predicates. Shapes follow /root/repo/FIXTURES.md; the `pages` shape is
authoritative from BASELINE.json input_hint:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The crawlable web (Common-Crawl-style page store).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Seed list — deterministic enumeration order, models the reference's
# generated seed URL lists (Borges/spiders/RSC/start_url_gen.py:24-35).
SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

# Frontier states. The reference encodes these as Mongo flag fields
# (Scraped / Crawled / Error — e.g. Borges/spiders/ECS/metadata.py:35).
STATE_PENDING = "pending"
STATE_FETCHED = "fetched"
STATE_ERROR = "error"  # transient, will be retried (attempts < max)
STATE_DEAD = "dead"  # permanent failure or retries exhausted

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("discovered_seq", T.LongType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("next_allowed_round", T.IntegerType(), False),
    ]
)

# Per-round crawl output — the ordering oracle for reference equivalence.
CRAWL_LOG = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("rank_in_round", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n_links", T.IntegerType(), True),
        T.StructField("error_class", T.StringType(), True),
    ]
)

# Per-partition lineage/counters — models the reference's Years_Indexed
# lineage sub-documents (Borges/spiders/Elsevier/paper_index.py:256-266).
ROUND_METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("parsed", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
        T.StructField("new_urls", T.LongType(), False),
        T.StructField("dedup_hits", T.LongType(), False),
    ]
)

# Politeness config (host '*' = default). Reference delay values become
# fixtures: 1.0s (settings.py:31), 5.0s (ECS/metadata.py:34),
# 1.25s (AIP/download_paper_v2023.py:117), 0.1s (Elsevier/paper_xml.py:137).
POLITENESS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("delay_s", T.DoubleType(), False),
        T.StructField("window_start_hour", T.IntegerType(), True),
        T.StructField("window_end_hour", T.IntegerType(), True),
    ]
)

# Robots cache — reference disables robots (settings.py:23) but the
# engine implements it; broadcast per round.
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)

# Extracted paper/article record — union of the reference's publisher
# paper documents (SURVEY.md §1.1 item 3).
PAPER = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("publisher", T.StringType(), True),
        T.StructField("doi", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("abstract", T.StringType(), True),
        T.StructField("authors", T.ArrayType(T.StringType()), True),
        T.StructField("journal", T.StringType(), True),
        T.StructField("issn", T.StringType(), True),
        T.StructField("issue", T.StringType(), True),
        T.StructField("published_year", T.IntegerType(), True),
        T.StructField("open_access", T.BooleanType(), True),
        T.StructField("full_text", T.StringType(), True),
        T.StructField("contains_body", T.BooleanType(), True),
        T.StructField("notes", T.ArrayType(T.StringType()), True),
    ]
)
