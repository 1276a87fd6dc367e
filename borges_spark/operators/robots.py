"""robots.txt acquisition + rule parsing.

The reference disables robots outright (ROBOTSTXT_OBEY=False,
Borges/settings.py:23) while setting a compliance user-agent
(settings.py:20); the engine implements the full path and leaves it
off by default to match. This module turns a host list into the
`robots_rules` table the engine's `_apply_robots` gate consumes:

    hosts -> scheme://host/robots.txt -> live fetch (sources/fetcher)
          -> per-row parse (User-agent blocks, Disallow prefixes,
             Crawl-delay) -> (host, disallow_prefixes, crawl_delay)

Parsing follows the original robots.txt convention: rules apply from
the most specific matching User-agent block ('our' agent token beats
'*'); empty Disallow means allow-all; Crawl-delay feeds the politeness
config (host_delays) rather than a separate limiter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_SCHEMA = "host string, fetched boolean, disallow_prefixes array<string>, crawl_delay double"


def parse_robots_txt(text: str, agent_token: str = "borges-spark") -> tuple[list[str], float | None]:
    """(disallow_prefixes, crawl_delay) for our agent; specific block
    wins over '*'; no matching block -> allow all."""
    blocks: list[tuple[list[str], list[str], float | None]] = []  # (agents, disallows, delay)
    agents: list[str] = []
    disallows: list[str] = []
    delay: float | None = None
    in_block_body = False

    def flush():
        nonlocal agents, disallows, delay, in_block_body
        if agents:
            blocks.append((agents, disallows, delay))
        agents, disallows, delay, in_block_body = [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_block_body:
                flush()
            agents.append(val.lower())
        elif key in ("disallow", "crawl-delay"):
            in_block_body = True
            if key == "disallow":
                if val:
                    disallows.append(val)
            else:
                try:
                    delay = float(val)
                except ValueError:
                    pass
    flush()

    token = agent_token.lower()
    specific = [(d, c) for a, d, c in blocks if any(token in ag for ag in a)]
    wildcard = [(d, c) for a, d, c in blocks if "*" in a]
    chosen = specific or wildcard
    if not chosen:
        return [], None
    dis: list[str] = []
    cd: float | None = None
    for d, c in chosen:
        dis.extend(d)
        if c is not None:
            cd = c
    return dis, cd


def fetch_robots_rules(
    hosts: DataFrame,
    scheme: str = "https",
    timeout_s: float = 5.0,
    agent_token: str = "borges-spark",
    url_col: str | None = None,
) -> DataFrame:
    """hosts: DataFrame with a `host` column (optionally url_col giving
    an explicit robots URL — used by file:// tests). Unfetchable hosts
    yield fetched=false with allow-all rules (the crawl proceeds; the
    reference never blocks on robots)."""
    from borges_spark.sources.fetcher import make_http_fetcher

    if url_col is None:
        with_urls = hosts.select(
            "host", F.concat(F.lit(f"{scheme}://"), F.col("host"), F.lit("/robots.txt")).alias("url")
        )
    else:
        with_urls = hosts.select("host", F.col(url_col).alias("url"))

    fetch = make_http_fetcher(timeout_s=timeout_s)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in fetch(it):
            rows = []
            for host, status, body in zip(pdf["host"], pdf["status"], pdf["html"]):
                if status == 200 and body is not None:
                    dis, cd = parse_robots_txt(bytes(body).decode("utf-8", "replace"), agent_token)
                    rows.append({"host": host, "fetched": True, "disallow_prefixes": dis, "crawl_delay": cd})
                else:
                    rows.append({"host": host, "fetched": False, "disallow_prefixes": [], "crawl_delay": None})
            yield pd.DataFrame(rows)

    return with_urls.mapInPandas(batches, ROBOTS_SCHEMA)
