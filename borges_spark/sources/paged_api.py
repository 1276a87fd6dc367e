"""Paginated token-auth REST source (SURVEY.md §2.1 S7).

The reference indexes publisher APIs with manual pagination loops —
accumulate pages while `len(collected) < resultCount`
(AIP/aip_journals.py:61-74, AIP/paper_index.py:74-131), per-(journal,
year) work units with resume-skip (Elsevier/paper_index.py:119-138),
and credential rotation on quota failure (:343-348).

Spark-first shape: the *work-unit list* (journal x year x credential)
is a DataFrame; each unit's page-walk happens inside an Arrow batch
(one unit = one bounded sequential walk — pagination is inherently
serial per unit, the parallelism is ACROSS units, exactly like the
reference's one-thread-per-key layout but with dynamic partitions).
The fetch callable is injected so tests drive it with file:// JSON
pages and deployments with a real HTTP opener.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

RESULT_SCHEMA = (
    "unit_id string, credential int, n_pages int, n_results long, "
    "results array<string>, quota_exhausted boolean"
)


def default_url_fetcher(url: str) -> str:
    """Reads a JSON page from any urllib-supported URL (file:// in tests)."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.read().decode("utf-8")


def paged_walk(
    first_url: str,
    fetcher: Callable[[str], str],
    max_pages: int = 100,
) -> tuple[int, list[str], bool]:
    """Walk one unit's pages: each page is JSON
    {"results": [...], "total": N, "next": url|null, "quota": bool?}.
    Stops when collected >= total, next is null, or quota trips
    (the reference's accumulate-until-resultCount loop)."""
    collected: list[str] = []
    url: str | None = first_url
    n_pages = 0
    total = None
    while url and n_pages < max_pages:
        page = json.loads(fetcher(url))
        if page.get("quota"):
            return n_pages, collected, True
        collected.extend(str(r) for r in page.get("results", []))
        total = page.get("total", total)
        n_pages += 1
        if total is not None and len(collected) >= total:
            break
        url = page.get("next")
    return n_pages, collected, False


def index_work_units(
    units: DataFrame,
    fetcher: Callable[[str], str] = default_url_fetcher,
    n_credentials: int = 8,
    max_pages: int = 100,
) -> DataFrame:
    """units: (unit_id string, first_url string[, credential int]).

    Returns one row per unit with its collected results. Units without
    a credential column get one assigned by hash (the reference's
    static key-per-thread becomes a dynamic column). Resume-skip is the
    caller's anti-join against already-indexed unit_ids (SO2)."""
    from pyspark.sql import functions as F

    if "credential" not in units.columns:
        units = units.withColumn(
            "credential", F.pmod(F.xxhash64("unit_id"), F.lit(n_credentials)).cast("int")
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for unit_id, first_url, cred in zip(pdf["unit_id"], pdf["first_url"], pdf["credential"]):
                n_pages, results, quota = paged_walk(str(first_url), fetcher, max_pages)
                rows.append(
                    {
                        "unit_id": str(unit_id),
                        "credential": int(cred),
                        "n_pages": n_pages,
                        "n_results": len(results),
                        "results": results,
                        "quota_exhausted": quota,
                    }
                )
            yield pd.DataFrame(rows)

    # partition by credential: one key's units walk sequentially within
    # a partition (per-key rate limits), keys run in parallel
    return units.repartition("credential").mapInPandas(batches, RESULT_SCHEMA)
