"""Live fetch stage — the deployment's HTTP GET (SURVEY.md §2.1 S5).

In tests and benchmarks the engine "fetches" by equi-joining against a
synthetic `pages` table; in a real deployment each politeness-budgeted
partition fetches its URLs over HTTP inside mapInPandas. This module is
that fetch body: stdlib urllib (requests isn't in the image), one
opener per partition (connection/session reuse — the Spark analogue of
the reference's per-thread session, Elsevier/paper_xml.py:244-263),
bounded timeouts, and error-class mapping compatible with
operators/frontier.route_fetch_outcomes.

Offline testing uses file:// URLs — same code path, no network.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

FETCHED_SCHEMA_SUFFIX = "status int, html binary"

# statuses route_fetch_outcomes treats as transient (retry)
_TRANSIENT = (429, 500, 502, 503)


def make_http_fetcher(
    timeout_s: float = 10.0,
    max_bytes: int = 16 * 1024 * 1024,  # the reference's blob ceiling
    user_agent: str = "borges-spark/0.1 (+compliance)",
):
    """Build a mapInPandas body: batches with a `url` column ->
    same columns + (status, html). Everything else (politeness, retry
    accounting, parse) stays in the engine."""

    def fetch_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request

        opener = urllib.request.build_opener()
        opener.addheaders = [("User-Agent", user_agent)]

        def fetch_one(url: str) -> tuple[int, bytes | None]:
            try:
                with opener.open(url, timeout=timeout_s) as resp:
                    body = resp.read(max_bytes + 1)
                    if len(body) > max_bytes:
                        return 413, None  # too large -> permanent, dead-letter
                    status = getattr(resp, "status", 200) or 200
                    return int(status), bytes(body)
            except urllib.error.HTTPError as ex:
                return int(ex.code), None
            except urllib.error.URLError:
                return 503, None  # connection-level: transient, retried
            except (TimeoutError, OSError):
                return 503, None
            except ValueError:
                return 400, None  # malformed URL: permanent

        for pdf in it:
            statuses, bodies = [], []
            for url in pdf["url"]:
                s, b = fetch_one(url)
                statuses.append(s)
                bodies.append(b)
            out = pdf.copy()
            out["status"] = pd.Series(statuses, dtype="int32")
            out["html"] = bodies
            yield out

    return fetch_batches


def fetch_urls(df, timeout_s: float = 10.0, extra_cols: str = ""):
    """Attach (status, html) to a DataFrame of URLs via live fetch.

    df must be repartitioned by (host, host_salt) upstream so one
    host's budgeted URLs share a partition (session reuse + per-host
    ordering) — `operators/credentials.partition_for_fetch` does this.
    """
    schema_prefix = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{schema_prefix}, {FETCHED_SCHEMA_SUFFIX}"
    return df.mapInPandas(make_http_fetcher(timeout_s), schema)
