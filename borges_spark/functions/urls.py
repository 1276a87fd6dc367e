"""URL canonicalization / hashing — the seen-set key functions.

The reference canonicalizes implicitly via urljoin + keyed Mongo probes
(Borges/spiders/ECS/issue_link.py:41, Borges/db_scripts/insert_jl.py:37-38).
Here canonicalization is a *column expression* (JVM-side, codegen'd, no
Python) so the hot path — hashing billions of URLs per round — never
leaves Tungsten. A pure-Python twin (`canonicalize_url_py`) exists for
the reference simulator and for property tests asserting the two agree.

Canonical form:
  - scheme lowercased; host lowercased
  - default ports stripped (:80 for http, :443 for https)
  - fragment stripped
  - empty path -> '/'
  - query preserved verbatim (order matters to many sites)
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme :// host[:port] path?query#fragment
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def canonicalize_url_col(url: Column | str) -> Column:
    """Canonicalize a URL column entirely with built-in expressions."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    netloc = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)

    netloc = F.when(scheme == "http", F.regexp_replace(netloc, ":80$", "")).otherwise(netloc)
    netloc = F.when(scheme == "https", F.regexp_replace(netloc, ":443$", "")).otherwise(netloc)

    path = F.when(path == "", F.lit("/")).otherwise(path)
    out = F.concat(scheme, F.lit("://"), netloc, path, query)
    # Rows that don't look like absolute URLs pass through unchanged.
    return F.when(F.regexp_extract(u, _URL_RE, 1) == "", u).otherwise(out)


def url_host_col(url: Column | str) -> Column:
    """Lowercased host (port stripped) of an already-canonical URL."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    return F.regexp_replace(host, ":\\d+$", "")


def url_hash_col(url: Column | str) -> Column:
    """64-bit seen-set key: xxhash64 of the canonical URL (built-in)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(u)


def canonicalize_url_py(url: str) -> str:
    """Pure-Python twin of canonicalize_url_col (simulator + tests)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    if not parts.scheme or "://" not in url:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def url_host_py(url: str) -> str:
    host = urlsplit(url).netloc.lower()
    if ":" in host:
        host = host.rsplit(":", 1)[0]
    return host
