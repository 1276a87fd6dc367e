"""Canonicalization: the builtin column expr must agree with the pure-
Python twin used by the simulator."""

import pytest
from pyspark.sql import functions as F

from borges_spark.functions.urls import (
    canonicalize_url_col,
    canonicalize_url_py,
    url_host_col,
    url_host_py,
)

CASES = [
    "https://Example.COM/path?q=1#frag",
    "http://example.com:80/a/b",
    "https://example.com:443/",
    "https://example.com:8443/x",
    "HTTPS://H0.EXAMPLE.COM/p/12",
    "https://example.com",
    "http://example.com/path%20with%20escape?a=b&c=d",
    "https://h3.example.com/p/999?x=2",
    "relative/not/a/url",
]

EXPECTED = {
    "https://Example.COM/path?q=1#frag": "https://example.com/path?q=1",
    "http://example.com:80/a/b": "http://example.com/a/b",
    "https://example.com:443/": "https://example.com/",
    "https://example.com:8443/x": "https://example.com:8443/x",
    "https://example.com": "https://example.com/",
}


@pytest.mark.parametrize("url,want", EXPECTED.items())
def test_py_canonicalization(url, want):
    assert canonicalize_url_py(url) == want


def test_col_matches_py(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = df.select(
        "url",
        canonicalize_url_col("url").alias("canon"),
        url_host_col(canonicalize_url_col("url")).alias("host"),
    ).collect()
    for row in got:
        assert row["canon"] == canonicalize_url_py(row["url"]), row["url"]
        if "://" in row["url"]:
            assert row["host"] == url_host_py(canonicalize_url_py(row["url"]))


def test_hash_is_stable(spark):
    df = spark.createDataFrame([("https://example.com/",)], "url string")
    h1 = df.select(F.xxhash64("url").alias("h")).collect()[0]["h"]
    h2 = df.select(F.xxhash64("url").alias("h")).collect()[0]["h"]
    assert h1 == h2
