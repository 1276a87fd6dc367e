"""F4/F11/F12 fidelity functions + credential pool + hot-host salting."""

from pyspark.sql import functions as F

from borges_spark.functions.fidelity import (
    clean_journal_title,
    clean_journal_title_udf,
    is_near_identical,
    similarity_ratio,
    similarity_ratio_udf,
    splice_abstract,
)
from borges_spark.operators.credentials import (
    assign_credentials,
    partition_for_fetch,
    rotate_credentials,
    salt_hot_hosts,
)


def test_clean_journal_title():
    assert clean_journal_title("journal   of\napplied physics") == "Journal of Applied Physics"
    assert clean_journal_title("AIP advances") == "AIP Advances"
    assert clean_journal_title("the journal of the ACS") == "The Journal of the ACS"


def test_similarity_ratio():
    assert similarity_ratio("abcdef", "abcdef") == 1.0
    assert is_near_identical("x" * 200, "x" * 199 + "y")
    assert not is_near_identical("completely different", "nothing alike here")


def test_splice_abstract():
    full = "<article><body><p>text</p></body></article>"
    out = splice_abstract(full, "<abstract>A</abstract>")
    assert out == "<article><body><abstract>A</abstract><p>text</p></body></article>"
    assert splice_abstract(full, "") == full


def test_udfs(spark):
    df = spark.createDataFrame(
        [("journal of physics", "abc", "abd")], "t string, a string, b string"
    )
    row = df.select(
        clean_journal_title_udf("t").alias("ct"),
        similarity_ratio_udf("a", "b").alias("r"),
    ).collect()[0]
    assert row["ct"] == "Journal of Physics"
    assert 0.6 < row["r"] < 0.7


def test_credentials(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "url_hash long")
    with_keys = assign_credentials(df, 8)
    counts = {r["credential"]: r["count"] for r in with_keys.groupBy("credential").count().collect()}
    assert set(counts) == set(range(8))
    rotated = rotate_credentials(with_keys, dead_key=3, n_keys=8)
    got = {r["credential"] for r in rotated.select("credential").distinct().collect()}
    assert 3 not in got


def test_salting(spark):
    rows = [(f"hot.com", i) for i in range(50)] + [("cold.com", i) for i in range(5)]
    df = spark.createDataFrame(rows, "host string, url_hash long")
    salted = salt_hot_hosts(df, hot_threshold=50, n_salts=4)
    hot_salts = {r["host_salt"] for r in salted.filter(F.col("host") == "hot.com").collect()}
    cold_salts = {r["host_salt"] for r in salted.filter(F.col("host") == "cold.com").collect()}
    assert len(hot_salts) > 1
    assert cold_salts == {0}
    assert salted.count() == 55  # salting never drops or duplicates rows
    parts = partition_for_fetch(salted, 4)
    assert parts.count() == 55
