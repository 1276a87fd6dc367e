"""Credential-pool partitioning + hot-host salting.

The reference's only true parallelism is 8 Python threads, one per API
key, over 8 static pickle batches (Elsevier/paper_xml.py:203,244-263),
with key rotation on quota failure (paper_index.py:343-348). The Spark
form: a `credential` column assigned deterministically, used as (part
of) the partition key for the fetch stage — dynamic partitions replace
static pickle files, and rotation is a column remap, not a restart.

Hot-host salting: hosts above a row-count threshold get a salt fan-out
(`salt = pmod(url_hash, n_salts)`) so one host's queue spreads over
multiple tasks. Selection semantics are unaffected — the politeness
top-k runs on `host` BEFORE salting; the salt only spreads the
fetch/parse work (SURVEY.md §4 physical strategy 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_credentials(df: DataFrame, n_keys: int, by: str = "url_hash") -> DataFrame:
    """Deterministic key assignment: pmod(hash, n_keys). A quota-dead
    key is handled by remapping its slice: rotate_credentials below."""
    return df.withColumn("credential", F.pmod(F.col(by), F.lit(n_keys)).cast("int"))


def rotate_credentials(df: DataFrame, dead_key: int, n_keys: int) -> DataFrame:
    """Key rotation on quota exhaustion (paper_index.py:343-348): the
    dead key's rows shift to the next live key; other rows unchanged."""
    return df.withColumn(
        "credential",
        F.when(
            F.col("credential") == dead_key,
            F.pmod(F.col("credential") + 1, F.lit(n_keys)),
        ).otherwise(F.col("credential")).cast("int"),
    )


def salt_hot_hosts(
    selected: DataFrame,
    hot_threshold: int = 1000,
    n_salts: int = 8,
) -> DataFrame:
    """Add `host_salt` for the fetch-stage partition key: hot hosts
    (>= hot_threshold selected rows this round) fan out over n_salts
    sub-keys; cold hosts keep salt 0. One window-free pass: a grouped
    count broadcast-joined back."""
    counts = selected.groupBy("host").agg(F.count("*").alias("_host_n"))
    joined = selected.join(F.broadcast(counts), "host")
    salt = F.when(
        F.col("_host_n") >= hot_threshold, F.pmod(F.col("url_hash"), F.lit(n_salts))
    ).otherwise(F.lit(0))
    return joined.withColumn("host_salt", salt.cast("int")).drop("_host_n")


def partition_for_fetch(selected: DataFrame, n_partitions: int) -> DataFrame:
    """Repartition the fetch set by (host, host_salt) so one host's
    politeness bucket lands in one task (session reuse, per-host
    ordering) unless salted hot."""
    return selected.repartition(n_partitions, "host", "host_salt")
