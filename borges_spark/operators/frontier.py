"""Frontier primitives: deterministic sequencing, upsert-merge, routing.

The reference's frontier is "Mongo docs where the flag is false"
(Borges/spiders/ECS/metadata.py:35, Elsevier/paper_xml.py:203); its
global ordering is cursor insertion order. Here both become explicit:
an Iceberg/Parquet `frontier` table plus a *total, parallelism-invariant
discovery order* (`discovered_seq`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def add_sequence(df: DataFrame, order_cols: list, col_name: str, start: int = 0) -> DataFrame:
    return add_sequence_with_total(df, order_cols, col_name, start)[0]


def add_sequence_with_total(
    df: DataFrame, order_cols: list, col_name: str, start: int = 0
) -> tuple[DataFrame, int]:
    """Assign a dense global sequence in `order_cols` order, distributed
    and Arrow-only (no per-row Python, no single-partition window).

    Two passes over a pinned global range-sort:
      1. count rows per sorted partition (tiny collect: one row per
         partition) -> cumulative offsets, broadcast;
      2. mapInPandas assigns offset[pid] + within-partition position,
         accumulated across the partition's Arrow batches.

    The assigned numbers depend only on the total order of the rows —
    not on partition boundaries or core count — so the sequence is
    identical at local[8] and local[32] (and N vs 4N executors), which
    the determinism contract requires. localCheckpoint pins the range
    boundaries so both passes see the same partitioning.

    Returns (df_with_seq, total_rows) — the total falls out of pass 1
    for free, saving callers a separate count() job.
    """
    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    sorted_df = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {r["_pid"]: r["cnt"] for r in sorted_df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    total = acc - start
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        [f for f in sorted_df.schema.fields if f.name != "_pid"]
        + [T.StructField(col_name, T.LongType(), False)]
    )

    def assign(it):
        pos = 0
        base = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if base is None:
                base = bc.value[int(pdf["_pid"].iloc[0])]
            import numpy as np

            seqs = base + pos + np.arange(len(pdf), dtype="int64")
            pos += len(pdf)
            out = pdf.drop(columns=["_pid"]).copy()
            out[col_name] = seqs
            yield out

    return sorted_df.mapInPandas(assign, out_schema), total


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE INTO emulation: rows in `updates` replace same-key rows in
    `target`; unmatched update rows are inserted.

    With Iceberg on the cluster this is a real `MERGE INTO` (SURVEY.md
    §1.4); on vanilla Parquet it is the standard anti-join + union —
    one shuffle on the key, no driver data.
    """
    untouched = target.join(updates.select(key), key, "left_anti")
    return untouched.unionByName(updates.select(*target.columns))


def route_fetch_outcomes(
    fetched: DataFrame,
    round_no: int,
    max_attempts: int = 3,
    retry_backoff_rounds: int = 1,
) -> DataFrame:
    """Classify fetch results into next frontier states.

    Models the reference's error routing: bounded 3-attempt retry with
    backoff and transient-vs-permanent classes
    (Borges/spiders/Elsevier/paper_xml.py:79-90,141-173) and terminal
    failure states (ECS/paper_html.py:61 'Server Issue').

    Input columns: frontier columns + `status` int.
    Output: frontier columns with updated state/attempts/next_allowed_round.
    """
    is_ok = F.col("status") == 200
    is_transient = F.col("status").isin(429, 500, 502, 503)
    attempts_next = F.col("attempts") + 1
    state = (
        F.when(is_ok, F.lit("fetched"))
        .when(is_transient & (attempts_next < max_attempts), F.lit("error"))
        .otherwise(F.lit("dead"))
    )
    # 'error' rows go back to pending after a cooldown; model the
    # quota-stall wait (AIP/paper_index.py:84-99) as round backoff.
    next_allowed = F.when(
        state == "error", F.lit(round_no + 1 + retry_backoff_rounds)
    ).otherwise(F.col("next_allowed_round"))
    reentry_state = F.when(state == "error", F.lit("pending")).otherwise(state)
    return (
        fetched.withColumn("attempts", attempts_next.cast("int"))
        .withColumn("next_allowed_round", next_allowed.cast("int"))
        .withColumn("state", reentry_state)
    )


def error_class_col() -> F.Column:
    """Crawl-log error class from HTTP status (Elsevier/paper_xml.py:79-90)."""
    return (
        F.when(F.col("status") == 200, F.lit(None).cast("string"))
        .when(F.col("status").isin(429, 500, 502, 503), F.lit("transient"))
        .otherwise(F.lit("permanent"))
    )
