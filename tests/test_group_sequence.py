"""add_group_sequence: the group-decomposed dense-rank primitive behind
selection ranks and discovery seqs — bucketed-offsets correctness and
scale shape (VERDICT r2 item 7)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from borges_spark.operators.frontier import _bucketed_counts, add_group_sequence


def _flat_reference(df, group_col, order_within, col_name, start):
    """The O(n_groups)-single-task formulation the bucketed version
    replaces — ground truth for equality checks."""
    w = Window.partitionBy(group_col).orderBy(*order_within)
    ranked = df.withColumn("_r", F.row_number().over(w))
    counts = df.groupBy(group_col).agg(F.count("*").alias("_c"))
    woff = Window.orderBy(F.col(group_col).asc()).rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(group_col, F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_o"))
    return (
        ranked.join(offs, group_col)
        .withColumn(col_name, (F.lit(start) + F.col("_o") + F.col("_r") - 1).cast("long"))
        .drop("_r", "_o")
    )


def test_bucketed_offsets_equal_flat_window(spark):
    """Many hosts sharing a long prefix (the synthetic-web worst case):
    the two-level cumsum must assign exactly the numbers the flat global
    window would."""
    n_hosts, per_host = 500, 4
    df = (
        spark.range(n_hosts * per_host)
        .select(
            F.concat(F.lit("host-"), F.lpad((F.col("id") % n_hosts).cast("string"), 6, "0")).alias("g"),
            F.col("id").alias("v"),
        )
    )
    got, total = add_group_sequence(df, "g", [F.col("v").asc()], "seq", start=7)
    assert total == n_hosts * per_host
    want = _flat_reference(df, "g", [F.col("v").asc()], "seq", 7)
    assert got.select("g", "v", "seq").exceptAll(want.select("g", "v", "seq")).count() == 0
    assert want.select("g", "v", "seq").exceptAll(got.select("g", "v", "seq")).count() == 0


def test_offsets_cumsum_decomposes_over_buckets(spark):
    """Scale shape: the per-group counts cumsum must spread over many
    monotone key buckets — no single task ever sorts all n_groups rows
    (at 10^8 hosts/round the flat window was one fat task)."""
    counts = spark.range(100_000).select(
        F.concat(F.lit("host-"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("g"),
        F.lit(1).alias("_gcnt"),
    )
    bucketed = _bucketed_counts(counts, "g", counts.schema["g"].dataType)
    n_buckets = bucketed.select("_gb").distinct().count()
    # 100k hosts -> one cumsum task per core, never one fat task
    assert n_buckets >= max(spark.sparkContext.defaultParallelism, 2), n_buckets
    # and the bucket is monotone in the group's sort order (the property
    # that makes the decomposition exact)
    rows = bucketed.orderBy("g").select("_gb").collect()
    vals = [r["_gb"] for r in rows]
    assert vals == sorted(vals)


def test_offsets_split_under_shared_host_prefix(spark):
    """VERDICT r3 'what's wrong #1': 10^5 hosts sharing a 12-char prefix
    (shard-XXXXX.bigsite.com style) collapsed the prefix-slice bucketing
    to ONE bucket — the offsets cumsum became the exact single fat task
    the decomposition exists to kill. Data-derived range boundaries must
    split them, and the assigned numbers must still equal the flat
    window's."""
    counts = spark.range(100_000).select(
        F.concat(
            F.lit("shard-"), F.lpad(F.col("id").cast("string"), 6, "0"), F.lit(".bigsite.com")
        ).alias("g"),
        F.lit(1).alias("_gcnt"),
    )
    bucketed = _bucketed_counts(counts, "g", counts.schema["g"].dataType)
    n_buckets = bucketed.select("_gb").distinct().count()
    assert n_buckets >= max(spark.sparkContext.defaultParallelism, 2), n_buckets
    rows = bucketed.orderBy("g").select("_gb").collect()
    vals = [r["_gb"] for r in rows]
    assert vals == sorted(vals)
    # end-to-end numbers unchanged on a shared-prefix host set
    df = spark.range(3_000).select(
        F.concat(
            F.lit("shard-"), F.lpad((F.col("id") % 300).cast("string"), 5, "0"), F.lit(".bigsite.com")
        ).alias("g"),
        F.col("id").alias("v"),
    )
    got, total = add_group_sequence(df, "g", [F.col("v").asc()], "seq", start=0)
    assert total == 3_000
    want = _flat_reference(df, "g", [F.col("v").asc()], "seq", 0)
    assert got.select("g", "v", "seq").exceptAll(want.select("g", "v", "seq")).count() == 0
    assert want.select("g", "v", "seq").exceptAll(got.select("g", "v", "seq")).count() == 0


def test_need_total_false_skips_the_action(spark):
    df = spark.range(40).select((F.col("id") % 5).alias("g"), F.col("id").alias("v"))
    got, total = add_group_sequence(df, "g", [F.col("v").asc()], "seq", need_total=False)
    assert total == -1
    assert got.count() == 40
    seqs = sorted(r["seq"] for r in got.collect())
    assert seqs == list(range(40))
