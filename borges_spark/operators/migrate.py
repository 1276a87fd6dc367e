"""Schema-migration operators — the reference's collection-rewrite
scripts as single-pass column algebra.

The reference migrates by looping every Mongo doc in the driver:
`$rename`/`del`/conditional field moves in
Borges/db_scripts/aggregate_results.py:27-36 (Publish_Year ->
Published_Year, drop Scraped, Paper_HTML_Scraped -> HTML_Crawled, and
`Paper_HTML` moved to `Paper_HTML_content` only when crawled) and flag
backfills in add_paper_scraped_flag.py:28-32 ($set default / $rename
fallback per document).

Here each migration is ONE narrow projection — no shuffle, no driver
loop, whole-stage-codegen'd — so migrating a 100 TB table is a single
scan-write pass. Steps compose left-to-right like the reference
scripts' statement order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """$rename (aggregate_results.py:28-31): old -> new, order-preserving."""
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def drop_columns(df: DataFrame, *cols: str) -> DataFrame:
    """del doc[field] (aggregate_results.py:29-30)."""
    return df.drop(*cols)


def backfill(df: DataFrame, col: str, default, only_when: Column | None = None) -> DataFrame:
    """$set with a default (add_paper_scraped_flag.py:29-30): create the
    column if absent; where `only_when` holds (or the value is null),
    overwrite with `default`."""
    lit = default if isinstance(default, Column) else F.lit(default)
    if col not in df.columns:
        return df.withColumn(col, lit)
    cond = F.col(col).isNull() if only_when is None else only_when
    return df.withColumn(col, F.when(cond, lit).otherwise(F.col(col)))


def conditional_move(df: DataFrame, src: str, dst: str, cond: Column) -> DataFrame:
    """Move `src` into `dst` only for rows satisfying `cond`
    (aggregate_results.py:33-35: Paper_HTML -> Paper_HTML_content only
    when HTML_Crawled); other rows get NULL `dst`. `src` is dropped."""
    return df.withColumn(dst, F.when(cond, F.col(src))).drop(src)


def rename_fallback(df: DataFrame, primary: str, fallback: str) -> DataFrame:
    """add_paper_scraped_flag.py:31-32: where `primary` is null, take the
    value from the legacy `fallback` column ($rename per-doc), then drop
    the legacy column."""
    if fallback not in df.columns:
        return df
    out = df.withColumn(primary, F.coalesce(F.col(primary), F.col(fallback)))
    return out.drop(fallback)


def migrate(df: DataFrame, steps: list) -> DataFrame:
    """Compose steps left-to-right: each step is (fn, *args)."""
    for fn, *args in steps:
        df = fn(df, *args)
    return df
