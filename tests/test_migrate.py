"""Schema-migration operators (ref aggregate_results.py:27-36,
add_paper_scraped_flag.py:28-32): single-projection column algebra."""

from pyspark.sql import functions as F

from borges_spark.operators.migrate import (
    backfill,
    conditional_move,
    drop_columns,
    migrate,
    rename_columns,
    rename_fallback,
)


def test_aggregate_results_migration(spark):
    """The full aggregate_results.py rewrite as one composed projection."""
    rows = [
        (1, 1998, True, True, "<html>a</html>"),
        (2, 2001, False, False, "<html>b</html>"),
    ]
    df = spark.createDataFrame(
        rows, "id int, Publish_Year int, Scraped boolean, Paper_HTML_Scraped boolean, Paper_HTML string"
    )
    out = migrate(df, [
        (rename_columns, {"Publish_Year": "Published_Year", "Paper_HTML_Scraped": "HTML_Crawled"}),
        (drop_columns, "Scraped"),
        (conditional_move, "Paper_HTML", "Paper_HTML_content", F.col("HTML_Crawled")),
    ])
    assert set(out.columns) == {"id", "Published_Year", "HTML_Crawled", "Paper_HTML_content"}
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["Published_Year"] == 1998
    assert got[1]["Paper_HTML_content"] == "<html>a</html>"  # crawled -> moved
    assert got[2]["Paper_HTML_content"] is None  # not crawled -> dropped


def test_flag_backfill_and_rename_fallback(spark):
    """add_paper_scraped_flag.py:28-32: default flag + legacy rename."""
    df = spark.createDataFrame(
        [(1, None, True), (2, False, None), (3, None, None)],
        "id int, HTML_Crawled boolean, Crawled boolean",
    )
    out = rename_fallback(df, "HTML_Crawled", "Crawled")
    out = backfill(out, "HTML_Crawled", False)
    got = {r["id"]: r["HTML_Crawled"] for r in out.collect()}
    assert got == {1: True, 2: False, 3: False}
    assert "Crawled" not in out.columns
    # creating a missing column entirely
    df2 = spark.createDataFrame([(1,)], "id int")
    assert backfill(df2, "flag", False).collect()[0]["flag"] is False


def test_migration_is_single_stage(spark):
    """Plan hygiene: a migration must compile to a projection over the
    scan — no Exchange anywhere (the 100 TB migration is one pass)."""
    import contextlib
    import io

    df = spark.range(100).select(
        F.col("id"), F.lit("x").alias("a"), (F.col("id") % 2 == 0).alias("flag")
    )
    out = migrate(df, [
        (rename_columns, {"a": "b"}),
        (conditional_move, "b", "c", F.col("flag")),
        (backfill, "d", 0),
    ])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()
