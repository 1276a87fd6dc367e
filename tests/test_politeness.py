"""Politeness budgets + top-k-per-host window selection."""

from pyspark.sql import functions as F

from borges_spark.operators.politeness import (
    PolitenessConfig,
    budget_for,
    budgets_df,
    select_round,
)


def test_budget_math():
    # reference delays as fixtures (BASELINE.md table)
    assert budget_for(1.0, 60.0) == (60, 1)  # settings.py:31
    assert budget_for(5.0, 60.0) == (12, 1)  # ECS/metadata.py:34
    assert budget_for(0.1, 60.0) == (600, 1)  # Elsevier/paper_xml.py:137
    assert budget_for(120.0, 60.0) == (1, 2)  # slower than a round
    assert budget_for(1.25, 60.0) == (48, 1)  # AIP wait_time


def _frontier(spark, n_per_host, hosts):
    rows = []
    seq = 0
    for h in hosts:
        for i in range(n_per_host):
            rows.append((f"https://{h}/p/{i}", seq * 7919 % 104729, h, 0, 1.0, seq, 0, "pending", 0, 0))
            seq += 1
    return spark.createDataFrame(
        rows,
        "url string, url_hash long, host string, depth int, priority double, "
        "discovered_seq long, discovered_round int, state string, attempts int, next_allowed_round int",
    )


def test_topk_per_host(spark):
    cfg = PolitenessConfig(default_delay_s=10.0, round_budget_s=30.0)  # k=3
    fr = _frontier(spark, 10, ["a.com", "b.com"])
    budgets = budgets_df(spark, cfg)
    sel = select_round(fr, budgets, 0, cfg, "fifo")
    got = sel.groupBy("host").count().collect()
    assert {r["host"]: r["count"] for r in got} == {"a.com": 3, "b.com": 3}
    # fifo order: lowest seq first within each host
    seqs = [r["discovered_seq"] for r in sel.filter(F.col("host") == "a.com").orderBy("host_rank").collect()]
    assert seqs == sorted(seqs)


def test_slow_host_cadence(spark):
    cfg = PolitenessConfig(
        default_delay_s=1.0, round_budget_s=10.0, host_delays=(("slow.com", 25.0),)
    )  # slow.com: every 3rd round, k=1
    fr = _frontier(spark, 5, ["slow.com", "fast.com"])
    budgets = budgets_df(spark, cfg)
    for r, want_slow in [(0, 1), (1, 0), (2, 0), (3, 1)]:
        sel = select_round(fr, budgets, r, cfg, "fifo")
        n = sel.filter(F.col("host") == "slow.com").count()
        assert n == want_slow, f"round {r}"


def test_time_window_gate(spark):
    # ECS paper_html.py:39-42 style: only 18:00-07:00
    cfg = PolitenessConfig(
        default_delay_s=1.0, round_budget_s=5.0,
        host_windows=(("night.com", 18, 7),), start_hour=12,
    )
    fr = _frontier(spark, 3, ["night.com", "day.com"])
    budgets = budgets_df(spark, cfg)
    sel_noon = select_round(fr, budgets, 0, cfg, "fifo")  # hour 12 -> gated
    assert sel_noon.filter(F.col("host") == "night.com").count() == 0
    assert sel_noon.filter(F.col("host") == "day.com").count() == 3
    sel_night = select_round(fr, budgets, 8, cfg, "fifo")  # hour 20 -> open
    assert sel_night.filter(F.col("host") == "night.com").count() == 3


def test_skew_prune_preserves_selection(spark):
    """A 50%-single-host frontier: the salted pre-window must select
    EXACTLY the rows the plain window selects (the prune is lossless),
    while bounding any one sort task to ~k rows per (host, salt)."""
    from pyspark.sql import functions as F

    rows = [(f"https://hot.com/{i}", i) for i in range(5000)] + [
        (f"https://h{i%50}.org/{i}", 5000 + i) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "url string, seq long").select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
        F.col("seq").alias("discovered_seq"),
        (F.lit(1.0) / (1 + F.col("seq") % 7)).alias("priority"),
    )
    budgets = budgets_df(spark, PolitenessConfig())
    pruned_cfg = PolitenessConfig(default_delay_s=2.0, skew_prune_salts=8)
    plain_cfg = PolitenessConfig(default_delay_s=2.0, skew_prune_salts=1)
    got_pruned = sorted(
        (r["url"], r["host_rank"])
        for r in select_round(df, budgets_df(spark, pruned_cfg), 0, pruned_cfg).collect()
    )
    got_plain = sorted(
        (r["url"], r["host_rank"])
        for r in select_round(df, budgets_df(spark, plain_cfg), 0, plain_cfg).collect()
    )
    assert got_pruned == got_plain
    assert len(got_pruned) == 51 * 30  # k=30 per host, 51 hosts
