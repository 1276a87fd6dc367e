"""End-to-end crawl equivalence + resume determinism (SURVEY.md §5.3/5.4).

The distributed engine and the single-process reference simulator run
on the same synthetic web, seeds and politeness budget, and must agree:
  (a) final URL-seen set exactly,
  (b) per-round crawl ordering exactly,
  (c) extracted text byte-equal to the pages.text oracle column.
"""

import pytest
from pyspark.sql import functions as F

from borges_spark.operators.politeness import PolitenessConfig
from borges_spark.plans.checkpoint import SnapshotStore
from borges_spark.plans.engine import CrawlConfig, CrawlEngine
from borges_spark.plans.simulator import simulate_crawl
from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds

WEB = WebConfig(n_pages=400, n_hosts=6, out_degree=3, n_seeds=4, hot_frac=0.3)
POL = PolitenessConfig(default_delay_s=5.0, round_budget_s=240.0)  # k=48/host/round


def _setup(spark, tmp_path, order_mode="fifo", fail_every=0, max_rounds=6, use_bloom=True):
    pages = gen_pages(spark, WEB)
    seeds = gen_seeds(spark, WEB)
    cfg = CrawlConfig(
        max_rounds=max_rounds, order_mode=order_mode, fail_every=fail_every,
        use_bloom=use_bloom, politeness=POL,
    )
    store = SnapshotStore(str(tmp_path / "store"))
    return CrawlEngine(spark, pages, seeds, store, cfg), pages, seeds


def _sim(spark, pages, seeds, order_mode="fifo", fail_every=0, max_rounds=12):
    page_rows = pages.select("url", "html").collect()
    pages_d = {r["url"]: bytes(r["html"]) for r in page_rows}
    seed_rows = [(r["url"], r["seq"]) for r in seeds.collect()]
    hashes = {
        r["url"]: r["h"]
        for r in pages.select("url").withColumn("h", F.xxhash64("url")).collect()
    }
    # hashes for URLs that 404 (relative links to missing pages)
    return pages_d, seed_rows, hashes


def _all_url_hashes(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r["url"]: r["h"] for r in df.withColumn("h", F.xxhash64("url")).collect()}


@pytest.mark.parametrize("order_mode", ["fifo", "priority", "opic"])
def test_engine_matches_simulator(spark, tmp_path, order_mode):
    engine, pages, seeds = _setup(spark, tmp_path, order_mode=order_mode, fail_every=11)
    summary = engine.run(resume=False)
    assert summary["rounds_run"] > 2

    log = engine.crawl_log().orderBy("round", "rank_in_round").collect()
    frontier = engine.frontier()

    pages_d, seed_rows, _ = _sim(spark, pages, seeds)
    # simulator needs hashes for every URL it will ever see
    seen_urls = [r["url"] for r in frontier.select("url").collect()]
    hashes = _all_url_hashes(spark, seen_urls)
    sim = simulate_crawl(
        pages_d, seed_rows, hashes, politeness=POL, order_mode=order_mode,
        max_rounds=6, fail_every=11,
    )

    got = [(r["round"], r["rank_in_round"], r["url"], r["status"]) for r in log]
    want = [(t[0], t[1], t[2], t[3]) for t in sim.crawl_log]
    assert got == want

    engine_seen = set(seen_urls)
    assert engine_seen == sim.seen_urls


def test_text_byte_identical(spark, tmp_path):
    engine, pages, _ = _setup(spark, tmp_path)
    engine.run(resume=False)
    log = engine.crawl_log().filter(F.col("status") == 200).alias("l")
    joined = log.join(pages.alias("p"), F.col("l.url") == F.col("p.url"), "inner")
    n_mismatch = joined.filter(F.col("l.text") != F.col("p.text")).count()
    n_ok = joined.count()
    assert n_ok > 0
    assert n_mismatch == 0


def test_resume_determinism(spark, tmp_path):
    # uninterrupted run
    engine_a, _, _ = _setup(spark, tmp_path / "a", max_rounds=5)
    engine_a.run(resume=False)
    log_a = [(r["round"], r["rank_in_round"], r["url"], r["status"])
             for r in engine_a.crawl_log().orderBy("round", "rank_in_round").collect()]

    # killed after 2 rounds, then resumed
    engine_b, _, _ = _setup(spark, tmp_path / "b", max_rounds=2)
    engine_b.run(resume=False)
    engine_b2, _, _ = _setup(spark, tmp_path / "b", max_rounds=5)
    engine_b2.run(resume=True)
    log_b = [(r["round"], r["rank_in_round"], r["url"], r["status"])
             for r in engine_b2.crawl_log().orderBy("round", "rank_in_round").collect()]

    assert log_a == log_b
    fa = {r["url"]: (r["state"], r["discovered_seq"]) for r in engine_a.frontier().collect()}
    fb = {r["url"]: (r["state"], r["discovered_seq"]) for r in engine_b2.frontier().collect()}
    assert fa == fb


def test_bloom_and_exact_paths_agree(spark, tmp_path):
    engine_a, _, _ = _setup(spark, tmp_path / "bloom", use_bloom=True, max_rounds=4)
    engine_b, _, _ = _setup(spark, tmp_path / "exact", use_bloom=False, max_rounds=4)
    engine_a.run(resume=False)
    engine_b.run(resume=False)
    la = [(r["round"], r["rank_in_round"], r["url"]) for r in engine_a.crawl_log().orderBy("round", "rank_in_round").collect()]
    lb = [(r["round"], r["rank_in_round"], r["url"]) for r in engine_b.crawl_log().orderBy("round", "rank_in_round").collect()]
    assert la == lb


def test_metrics_lineage(spark, tmp_path):
    engine, _, _ = _setup(spark, tmp_path, max_rounds=4)
    engine.run(resume=False)
    m = engine.metrics()
    total_sched = m.agg(F.sum("scheduled")).collect()[0][0]
    total_log = engine.crawl_log().count()
    assert total_sched == total_log
    assert m.filter(F.col("fetched") > F.col("scheduled")).count() == 0


def test_equivalence_under_politeness_gates(spark, tmp_path):
    """Engine == simulator with per-host delays (cadence gating) and a
    time-of-day window active — the full politeness surface."""
    pol = PolitenessConfig(
        default_delay_s=5.0,
        round_budget_s=240.0,
        host_delays=(("h0.example.com", 600.0),),  # every 3rd round, k=1
        host_windows=(("h1.example.com", 18, 7),),  # night window
        start_hour=20,  # open at round 0; closes as rounds tick past 7am
    )
    pages = gen_pages(spark, WEB)
    seeds = gen_seeds(spark, WEB)
    cfg = CrawlConfig(max_rounds=6, order_mode="fifo", politeness=pol)
    engine = CrawlEngine(spark, pages, seeds, SnapshotStore(str(tmp_path / "s")), cfg)
    engine.run(resume=False)

    log = engine.crawl_log().orderBy("round", "rank_in_round").collect()
    pages_d = {r["url"]: bytes(r["html"]) for r in pages.select("url", "html").collect()}
    seed_rows = [(r["url"], r["seq"]) for r in seeds.collect()]
    seen_urls = [r["url"] for r in engine.frontier().select("url").collect()]
    hashes = _all_url_hashes(spark, seen_urls)
    sim = simulate_crawl(
        pages_d, seed_rows, hashes, politeness=pol, order_mode="fifo", max_rounds=6
    )
    got = [(r["round"], r["rank_in_round"], r["url"], r["status"]) for r in log]
    want = [(t[0], t[1], t[2], t[3]) for t in sim.crawl_log]
    assert got == want
    assert set(seen_urls) == sim.seen_urls
    # the gates actually bit: h0 absent in non-multiple-of-3 rounds
    h0_rounds = {r["round"] for r in log if r["host"] == "h0.example.com"}
    assert h0_rounds and all(r % 3 == 0 for r in h0_rounds)


def test_two_tier_matches_simulator(spark, tmp_path):
    """Native chained-crawl stages (ECS metadata -> full-HTML,
    paper_html.py:43): every 200 at stage 0 re-enters pending at stage 1
    under the stage-1 hour window; engine and simulator must agree on
    (round, rank, url, status, stage) exactly, and every fetched URL
    must appear once per tier."""
    pages = gen_pages(spark, WEB)
    seeds = gen_seeds(spark, WEB)
    # stage 1 opens at hour >= 2 (start_hour=0, hour == round here), so
    # the first tier-1 fetches are forced to wait for round 2+
    pol = PolitenessConfig(default_delay_s=5.0, round_budget_s=240.0)
    cfg = CrawlConfig(
        max_rounds=10, order_mode="fifo", fail_every=11, use_bloom=True,
        politeness=pol, n_stages=2, stage_windows=(None, (2, 23)),
    )
    engine = CrawlEngine(spark, pages, seeds, SnapshotStore(str(tmp_path / "s")), cfg)
    engine.run(resume=False)

    log = engine.crawl_log().orderBy("round", "rank_in_round").collect()
    frontier = engine.frontier()
    pages_d, seed_rows, _ = _sim(spark, pages, seeds)
    seen_urls = [r["url"] for r in frontier.select("url").collect()]
    hashes = _all_url_hashes(spark, seen_urls)
    sim = simulate_crawl(
        pages_d, seed_rows, hashes, politeness=pol, order_mode="fifo",
        max_rounds=10, fail_every=11, n_stages=2, stage_windows=(None, (2, 23)),
    )
    got = [(r["round"], r["rank_in_round"], r["url"], r["status"], r["stage"]) for r in log]
    want = [(t[0], t[1], t[2], t[3], t[5]) for t in sim.crawl_log]
    assert got == want
    assert {r["url"] for r in frontier.select("url").collect()} == sim.seen_urls

    # chained semantics: every 200-fetched stage-0 URL reappears at
    # stage 1 (windows permitting within the round budget)
    s0 = {t[2] for t in sim.crawl_log if t[3] == 200 and t[5] == 0}
    s1 = {t[2] for t in sim.crawl_log if t[5] == 1}
    assert s1 and s1 <= s0


def test_bucketed_frontier_reregisters_in_fresh_catalog(spark, tmp_path):
    """Resume in a NEW session: the bucketed frontier table is gone from
    the (session-scoped) catalog, so store.read must re-register the
    external bucketed table over the committed files — same rows, and
    the re-registered scan still engages its bucket layout."""
    import contextlib
    import io

    engine, _, _ = _setup(spark, tmp_path, max_rounds=2)
    engine.run(resume=False)
    store = engine.store
    latest = store.latest_round()
    before = sorted(
        (r["url_hash"], r["state"]) for r in store.read(spark, latest, "frontier").collect()
    )
    spark.sql(f"DROP TABLE IF EXISTS {store._frontier_table(latest)}")  # fresh-session stand-in
    frontier = store.read(spark, latest, "frontier")
    after = sorted((r["url_hash"], r["state"]) for r in frontier.collect())
    assert after == before and len(after) > 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        frontier.groupBy("url_hash").count().explain("formatted")
    assert "Bucketed: true" in buf.getvalue()


def test_resume_rebuilds_shards_on_format_mismatch(spark, tmp_path):
    """Cross-version resume hazard (round-5 fix): shard blobs written by
    an older hash-derivation version must NOT be probed — the current
    derivation would read them wrong and produce false negatives
    (already-crawled URLs readmitted, silently re-crawled). The manifest
    pins seen_filter_format; on mismatch _load_state rebuilds the shards
    from the frontier. Simulate the hazard maximally: mark the committed
    snapshot as format v1 AND zero every bloom blob (a zeroed bloom
    answers 'definitely new' for everything — the worst-case stale
    filter). A resume that probed the stale blobs would duplicate rows;
    the rebuild path must reproduce the uninterrupted run exactly."""
    import json
    import os

    # uninterrupted 5-round run
    engine_a, _, _ = _setup(spark, tmp_path / "a", max_rounds=5)
    engine_a.run(resume=False)
    log_a = [(r["round"], r["rank_in_round"], r["url"], r["status"])
             for r in engine_a.crawl_log().orderBy("round", "rank_in_round").collect()]

    # 2 rounds, then tamper the committed snapshot: old format + poisoned blobs
    engine_b, _, _ = _setup(spark, tmp_path / "b", max_rounds=2)
    engine_b.run(resume=False)
    store = engine_b.store
    latest = store.latest_round()
    mpath = os.path.join(store._round_dir(latest), "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["meta"]["seen_filter_format"] = 1
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    shard_dir = os.path.join(store._round_dir(latest), "seen_shards")
    poisoned = (
        spark.read.parquet(shard_dir)
        .withColumn("bloom_bits", F.expr("cast(repeat(x'00', length(bloom_bits)) as binary)"))
        .collect()
    )
    spark.createDataFrame(poisoned, spark.read.parquet(shard_dir).schema) \
        .write.mode("overwrite").parquet(shard_dir)

    engine_b2, _, _ = _setup(spark, tmp_path / "b", max_rounds=5)
    engine_b2.run(resume=True)
    log_b = [(r["round"], r["rank_in_round"], r["url"], r["status"])
             for r in engine_b2.crawl_log().orderBy("round", "rank_in_round").collect()]
    assert log_b == log_a

    # duplicate-free frontier (a probed stale filter would readmit URLs)
    fb = engine_b2.frontier()
    assert fb.count() == fb.select("url").distinct().count()
    # and the NEW manifests re-pin the current format
    from borges_spark.operators.seen import SEEN_FILTER_FORMAT
    assert store.manifest(store.latest_round())["meta"]["seen_filter_format"] == SEEN_FILTER_FORMAT
