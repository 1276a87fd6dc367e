"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline suite seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {"throughput_low": urls/s at local[N_LOW],
             "throughput_high": urls/s at local[N_HIGH],
             "scaling_efficiency": ...}}

The crawl block is the BASELINE.json north-rule evidence: the same
fetch-round pipeline (frontier select -> fetch-join -> Arrow parse ->
seen-check -> merge) run at two parallelism levels on the same input;
scaling_efficiency = T_high / (T_low * (N_HIGH/N_LOW)).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BORGES_BENCH_LOW (default 8).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOW = int(os.environ.get("BORGES_BENCH_LOW", "8"))

HEADLINE = [
    "frontier_round",
    "seen_antijoin",
    "scan_agg",
    "broadcast_join",
    "topk_per_group",
    "window_running",
    "sessionize",
    "dedup_exact",
    "token_count",
    "lang_id",
    "simhash",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "embedding_neardup",
    "ann_bruteforce",
]


def _fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        # a stopped context lingers briefly; getOrCreate below makes a new one
    from borges_spark.session import get_spark

    return get_spark(cores=cores, app_name=f"borges_bench_{cores}",
                     shuffle_partitions=2 * cores)


def run_headline(spark) -> dict[str, float]:
    import __spark_entry__ as E

    qs = E.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        df = fn(spark, SF_DIR)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def run_crawl_bench(spark, n_pages: int = 200_000, rounds: int = 3) -> dict:
    """Fixed crawl workload; returns urls-scheduled+pages-parsed per sec.

    Steady-state throughput is measured on the final (largest) round —
    the regime that matters at 10^10-frontier scale, where per-round
    driver overhead is amortized over millions of URLs.
    """
    from pyspark.sql import functions as F

    from borges_spark.operators.politeness import PolitenessConfig
    from borges_spark.plans.checkpoint import SnapshotStore
    from borges_spark.plans.engine import CrawlConfig, CrawlEngine
    from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds

    web = WebConfig(n_pages=n_pages, n_hosts=400, out_degree=8, n_seeds=8000, hot_frac=0.1)
    pol = PolitenessConfig(default_delay_s=0.02, round_budget_s=60.0)  # k=3000/host/round
    cfg = CrawlConfig(max_rounds=rounds, order_mode="priority", use_bloom=True, politeness=pol)

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    root = tempfile.mkdtemp(prefix="borges_bench_store_", dir=base)
    try:
        pages = gen_pages(spark, web)
        # materialize pages once so generation cost isn't in the loop
        pages_path = os.path.join(root, "pages")
        pages.write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        engine = CrawlEngine(spark, pages, gen_seeds(spark, web), SnapshotStore(os.path.join(root, "store")), cfg)
        t0 = time.time()
        summary = engine.run(resume=False)
        wall = time.time() - t0
        m = engine.metrics().agg(
            F.sum("scheduled").alias("s"), F.sum("parsed").alias("p")
        ).collect()[0]
        scheduled, parsed = int(m["s"]), int(m["p"])
        last = summary["round_stats"][-1]
        last_m = (
            engine.metrics()
            .filter(F.col("round") == last["round"])
            .agg(F.sum("scheduled").alias("s"), F.sum("parsed").alias("p"))
            .collect()[0]
        )
        steady_wall = last["compute_s"] + last["commit_s"]
        return {
            "wall_s": round(wall, 2),
            "scheduled": scheduled,
            "parsed": parsed,
            "urls_per_s": round((scheduled + parsed) / wall, 1),
            "steady_urls_per_s": round((int(last_m["s"]) + int(last_m["p"])) / steady_wall, 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    spark = _fresh_spark(LOW)
    crawl_low = run_crawl_bench(spark)

    spark = _fresh_spark(CPUS)
    crawl_high = run_crawl_bench(spark)
    queries = run_headline(spark)

    ratio = CPUS / LOW
    eff_total = crawl_high["urls_per_s"] / (crawl_low["urls_per_s"] * ratio)
    eff_steady = crawl_high["steady_urls_per_s"] / (crawl_low["steady_urls_per_s"] * ratio)
    out = {
        "metric": "frontier URLs scheduled + pages parsed per second",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "crawl": {
            "cores_low": LOW,
            "cores_high": CPUS,
            "throughput_low_urls_per_s": crawl_low["urls_per_s"],
            "throughput_high_urls_per_s": crawl_high["urls_per_s"],
            "steady_low_urls_per_s": crawl_low["steady_urls_per_s"],
            "steady_high_urls_per_s": crawl_high["steady_urls_per_s"],
            "wall_low_s": crawl_low["wall_s"],
            "wall_high_s": crawl_high["wall_s"],
            "scheduled": crawl_high["scheduled"],
            "parsed": crawl_high["parsed"],
            "scaling_efficiency": round(eff_total, 3),
            "scaling_efficiency_steady": round(eff_steady, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
