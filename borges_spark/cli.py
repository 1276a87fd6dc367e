"""CLI entry points — the spark-submit deployment surface.

Cluster usage (the north-rule invocation):

    # package the engine for the executors
    cd /root/repo && zip -r borges_spark.zip borges_spark

    # generate a synthetic web (or point --pages at a real Iceberg/
    # parquet pages table of shape url/warc_ts/html/text/lang)
    spark-submit --py-files borges_spark.zip -m borges_spark.cli ...

    spark-submit --py-files borges_spark.zip cli.py gen-web \
        --out /data/web --pages 10000000 --hosts 100000

    spark-submit --py-files borges_spark.zip cli.py crawl \
        --pages /data/web/pages --seeds /data/web/seeds \
        --store /data/crawl_store --rounds 50 --resume

In local mode the same commands run with `python -m borges_spark.cli`.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from pyspark.sql import SparkSession

    existing = SparkSession.getActiveSession()
    if existing is not None:
        return existing
    if getattr(args, "local_cores", None):
        from borges_spark.session import get_spark

        return get_spark(cores=args.local_cores)
    # under spark-submit the session config comes from the submit args
    return SparkSession.builder.getOrCreate()


def cmd_gen_web(args) -> int:
    from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds

    spark = _spark(args)
    cfg = WebConfig(
        n_pages=args.pages, n_hosts=args.hosts, out_degree=args.out_degree,
        n_seeds=args.seeds, hot_frac=args.hot_frac,
    )
    gen_pages(spark, cfg).write.mode("overwrite").parquet(f"{args.out}/pages")
    gen_seeds(spark, cfg).write.mode("overwrite").parquet(f"{args.out}/seeds")
    print(json.dumps({"pages": args.pages, "hosts": args.hosts, "out": args.out}))
    return 0


def cmd_crawl(args) -> int:
    from borges_spark.operators.politeness import PolitenessConfig
    from borges_spark.plans.checkpoint import SnapshotStore
    from borges_spark.plans.engine import CrawlConfig, CrawlEngine

    spark = _spark(args)
    pages = spark.read.parquet(args.pages)
    seeds = spark.read.parquet(args.seeds)
    pol = PolitenessConfig(default_delay_s=args.delay, round_budget_s=args.round_budget)
    cfg = CrawlConfig(
        verbose=True, max_rounds=args.rounds, order_mode=args.order_mode,
        use_bloom=not args.no_bloom, politeness=pol,
    )
    engine = CrawlEngine(spark, pages, seeds, SnapshotStore(args.store), cfg)
    summary = engine.run(resume=args.resume)
    print(json.dumps(summary))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="borges_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-web", help="generate a deterministic synthetic web")
    g.add_argument("--out", required=True)
    g.add_argument("--pages", type=int, default=100_000)
    g.add_argument("--hosts", type=int, default=1000)
    g.add_argument("--out-degree", type=int, default=8)
    g.add_argument("--seeds", type=int, default=1000)
    g.add_argument("--hot-frac", type=float, default=0.1)
    g.add_argument("--local-cores", type=int, default=0)
    g.set_defaults(fn=cmd_gen_web)

    c = sub.add_parser("crawl", help="run the crawl engine")
    c.add_argument("--pages", required=True)
    c.add_argument("--seeds", required=True)
    c.add_argument("--store", required=True)
    c.add_argument("--rounds", type=int, default=10)
    c.add_argument("--delay", type=float, default=1.0)
    c.add_argument("--round-budget", type=float, default=60.0)
    c.add_argument("--order-mode", choices=["priority", "fifo"], default="priority")
    c.add_argument("--no-bloom", action="store_true")
    c.add_argument("--resume", action="store_true")
    c.add_argument("--local-cores", type=int, default=0)
    c.set_defaults(fn=cmd_crawl)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
