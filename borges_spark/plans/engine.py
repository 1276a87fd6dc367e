"""CrawlEngine — the round-based distributed crawl loop.

One fetch round =
    SELECT top-k per host FROM frontier WHERE eligible(politeness, robots)
    -> vectorized fetch (join against the page store)
    -> vectorized parse (mapInPandas: decode, text, out-links)
    -> seen-check new links (Bloom pre-filter + exact anti-join)
    -> MERGE frontier state + APPEND crawl_log/metrics
    -> atomic snapshot commit.

This is the faithful distributed generalization of every loop in the
reference (SURVEY.md §3): the ECS six-script chain
(Borges/spiders/ECS/*), the Elsevier 8-thread downloader
(Elsevier/paper_xml.py:244-263), and the poll-until-empty pattern
(ECS/metadata.py:33-37). Determinism contract: every selection,
sequence number, and state transition is a pure function of
(seeds, pages, config, round) — never of partition count — so runs at
local[8] and local[32] (or N and 4N executors) produce identical
crawl logs and seen sets.

Scale notes (the 100 TB / 10^10-frontier design):
  - frontier is re-read from the committed snapshot every round: plans
    stay O(1) size across rounds (no lineage blow-up) and resume is
    free;
  - the only per-round shuffles are (a) the host window for top-k,
    (b) the anti-join for Bloom positives, (c) the frontier merge —
    all keyed, all AQE-managed; skewed hot hosts are bounded by the
    politeness budget itself (a host can contribute at most k rows);
  - fetch + parse never leave Arrow batches; no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from borges_spark.functions.urls import canonicalize_url_col, url_hash_col, url_host_col
from borges_spark.operators.frontier import (
    add_sequence_with_total,
    error_class_col,
    merge_upsert,
    route_fetch_outcomes,
)
from borges_spark.operators.politeness import PolitenessConfig, budgets_df, select_round
from borges_spark.operators.seen import BloomConfig, filter_unseen, merge_seen_shards
from borges_spark.plans.checkpoint import SnapshotStore


@dataclass(frozen=True)
class CrawlConfig:
    verbose: bool = False
    max_rounds: int = 50
    max_attempts: int = 3  # Elsevier/paper_xml.py:141
    retry_backoff_rounds: int = 1
    # 'priority' (depth-weighted) | 'opic' (cash-flow) | 'fifo' (reference insertion order)
    order_mode: str = "priority"
    initial_cash: float = 1_000_000.0  # per-seed OPIC cash (integer-valued)
    fail_every: int = 0  # inject deterministic transient 503 when pmod(url_hash, fail_every)==0
    # 'table' joins against the pages table (tests/bench); 'http' does a
    # live fetch via sources/fetcher (file:// in offline tests)
    fetch_mode: str = "table"
    fetch_timeout_s: float = 10.0
    use_bloom: bool = True
    # hot-host fetch fan-out (SURVEY.md §4 strategy 2): hosts with >= this
    # many selected rows in a round spread over `n_salts` fetch sub-keys
    hot_host_threshold: int = 1000
    n_salts: int = 8
    politeness: PolitenessConfig = field(default_factory=PolitenessConfig)
    bloom: BloomConfig = field(default_factory=BloomConfig)


_FRONTIER_COLS = [
    "url", "url_hash", "host", "depth", "priority", "discovered_seq",
    "discovered_round", "state", "attempts", "next_allowed_round",
]

_PARSE_SCHEMA = (
    "url string, url_hash bigint, host string, depth int, priority double, "
    "discovered_seq bigint, discovered_round int, state string, attempts int, "
    "next_allowed_round int, host_rank int, rank_in_round bigint, status int, "
    "lang string, text string, links array<string>, n_links int"
)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        seeds: DataFrame,
        store: SnapshotStore,
        cfg: CrawlConfig = CrawlConfig(),
        robots: DataFrame | None = None,
    ):
        self.spark = spark
        self.pages = pages
        self.seeds = seeds
        self.store = store
        self.cfg = cfg
        self.robots = robots  # (host, disallow_prefixes); reference disables robots (settings.py:23)
        self.budgets = budgets_df(spark, cfg.politeness)

    # -- initialization --------------------------------------------------
    def init_frontier(self) -> DataFrame:
        s = self.seeds
        url = canonicalize_url_col("url")
        seed_priority = (
            self.cfg.initial_cash if self.cfg.order_mode == "opic" else 1.0
        )
        rows = s.select(
            url.alias("url"),
            url_hash_col(url).alias("url_hash"),
            url_host_col(url).alias("host"),
            F.lit(0).alias("depth"),
            F.lit(float(seed_priority)).alias("priority"),
            F.col("seq").cast("long").alias("discovered_seq"),
            F.lit(0).alias("discovered_round"),
            F.lit("pending").alias("state"),
            F.lit(0).alias("attempts"),
            F.lit(0).alias("next_allowed_round"),
        )
        # duplicate seed URLs: keep the lowest seq (deterministic — the
        # simulator keeps the first in seed order; dropDuplicates would
        # keep an arbitrary row)
        from pyspark.sql import Window

        w = Window.partitionBy("url_hash").orderBy(F.col("discovered_seq").asc())
        return (
            rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # -- one round ---------------------------------------------------------
    def _apply_robots(self, eligible: DataFrame) -> DataFrame:
        if self.robots is None:
            return eligible
        rb = F.broadcast(self.robots.select("host", "disallow_prefixes"))
        joined = eligible.join(rb, "host", "left")
        blocked = F.exists(
            F.coalesce(F.col("disallow_prefixes"), F.array()),
            lambda p: F.expr("url").startswith(F.concat(F.lit("https://"), F.col("host"), p))
            | F.expr("url").startswith(F.concat(F.lit("http://"), F.col("host"), p)),
        )
        return joined.filter(~blocked).drop("disallow_prefixes")

    def run_round(
        self,
        frontier: DataFrame,
        shards: DataFrame | None,
        round_no: int,
        next_seq: int,
    ) -> tuple[DataFrame, DataFrame | None, DataFrame, DataFrame, int, int]:
        """Returns (new_frontier, new_shards, crawl_log, metrics,
        n_selected, next_seq). `shards` is the incremental Bloom seen-set
        (None when use_bloom is off or on the first round)."""
        cfg = self.cfg
        eligible = frontier.filter(
            (F.col("state") == "pending")
            & (F.col("attempts") < cfg.max_attempts)
            & (F.col("next_allowed_round") <= round_no)
        )
        eligible = self._apply_robots(eligible)
        selected = select_round(eligible, self.budgets, round_no, cfg.politeness, cfg.order_mode)

        if cfg.order_mode == "fifo":
            order = [F.col("discovered_seq").asc(), F.col("url_hash").asc()]
        else:
            order = [F.col("priority").desc(), F.col("discovered_seq").asc(), F.col("url_hash").asc()]
        selected, n_selected = add_sequence_with_total(selected, order, "rank_in_round", start=1)
        if n_selected == 0:
            return frontier, shards, None, None, 0, next_seq

        # -- fetch: equi-join against the page store ("the web") ---------
        # hot politeness buckets fan out over salted sub-keys; the salt
        # shapes the parse-stage partitioning below (in a live deployment
        # the HTTP fetch itself runs inside that host-grouped stage)
        from borges_spark.operators.credentials import salt_hot_hosts

        salted = salt_hot_hosts(selected, cfg.hot_host_threshold, cfg.n_salts)
        if cfg.fetch_mode == "http":
            # live fetch (or file:// offline): partition by the salted
            # host key first so one host's budget shares a session
            from borges_spark.sources.fetcher import fetch_urls

            salted = salted.repartition(
                self.spark.sparkContext.defaultParallelism, "host", "host_salt"
            )
            fetched = fetch_urls(salted, cfg.fetch_timeout_s).withColumn(
                "lang", F.lit(None).cast("string")
            )
        else:
            page_side = self.pages.select(
                F.col("url"), F.col("html"), F.col("lang").alias("_page_lang")
            )
            fetched = salted.join(page_side, "url", "left")
            fail_injected = (
                (F.lit(cfg.fail_every) > 0)
                & (F.pmod(F.col("url_hash"), F.lit(max(cfg.fail_every, 1))) == 0)
                & (F.col("attempts") == 0)
            )
            status = (
                F.when(F.col("html").isNull(), F.lit(404))
                .when(fail_injected, F.lit(503))
                .otherwise(F.lit(200))
            )
            fetched = fetched.withColumn("status", status).withColumn(
                "html", F.when(F.col("status") == 200, F.col("html"))
            ).withColumn("lang", F.col("_page_lang")).drop("_page_lang")

        # -- parse: Arrow-batched decode + extract ------------------------
        # partition by (host, host_salt): one host's pages batch to the
        # same Python worker (session/cache locality) unless salted hot
        parse_in = (
            fetched.select(
                *_FRONTIER_COLS, "host_salt", "host_rank", "rank_in_round", "status", "lang", "html"
            )
            .repartition(self.spark.sparkContext.defaultParallelism, "host", "host_salt")
            .drop("host_salt")
        )

        def _parse(it):
            import pandas as pd

            from borges_spark.functions.html import decode_html, extract_links, extract_text

            for pdf in it:
                ok = pdf["status"] == 200
                htmls = [decode_html(h) if o else "" for h, o in zip(pdf["html"], ok)]
                texts = [extract_text(h) if o else None for h, o in zip(htmls, ok)]
                links = [extract_links(u, h) if o else [] for u, h, o in zip(pdf["url"], htmls, ok)]
                out = pdf.drop(columns=["html"]).copy()
                out["text"] = texts
                out["links"] = links
                out["n_links"] = [len(ls) for ls in links]
                yield out

        parsed = parse_in.mapInPandas(_parse, _PARSE_SCHEMA)
        parsed = parsed.localCheckpoint(eager=True)  # small (≤ Σk per round); cut lineage

        crawl_log = parsed.select(
            F.lit(round_no).alias("round"),
            F.col("rank_in_round").cast("int"),
            "url", "host", "status", "text", "lang", "n_links",
            error_class_col().alias("error_class"),
        )

        # -- discover: explode out-links, first-occurrence dedup ----------
        exploded = parsed.select(
            F.col("rank_in_round").alias("parent_rank"),
            (F.col("depth") + 1).alias("depth"),
            F.col("priority").alias("parent_priority"),
            F.col("n_links"),
            F.posexplode_outer("links").alias("link_pos", "url"),
        ).filter(F.col("url").isNotNull())
        candidates = (
            exploded.groupBy("url")
            .agg(F.min(F.struct("parent_rank", "link_pos", "depth")).alias("first"))
            .select(
                "url",
                F.col("first.parent_rank").alias("parent_rank"),
                F.col("first.link_pos").alias("link_pos"),
                F.col("first.depth").alias("depth"),
            )
            .withColumn("url_hash", url_hash_col("url"))
            .withColumn("host", url_host_col("url"))
        )

        # OPIC cash flow (order_mode='opic'): every fetched page splits
        # its integer-valued cash equally over its out-link occurrences.
        # Integer-valued doubles keep sums exact and order-independent,
        # so accumulation is parallelism-invariant.
        contrib = None
        if cfg.order_mode == "opic":
            contrib = (
                exploded.withColumn(
                    "cash", F.floor(F.col("parent_priority") / F.col("n_links")).cast("double")
                )
                .groupBy("url")
                .agg(F.sum("cash").alias("cash_add"))
            )

        unseen = filter_unseen(candidates, frontier, shards, cfg.bloom)

        new_rows, n_new = add_sequence_with_total(
            unseen, [F.col("parent_rank").asc(), F.col("link_pos").asc(), F.col("url_hash").asc()],
            "discovered_seq", start=next_seq,
        )
        if cfg.order_mode == "opic":
            new_priority = F.coalesce(F.col("cash_add"), F.lit(0.0))
            new_rows = new_rows.join(contrib, "url", "left")
        else:
            new_priority = F.lit(1.0) / (1.0 + F.col("depth"))
        new_rows = new_rows.select(
            "url", "url_hash", "host",  # frontier column order
            F.col("depth").cast("int"),
            new_priority.alias("priority"),
            "discovered_seq",
            F.lit(round_no).alias("discovered_round"),
            F.lit("pending").alias("state"),
            F.lit(0).alias("attempts"),
            F.lit(round_no + 1).alias("next_allowed_round"),
        )

        # -- frontier state transitions -----------------------------------
        updated = route_fetch_outcomes(
            parsed.select(*_FRONTIER_COLS, "status"),
            round_no, cfg.max_attempts, cfg.retry_backoff_rounds,
        ).select(*_FRONTIER_COLS)
        merged = merge_upsert(frontier, updated, "url_hash")
        if contrib is not None:
            # cash flowing to already-known URLs accrues only to rows
            # still pending after this round's fetch routing
            cash_upd = (
                merged.filter(F.col("state") == "pending")
                .join(contrib, "url")
                .withColumn("priority", F.col("priority") + F.col("cash_add"))
                .drop("cash_add")
                .select(*_FRONTIER_COLS)
            )
            merged = merge_upsert(merged, cash_upd, "url_hash")
        new_frontier = merged.unionByName(new_rows)

        # incremental seen-set: fold only this round's new hashes in
        new_shards = shards
        if cfg.use_bloom:
            new_shards = merge_seen_shards(shards, new_rows.select("url_hash"), cfg.bloom)

        # -- lineage counters (A2: per-host per-round) ---------------------
        sched = parsed.groupBy("host").agg(
            F.count("*").alias("scheduled"),
            F.sum((F.col("status") == 200).cast("long")).alias("fetched"),
            F.sum((F.col("status") == 200).cast("long")).alias("parsed"),
            F.sum((F.col("status") != 200).cast("long")).alias("errors"),
        )
        discovered = new_rows.groupBy("host").agg(F.count("*").alias("new_urls"))
        # dedup_hits = candidate links rejected by the seen set, per host
        cand_by_host = candidates.groupBy("host").agg(F.count("*").alias("_n_cand"))
        metrics = (
            sched.join(discovered, "host", "full_outer")
            .join(cand_by_host, "host", "full_outer")
            .select(
                F.lit(round_no).alias("round"),
                "host",
                *[F.coalesce(c, F.lit(0)).alias(c) for c in ("scheduled", "fetched", "parsed", "errors", "new_urls")],
                (F.coalesce("_n_cand", F.lit(0)) - F.coalesce("new_urls", F.lit(0)))
                .cast("long")
                .alias("dedup_hits"),
            )
        )
        return new_frontier, new_shards, crawl_log, metrics, n_selected, next_seq + n_new

    # -- driver loop -------------------------------------------------------
    def fold_seeds(
        self, frontier: DataFrame, seeds: DataFrame, next_seq: int, round_no: int
    ) -> tuple[DataFrame, int]:
        """Fold a new seed batch into an existing frontier (continuous /
        streaming mode): canonicalize, drop already-known URLs, assign
        discovered_seq deterministically in seed order."""
        url = canonicalize_url_col("url")
        rows = seeds.select(
            url.alias("url"),
            url_hash_col(url).alias("url_hash"),
            F.col("seq").cast("long").alias("_seed_seq"),
        )
        unseen = rows.join(frontier.select("url_hash"), "url_hash", "left_anti")
        seeded, n = add_sequence_with_total(
            unseen, [F.col("_seed_seq").asc(), F.col("url_hash").asc()], "discovered_seq", next_seq
        )
        seed_priority = self.cfg.initial_cash if self.cfg.order_mode == "opic" else 1.0
        new_rows = seeded.select(
            "url", "url_hash", url_host_col("url").alias("host"),
            F.lit(0).alias("depth"),
            F.lit(float(seed_priority)).alias("priority"),
            "discovered_seq",
            F.lit(round_no).alias("discovered_round"),
            F.lit("pending").alias("state"),
            F.lit(0).alias("attempts"),
            F.lit(round_no).alias("next_allowed_round"),
        )
        return frontier.unionByName(new_rows), next_seq + n

    def _load_state(self, resume: bool):
        store, spark = self.store, self.spark
        if resume:
            store.gc_uncommitted()
            latest = store.latest_round()
        else:
            latest = None
        shards: DataFrame | None = None
        if latest is None:
            frontier = self.init_frontier()
            start_round = 0
            next_seq = frontier.count()
            if self.cfg.use_bloom:
                shards = merge_seen_shards(None, frontier.select("url_hash"), self.cfg.bloom)
        else:
            frontier = store.read(spark, latest, "frontier")
            start_round = latest + 1
            next_seq = int(store.manifest(latest)["meta"]["next_seq"])
            if self.cfg.use_bloom:
                try:
                    shards = store.read(spark, latest, "seen_shards")
                except Exception:
                    # older snapshot without shards: rebuild once
                    shards = merge_seen_shards(None, frontier.select("url_hash"), self.cfg.bloom)
        return frontier, shards, start_round, next_seq

    def run(
        self,
        resume: bool = True,
        seed_batch: DataFrame | None = None,
        extra_rounds: int | None = None,
    ) -> dict:
        """Run rounds until the frontier drains or the round cap.

        seed_batch: extra (url, seq) rows folded into the frontier
        before running — the continuous-mode entry used by streaming
        foreachBatch handlers (on the first batch it IS the seed list).
        extra_rounds: advance at most this many rounds past the resume
        point (streaming micro-batch pacing); default: cfg.max_rounds
        as an absolute cap.
        """
        store, spark = self.store, self.spark
        frontier, shards, start_round, next_seq = self._load_state(resume)
        limit = self.cfg.max_rounds if extra_rounds is None else start_round + extra_rounds
        if seed_batch is not None:
            if start_round == 0:
                self.seeds = seed_batch
                frontier = self.init_frontier()
                next_seq = frontier.count()
                if self.cfg.use_bloom:
                    shards = merge_seen_shards(None, frontier.select("url_hash"), self.cfg.bloom)
            else:
                frontier, new_next = self.fold_seeds(frontier, seed_batch, next_seq, start_round)
                if self.cfg.use_bloom and new_next > next_seq:
                    added = frontier.filter(F.col("discovered_seq") >= next_seq)
                    shards = merge_seen_shards(shards, added.select("url_hash"), self.cfg.bloom)
                next_seq = new_next

        rounds_run = 0
        round_stats: list[dict] = []
        for r in range(start_round, limit):
            import time as _time

            t0 = _time.time()
            new_frontier, new_shards, crawl_log, metrics, n_sel, next_seq = self.run_round(
                frontier, shards, r, next_seq
            )
            t1 = _time.time()
            if n_sel == 0:
                break
            datasets = {"frontier": new_frontier, "crawl_log": crawl_log, "metrics": metrics}
            if new_shards is not None:
                datasets["seen_shards"] = new_shards
            store.write_snapshot(
                r,
                datasets,
                meta={"next_seq": next_seq, "n_selected": n_sel, "compute_s": round(t1 - t0, 2)},
            )
            round_stats.append(
                {
                    "round": r,
                    "n_selected": n_sel,
                    "compute_s": round(t1 - t0, 2),
                    "commit_s": round(_time.time() - t1, 2),
                }
            )
            if self.cfg.verbose:
                print(
                    f"[round {r}] selected={n_sel} next_seq={next_seq} "
                    f"compute={t1 - t0:.1f}s commit={_time.time() - t1:.1f}s",
                    flush=True,
                )
            # snapshot-backed re-reads: O(1) plan size per round
            frontier = store.read(spark, r, "frontier")
            shards = store.read(spark, r, "seen_shards") if new_shards is not None else None
            rounds_run += 1

        final_round = store.latest_round()
        return {
            "rounds_run": rounds_run,
            "final_round": final_round,
            "next_seq": next_seq,
            "frontier_size": frontier.count(),
            "round_stats": round_stats,
        }

    # -- readers -------------------------------------------------------------
    def crawl_log(self) -> DataFrame:
        paths = [f"{self.store._round_dir(r)}/crawl_log" for r in self.store.rounds()]
        return self.spark.read.parquet(*paths)

    def metrics(self) -> DataFrame:
        paths = [f"{self.store._round_dir(r)}/metrics" for r in self.store.rounds()]
        return self.spark.read.parquet(*paths)

    def frontier(self) -> DataFrame:
        latest = self.store.latest_round()
        if latest is None:
            return self.init_frontier()
        return self.store.read(self.spark, latest, "frontier")
