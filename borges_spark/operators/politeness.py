"""Per-host politeness scheduling: token-bucket budgets + top-k windows.

The reference enforces politeness with blocking sleeps in serial loops
(DOWNLOAD_DELAY=1 Borges/settings.py:31; time.sleep(5)
Borges/spiders/ECS/metadata.py:34; 1.25s AIP/download_paper_v2023.py:117;
0.1s Elsevier/paper_xml.py:137) and a time-of-day gate
(ECS/paper_html.py:39-42). A distributed engine cannot sleep on
executors; instead each fetch round has a wall-clock budget
`round_budget_s`, and a host's token bucket admits

    k(host)      = floor(round_budget_s / delay_s)   URLs per round
    every_m(host)= ceil(delay_s / round_budget_s)    rounds between visits
                   (for delays longer than a round; k=1 on those rounds)

Budgets are a pure function of (config, round) — NEVER of partition
count — so N-core and 4N-core runs select identical URLs (the
determinism requirement in SURVEY.md §7).

Selection itself is the W1 window operator (SURVEY.md §2.5):
row_number over (host, order) <= k — a single shuffle on host.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PolitenessConfig:
    default_delay_s: float = 1.0  # Borges/settings.py:31
    round_budget_s: float = 60.0
    host_delays: tuple[tuple[str, float], ...] = ()
    # time-of-day gates per host: (host, start_hour, end_hour); a host is
    # eligible only when round_hour is inside [start, end) (wrapping) —
    # models ECS/paper_html.py:39-42.
    host_windows: tuple[tuple[str, int, int], ...] = ()
    start_hour: int = 0  # hour-of-day of round 0
    # skew protection for the selection window: when every host budget k
    # is <= skew_prune_max_k, a salted pre-window keeps only the top-k
    # per (host, salt) so a hot host owning half the frontier never
    # funnels all its pending rows through ONE sort task — the exact
    # window then re-ranks <= n_salts*k survivors per host. Disabled for
    # huge budgets where pruning keeps ~everything (pure overhead).
    skew_prune_salts: int = 8
    skew_prune_max_k: int = 10_000


def budget_for(delay_s: float, round_budget_s: float) -> tuple[int, int]:
    """(k per eligible round, every_m rounds) for one host. k is capped
    at 2^30 ('effectively unlimited') so it always fits the budget
    table's int column — a sub-microsecond delay must not overflow."""
    if delay_s <= 0:
        return (1 << 30, 1)
    # epsilon guards the binary-float quotient (60.0/0.1 -> 599.999...)
    k = int(round_budget_s / delay_s + 1e-9)
    if k >= 1:
        return (min(k, 1 << 30), 1)
    return (1, int(math.ceil(delay_s / round_budget_s)))


def budgets_df(spark, cfg: PolitenessConfig) -> DataFrame:
    """Small per-host override table (only hosts with non-default config),
    broadcast-joined at selection; every other host falls back to the
    default budget via coalesce — no scan over the (huge) host universe.
    """
    delays = dict(cfg.host_delays)
    windows = {h: (a, b) for h, a, b in cfg.host_windows}

    def rows_for(host: str):
        d = delays.get(host, cfg.default_delay_s)
        k, m = budget_for(d, cfg.round_budget_s)
        w = windows.get(host)
        return (host, k, m, w[0] if w else None, w[1] if w else None)

    host_list = sorted(set(delays) | set(windows))
    schema = "host string, k int, every_m int, win_start int, win_end int"
    if not host_list:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame([rows_for(h) for h in host_list], schema)


def budgets_from_robots(robots: DataFrame, cfg: PolitenessConfig) -> DataFrame:
    """Per-host budget rows derived from robots.txt Crawl-delay —
    column math over the robots table (same (k, every_m) formula as
    `budget_for`, bit-for-bit), so a million-host robots table never
    passes through the driver. Precedence is applied by the ENGINE when
    it merges these with the config budgets: an explicit config
    host_delays entry keeps its k/every_m (when/otherwise on the joined
    row), every other host coalesces to the robots-derived values."""
    d = F.col("crawl_delay").cast("double")
    # least() BEFORE the int cast: a sub-microsecond delay would overflow
    # int32 and null out (budget_for caps at the same 2^30)
    k_raw = F.least(
        F.floor(F.lit(cfg.round_budget_s) / d + F.lit(1e-9)), F.lit(float(1 << 30))
    ).cast("int")
    k = F.when(k_raw >= 1, k_raw).otherwise(F.lit(1))
    every = F.when(k_raw >= 1, F.lit(1)).otherwise(
        F.ceil(d / F.lit(cfg.round_budget_s)).cast("int")
    )
    return robots.filter(d.isNotNull() & (d > 0)).select(
        "host",
        k.alias("k"),
        every.alias("every_m"),
        F.lit(None).cast("int").alias("win_start"),
        F.lit(None).cast("int").alias("win_end"),
    )


def hour_of_round(r: int, cfg: PolitenessConfig) -> int:
    return (cfg.start_hour + r) % 24


def select_round(
    eligible: DataFrame,
    budgets: DataFrame,
    round_no: int,
    cfg: PolitenessConfig,
    order_mode: str = "priority",
    max_k_hint: int | None = None,
) -> DataFrame:
    """Pick this round's fetch set: top-k per host under the budget.

    eligible: frontier rows already filtered to state='pending',
    attempts not exhausted, next_allowed_round <= round_no.

    max_k_hint: the largest k present in the `budgets` table, when the
    caller knows it (the engine computes it once — robots-derived budget
    rows are invisible to the config-only heuristic below, and a
    near-unbounded robots k would otherwise engage the skew prune as
    pure overhead).

    Total order (documented, tie-proof — SURVEY.md §7 'what's hard'):
      priority mode: priority DESC, discovered_seq ASC, url_hash ASC
      fifo mode (reference-equivalent insertion order):
                     discovered_seq ASC, url_hash ASC
    """
    hour = hour_of_round(round_no, cfg)
    dk, dm = budget_for(cfg.default_delay_s, cfg.round_budget_s)
    joined = eligible.join(F.broadcast(budgets), "host", "left")
    joined = joined.withColumn("k", F.coalesce("k", F.lit(dk))).withColumn(
        "every_m", F.coalesce("every_m", F.lit(dm))
    )

    # cadence gate for slow hosts + time-of-day gate
    gate = F.pmod(F.lit(round_no), F.col("every_m")) == 0
    in_window = F.when(
        F.col("win_start").isNull(), F.lit(True)
    ).otherwise(
        F.when(
            F.col("win_start") <= F.col("win_end"),
            (F.lit(hour) >= F.col("win_start")) & (F.lit(hour) < F.col("win_end")),
        ).otherwise(  # wrapping window, e.g. 18 -> 7
            (F.lit(hour) >= F.col("win_start")) | (F.lit(hour) < F.col("win_end"))
        )
    )
    joined = joined.filter(gate & in_window)

    # multi-tier frontiers (engine n_stages > 1): stage ASC leads the
    # per-host order — earlier-tier rows drain first, mirroring the
    # reference's run-the-metadata-script-then-the-html-script chain.
    # Single-tier frontiers carry a constant stage 0, so the key is a
    # no-op there.
    lead = [F.col("stage").asc()] if "stage" in eligible.columns else []
    if order_mode == "fifo":
        order = lead + [F.col("discovered_seq").asc(), F.col("url_hash").asc()]
    else:
        order = lead + [
            F.col("priority").desc(), F.col("discovered_seq").asc(), F.col("url_hash").asc()
        ]

    # hot-host skew pre-prune: the true per-host top-k is a subset of the
    # union of per-(host, salt) top-k's, so pruning first is lossless; the
    # salt is a pure function of url_hash, keeping selection deterministic
    # and parallelism-invariant. Only engaged when k is bounded enough
    # for the prune to actually discard rows.
    ks = [budget_for(d, cfg.round_budget_s)[0] for _, d in cfg.host_delays] + [dk]
    if max_k_hint is not None:
        ks.append(max_k_hint)
    if cfg.skew_prune_salts > 1 and max(ks) <= cfg.skew_prune_max_k:
        salt = F.pmod(F.col("url_hash"), F.lit(cfg.skew_prune_salts)).cast("int")
        w_pre = Window.partitionBy("host", "_salt").orderBy(*order)
        joined = (
            joined.withColumn("_salt", salt)
            .withColumn("_pre_rank", F.row_number().over(w_pre))
            .filter(F.col("_pre_rank") <= F.col("k"))
            .drop("_salt", "_pre_rank")
        )

    w = Window.partitionBy("host").orderBy(*order)
    return (
        joined.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= F.col("k"))
        .drop("k", "every_m", "win_start", "win_end")
    )
