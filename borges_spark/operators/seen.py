"""URL-seen set: sharded Bloom pre-filter + exact anti-join tier.

The reference's seen set is a keyed `find_one` probe before every insert
(Borges/db_scripts/insert_jl.py:37-38, Borges/spiders/AIP/
paper_index.py:142-143) plus Scrapy's request dupefilter
(Borges/settings.py:103). At 10^10 URLs that becomes:

  1. a *sharded Bloom filter* over `xxhash64(canonical_url)`, built
     distributed (one `applyInPandas` per shard), broadcast to
     executors, probed by a vectorized pandas UDF — this is only a
     shuffle-volume reducer: candidates that miss the Bloom are
     *definitely new* and skip the join entirely;
  2. an *exact left-anti join* against the frontier for the Bloom
     positives — correctness never depends on the filter (no false
     negatives by construction), so the final seen set is exact.

Spill tier: shards whose fill ratio exceeds `max_fill` are marked
'exact' (cuckoo-style overflow) — their candidates always take the
exact join, keeping false-positive rates bounded on hot shards.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORD_BITS = 64


@dataclass(frozen=True)
class BloomConfig:
    n_shards: int = 16
    bits_per_shard: int = 1 << 20  # 128 KiB / shard
    n_hashes: int = 5
    max_fill: float = 0.5  # above this a shard spills to the exact tier
    # probe strategy: 'broadcast' collects the shards to the driver and
    # broadcasts them (right for small filters); 'cogroup' probes
    # executor-side via a shard-keyed cogroup (no driver collect — the
    # only strategy that works once the filter is sized for 10^9+ keys);
    # 'auto' picks by total filter size vs broadcast_max_bytes
    probe: str = "auto"
    broadcast_max_bytes: int = 32 * 1024 * 1024

    @classmethod
    def sized_for(
        cls,
        expected_keys: int,
        bits_per_key: int = 12,
        shard_bits: int = 1 << 23,
        **kw,
    ) -> "BloomConfig":
        """Size the filter from expected seen-set cardinality: ~12
        bits/key keeps the fill ratio near 1-e^(-5/12) ≈ 0.34 < max_fill
        at capacity (k=5 hashes), i.e. the shards never spill to the
        exact tier below `expected_keys`. 10^10 URLs => ~15 GB of shards
        spread over ~14k 1-MiB shards — executor-resident (cogroup
        probe), never a driver broadcast."""
        total_bits = max(expected_keys, 1) * bits_per_key
        n_shards = max(1, -(-total_bits // shard_bits))
        return cls(n_shards=int(n_shards), bits_per_shard=int(shard_bits), **kw)

    @property
    def total_bytes(self) -> int:
        return self.n_shards * self.bits_per_shard // 8


def _positions(hashes: np.ndarray, cfg: BloomConfig) -> tuple[np.ndarray, np.ndarray]:
    """k double-hashed bit positions per input hash -> (rows, positions)."""
    h = hashes.astype(np.uint64)
    h1 = h
    h2 = (h * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1))
    ks = np.arange(cfg.n_hashes, dtype=np.uint64)
    pos = (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(cfg.bits_per_shard)
    rows = np.repeat(np.arange(len(h)), cfg.n_hashes)
    return rows, pos.reshape(-1)


def _build_shard(pdf: pd.DataFrame, cfg: BloomConfig) -> pd.DataFrame:
    shard = int(pdf["shard"].iloc[0])
    bits = np.zeros(cfg.bits_per_shard // _WORD_BITS, dtype=np.uint64)
    _, pos = _positions(pdf["url_hash"].to_numpy(), cfg)
    np.bitwise_or.at(bits, (pos // _WORD_BITS).astype(np.int64), np.uint64(1) << (pos % _WORD_BITS))
    fill = float(np.unpackbits(bits.view(np.uint8)).mean())
    tier = "exact" if fill > cfg.max_fill else "bloom"
    return pd.DataFrame(
        {"shard": [shard], "tier": [tier], "n_urls": [len(pdf)], "bloom_bits": [bits.tobytes()]}
    )


SEEN_SHARDS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("n_urls", T.LongType(), False),
        T.StructField("bloom_bits", T.BinaryType(), False),
    ]
)


def build_seen_shards(seen_hashes: DataFrame, cfg: BloomConfig = BloomConfig()) -> DataFrame:
    """Distributed Bloom build: one shard per group, one pass over hashes.

    seen_hashes: DataFrame with a `url_hash` bigint column.
    """
    return (
        seen_hashes.select("url_hash", F.pmod("url_hash", F.lit(cfg.n_shards)).cast("int").alias("shard"))
        .groupBy("shard")
        .applyInPandas(lambda pdf: _build_shard(pdf, cfg), SEEN_SHARDS_SCHEMA)
    )


def merge_seen_shards(
    old: DataFrame | None,
    additions: DataFrame,
    cfg: BloomConfig = BloomConfig(),
) -> DataFrame:
    """Incrementally fold new url_hashes into existing shards: build
    shards for the additions, union with the old rows, bitwise-OR per
    shard (distributed applyInPandas — one row per shard). Cost is
    O(additions + n_shards), not O(total seen set) — the property that
    keeps per-round work constant as the frontier grows to 10^10."""
    new = build_seen_shards(additions, cfg)
    if old is None:
        return new
    both = old.unionByName(new)

    def _or(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        bits = np.zeros(cfg.bits_per_shard // _WORD_BITS, dtype=np.uint64)
        for blob in pdf["bloom_bits"]:
            bits |= np.frombuffer(blob, dtype=np.uint64)
        fill = float(np.unpackbits(bits.view(np.uint8)).mean())
        tier = "exact" if (fill > cfg.max_fill or (pdf["tier"] == "exact").any()) else "bloom"
        return pd.DataFrame(
            {
                "shard": [shard],
                "tier": [tier],
                "n_urls": [int(pdf["n_urls"].sum())],
                "bloom_bits": [bits.tobytes()],
            }
        )

    return both.groupBy("shard").applyInPandas(_or, SEEN_SHARDS_SCHEMA)


def resolve_probe(cfg: BloomConfig) -> str:
    """The probe strategy 'auto' resolves to for this filter size."""
    if cfg.probe != "auto":
        return cfg.probe
    return "broadcast" if cfg.total_bytes <= cfg.broadcast_max_bytes else "cogroup"


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    shards: DataFrame | None = None,
    cfg: BloomConfig = BloomConfig(),
    caches: list | None = None,
    prefetched_shards: list | None = None,
) -> DataFrame:
    """Exact set-difference candidates ∖ seen on `url_hash`.

    With `shards` (built by build_seen_shards) the Bloom pre-pass routes
    definite-new rows around the shuffle; without it this degrades to
    the plain exact anti-join.

    When `caches` is given, the flagged frame is persisted (and appended
    to it for the caller to unpersist) so the probe UDF runs ONCE over
    the candidates, not once per output branch. Without a caches list
    the probe stays lazy — a standalone caller has no unpersist hook, and
    silently pinning executor memory across invocations of a long-lived
    session is worse than re-running the (vectorized, cheap) probe.

    `prefetched_shards`: the shard rows if the caller already collected
    them (the engine overlaps that collect with round selection);
    broadcast probe only.
    """
    if shards is None:
        return candidates.join(seen.select("url_hash"), "url_hash", "left_anti")

    probe = resolve_probe(cfg)
    if probe == "cogroup":
        flagged = _probe_cogroup(candidates, shards, cfg)
    else:
        flagged = _probe_broadcast(candidates, shards, cfg, rows=prefetched_shards)
    if caches is not None:
        flagged = flagged.persist()
        caches.append(flagged)
    definite_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    needs_check = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    checked = needs_check.join(seen.select("url_hash"), "url_hash", "left_anti")
    return definite_new.unionByName(checked)


def _probe_cogroup(candidates: DataFrame, shards: DataFrame, cfg: BloomConfig) -> DataFrame:
    """Executor-side probe: candidates cogrouped with their Bloom shard
    on `pmod(url_hash, n_shards)` — each task sees ONE shard's bitset
    plus that shard's candidates, so the filter never moves through the
    driver (a properly sized 10^10-key filter is ~15 GB — collecting it
    per round, as the round-1 implementation did, is a driver OOM).
    Shuffle cost: the per-round candidate set only, keyed by shard."""
    import pyspark.sql.types as _T

    cand = candidates.withColumn(
        "_shard", F.pmod("url_hash", F.lit(cfg.n_shards)).cast("int")
    )
    out_schema = _T.StructType(
        [f for f in candidates.schema.fields]
        + [_T.StructField("_maybe_seen", _T.BooleanType(), False)]
    )
    drop_cols = ["_shard"]

    def probe(cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand_pdf.drop(columns=drop_cols)
        if len(out) == 0:
            out["_maybe_seen"] = pd.Series([], dtype=bool)
            return out
        if len(shard_pdf) == 0:
            out["_maybe_seen"] = False  # shard holds no seen URLs
            return out
        if (shard_pdf["tier"] == "exact").any():
            out["_maybe_seen"] = True  # spill tier: always take the exact join
            return out
        bits = np.zeros(cfg.bits_per_shard // _WORD_BITS, dtype=np.uint64)
        for blob in shard_pdf["bloom_bits"]:
            bits |= np.frombuffer(blob, dtype=np.uint64)
        h = cand_pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        rows, pos = _positions(h, cfg)
        hit = bits[(pos // _WORD_BITS).astype(np.int64)] >> (pos % _WORD_BITS) & np.uint64(1)
        out["_maybe_seen"] = hit.reshape(-1, cfg.n_hashes).all(axis=1)
        return out

    return (
        cand.groupBy("_shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(lambda left, right: probe(left, right), out_schema)
    )


def _probe_broadcast(
    candidates: DataFrame, shards: DataFrame, cfg: BloomConfig, rows: list | None = None
) -> DataFrame:
    """Driver-broadcast probe — right when the whole filter is small
    (tests, small crawls): one vectorized pandas UDF, no shuffle.
    `rows`: pre-collected shard rows (skips the blocking collect)."""
    spark = candidates.sparkSession
    shard_rows = rows if rows is not None else shards.collect()
    filters = {
        r["shard"]: np.frombuffer(r["bloom_bits"], dtype=np.uint64)
        for r in shard_rows
        if r["tier"] == "bloom"
    }
    exact_shards = {r["shard"] for r in shard_rows if r["tier"] == "exact"}
    bc = spark.sparkContext.broadcast((filters, exact_shards, cfg))

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        flt, exact, c = bc.value
        h_signed = url_hash.to_numpy(dtype=np.int64)
        h = h_signed.view(np.uint64)
        # match Spark's pmod on signed int64 (numpy mod is sign-of-divisor)
        shard_of = np.mod(h_signed, np.int64(c.n_shards))
        out = np.ones(len(h), dtype=bool)  # missing shard -> no seen URLs there
        for s in np.unique(shard_of):
            mask = shard_of == s
            if int(s) in exact:
                continue  # spill tier: must take the exact join
            bits = flt.get(int(s))
            if bits is None:
                out[mask] = False  # shard empty -> definitely new
                continue
            rows, pos = _positions(h[mask], c)
            hit = bits[(pos // _WORD_BITS).astype(np.int64)] >> (pos % _WORD_BITS) & np.uint64(1)
            out[mask] = hit.reshape(-1, c.n_hashes).all(axis=1)
        return pd.Series(out)

    return candidates.withColumn("_maybe_seen", maybe_seen(F.col("url_hash")))
