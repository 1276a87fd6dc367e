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


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    shards: DataFrame | None = None,
    cfg: BloomConfig = BloomConfig(),
) -> DataFrame:
    """Exact set-difference candidates ∖ seen on `url_hash`.

    With `shards` (built by build_seen_shards) the Bloom pre-pass routes
    definite-new rows around the shuffle; without it this degrades to
    the plain exact anti-join.
    """
    if shards is None:
        return candidates.join(seen.select("url_hash"), "url_hash", "left_anti")

    spark = candidates.sparkSession
    shard_rows = shards.collect()
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

    flagged = candidates.withColumn("_maybe_seen", maybe_seen(F.col("url_hash")))
    definite_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    needs_check = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    checked = needs_check.join(seen.select("url_hash"), "url_hash", "left_anti")
    return definite_new.unionByName(checked)
