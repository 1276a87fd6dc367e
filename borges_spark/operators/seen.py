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

Spill tier: a shard whose Bloom fill ratio would exceed `max_fill` at
BUILD time spills to a real CUCKOO FILTER (partial-key cuckoo hashing:
16-bit fingerprints, 4-slot buckets, two candidate buckets i1 and
i1 XOR H(fp), bounded eviction) — membership stays
exact-no-false-negative and insertable, so later rounds keep folding
hashes in, and false-positive rates stay bounded on hot shards without
abandoning the filter. A partial-key filter cannot RESIZE (fingerprints
don't retain i1's high bits), so an eviction overflow — like a Bloom
shard that only overfills LATER (merge time) — degrades the shard to
the 'exact' tier, which always routes through the exact join: no false
negative is ever possible.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORD_BITS = 64

# Version of the PERSISTED shard encoding: the hash-to-bit/bucket
# derivations that stored blobs were built with. Any change to
# `_positions` (bloom) or `_ck_fp_i1`/`_ck_alt` (cuckoo) MUST bump this:
# probing a stored blob with a different derivation produces false
# negatives (already-crawled URLs readmitted — silent duplicate
# crawling). The engine records this in every round manifest and, on
# resume with a mismatch, rebuilds the shards from the frontier's
# url_hashes instead of probing the stale blobs.
#   v1: cuckoo i1 = raw low hash bits (aliased pmod shard routing)
#   v2: cuckoo i1 = high bits of golden-ratio remix (round 4)
SEEN_FILTER_FORMAT = 2


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


# --- cuckoo spill tier ------------------------------------------------
# Partial-key cuckoo hashing (Fan et al., "Cuckoo Filter: Practically
# Better Than Bloom"): fingerprint fp = 16 key bits (0 reserved for
# empty), candidate buckets i1 = h mod n and i2 = i1 XOR H(fp) — the
# XOR form lets any stored (bucket, fp) entry recover its alternate
# bucket, which is what makes insertion, eviction and table growth
# possible without the original keys.

_CK_SLOTS = 4
_CK_MAX_KICKS = 500
_CK_FP_MULT = 0x5BD1E995  # Murmur-ish odd multiplier for H(fp)


def _ck_fp_i1(h: np.ndarray, n_buckets: int):
    h = h.astype(np.uint64)
    fp = ((h >> np.uint64(45)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    # i1 must NOT reuse the raw low bits: shard routing is
    # pmod(url_hash, n_shards), so within one shard every hash agrees on
    # its low log2(n_shards) bits and a plain `h & (n_buckets-1)` would
    # reach only 1/n_shards of the buckets (insertion degrades to
    # single-choice and hot shards overflow to 'exact' exactly where the
    # spill tier matters). Remix with the golden-ratio multiplier and
    # take HIGH product bits — disjoint from any shard-count residue.
    mix = h * np.uint64(0x9E3779B97F4A7C15)
    i1 = ((mix >> np.uint64(32)) & np.uint64(n_buckets - 1)).astype(np.int64)
    return fp, i1


def _ck_alt(i: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    return i ^ ((fp.astype(np.int64) * _CK_FP_MULT) & (n_buckets - 1))


def _ck_empty(n_keys: int) -> np.ndarray:
    """Table sized for ~0.75 max load: n/3 4-slot buckets, power of 2."""
    n_buckets = 1 << max(4, int(np.ceil(np.log2(max(n_keys, 1) / 3 + 1))))
    return np.zeros((n_buckets, _CK_SLOTS), dtype=np.uint16)


def _group_ranks(buckets: np.ndarray) -> np.ndarray:
    """rank of each element within its equal-value group, preserving
    input order (stable) — vectorized, no per-key loop."""
    order = np.argsort(buckets, kind="stable")
    bs = buckets[order]
    is_start = np.empty(len(bs), dtype=bool)
    if len(bs):
        is_start[0] = True
        is_start[1:] = bs[1:] != bs[:-1]
    starts = np.flatnonzero(is_start)
    run_lens = np.diff(np.append(starts, len(bs)))
    rank_sorted = np.arange(len(bs), dtype=np.int64) - np.repeat(starts, run_lens)
    ranks = np.empty(len(bs), dtype=np.int64)
    ranks[order] = rank_sorted
    return ranks


def _ck_insert_many(table: np.ndarray, hashes: np.ndarray) -> np.ndarray | None:
    """Bulk insert; returns the table, or None when an eviction chain
    exhausts _CK_MAX_KICKS — a partial-key cuckoo filter cannot RESIZE
    without the original keys (only fingerprints are stored; i1's high
    bits are unrecoverable), so the caller degrades the shard to the
    'exact' tier instead of risking a false negative.

    The common case is fully vectorized: one membership lookup drops
    already-present keys, a (fp, canonical-bucket) dedup drops
    indistinguishable twins (two keys with equal fp sharing a candidate
    bucket have the SAME candidate pair — i2 = i1 ^ H(fp) — so the pair
    is canonical), then two scatter passes place keys whose i1 / i2
    bucket has free slots, with per-bucket ranks resolving intra-batch
    collisions. Only keys still homeless after both passes (~the load
    tail) walk the per-key eviction chain. Deterministic: sorted-unique
    key order + a seeded LCG walk — a pure function of the key set."""
    n_buckets = table.shape[0]
    hs = np.unique(hashes.astype(np.uint64))  # sorted unique
    if len(hs) == 0:
        return table
    fp, b1 = _ck_fp_i1(hs, n_buckets)
    b2 = _ck_alt(b1, fp, n_buckets)
    # drop keys already present (or fp-twins of present entries)
    present = (table[b1] == fp[:, None]).any(axis=1) | (table[b2] == fp[:, None]).any(axis=1)
    keep = ~present
    # intra-batch twin dedup on (fp, min(b1,b2)): equal-fp keys sharing
    # any candidate bucket share BOTH, so the canonical pair is exact
    pair_key = (np.minimum(b1, b2).astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
    _, first_idx = np.unique(pair_key, return_index=True)
    first_mask = np.zeros(len(hs), dtype=bool)
    first_mask[first_idx] = True
    keep &= first_mask
    fp, b1, b2 = fp[keep], b1[keep], b2[keep]

    used = (table != 0).sum(axis=1).astype(np.int64)
    pending = np.ones(len(fp), dtype=bool)
    for cand in (b1, b2):
        if not pending.any():
            break
        idx = np.flatnonzero(pending)
        c = cand[idx]
        slots = used[c] + _group_ranks(c)
        ok = slots < _CK_SLOTS
        table[c[ok], slots[ok]] = fp[idx[ok]]
        np.add.at(used, c[ok], 1)
        pending[idx[ok]] = False

    # eviction chains for the homeless tail (rare below ~0.75 load)
    rng_state = 0x9E3779B9
    for j in np.flatnonzero(pending):
        i1, i2, f = int(b1[j]), int(b2[j]), int(fp[j])
        placed = False
        for b in (i1, i2):
            empty = np.where(table[b] == 0)[0]
            if len(empty):
                table[b, empty[0]] = f
                placed = True
                break
        if placed:
            continue
        cur_b, cur_fp, ok = i1, f, False
        for _ in range(_CK_MAX_KICKS):
            rng_state = (rng_state * 1103515245 + 12345) & 0x7FFFFFFF
            slot = rng_state % _CK_SLOTS
            cur_fp, table[cur_b, slot] = int(table[cur_b, slot]), cur_fp
            cur_b = cur_b ^ ((cur_fp * _CK_FP_MULT) & (n_buckets - 1))
            empty = np.where(table[cur_b] == 0)[0]
            if len(empty):
                table[cur_b, empty[0]] = cur_fp
                ok = True
                break
        if not ok:
            return None  # overflow -> exact tier
    return table


def _ck_lookup(table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership: fp present in either candidate bucket."""
    n_buckets = table.shape[0]
    fp, i1 = _ck_fp_i1(hashes, n_buckets)
    i2 = _ck_alt(i1, fp, n_buckets)
    hit1 = (table[i1] == fp[:, None]).any(axis=1)
    hit2 = (table[i2] == fp[:, None]).any(axis=1)
    return hit1 | hit2


def _ck_serialize(table: np.ndarray) -> bytes:
    import struct

    return struct.pack("<Q", table.shape[0]) + table.tobytes()


def _ck_deserialize(blob: bytes) -> np.ndarray:
    import struct

    n_buckets = struct.unpack_from("<Q", blob, 0)[0]
    return (
        np.frombuffer(blob, dtype=np.uint16, offset=8)
        .reshape(n_buckets, _CK_SLOTS)
        .copy()
    )


def _build_shard(pdf: pd.DataFrame, cfg: BloomConfig) -> pd.DataFrame:
    shard = int(pdf["shard"].iloc[0])
    hashes = pdf["url_hash"].to_numpy()
    bits = np.zeros(cfg.bits_per_shard // _WORD_BITS, dtype=np.uint64)
    _, pos = _positions(hashes, cfg)
    np.bitwise_or.at(bits, (pos // _WORD_BITS).astype(np.int64), np.uint64(1) << (pos % _WORD_BITS))
    fill = float(np.unpackbits(bits.view(np.uint8)).mean())
    if fill > cfg.max_fill:
        # spill tier: a REAL cuckoo filter sized for the keys — no false
        # negatives, still insertable by later merges
        table = _ck_insert_many(_ck_empty(len(hashes)), hashes.astype(np.uint64))
        if table is None:  # astronomically unlikely at 0.75 load
            tier, blob = "exact", bits.tobytes()
        else:
            tier, blob = "cuckoo", _ck_serialize(table)
    else:
        tier, blob = "bloom", bits.tobytes()
    return pd.DataFrame(
        {"shard": [shard], "tier": [tier], "n_urls": [len(pdf)], "bloom_bits": [blob]}
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
    """Incrementally fold new url_hashes into existing shards: the raw
    addition HASHES cogroup with their shard's row, so each executor
    task updates one shard in place — Bloom shards set bits, cuckoo
    shards insert fingerprints, and tier transitions happen where the
    information exists (bloom->exact when the bits overfill, since a
    bloom's keys are unrecoverable; cuckoo->exact only on eviction
    overflow). Cost is O(additions + n_shards), not O(total seen set) —
    the property that keeps per-round work constant as the frontier
    grows to 10^10.

    PRECONDITION: `additions` must contain only hashes NOT already in
    the filter (the engine feeds exactly the round's new_rows, which are
    post-anti-join). The per-shard n_urls counter is old + len(added);
    feeding already-seen hashes would overcount it (the filter bits
    themselves stay correct — bloom OR and cuckoo twin-skip are
    idempotent — but the batch-vs-incremental n_urls equality that
    test_incremental_merge_matches_batch pins would break)."""
    if old is None:
        return build_seen_shards(additions, cfg)
    keyed = additions.select(
        "url_hash", F.pmod("url_hash", F.lit(cfg.n_shards)).cast("int").alias("shard")
    )

    def _merge(old_pdf: pd.DataFrame, add_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(old_pdf) == 0:
            return _build_shard(add_pdf, cfg)  # shard seen for the first time
        if len(add_pdf) == 0:
            return old_pdf[["shard", "tier", "n_urls", "bloom_bits"]]
        shard = int(old_pdf["shard"].iloc[0])
        tier = str(old_pdf["tier"].iloc[0])
        blob = bytes(old_pdf["bloom_bits"].iloc[0])
        n_urls = int(old_pdf["n_urls"].sum()) + len(add_pdf)
        hashes = add_pdf["url_hash"].to_numpy()
        if tier == "cuckoo":
            table = _ck_insert_many(_ck_deserialize(blob), hashes.astype(np.uint64))
            if table is None:
                tier = "exact"
            else:
                blob = _ck_serialize(table)
        elif tier == "bloom":
            bits = np.frombuffer(blob, dtype=np.uint64).copy()
            _, pos = _positions(hashes, cfg)
            np.bitwise_or.at(
                bits, (pos // _WORD_BITS).astype(np.int64), np.uint64(1) << (pos % _WORD_BITS)
            )
            fill = float(np.unpackbits(bits.view(np.uint8)).mean())
            if fill > cfg.max_fill:
                tier = "exact"  # keys not recoverable from bits
            blob = bits.tobytes()
        # tier == "exact": stays exact; the blob is vestigial
        return pd.DataFrame(
            {"shard": [shard], "tier": [tier], "n_urls": [n_urls], "bloom_bits": [blob]}
        )

    return (
        old.groupBy("shard")
        .cogroup(keyed.groupBy("shard"))
        .applyInPandas(lambda left, right: _merge(left, right), SEEN_SHARDS_SCHEMA)
    )


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
            out["_maybe_seen"] = True  # degraded tier: always take the exact join
            return out
        h = cand_pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        maybe = np.zeros(len(h), dtype=bool)
        bits = None
        for tier, blob in zip(shard_pdf["tier"], shard_pdf["bloom_bits"]):
            if tier == "cuckoo":
                maybe |= _ck_lookup(_ck_deserialize(bytes(blob)), h)
            else:
                if bits is None:
                    bits = np.zeros(cfg.bits_per_shard // _WORD_BITS, dtype=np.uint64)
                bits |= np.frombuffer(blob, dtype=np.uint64)
        if bits is not None:
            rows, pos = _positions(h, cfg)
            hit = bits[(pos // _WORD_BITS).astype(np.int64)] >> (pos % _WORD_BITS) & np.uint64(1)
            maybe |= hit.reshape(-1, cfg.n_hashes).all(axis=1)
        out["_maybe_seen"] = maybe
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
    cuckoos = {
        r["shard"]: _ck_deserialize(bytes(r["bloom_bits"]))
        for r in shard_rows
        if r["tier"] == "cuckoo"
    }
    exact_shards = {r["shard"] for r in shard_rows if r["tier"] == "exact"}
    bc = spark.sparkContext.broadcast((filters, cuckoos, exact_shards, cfg))

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        flt, ck, exact, c = bc.value
        h_signed = url_hash.to_numpy(dtype=np.int64)
        h = h_signed.view(np.uint64)
        # match Spark's pmod on signed int64 (numpy mod is sign-of-divisor)
        shard_of = np.mod(h_signed, np.int64(c.n_shards))
        out = np.ones(len(h), dtype=bool)  # missing shard -> no seen URLs there
        for s in np.unique(shard_of):
            mask = shard_of == s
            if int(s) in exact:
                continue  # degraded tier: must take the exact join
            table = ck.get(int(s))
            if table is not None:
                out[mask] = _ck_lookup(table, h[mask])
                continue
            bits = flt.get(int(s))
            if bits is None:
                out[mask] = False  # shard empty -> definitely new
                continue
            rows, pos = _positions(h[mask], c)
            hit = bits[(pos // _WORD_BITS).astype(np.int64)] >> (pos % _WORD_BITS) & np.uint64(1)
            out[mask] = hit.reshape(-1, c.n_hashes).all(axis=1)
        return pd.Series(out)

    return candidates.withColumn("_maybe_seen", maybe_seen(F.col("url_hash")))
