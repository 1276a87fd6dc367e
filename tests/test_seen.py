"""Seen-set: Bloom-prefiltered set-difference must equal the exact one."""

from pyspark.sql import functions as F

from borges_spark.operators.seen import BloomConfig, build_seen_shards, filter_unseen


def _hashed(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return df.withColumn("url_hash", F.xxhash64("url"))


def test_exact_anti_join(spark):
    seen = _hashed(spark, [f"https://a.com/{i}" for i in range(100)])
    cand = _hashed(spark, [f"https://a.com/{i}" for i in range(50, 150)])
    out = filter_unseen(cand, seen, shards=None)
    got = sorted(r["url"] for r in out.collect())
    assert got == sorted(f"https://a.com/{i}" for i in range(100, 150))


def test_bloom_matches_exact(spark):
    cfg = BloomConfig(n_shards=4, bits_per_shard=1 << 14, n_hashes=4)
    seen = _hashed(spark, [f"https://h{i%5}.com/p/{i}" for i in range(500)])
    cand = _hashed(spark, [f"https://h{i%5}.com/p/{i}" for i in range(250, 900)])
    shards = build_seen_shards(seen, cfg)
    with_bloom = sorted(r["url"] for r in filter_unseen(cand, seen, shards, cfg).collect())
    exact = sorted(r["url"] for r in filter_unseen(cand, seen, None).collect())
    assert with_bloom == exact
    assert len(exact) == 400  # 500..899


def test_bloom_spill_tier_is_cuckoo(spark):
    # tiny bloom forces fill > max_fill at BUILD time -> the shard
    # spills to a REAL cuckoo filter (not a give-up 'exact' marker) and
    # stays correct
    cfg = BloomConfig(n_shards=2, bits_per_shard=256, n_hashes=4, max_fill=0.3)
    seen = _hashed(spark, [f"https://x.com/{i}" for i in range(300)])
    cand = _hashed(spark, [f"https://x.com/{i}" for i in range(200, 400)])
    shards = build_seen_shards(seen, cfg)
    tiers = {r["tier"] for r in shards.collect()}
    assert "cuckoo" in tiers and "exact" not in tiers
    got = sorted(r["url"] for r in filter_unseen(cand, seen, shards, cfg).collect())
    assert got == sorted(f"https://x.com/{i}" for i in range(300, 400))


def test_incremental_merge_matches_batch(spark):
    from borges_spark.operators.seen import merge_seen_shards

    cfg = BloomConfig(n_shards=4, bits_per_shard=1 << 14, n_hashes=4)
    first = _hashed(spark, [f"https://m.com/{i}" for i in range(200)])
    second = _hashed(spark, [f"https://m.com/{i}" for i in range(200, 350)])
    everything = _hashed(spark, [f"https://m.com/{i}" for i in range(350)])

    incremental = merge_seen_shards(merge_seen_shards(None, first, cfg), second, cfg)
    batch = build_seen_shards(everything, cfg)

    inc = {r["shard"]: (r["tier"], r["n_urls"], bytes(r["bloom_bits"])) for r in incremental.collect()}
    bat = {r["shard"]: (r["tier"], r["n_urls"], bytes(r["bloom_bits"])) for r in batch.collect()}
    assert inc == bat

    cand = _hashed(spark, [f"https://m.com/{i}" for i in range(300, 500)])
    seen = everything
    got = sorted(r["url"] for r in filter_unseen(cand, seen, incremental, cfg).collect())
    assert got == sorted(f"https://m.com/{i}" for i in range(350, 500))


def test_cogroup_probe_matches_exact(spark):
    """Executor-side probe (no driver collect of the filter) must agree
    with both the broadcast probe and the exact anti-join."""
    cfg = BloomConfig(n_shards=4, bits_per_shard=1 << 14, n_hashes=4, probe="cogroup")
    seen = _hashed(spark, [f"https://h{i%5}.com/p/{i}" for i in range(500)])
    cand = _hashed(spark, [f"https://h{i%5}.com/p/{i}" for i in range(250, 900)])
    shards = build_seen_shards(seen, cfg)
    got = sorted(r["url"] for r in filter_unseen(cand, seen, shards, cfg).collect())
    exact = sorted(r["url"] for r in filter_unseen(cand, seen, None).collect())
    assert got == exact


def test_cogroup_probe_spill_and_empty_shards(spark):
    # over-full shards (exact tier) and shards with no seen URLs, both
    # through the cogroup path
    cfg = BloomConfig(n_shards=8, bits_per_shard=256, n_hashes=4, max_fill=0.3, probe="cogroup")
    seen = _hashed(spark, [f"https://x.com/{i}" for i in range(300)])
    cand = _hashed(spark, [f"https://x.com/{i}" for i in range(200, 400)] + ["https://new.org/a"])
    shards = build_seen_shards(seen, cfg)
    got = sorted(r["url"] for r in filter_unseen(cand, seen, shards, cfg).collect())
    exact = sorted(r["url"] for r in filter_unseen(cand, seen, None).collect())
    assert got == exact


def test_sized_for_stays_under_max_fill(spark):
    """BloomConfig.sized_for(n) must keep every shard in the 'bloom'
    tier at n keys — the round-1 default saturated and spilled
    everything to the exact tier long before its documented target."""
    n_keys = 20_000
    cfg = BloomConfig.sized_for(n_keys, bits_per_key=12, shard_bits=1 << 16)
    seen = _hashed(spark, [f"https://s{i%7}.com/{i}" for i in range(n_keys)])
    shards = build_seen_shards(seen, cfg).collect()
    assert all(r["tier"] == "bloom" for r in shards)
    import numpy as np

    for r in shards:
        bits = np.frombuffer(bytes(r["bloom_bits"]), dtype=np.uint64)
        fill = float(np.unpackbits(bits.view(np.uint8)).mean())
        assert fill <= cfg.max_fill
    # and the auto probe picks cogroup once the filter outgrows broadcast
    big = BloomConfig.sized_for(10**9)  # ~1.5 GB of shards
    assert big.total_bytes > big.broadcast_max_bytes


def test_cuckoo_unit_no_false_negatives_bounded_fp():
    """Partial-key cuckoo filter core: every inserted key is found (no
    false negatives — the property the seen-set's correctness leans on),
    and the false-positive rate on disjoint probes stays near the
    2 * slots * 2^-16 theoretical bound."""
    import numpy as np

    from borges_spark.operators.seen import _ck_empty, _ck_insert_many, _ck_lookup

    rng = np.random.RandomState(7)
    keys = rng.randint(0, 2**63, size=10_000, dtype=np.int64).astype(np.uint64)
    probes = rng.randint(0, 2**63, size=20_000, dtype=np.int64).astype(np.uint64)
    probes = np.setdiff1d(probes, keys)
    table = _ck_insert_many(_ck_empty(len(keys)), keys)
    assert table is not None
    assert bool(_ck_lookup(table, keys).all())  # no false negatives
    fp_rate = float(_ck_lookup(table, probes).mean())
    assert fp_rate < 0.005, fp_rate  # theory ~0.00012; huge margin


def test_cuckoo_i1_independent_of_shard_residue():
    """All of one shard's hashes agree on their low log2(n_shards) bits
    (shard = pmod(hash, n_shards)); i1 must still spread over ALL
    buckets or insertion degrades to single-choice and overflows long
    before the sized-for load. Build a table at ~0.73 load purely from
    keys sharing their low 4 bits — the raw-low-bits i1 overflowed
    here, the remixed one must not."""
    import numpy as np

    from borges_spark.operators.seen import _ck_empty, _ck_fp_i1, _ck_insert_many, _ck_lookup

    rng = np.random.RandomState(11)
    keys = (rng.randint(0, 2**59, size=10_000, dtype=np.int64).astype(np.uint64) << np.uint64(4)) | np.uint64(3)
    keys = np.unique(keys)
    table = _ck_insert_many(_ck_empty(len(keys)), keys)
    assert table is not None  # no overflow at sized load
    assert bool(_ck_lookup(table, keys).all())
    _, i1 = _ck_fp_i1(keys, table.shape[0])
    # i1 reaches (nearly) every bucket, not a 1/16 slice
    assert len(np.unique(i1)) > table.shape[0] * 0.9


def test_cuckoo_bulk_insert_deterministic_and_incremental_exact():
    """The vectorized bulk insert is a pure function of the KEY SET
    (input order/duplication must not change a bit), and incremental
    inserts find everything the batch insert finds (membership — layout
    may differ)."""
    import numpy as np

    from borges_spark.operators.seen import _ck_empty, _ck_insert_many, _ck_lookup

    rng = np.random.RandomState(3)
    keys = np.unique(rng.randint(0, 2**63, size=8_000, dtype=np.int64).astype(np.uint64))
    shuffled = keys.copy()
    rng.shuffle(shuffled)
    with_dups = np.concatenate([shuffled, shuffled[:1000]])
    t1 = _ck_insert_many(_ck_empty(len(keys)), keys)
    t2 = _ck_insert_many(_ck_empty(len(keys)), with_dups)
    assert t1 is not None and t2 is not None
    assert t1.tobytes() == t2.tobytes()
    # incremental: two halves into one table -> all keys found
    t3 = _ck_insert_many(_ck_empty(len(keys)), keys[: len(keys) // 2])
    t3 = _ck_insert_many(t3, keys[len(keys) // 2 :])
    assert t3 is not None
    assert bool(_ck_lookup(t3, keys).all())


def test_cuckoo_shard_accepts_incremental_merges(spark):
    """A spilled (cuckoo) shard keeps absorbing later rounds' hashes —
    the insertable-spill property the 'exact' marker lacked — and the
    merged filter still agrees with the exact anti-join."""
    from borges_spark.operators.seen import merge_seen_shards

    cfg = BloomConfig(n_shards=2, bits_per_shard=256, n_hashes=4, max_fill=0.3)
    first = _hashed(spark, [f"https://x.com/{i}" for i in range(300)])
    second = _hashed(spark, [f"https://x.com/{i}" for i in range(300, 380)])
    merged = merge_seen_shards(build_seen_shards(first, cfg), second, cfg)
    assert {r["tier"] for r in merged.collect()} == {"cuckoo"}
    seen = _hashed(spark, [f"https://x.com/{i}" for i in range(380)])
    cand = _hashed(spark, [f"https://x.com/{i}" for i in range(250, 500)])
    got = sorted(r["url"] for r in filter_unseen(cand, seen, merged, cfg).collect())
    assert got == sorted(f"https://x.com/{i}" for i in range(380, 500))


def test_cuckoo_overflow_degrades_to_exact(spark):
    """A cuckoo table cannot resize without the original keys, so an
    eviction overflow degrades the shard to the exact tier instead of
    ever risking a false negative."""
    from borges_spark.operators.seen import merge_seen_shards

    cfg = BloomConfig(n_shards=1, bits_per_shard=256, n_hashes=4, max_fill=0.3)
    small = _hashed(spark, [f"https://x.com/{i}" for i in range(120)])  # cuckoo sized ~120
    flood = _hashed(spark, [f"https://y.com/{i}" for i in range(5000)])
    merged = merge_seen_shards(build_seen_shards(small, cfg), flood, cfg)
    assert {r["tier"] for r in merged.collect()} == {"exact"}
    seen = _hashed(
        spark,
        [f"https://x.com/{i}" for i in range(120)] + [f"https://y.com/{i}" for i in range(5000)],
    )
    cand = _hashed(spark, [f"https://x.com/{i}" for i in range(100, 140)])
    got = sorted(r["url"] for r in filter_unseen(cand, seen, merged, cfg).collect())
    assert got == sorted(f"https://x.com/{i}" for i in range(120, 140))
