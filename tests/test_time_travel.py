"""Snapshot time travel, rollback and expiry (the Iceberg snapshot
surface over the manifest protocol — checkpoint.py).

Determinism is the oracle: the engine's crawl is bit-identical across
runs, so `read_as_of(round k)` must equal a fresh run stopped at k,
and rollback(k) + resume must reproduce the uninterrupted run exactly.
"""

import shutil

import pytest

from borges_spark.operators.politeness import PolitenessConfig
from borges_spark.plans.checkpoint import SnapshotStore
from borges_spark.plans.engine import CrawlConfig, CrawlEngine
from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds

WEB = WebConfig(n_pages=300, n_hosts=6, out_degree=3, n_seeds=4, hot_frac=0.3)
POL = PolitenessConfig(default_delay_s=5.0, round_budget_s=240.0)
ROUNDS = 4


def _engine(spark, root: str, max_rounds: int) -> CrawlEngine:
    pages = gen_pages(spark, WEB)
    seeds = gen_seeds(spark, WEB)
    cfg = CrawlConfig(max_rounds=max_rounds, politeness=POL)
    return CrawlEngine(spark, pages, seeds, SnapshotStore(root), cfg)


def _log_tuples(spark, store: SnapshotStore, as_of: int | None = None):
    rounds = store.rounds()
    df = store.read_as_of(spark, "crawl_log", as_of if as_of is not None else rounds[-1])
    return sorted(
        (r["round"], r["rank_in_round"], r["url"], r["status"]) for r in df.collect()
    )


def _frontier_map(df):
    return {r["url"]: (r["state"], r["discovered_seq"]) for r in df.collect()}


@pytest.fixture(scope="module")
def full_store(spark, tmp_path_factory):
    """One uninterrupted ROUNDS-round crawl; every test reads or copies it."""
    root = str(tmp_path_factory.mktemp("tt") / "full")
    eng = _engine(spark, root, ROUNDS)
    eng.run(resume=False)
    return eng.store


def test_snapshots_listing(full_store):
    snaps = full_store.snapshots()
    assert [m["round"] for m in snaps] == full_store.rounds()
    assert len(snaps) >= 3
    for m in snaps:
        assert {"frontier", "crawl_log", "metrics"} <= set(m["datasets"])
        assert m["frontier_buckets"] == full_store.frontier_buckets
    stamps = [m["committed_at"] for m in snaps]
    assert stamps == sorted(stamps)  # strict round-order publish


def test_read_as_of_equals_fresh_run(spark, full_store, tmp_path):
    """frontier/crawl_log AS OF round k == a fresh crawl stopped at k."""
    k = full_store.rounds()[1]  # second committed round
    short = _engine(spark, str(tmp_path / "short"), max_rounds=2)
    short.run(resume=False)

    f_tt = full_store.read_as_of(spark, "frontier", k)
    f_fresh = short.frontier()
    assert f_tt.exceptAll(f_fresh).count() == 0
    assert f_fresh.exceptAll(f_tt).count() == 0

    assert _log_tuples(spark, full_store, as_of=k) == _log_tuples(spark, short.store)


def test_read_as_of_validation(spark, full_store):
    last = full_store.rounds()[-1]
    with pytest.raises(ValueError, match="not committed"):
        full_store.read_as_of(spark, "frontier", last + 1)
    with pytest.raises(ValueError, match="no committed"):
        full_store.read_as_of(spark, "nonexistent_ds", last)


def test_rollback_then_resume_bit_identical(spark, full_store, tmp_path):
    """rollback(k) + resume == the uninterrupted run, exactly."""
    root = str(tmp_path / "rb")
    shutil.copytree(full_store.root, root)
    store = SnapshotStore(root)
    k = store.rounds()[1]
    store.rollback(k, spark=spark)
    assert store.latest_round() == k
    assert store.rounds() == [r for r in full_store.rounds() if r <= k]

    eng = _engine(spark, root, ROUNDS)
    eng.run(resume=True)
    assert _log_tuples(spark, eng.store) == _log_tuples(spark, full_store)
    f_a = _frontier_map(full_store.read_as_of(spark, "frontier", full_store.rounds()[-1]))
    f_b = _frontier_map(eng.frontier())
    assert f_a == f_b


def test_rollback_validation(full_store, tmp_path):
    root = str(tmp_path / "rbv")
    shutil.copytree(full_store.root, root)
    store = SnapshotStore(root)
    with pytest.raises(ValueError, match="not a committed snapshot"):
        store.rollback(full_store.rounds()[-1] + 7)


def test_expire_snapshots(spark, full_store, tmp_path):
    """Expiry reclaims only superseded full-state snapshots; append
    history and the resume point survive any horizon."""
    root = str(tmp_path / "exp")
    shutil.copytree(full_store.root, root)
    store = SnapshotStore(root)
    rounds = store.rounds()
    last = rounds[-1]
    log_before = _log_tuples(spark, store)

    expired = store.expire_snapshots(keep_last=1, spark=spark)
    assert expired == rounds[:-1]
    assert store.expire_snapshots(keep_last=1, spark=spark) == []  # idempotent

    # full crawl_log/metrics history still reads at every horizon
    assert _log_tuples(spark, store) == log_before
    assert store.read_as_of(spark, "metrics", rounds[0]).count() > 0
    # the latest frontier (the resume point) still reads
    assert store.read_as_of(spark, "frontier", last).count() > 0
    # a reclaimed snapshot fails with a clear error, not a missing-file scan
    with pytest.raises(ValueError, match="expired"):
        store.read_as_of(spark, "frontier", rounds[0])
    # and a resumed engine continues from the surviving latest round
    eng = _engine(spark, root, ROUNDS + 1)
    eng.run(resume=True)
    assert eng.store.latest_round() >= last


def test_compact_dataset(spark, full_store, tmp_path):
    """Compaction coalesces a round's multi-task crawl_log into one
    file with identical data; snapshot datasets are refused; manifest
    records the stats; time-travel reads keep working."""
    import os

    root = str(tmp_path / "cp")
    shutil.copytree(full_store.root, root)
    store = SnapshotStore(root)
    r = store.rounds()[0]
    before = _log_tuples(spark, store)

    path = f"{store._round_dir(r)}/crawl_log"
    n_files = len([f for f in os.listdir(path) if f.startswith("part-") and not f.endswith(".crc")])
    assert n_files >= 2  # written by multiple tasks

    stats = store.compact_dataset(spark, r, "crawl_log")
    assert stats["files_before"] == n_files and stats["files_after"] == 1
    assert store.manifest(r)["compacted"]["crawl_log"]["files_after"] == 1
    assert _log_tuples(spark, store) == before  # data identical
    assert store.read_as_of(spark, "crawl_log", r).count() > 0

    with pytest.raises(ValueError, match="snapshot dataset"):
        store.compact_dataset(spark, r, "frontier")
    with pytest.raises(ValueError, match="not committed"):
        store.compact_dataset(spark, store.rounds()[-1] + 5, "crawl_log")


def test_heal_interrupted_compaction(spark, full_store, tmp_path):
    """All three compaction crash states recover without data loss."""
    import os

    before = _log_tuples(spark, full_store)
    r = full_store.rounds()[0]

    # state 1: crash before the swap (stray .compact_tmp only)
    root1 = str(tmp_path / "h1")
    shutil.copytree(full_store.root, root1)
    s1 = SnapshotStore(root1)
    os.makedirs(f"{s1._round_dir(r)}/crawl_log.compact_tmp")
    assert s1.heal_compactions() == []
    assert not os.path.exists(f"{s1._round_dir(r)}/crawl_log.compact_tmp")
    assert _log_tuples(spark, s1) == before

    # state 2: crash between the renames (live name missing)
    root2 = str(tmp_path / "h2")
    shutil.copytree(full_store.root, root2)
    s2 = SnapshotStore(root2)
    live = f"{s2._round_dir(r)}/crawl_log"
    os.rename(live, live + ".pre_compact")
    healed = s2.heal_compactions()
    assert healed == [live]
    assert _log_tuples(spark, s2) == before

    # state 3: crash after the swap, before cleanup (both present) —
    # gc_uncommitted (the resume entry point) heals it too
    root3 = str(tmp_path / "h3")
    shutil.copytree(full_store.root, root3)
    s3 = SnapshotStore(root3)
    live3 = f"{s3._round_dir(r)}/crawl_log"
    shutil.copytree(live3, live3 + ".pre_compact")
    s3.gc_uncommitted()
    assert not os.path.exists(live3 + ".pre_compact")
    assert _log_tuples(spark, s3) == before


def test_rollback_refuses_expired_target(spark, full_store, tmp_path):
    """r6 (ADVICE): rolling back onto a round whose snapshots were
    reclaimed by expire_snapshots must refuse — it would GC the only
    surviving live frontier and leave the store unresumable."""
    root = str(tmp_path / "rbx")
    shutil.copytree(full_store.root, root)
    store = SnapshotStore(root)
    rounds = store.rounds()
    last = rounds[-1]
    store.expire_snapshots(keep_last=1, spark=spark)
    with pytest.raises(ValueError, match="reclaimed|unresumable"):
        store.rollback(rounds[0], spark=spark)
    # the refusal left the store intact: latest unchanged, resume works
    assert store.latest_round() == last
    eng = _engine(spark, root, ROUNDS + 1)
    eng.run(resume=True)
    assert eng.store.latest_round() >= last
