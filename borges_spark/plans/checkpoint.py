"""Snapshot checkpoint store — Iceberg-snapshot semantics over Parquet.

The reference checkpoints by flipping Mongo flags + pickling frontier
snapshots (Borges/db_scripts/mongo2pickle.py:5-34); any script re-run
resumes from the flags (Elsevier/paper_index.py:119-138). Here every
fetch round commits an atomic snapshot: per-round Parquet datasets plus
a JSON manifest, with a LATEST pointer written via tmp+rename (atomic on
POSIX). A killed job resumes from the last committed round; data written
for rounds after LATEST is garbage-collected on resume, so a crash
mid-round is invisible.

On a cluster with Iceberg jars this class is swapped for real Iceberg
tables (`MERGE INTO` + snapshot ids); the import-try below keeps that
path open without requiring the jars in this image.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

# On a deployment with the Iceberg runtime jar, set this True and route
# write_snapshot/read through an Iceberg catalog (MERGE INTO + snapshot
# ids). The jar is not in this image, so the Parquet+manifest protocol
# below provides the same commit/resume semantics.
_HAVE_ICEBERG = False


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _round_dir(self, round_no: int) -> str:
        return os.path.join(self.root, f"r{round_no:06d}")

    def _latest_path(self) -> str:
        return os.path.join(self.root, "LATEST")

    # -- commit protocol -----------------------------------------------
    def write_snapshot(self, round_no: int, datasets: dict[str, DataFrame], meta: dict | None = None) -> None:
        """Write all datasets for a round, then commit atomically."""
        rdir = self._round_dir(round_no)
        counts: dict[str, int] = {}
        write_times: dict[str, float] = {}

        # The datasets are independent (shared parents are already cached
        # by the engine), so submit the write jobs CONCURRENTLY — Spark's
        # scheduler interleaves their stages, overlapping each job's
        # driver-side planning latency with the others' executor work.
        # The commit point (LATEST rename) still happens only after every
        # write has finished, so atomicity is unchanged.
        def _write(item):
            name, df = item
            t0 = time.time()
            # snappy, not the session's zstd: snapshots are hot engine
            # state rewritten every round — encode speed beats ratio here
            df.write.mode("overwrite").option("compression", "snappy").parquet(
                os.path.join(rdir, name)
            )
            return name, round(time.time() - t0, 2)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(datasets)) as pool:
            for name, secs in pool.map(_write, datasets.items()):
                write_times[name] = secs
        self.last_write_times = write_times
        manifest = {
            "round": round_no,
            "datasets": sorted(datasets),
            "counts": counts,
            "committed_at": time.time(),
            "meta": meta or {},
        }
        with open(os.path.join(rdir, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        tmp = self._latest_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(round_no))
        os.replace(tmp, self._latest_path())  # atomic commit point

    def latest_round(self) -> int | None:
        p = self._latest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def manifest(self, round_no: int) -> dict:
        with open(os.path.join(self._round_dir(round_no), "manifest.json")) as f:
            return json.load(f)

    def read(self, spark: SparkSession, round_no: int, name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._round_dir(round_no), name))

    def gc_uncommitted(self) -> None:
        """Drop data for rounds after the last committed snapshot."""
        latest = self.latest_round()
        for entry in os.listdir(self.root):
            if not entry.startswith("r") or not entry[1:].isdigit():
                continue
            rno = int(entry[1:])
            if latest is None or rno > latest:
                shutil.rmtree(os.path.join(self.root, entry), ignore_errors=True)

    def rounds(self) -> list[int]:
        latest = self.latest_round()
        if latest is None:
            return []
        out = []
        for entry in sorted(os.listdir(self.root)):
            if entry.startswith("r") and entry[1:].isdigit() and int(entry[1:]) <= latest:
                out.append(int(entry[1:]))
        return out
