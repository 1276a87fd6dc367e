"""S9 — SFTP bulk acquisition, offline: a fake transport drives the
exact selection / retry / progress semantics of the reference's
IOPDownloader (download_via_sftp.py:66-179)."""

import pytest

from borges_spark.sources import sftp as S

ZIPMAP = {
    "IOP_batch1_part_X.zip": ["Journal A", "Journal B"],
    "IOP_batch2_all.zip": ["Journal C"],
    "JPDAP_a_b_c_X_extra.zip": "Journal of Physics D: Applied Physics",
}


class FakeTransport:
    """Anything with .get(remote, local, callback=) — the pluggable
    stand-in for pysftp.Connection."""

    def __init__(self, fail_first_for=()):
        self.calls = []
        self.remaining_failures = dict(fail_first_for)

    def get(self, remote, local, callback=None):
        n = self.remaining_failures.get(remote, 0)
        if n > 0:
            self.remaining_failures[remote] = n - 1
            raise IOError(f"transient channel error on {remote}")
        payload = f"ZIPBYTES:{remote}".encode()
        if callback:
            callback(len(payload) // 2, len(payload))
            callback(len(payload), len(payload))
        with open(local, "wb") as f:
            f.write(payload)
        self.calls.append(remote)


def test_batch1_template_expansion():
    # batch 1: X-template expands to 1..n_files (:123-131)
    files = S.expand_batch_files(ZIPMAP, batch_no=1, n_files=3)
    assert files == [
        "IOP_batch1_part_1.zip", "IOP_batch1_part_2.zip", "IOP_batch1_part_3.zip"
    ]
    # explicit file_no picks exactly one (:125-126)
    assert S.expand_batch_files(ZIPMAP, batch_no=1, file_no=7) == ["IOP_batch1_part_7.zip"]
    # later batches map one-to-one (:133-134)
    assert S.expand_batch_files(ZIPMAP, batch_no=2) == ["IOP_batch2_all.zip"]


def test_journal_selection_and_jpdap_sort():
    files = S.expand_batch_files(
        ZIPMAP, journal="Journal of Physics D: Applied Physics", n_files=2
    )
    assert files == ["JPDAP_a_b_c_1_extra.zip", "JPDAP_a_b_c_2_extra.zip"]
    # the JPD:AP numeric 5th-field sort (:150-151)
    shuffled = ["f_a_b_c_10_x.zip", "f_a_b_c_2_x.zip", "f_a_b_c_1_x.zip"]
    assert S.order_filenames_jpdap(shuffled) == [
        "f_a_b_c_1_x.zip", "f_a_b_c_2_x.zip", "f_a_b_c_10_x.zip"
    ]


def test_fetch_files_retry_and_progress(tmp_path):
    lines = []
    t = FakeTransport(fail_first_for={"IOP_batch1_part_2.zip": 2})
    files = S.expand_batch_files(ZIPMAP, batch_no=1, n_files=2)
    out = S.fetch_files(t, files, str(tmp_path / "dl"), log=lines.append)
    assert [p.rsplit("/", 1)[1] for p in out] == files
    with open(out[1], "rb") as f:
        assert f.read() == b"ZIPBYTES:IOP_batch1_part_2.zip"
    # the reference's convert_size progress line, byte-for-byte shape
    assert any(line.startswith("Downloaded ") and " Out of" in line for line in lines)
    # third attempt succeeded after two injected failures
    assert t.calls.count("IOP_batch1_part_2.zip") == 1


def test_fetch_files_exhausted_retries_raise(tmp_path):
    t = FakeTransport(fail_first_for={"IOP_batch2_all.zip": 99})
    with pytest.raises(IOError):
        S.fetch_files(t, ["IOP_batch2_all.zip"], str(tmp_path / "dl"), log=lambda s: None)


def test_connect_failure_returns_none():
    def boom():
        raise ConnectionError("no route to host")

    assert S.connect(S.SftpConfig("h", "u", "p"), transport_factory=boom) is None


def test_distributed_fetch(spark, tmp_path):
    out_dir = str(tmp_path / "dl")

    # class defined INSIDE the test: cloudpickle ships it by value to
    # executors (the module-level FakeTransport would need tests/ on the
    # worker import path)
    class LocalTransport:
        def get(self, remote, local, callback=None):
            with open(local, "wb") as f:
                f.write(f"ZIPBYTES:{remote}".encode())

    files = [f"IOP_batch1_part_{i}.zip" for i in range(1, 9)]
    res = S.fetch_files_distributed(spark, LocalTransport, files, out_dir).collect()
    assert len(res) == 8 and all(r["ok"] for r in res)
    import os

    assert sorted(os.listdir(out_dir)) == sorted(files)
    # and the staged files flow into the S10/S11 scan path
    from borges_spark.sources.readers import read_binary_dir

    staged = read_binary_dir(spark, out_dir)
    assert staged.count() == 8
