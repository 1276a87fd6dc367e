"""S9 — live SFTP bulk acquisition (the IOP batch-zip channel).

Re-expresses Borges/spiders/IOP/scripts/download_via_sftp.py:66-179:
connect to the publisher's SFTP drop, select batch zip files from the
zipname->journal mapping (X-template expansion, the JPD:AP numeric
filename sort), and transfer them with a human-readable progress
callback. Downloaded files then enter the engine through the staged-file
scan path (readers.read_binary_dir + readers.scan_zip_members — S10/S11).

The transport is PLUGGABLE: `connect()` builds a real pysftp connection
when the library is importable (it is not baked into this image — the
import is guarded), and any object exposing .get(remote, local,
callback=) works in its place, which is how the tests drive the full
selection/retry/progress logic offline. The distributed variant fans a
file list out over executors with one connection per partition — the
scale path for a thousand-zip drop, vs the reference's serial loop.
"""

from __future__ import annotations

from dataclasses import dataclass

from borges_spark.functions.text import format_size_py


@dataclass(frozen=True)
class SftpConfig:
    host: str
    username: str
    password: str
    port: int = 22  # :73 ("22 by default for ssh")
    max_retries: int = 3  # bounded per-file retry, Elsevier-style (paper_xml.py:141)


def connect(cfg: SftpConfig, transport_factory=None):
    """Open the transfer connection (download_via_sftp.py:87-103).
    Returns the transport, or None on failure (the reference prints the
    error and flags connected=False rather than raising)."""
    if transport_factory is None:
        try:
            import pysftp  # not in this image; real deployments have it
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "pysftp is not installed; pass transport_factory "
                "(any object with .get(remote, local, callback=))"
            ) from e

        def transport_factory():  # pragma: no cover - needs a live host
            return pysftp.Connection(
                host=cfg.host, port=cfg.port,
                username=cfg.username, password=cfg.password,
            )

    try:
        return transport_factory()
    except Exception:
        return None


def expand_batch_files(
    zipname2journal: dict,
    batch_no: int | None = None,
    journal: str | None = None,
    n_files: int = 1,
    file_no: int | None = None,
) -> list[str]:
    """Select the remote zip names to transfer — the reference's
    __get_relevant_zipfiles selection semantics (:110-148) exactly:
    batch 1's name is an X-template expanded to file_no or 1..n_files;
    other batches map one-to-one; journal mode inverts the mapping, with
    the JPD:AP special case expanding its template."""
    journal2zipname = {
        vsub: k
        for k, v in zipname2journal.items()
        for vsub in (v if isinstance(v, (list, tuple)) else [v])
    }
    files: list[str] = []
    if batch_no:
        names = list(zipname2journal.keys())
        if batch_no == 1:
            general = names[batch_no - 1]
            if file_no:
                files = [general.replace("X", str(file_no))]
            else:
                files = [general.replace("X", str(i + 1)) for i in range(n_files)]
        else:
            files = [names[batch_no - 1]]
    elif journal:
        if journal == "Journal of Physics D: Applied Physics":
            general = journal2zipname[journal]
            files = [general.replace("X", str(i + 1)) for i in range(n_files)]
        else:
            v = journal2zipname[journal]
            files = [v] if isinstance(v, str) else list(v)
    return files


def order_filenames_jpdap(files: list[str]) -> list[str]:
    """JPD:AP zips sort by the numeric 5th underscore field (:150-151)."""
    return sorted(files, key=lambda x: int(x.split("_")[4]))


def make_progress(log=print):
    """The reference's transfer callback (:153-157): human-readable
    'Downloaded X Out of Y' through the size formatter."""

    def progress(transferred: int, to_be_transferred: int) -> None:
        log(
            f"Downloaded {format_size_py(transferred)} Out of"
            f"{format_size_py(to_be_transferred)}"
        )

    return progress


def fetch_files(
    transport,
    files: list[str],
    output_dir: str,
    n_files: int | None = None,
    max_retries: int = 3,
    log=print,
) -> list[str]:
    """Serial transfer loop (:159-173) hardened with the bounded
    per-file retry the engine applies to every other fetch channel.
    Returns the local paths written."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    progress = make_progress(log)
    out: list[str] = []
    for name in files[:n_files]:
        local = os.path.join(output_dir, name)
        last: Exception | None = None
        for _ in range(max_retries):
            try:
                transport.get(name, local, callback=progress)
                out.append(local)
                last = None
                break
            except Exception as e:  # transient channel errors retry
                last = e
        if last is not None:
            raise last
    return out


def fetch_files_distributed(
    spark,
    transport_factory,
    files: list[str],
    output_dir: str,
    max_retries: int = 3,
):
    """Scale path: fan the file list out over executors, ONE connection
    per partition (connections don't serialize; each task opens its
    own — the same pattern as the per-partition HTTP sessions in
    sources/fetcher). Returns a DataFrame of (file, local_path, ok,
    error). With a shared filesystem (the cluster case) local_path is
    directly scannable by readers.read_binary_dir."""
    import pandas as pd

    df = spark.createDataFrame([(f,) for f in files], "file string")

    def worker(it):
        import os

        os.makedirs(output_dir, exist_ok=True)
        transport = transport_factory()
        for pdf in it:
            rows = []
            for name in pdf["file"]:
                local = os.path.join(output_dir, name)
                err = None
                for _ in range(max_retries):
                    try:
                        transport.get(name, local, callback=None)
                        err = None
                        break
                    except Exception as e:
                        err = str(e)
                rows.append((name, local, err is None, err))
            yield pd.DataFrame(rows, columns=["file", "local_path", "ok", "error"])

    n = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    return df.repartition(n).mapInPandas(
        worker, "file string, local_path string, ok boolean, error string"
    )
