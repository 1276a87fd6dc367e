"""Sources/sinks: JSONL round-trip, CSV seeds, zip member extraction
with charset fallback, already-seen file filter."""

import io
import zipfile

from borges_spark.sources.readers import (
    extract_zip_members,
    filter_unprocessed_files,
    read_binary_dir,
    read_csv_seeds,
    read_jsonl,
    write_jsonl,
)


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://a/1", 1, False), ("https://a/2", 2, True)],
        "url string, seq long, scraped boolean",
    )
    path = str(tmp_path / "out.jl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, "url string, seq long, scraped boolean")
    assert sorted((r["url"], r["seq"], r["scraped"]) for r in back.collect()) == [
        ("https://a/1", 1, False),
        ("https://a/2", 2, True),
    ]


def test_csv_seeds(spark, tmp_path):
    p = tmp_path / "seeds.csv"
    p.write_text("url,label\nhttps://x/1,a\nhttps://x/2,b\n")
    got = read_csv_seeds(spark, str(p)).collect()
    assert {r["url"] for r in got} == {"https://x/1", "https://x/2"}


def _make_zip(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_zip_member_extraction(spark, tmp_path):
    z1 = _make_zip(
        {
            "a/doc1.xml": "<doc>uno</doc>".encode(),
            "a/skip.pdf": b"%PDF",
            "a/doc2.html": "caf\xe9 latin".encode("windows-1252"),
        }
    )
    (tmp_path / "z1.zip").write_bytes(z1)
    binaries = read_binary_dir(spark, str(tmp_path), glob="*.zip")
    out = {r["member"]: r for r in extract_zip_members(binaries).collect()}
    assert set(out) == {"a/doc1.xml", "a/doc2.html"}  # pdf filtered pre-read
    assert out["a/doc1.xml"]["charset"] == "utf-8"
    assert out["a/doc2.html"]["charset"] == "windows-1252"
    assert out["a/doc2.html"]["content_text"] == "café latin"


def test_unprocessed_filter(spark):
    files = spark.createDataFrame([("f1",), ("f2",), ("f3",)], "path string")
    done = spark.createDataFrame([("f2",)], "path string")
    got = {r["path"] for r in filter_unprocessed_files(files, done).collect()}
    assert got == {"f1", "f3"}
