"""Sources/sinks beyond Parquet (SURVEY.md §2.1).

  S3  CSV seed lists        (Elsevier/physlettA.csv)
  S4  JSON-lines            (.jl spider output, db_scripts/insert_jl.py:25-27)
  S9  staged binary files   (IOP SFTP zip batches -> binaryFile scan)
  S10 zip member extraction (IOP/upload_to_mongodb.py:43-127, including
      the windows-1252 fallback at :83-86)
  S11 already-seen file filter (Springer upload_to_mongodb.py:40-43)

All distributed: binaryFile scans parallelize over files; zip member
extraction is an Arrow-batched mapInPandas (one zip per row in, one
member per row out — a UDTF shape).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEEDS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
    ]
)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | str | None = None) -> DataFrame:
    """JSON-lines source — the reference's .jl interchange format."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_csv_seeds(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV seed/DOI lists; explicit schema — no inferSchema in prod."""
    return spark.read.schema(SEEDS_CSV_SCHEMA).option("header", header).csv(path)


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Staged-file scan (the SFTP-download landing zone)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


ZIP_MEMBER_SCHEMA = "zip_path string, member string, content_text string, charset string"


def extract_zip_members(
    binaries: DataFrame, extensions: tuple[str, ...] = (".xml", ".html")
) -> DataFrame:
    """Explode zip archives into (zip, member, decoded text) rows.

    Namelist is filtered by extension before any member is read
    (the reference's targeted-extract optimization,
    IOP/upload_to_mongodb.py:147-169); decode tries utf-8 then falls
    back to windows-1252 (IOP :83-86).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"zip_path": [], "member": [], "content_text": [], "charset": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(blob)))
                except zipfile.BadZipFile:
                    continue
                for name in zf.namelist():
                    if not name.lower().endswith(extensions):
                        continue
                    raw = zf.read(name)
                    try:
                        text, charset = raw.decode("utf-8"), "utf-8"
                    except UnicodeDecodeError:
                        text, charset = raw.decode("windows-1252"), "windows-1252"
                    out["zip_path"].append(path)
                    out["member"].append(name)
                    out["content_text"].append(text)
                    out["charset"].append(charset)
            yield pd.DataFrame(out)

    return binaries.select("path", "content").mapInPandas(batches, ZIP_MEMBER_SCHEMA)


def filter_unprocessed_files(files: DataFrame, processed: DataFrame, key: str = "path") -> DataFrame:
    """S11 — local-directory source minus already-ingested filepaths."""
    return files.join(processed.select(key), key, "left_anti")
