"""borges_spark — a PySpark-native distributed crawl + data-pipeline engine.

A from-scratch rebuild of the capabilities of the reference crawl toolkit
(kevcruse96/Borges, surveyed in /root/repo/SURVEY.md): a distributed URL
frontier with an exact+Bloom URL-seen set, per-host politeness scheduling,
priority-ranked fetch rounds, vectorized Arrow/pandas-UDF parsing, and
snapshot-checkpointed resumable state — plus the large-scale training-data
operators (dedup, similarity search, text analysis) such a corpus pipeline
needs.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, shuffles minimized by broadcast/anti-join/window patterns, and
Python only in Arrow-batched pandas UDFs (never per-row).
"""

__version__ = "0.1.0"
