"""Custom stateful streaming operator: per-host politeness limiter.

applyInPandasWithState keeps a per-host token-bucket across
micro-batches: each batch of candidate fetches for a host consumes
tokens (budget k per round window); the overflow is deferred. This is
the Structured-Streaming form of the engine's batch politeness window
(operators/politeness.py) — the state (tokens spent, rounds seen) lives
in the streaming state store, so a restarted query resumes mid-budget
exactly, mirroring the reference's resumable crawl state
(SURVEY.md §2.9 ST1-ST6).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("batch_candidates", T.LongType()),
        T.StructField("allowed", T.LongType()),
        T.StructField("deferred", T.LongType()),
        T.StructField("total_allowed", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_allowed", T.LongType()),
        T.StructField("budget_left", T.LongType()),
    ]
)


def make_limiter(budget_per_host: int):
    """Build the applyInPandasWithState function for a per-host budget."""

    def limiter(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (host,) = key
        if state.exists:
            total_allowed, budget_left = state.get
        else:
            total_allowed, budget_left = 0, budget_per_host
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        allowed = min(n, budget_left)
        deferred = n - allowed
        total_allowed += allowed
        budget_left -= allowed
        state.update((total_allowed, budget_left))
        yield pd.DataFrame(
            {
                "host": [host],
                "batch_candidates": [n],
                "allowed": [allowed],
                "deferred": [deferred],
                "total_allowed": [total_allowed],
            }
        )

    return limiter


def rate_limited_counts(
    candidates_stream: DataFrame, budget_per_host: int
) -> DataFrame:
    """candidates_stream: streaming DF with a `host` column. Returns the
    streaming per-host allow/defer ledger."""
    return candidates_stream.groupBy("host").applyInPandasWithState(
        make_limiter(budget_per_host),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
