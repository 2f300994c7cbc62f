"""Custom stateful streaming operators — applyInPandasWithState.

The reference has no stateful streaming (SURVEY.md §2.7: windows/stateful
aggs absent); this is the engine's extension point for operators that need
per-key state across micro-batches (session/burst detection, incremental
counters, dedup-with-TTL).  Arrow-batched per group — no per-row Python.

``running_key_totals`` is the canonical example: per-key running
(event count, last LSN, bytes) maintained in GroupState across
micro-batches — the stateful twin of the lineage counters, emitted in
"update" mode every batch so downstream sinks see monotone progress.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_lsn", T.LongType()),
        T.StructField("bytes", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("last_lsn", T.LongType()),
        T.StructField("bytes", T.LongType()),
    ]
)


def _totals_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, last, nbytes = state.get
    else:
        n, last, nbytes = 0, -1, 0
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last = max(last, int(pdf["lsn"].max()))
            nbytes += int(
                pdf["content"].fillna("").map(lambda s: len(s.encode("utf-8"))).sum()
            )
    state.update((n, last, nbytes))
    yield pd.DataFrame(
        {"key": [str(key[0])], "n_events": [n], "last_lsn": [last], "bytes": [nbytes]}
    )


def running_key_totals(stream: DataFrame, key_col: str = "repo") -> DataFrame:
    """Per-key running totals with state across micro-batches.

    Input: the CDC envelope stream (needs ``lsn`` and ``content``).
    Output ("update" mode): one row per key per batch with the cumulative
    (n_events, last_lsn, bytes) — later emissions supersede earlier ones.
    """
    return stream.groupBy(key_col).applyInPandasWithState(
        _totals_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
