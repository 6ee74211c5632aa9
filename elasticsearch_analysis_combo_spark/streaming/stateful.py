"""Custom stateful streaming operator: first-seen (min-doc_id) dedup keyed
on content hash, via ``applyInPandasWithState``.

The canonical training-data stream task the built-in windowed aggregations
can't express: as documents stream in, track for every content hash the
smallest doc_id seen so far and emit it whenever it improves. The final
emission per hash is the GLOBAL min doc_id — deterministic regardless of
micro-batch boundaries or arrival order, which is what makes the operator
exactly oracle-checkable (batch SQL: ``min(doc_id) GROUP BY hash``).

State per key: one int64 (the current min) — the at-scale shape for
streaming dedup over 10^12 docs is exactly this: state size is O(distinct
hashes), per-batch work is a grouped min.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("doc_id", T.LongType()),
    ]
)
DEDUP_STATE = T.StructType([T.StructField("min_doc", T.LongType())])


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch_min = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            batch_min = m if batch_min is None else min(batch_min, m)
    if batch_min is None:
        return
    if state.exists:
        (cur,) = state.get
        if batch_min >= cur:
            return  # no improvement: emit nothing this batch
        state.update((batch_min,))
    else:
        state.update((batch_min,))
    yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [batch_min]})


def stateful_first_seen(keyed: DataFrame) -> DataFrame:
    """Streaming DataFrame (content_hash, doc_id) -> update-mode stream of
    improving per-hash minima; the last emission per hash is the global
    first-seen doc. Use outputMode("update")."""
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
