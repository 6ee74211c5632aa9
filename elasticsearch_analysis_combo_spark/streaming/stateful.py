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


NEARDUP_OUTPUT = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("doc_id", T.LongType()),
    ]
)
NEARDUP_STATE = T.StructType([T.StructField("min_doc", T.LongType())])


def _neardup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    ids: set[int] = set()
    for pdf in pdfs:
        ids.update(int(d) for d in pdf["doc_id"])
    if not ids:
        return
    cur = int(state.get[0]) if state.exists else None
    flagged = []
    for d in sorted(ids):
        if cur is None:
            cur = d
        elif d < cur:
            flagged.append(cur)  # retroactive: the old owner loses
            cur = d
        elif d > cur:
            flagged.append(d)
    state.update((cur,))
    if flagged:
        yield pd.DataFrame(
            {"band": int(key[0]), "bucket": int(key[1]),
             "doc_id": flagged}
        )


def stateful_near_dup(bucketed: DataFrame) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate detection: a
    (doc_id, band, bucket) stream (:func:`operators.dedup.
    lsh_bucket_rows` — map-only, streaming-safe) -> update-mode stream
    of FLAGGED candidate rows. Per (band, bucket) the state is one
    int64: the smallest doc_id seen so far (the bucket's owner). An
    arriving doc larger than the owner is flagged; a doc that DETHRONES
    the owner flags the previous owner retroactively — so the union of
    emissions converges to exactly ``{doc | exists band: doc_id >
    global bucket min}`` REGARDLESS of arrival order or micro-batch
    boundaries, which is what makes the operator batch-oracle-checkable
    (the batch spec: flag where doc_id > min over (band, bucket)).

    State is O(distinct buckets) x 8 bytes; per-batch work is a grouped
    scan. A doc may be flagged through several buckets/batches —
    consumers dedupe with a distinct on doc_id (tiny: flagged rows
    only)."""
    return bucketed.groupBy("band", "bucket").applyInPandasWithState(
        _neardup_fn,
        outputStructType=NEARDUP_OUTPUT,
        stateStructType=NEARDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


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
