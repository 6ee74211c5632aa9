"""Streaming grouped-map: contiguous-group processing over sorted partitions.

``DataFrame.groupBy(...).applyInPandas`` evaluates the UDF once per group —
per-group Spark/Arrow + pandas-construction overhead (~1ms) that melts down
when groups are tiny and numerous (an inverted index has one group per
vocabulary term; 10^12 docs of source code have vocabulary in the billions).
This helper gets the same semantics with per-*batch* overhead instead:

  repartition(group_keys) -> sortWithinPartitions(group_keys + sort_keys)
  -> mapInPandas(stream)

Groups are contiguous within a partition after the sort; the stream carries
the (possibly incomplete) trailing group across Arrow batch boundaries, so
results are exact regardless of ``spark.sql.execution.arrow.maxRecordsPerBatch``.

Cost model per group: one numpy-slice view + one Python call + one appended
row tuple — no pandas objects. Group boundaries come from numpy change
detection; output rows accumulate into columnar record batches.

This is the engine's workhorse for B4 (segment encode) and B5 (segment
merge); at scale, per-group dispatch cost is the difference between a
shuffle-bound job and a Python-bound one.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# fn(cols, start, end) -> one output row (tuple) | list of rows | None
GroupFn = Callable[[dict, int, int], object]


def _bounds(cols: dict, group_keys: list[str], n: int) -> np.ndarray:
    """Start offsets of each contiguous group (keys pre-sorted)."""
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in group_keys:
        col = cols[k]
        change[1:] |= col[1:] != col[:-1]
    return np.nonzero(change)[0]


def grouped_map_sorted(
    df: DataFrame,
    group_keys: list[str],
    sort_keys: list[str],
    fn: GroupFn,
    schema: T.StructType,
    num_partitions: int | None = None,
    out_batch_rows: int = 1024,
    batched: bool = False,
) -> DataFrame:
    """Apply ``fn(column_arrays, start, end) -> row tuple(s)`` to every
    (group_keys) group, rows inside each group sorted by sort_keys.

    Semantically groupBy(group_keys).applyInPandas with per-group sorted
    input, but one shuffle + one streaming pass instead of per-group UDF
    dispatch.

    ``batched=True`` switches the contract to
    ``fn(column_arrays, starts, ends) -> list of rows`` called ONCE per
    chunk with ALL group boundaries — for encoders that vectorize across
    groups (per-group Python dispatch at vocabulary scale costs ~1ms/group
    even with numpy bodies; a whole-chunk encoder amortizes it away)."""
    npart = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartition(npart, *group_keys).sortWithinPartitions(
        *(group_keys + sort_keys)
    )
    out_names = [f.name for f in schema.fields]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        rows: list[tuple] = []

        def flush():
            nonlocal rows
            if rows:
                out = pd.DataFrame.from_records(rows, columns=out_names)
                rows = []
                yield out

        def emit(chunk: pd.DataFrame):
            n = len(chunk)
            cols = {c: chunk[c].to_numpy() for c in chunk.columns}
            starts = _bounds(cols, group_keys, n)
            ends = np.append(starts[1:], n)
            if batched:
                r = fn(cols, starts, ends)
                if r:
                    rows.extend(r)
                if len(rows) >= out_batch_rows:
                    yield from flush()
                return
            for s, e in zip(starts, ends):
                r = fn(cols, int(s), int(e))
                if r is None:
                    continue
                if isinstance(r, list):
                    rows.extend(r)
                else:
                    rows.append(r)
                if len(rows) >= out_batch_rows:
                    yield from flush()

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # the trailing group may continue in the next Arrow batch
            n = len(pdf)
            eq = np.ones(n, dtype=bool)
            for k in group_keys:
                col = pdf[k].to_numpy()
                eq &= col == col[n - 1]
            idx = n - 1
            while idx >= 0 and eq[idx]:
                idx -= 1
            split = idx + 1
            carry = pdf.iloc[split:]
            head = pdf.iloc[:split]
            if len(head):
                yield from emit(head)
        if carry is not None and len(carry):
            yield from emit(carry)
        yield from flush()

    return parted.mapInPandas(mapper, schema=schema)
