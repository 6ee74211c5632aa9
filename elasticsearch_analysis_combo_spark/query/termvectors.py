"""Termvectors API (ES ``_termvectors``): per-doc term vector readback.

Returns, for requested doc ids, every indexed term with its tf and
absolute positions — decoded from the same packed ``pos_data`` wire
format the posting blocks ship (so this is also an end-to-end value
check of the positions payload). The doc-id filter pushes into the
term_stats parquet scan; only the selected docs' rows are ever decoded
(O(requested docs), not O(corpus)).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

from elasticsearch_analysis_combo_spark.operators.codec import (
    decode_positions_flat,
)

TERMVECTORS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.LongType()),
        T.StructField("pos", T.LongType()),
    ]
)


def termvectors(
    spark: SparkSession,
    term_stats: DataFrame,
    doc_ids: list[int],
) -> DataFrame:
    """One row per (doc, term, occurrence): (doc_id, term, tf, pos)."""
    if not doc_ids:
        return tiny_df(spark, [], TERMVECTORS_SCHEMA)
    sel = term_stats.filter(
        F.col("doc_id").isin([int(d) for d in doc_ids])
    ).select("doc_id", "term", "tf", "pos_data")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            docs, terms, tfs, poss = [], [], [], []
            for doc, term, tf, pos_data in zip(
                pdf["doc_id"], pdf["term"], pdf["tf"], pdf["pos_data"]
            ):
                tf = int(tf)
                p = decode_positions_flat(
                    bytes(pos_data), np.asarray([tf], dtype=np.int64)
                )
                docs.append(np.full(tf, doc, dtype=np.int64))
                terms.extend([term] * tf)
                tfs.append(np.full(tf, tf, dtype=np.int64))
                poss.append(p.astype(np.int64))
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(docs),
                    "term": pd.Series(terms, dtype=object),
                    "tf": np.concatenate(tfs),
                    "pos": np.concatenate(poss),
                }
            )

    return sel.mapInPandas(decode, TERMVECTORS_SCHEMA)
