"""Exact phrase matching over the positional posting index.

This is what the posting ``positions`` payload exists for (SURVEY.md §1.3:
absolute positions are "what BM25 positions/phrase data need"). A phrase
"w1 w2 ... wn" matches where the terms' absolute positions are consecutive
(pos_{i+1} = pos_i + 1 — same definition Lucene's exact PhraseQuery uses
over its position postings).

Distribution mirrors WAND: the phrase's terms' postings (compressed blocks,
positions payload included) gather per query task; the positional
intersection is numpy set logic over decoded flat position arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
)
from elasticsearch_analysis_combo_spark.operators.postings import (
    decode_segment_blocks_flat,
)

PHRASE_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_matches", T.LongType()),
    ]
)


def analyze_phrases(
    queries: list[tuple[int, str]], config: ComboConfig
) -> list[tuple[int, int, str]]:
    """(query_id, text) -> (query_id, slot, term) rows; slot is the term's
    order in the phrase (repeated terms keep their slots)."""
    out = []
    for qid, text in queries:
        toks = analyze_text(text, config)
        for slot, t in enumerate(toks):
            out.append((qid, slot, t.term))
    return out


def phrase_match(
    spark: SparkSession,
    postings: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
) -> DataFrame:
    """(query_id, doc_id, n_matches) for every doc containing the phrase."""
    qrows = analyze_phrases(queries, config)
    if not qrows:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    qterms = spark.createDataFrame(qrows, "query_id int, slot int, term string")
    all_terms = sorted({t for _, _, t in qrows})
    plists = postings.filter(F.col("term").isin(all_terms))
    joined = plists.join(F.broadcast(qterms), "term")
    slots_by_q = {}
    for qid, slot, term in qrows:
        slots_by_q.setdefault(qid, []).append((slot, term))

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        # runs of one term stay doc-sorted when concatenated in run_idx
        # order; repeated query terms join the same posting rows once
        rows_by_term: dict[str, dict[int, list]] = {}
        for term, ri, blocks in zip(pdf["term"], pdf["run_idx"], pdf["blocks"]):
            rows_by_term.setdefault(term, {})[int(ri)] = blocks
        decoded: dict[str, tuple] = {}
        for term, runs in rows_by_term.items():
            blocks = [bl for ri in sorted(runs) for bl in runs[ri]]
            d, t, _l, pos_flat = decode_segment_blocks_flat(blocks, True)
            offs = np.concatenate([[0], np.cumsum(t.astype(np.int64))])
            decoded[term] = (d, offs, pos_flat)
        slots = sorted(slots_by_q[qid])
        out_docs, out_n = [], []
        # docs present in every slot's posting list
        doc_sets = []
        for _, term in slots:
            if term not in decoded:
                return pd.DataFrame(
                    {"query_id": pd.Series([], dtype="int32"),
                     "doc_id": pd.Series([], dtype="int64"),
                     "n_matches": pd.Series([], dtype="int64")}
                )
            doc_sets.append(decoded[term][0])
        common = doc_sets[0]
        for ds in doc_sets[1:]:
            common = common[np.isin(common, ds)]
        for doc in common:
            n = None
            for slot, term in slots:
                d, offs, pos_flat = decoded[term]
                i = int(np.searchsorted(d, doc))
                p = pos_flat[offs[i]:offs[i + 1]].astype(np.int64) - slot
                n = p if n is None else np.intersect1d(n, p, assume_unique=False)
                if n.size == 0:
                    break
            if n is not None and n.size:
                out_docs.append(int(doc))
                out_n.append(int(n.size))
        return pd.DataFrame(
            {
                "query_id": pd.Series(np.full(len(out_docs), qid), dtype="int32"),
                "doc_id": pd.Series(out_docs, dtype="int64"),
                "n_matches": pd.Series(out_n, dtype="int64"),
            }
        )

    return joined.groupBy("query_id").applyInPandas(run_query, PHRASE_SCHEMA)
