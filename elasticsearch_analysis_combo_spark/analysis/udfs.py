"""Spark-facing analysis API: vectorized pandas/Arrow UDFs over the combo
functional core (no per-row Python UDFs — everything crosses the JVM<->Python
boundary as Arrow batches).

Two surfaces:

* :func:`analyze` — the ``_analyze`` API equivalent (reference:
  TestIntegration.java:28-54, README.md:97-154): a token-struct array column
  with terms, offsets, absolute positions, and re-derived position
  increments. Debug/golden surface; small-scale.
* :func:`build_term_stats` — the index hot path (reference lifecycle EP1,
  ComboAnalyzer.java:207-271 feeding Lucene's IndexWriter): goes straight
  from content to per-(doc, term) aggregated rows via ``mapInPandas`` so the
  posting build ships ONE pre-aggregated shuffle instead of raw tokens
  (map-side combine done inside the Arrow batch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_batch,
    term_stats,
    to_pos_increments,
)

TOKEN_STRUCT = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("pos_inc", T.IntegerType()),
        T.StructField("type", T.StringType()),
    ]
)

TERM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.IntegerType()),
        # per-row positions pre-packed as an independent delta+varint
        # stream (codec.encode_positions_rows) — the block wire format, so
        # the posting build concatenates bytes instead of re-encoding, and
        # the shuffle moves compressed bytes instead of int arrays. Decode
        # with codec.decode_positions_flat(pos_data, [tf]).
        T.StructField("pos_data", T.BinaryType()),
        T.StructField("dl", T.IntegerType()),
    ]
)


def analyze_tokens_udf(config: ComboConfig, with_lang: bool = False):
    """pandas UDF: content [, lang] -> array<token struct> (absolute pos +
    re-derived pos_inc per ComboTokenStream.java:108)."""

    def _rows(texts: pd.Series, langs: pd.Series | None) -> pd.Series:
        lang_vals = langs.tolist() if langs is not None else None
        docs = analyze_batch(texts.tolist(), config, lang_vals)
        out = []
        for toks in docs:
            incs = to_pos_increments(toks)
            out.append(
                [
                    {"term": t.term, "start": t.start, "end": t.end,
                     "pos": t.pos, "pos_inc": inc, "type": t.type}
                    for t, inc in zip(toks, incs)
                ]
            )
        return pd.Series(out)

    if with_lang:
        @F.pandas_udf(T.ArrayType(TOKEN_STRUCT))
        def udf(content: pd.Series, lang: pd.Series) -> pd.Series:
            return _rows(content, lang)
        return udf

    @F.pandas_udf(T.ArrayType(TOKEN_STRUCT))
    def udf(content: pd.Series) -> pd.Series:
        return _rows(content, None)
    return udf


def analyze(
    df: DataFrame,
    config: ComboConfig,
    content_col: str = "content",
    lang_col: str | None = None,
    output_col: str = "tokens",
) -> DataFrame:
    """Append a merged-token-array column (the `_analyze` view)."""
    udf = analyze_tokens_udf(config, with_lang=lang_col is not None)
    args = (F.col(content_col),) + (
        (F.col(lang_col),) if lang_col is not None else ()
    )
    return df.withColumn(output_col, udf(*args))


def analyze_response(
    df: DataFrame,
    config: ComboConfig,
    content_col: str = "content",
    lang_col: str | None = None,
) -> DataFrame:
    """The `_analyze` API response shape (reference EP2,
    TestIntegration.java:38-54 / README.md:97-154): one row per token with
    ES field names — token, start_offset, end_offset, type, position
    (absolute, starting at 1)."""
    t = analyze(df, config, content_col=content_col, lang_col=lang_col)
    keep = [c for c in df.columns]
    return t.select(*keep, F.explode("tokens").alias("_tok")).select(
        *keep,
        F.col("_tok.term").alias("token"),
        F.col("_tok.start").alias("start_offset"),
        F.col("_tok.end").alias("end_offset"),
        F.col("_tok.type").alias("type"),
        F.col("_tok.pos").alias("position"),
    )


def build_term_stats(
    df: DataFrame,
    config: ComboConfig,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
    lang_col: str | None = None,
) -> DataFrame:
    """content -> (doc_id, term, tf, pos_data, dl), one row per (doc, term).

    This replaces explode+groupBy(term, doc): the per-document aggregation is
    computed inside the Arrow batch (term_stats in combo.py), so no shuffle
    is needed to obtain tf/positions — the downstream posting build shuffles
    already-aggregated rows only (SURVEY.md §2 B2, "one shuffle saved").
    Positions ship pre-packed (see TERM_STATS_SCHEMA) — the stats shuffle
    moves varint bytes, not int64 arrays."""
    cols = [doc_id_col, content_col] + ([lang_col] if lang_col else [])
    src = df.select(*cols)
    # small-FILE inputs arrive as 1-2 scan partitions; spread the analysis
    # (CPU-bound Python) across the executor cores. Metadata-only check —
    # no .rdd conversion (which forces plan materialization) and no
    # repartition for real multi-file corpora, which already scan wide.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if 0 < n_files < parallelism:
        src = src.repartition(parallelism)
    elif n_files == 0:
        # non-file source (createDataFrame / in-memory view): inputFiles()
        # is empty, so fall back to the actual partition count — a 1-2
        # partition local relation would otherwise run the CPU-bound
        # analysis on 1-2 cores. The .rdd probe is accepted here only on
        # this path (file sources above stay metadata-only).
        try:
            n_parts = src.rdd.getNumPartitions()
        except Exception:
            n_parts = parallelism
        if n_parts < parallelism:
            src = src.repartition(parallelism)

    has_lang = lang_col is not None

    # fully-vectorized batch aggregation for the single-analyzer, no-dedup,
    # no-lang case (the posting hot path): tokenization stays per-doc (string
    # ops), but the per-(doc, term) tf/positions aggregation and row assembly
    # become one stable sort + boundary scan over the whole Arrow batch —
    # no per-token dict work, no per-row appends
    fast_leaf = None
    if (
        not has_lang
        and not config.deduplication
        and len(config.sub_analyzers) == 1
        and isinstance(config.sub_analyzers[0], str)
        and config.sub_analyzers[0] != "lang"
    ):
        from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
            FAST_TERM_POS_REGISTRY,
        )

        fast_leaf = FAST_TERM_POS_REGISTRY.get(config.sub_analyzers[0])

    def _vectorized_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[doc_id_col].to_numpy()
        toks = [fast_leaf(t or "") for t in pdf[content_col]]
        lens = np.fromiter((len(t[0]) for t in toks), np.int64, len(toks))
        total = int(lens.sum())
        if total == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "term": pd.Series([], dtype=object),
                 "tf": pd.Series([], dtype="int32"),
                 "pos_data": pd.Series([], dtype=object),
                 "dl": pd.Series([], dtype="int32")}
            )
        flat = np.empty(total, dtype=object)
        pos = np.empty(total, dtype=np.int32)
        off = 0
        for (terms, poses), length in zip(toks, lens):
            length = int(length)
            flat[off:off + length] = terms
            if poses is None:
                pos[off:off + length] = np.arange(1, length + 1)
            else:
                pos[off:off + length] = poses
            off += length
        doc_idx = np.repeat(np.arange(len(ids)), lens)
        codes, uniq = pd.factorize(flat)
        key = doc_idx * len(uniq) + codes
        order = np.argsort(key, kind="stable")  # stable: positions stay sorted
        k_sorted = key[order]
        starts = np.nonzero(
            np.concatenate([[True], k_sorted[1:] != k_sorted[:-1]])
        )[0]
        ends = np.append(starts[1:], total)
        row_first = order[starts]
        pos_sorted = pos[order]
        from elasticsearch_analysis_combo_spark.operators.codec import (
            encode_positions_rows,
        )

        packed = encode_positions_rows(pos_sorted, ends - starts)
        return pd.DataFrame(
            {"doc_id": pd.Series(ids[doc_idx[row_first]], dtype="int64"),
             "term": pd.Series(flat[row_first], dtype=object),
             "tf": pd.Series((ends - starts).astype(np.int32), dtype="int32"),
             "pos_data": pd.Series(packed, dtype=object),
             "dl": pd.Series(lens[doc_idx[row_first]].astype(np.int32),
                             dtype="int32")}
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from elasticsearch_analysis_combo_spark.analysis.combo import (
            resolve_fast_config,
            term_stats_from_pairs,
        )

        if fast_leaf is not None:
            for pdf in batches:
                yield _vectorized_batch(pdf)
            return

        fast = resolve_fast_config(config)
        presorted = fast is not None and fast._n_subs == 1 and not config.deduplication

        def doc_stats_iter(texts, langs):
            if fast is not None:
                lang_vals = langs if langs is not None else [None] * len(texts)
                for text, lg in zip(texts, lang_vals):
                    yield term_stats_from_pairs(
                        fast(text or "", lg), presorted
                    )
            else:
                for toks in analyze_batch(texts, config, langs):
                    yield term_stats(toks)

        for pdf in batches:
            texts = pdf[content_col].tolist()
            langs = pdf[lang_col].tolist() if has_lang else None
            ids = pdf[doc_id_col].tolist()
            out_id, out_term, out_tf, out_pos, out_dl = [], [], [], [], []
            for doc_id, (stats, dl) in zip(ids, doc_stats_iter(texts, langs)):
                for term, (tf, positions) in stats.items():
                    out_id.append(doc_id)
                    out_term.append(term)
                    out_tf.append(tf)
                    out_pos.append(positions)
                    out_dl.append(dl)
            from elasticsearch_analysis_combo_spark.operators.codec import (
                encode_positions_rows,
            )
            import itertools

            if out_pos:
                flat = np.fromiter(
                    itertools.chain.from_iterable(out_pos), np.int64,
                    int(sum(out_tf)),
                )
                packed = encode_positions_rows(
                    flat, np.asarray(out_tf, dtype=np.int64)
                )
            else:
                packed = []
            yield pd.DataFrame(
                {"doc_id": pd.Series(out_id, dtype="int64"),
                 "term": pd.Series(out_term, dtype=object),
                 "tf": pd.Series(out_tf, dtype="int32"),
                 # object dtype keeps Arrow's binary conversion working
                 # even for empty batches
                 "pos_data": pd.Series(packed, dtype=object),
                 "dl": pd.Series(out_dl, dtype="int32")}
            )

    return src.mapInPandas(gen, schema=TERM_STATS_SCHEMA)
