"""Batch-index maintenance: document delete / upsert without a full rebuild.

The reference delegates index mutation to its Lucene host (deletes are
tombstones folded in at segment merge; reference
``AnalysisComboPlugin.java:37-42`` registers analysis only). This module is
the engine's equivalent story for the BATCH index (the streaming path
already has last-writer-wins compaction, streaming/ingest.py):

* :func:`delete_docs` appends doc-id tombstones under the index dir —
  cheap, append-only, no data rewritten.
* :func:`upsert_docs` analyzes replacement/new documents into a pending
  generation (update = delete + add, like Lucene's updateDocument).
* :func:`compact` folds tombstones + pending generations into a new index
  generation **incrementally**:
    - per-doc term stats are filtered/replaced (one anti-join + union);
    - only AFFECTED terms (terms occurring in deleted or upserted docs)
      re-encode their posting rows;
    - unaffected terms keep their compressed bytes as-is — but their block
      ``max_impact`` headers are recomputed for the new corpus ``avgdl``
      in a map-only pass (no shuffle), because stale upper bounds computed
      under the old avgdl could under-estimate and make WAND's pruning
      unsound;
    - the result publishes atomically as a new generation via
      :func:`~..plans.index_build.publish_tables` (meta.json swap; old
      readers keep a consistent view).

Query results after compact are identical to a fresh build on the edited
corpus (pinned by tests/test_maintenance.py); physical run layout of
previously-hot terms may differ, which consumers never observe.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

from elasticsearch_analysis_combo_spark.operators.codec import (
    bm25_impact,
    decode_block,
)
from elasticsearch_analysis_combo_spark.operators.postings import (
    MIN_DOC,
    build_postings,
)
from elasticsearch_analysis_combo_spark.plans.index_build import (
    IndexMeta,
    InvertedIndex,
    publish_tables,
)

_TOMBSTONE_SCHEMA = "doc_id long"


def _pending_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "pending")


def _alloc_seq(index_dir: str) -> int:
    """Allocate the next pending-operation sequence number (shared between
    deletes and upserts, so compact can order them per doc: the LAST staged
    operation wins). Marker files, no Spark job; single staging writer
    assumed (concurrent writers need an external sequencer)."""
    import uuid

    d = os.path.join(_pending_dir(index_dir), "ops")
    os.makedirs(d, exist_ok=True)
    seqs = [int(e.split(".", 1)[0]) for e in os.listdir(d) if "." in e]
    seq = (max(seqs) + 1) if seqs else 0
    open(os.path.join(d, f"{seq}.{uuid.uuid4().hex[:8]}"), "w").close()
    return seq


def delete_docs(
    spark: SparkSession, index_dir: str, doc_ids: DataFrame | list[int]
) -> None:
    """Record tombstones for ``doc_ids``. Append-only; takes effect at the
    next :func:`compact` (queries served before that still see the docs,
    exactly like Lucene deletes before a segment merge). Ordered against
    upserts of the same doc by staging sequence — deleting after
    re-upserting really deletes."""
    if not isinstance(doc_ids, DataFrame):
        doc_ids = tiny_df(spark,
            [(int(d),) for d in doc_ids], _TOMBSTONE_SCHEMA
        )
    seq = _alloc_seq(index_dir)
    (
        doc_ids.select(F.col("doc_id").cast("long"))
        .withColumn("seq", F.lit(seq))
        .write.mode("append")
        .parquet(os.path.join(_pending_dir(index_dir), "tombstones"))
    )


def upsert_docs(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
    lang_col: str | None = None,
) -> None:
    """Stage new or replacement documents (update = delete + add). Each
    call analyzes its batch with the INDEX's recorded analyzer config and
    appends a pending stats generation; the LAST staged operation per
    doc_id (upsert or delete) wins at compact time. The batch's doc ids
    are recorded separately from its analyzed rows, so replacing a doc
    with content that analyzes to zero tokens correctly blanks it."""
    from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats
    from elasticsearch_analysis_combo_spark.query.wand import config_from_meta

    meta = IndexMeta.load(index_dir)
    config = config_from_meta(meta.config)
    seq = _alloc_seq(index_dir)
    stats = build_term_stats(
        docs, config, doc_id_col=doc_id_col,
        content_col=content_col, lang_col=lang_col,
    ).withColumn("gen", F.lit(seq))
    stats.write.mode("append").partitionBy("gen").parquet(
        os.path.join(_pending_dir(index_dir), "upserts")
    )
    (
        docs.select(F.col(doc_id_col).cast("long").alias("doc_id"))
        .distinct()
        .withColumn("gen", F.lit(seq))
        .write.mode("append")
        .parquet(os.path.join(_pending_dir(index_dir), "upsert_ids"))
    )


def _read_optional(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.isdir(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def rescore_block_headers(
    postings: DataFrame, avgdl: float, k1: float, b: float
) -> DataFrame:
    """Recompute ``max_impact`` headers (block- and row-level) for a new
    ``avgdl`` without touching the compressed payloads. Map-only: no
    shuffle, positions never decoded; the per-block work is one vectorized
    impact pass over the already-delta-coded (tf, dl) stream."""
    schema = postings.schema

    def rescore(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pdf
                continue
            new_blocks, new_max = [], []
            for blocks in pdf["blocks"]:
                out, row_max = [], 0.0
                for bl in blocks:
                    _d, t, l = decode_block(
                        bytes(bl["data"]), MIN_DOC, int(bl["n"])
                    )
                    mi = float(bm25_impact(t, l, avgdl, k1, b).max())
                    row_max = max(row_max, mi)
                    out.append(
                        {
                            "first_doc": bl["first_doc"],
                            "last_doc": bl["last_doc"],
                            "n": bl["n"],
                            "max_impact": mi,
                            "data": bl["data"],
                            "pos_data": bl["pos_data"],
                        }
                    )
                new_blocks.append(out)
                new_max.append(row_max)
            pdf = pdf.copy()
            pdf["blocks"] = pd.Series(new_blocks, dtype=object, index=pdf.index)
            pdf["max_impact"] = np.asarray(new_max, dtype=np.float64)
            yield pdf

    return postings.mapInPandas(rescore, schema)


def compact(
    spark: SparkSession,
    index_dir: str,
    hot_df_threshold: int | None = None,
    incremental: bool = True,
) -> InvertedIndex:
    """Fold pending tombstones + upserts into a new index generation and
    publish it atomically. ``incremental=False`` forces a full posting
    rebuild (useful as the oracle for the incremental path). Returns the
    fresh :class:`InvertedIndex`; no-op (returns the current handle) when
    nothing is pending."""
    idx = InvertedIndex(spark, index_dir)
    meta = idx.meta
    pend = _pending_dir(index_dir)
    tomb = _read_optional(spark, os.path.join(pend, "tombstones"))
    ups = _read_optional(spark, os.path.join(pend, "upserts"))
    up_ids = _read_optional(spark, os.path.join(pend, "upsert_ids"))
    if tomb is None and up_ids is None:
        return idx

    # per-doc LAST staged operation wins (tombstones and upserts share one
    # staging sequence): a delete staged after a re-upsert really deletes,
    # and an upsert staged after a delete resurrects with the new content
    tomb_last = (
        tomb.groupBy("doc_id").agg(F.max("seq").alias("_t"))
        if tomb is not None else None
    )
    up_last = (
        up_ids.groupBy("doc_id").agg(F.max("gen").alias("_g"))
        if up_ids is not None else None
    )
    if tomb_last is not None and up_last is not None:
        ops = tomb_last.join(up_last, "doc_id", "full_outer")
    elif tomb_last is not None:
        ops = tomb_last.withColumn("_g", F.lit(None).cast("long"))
    else:
        ops = up_last.withColumn("_t", F.lit(None).cast("long"))
    ops = ops.persist()

    old_stats = idx.term_stats()
    # every touched doc's OLD rows go away...
    dead_ids = ops.select("doc_id")
    # ...and only docs whose last op is an upsert re-add their new rows.
    # An upserted doc whose content analyzed to zero tokens has a winner
    # row but no stats rows — it is correctly blanked, not resurrected.
    winners = ops.filter(
        F.col("_g").isNotNull()
        & (F.col("_t").isNull() | (F.col("_g") > F.col("_t")))
    ).select("doc_id", F.col("_g").alias("gen"))
    up_stats = None
    if ups is not None:
        up_stats = ups.join(winners, ["doc_id", "gen"]).drop("gen")

    # terms whose posting rows must re-encode: any term of a removed or
    # replaced doc's old rows, plus every term of the replacement docs
    affected = (
        old_stats.join(dead_ids, "doc_id", "left_semi").select("term").distinct()
    )
    if up_stats is not None:
        affected = affected.unionByName(up_stats.select("term").distinct()).distinct()

    new_stats = old_stats.join(dead_ids, "doc_id", "left_anti")
    if up_stats is not None:
        new_stats = new_stats.unionByName(up_stats.select(*old_stats.columns))
    # reused by four consumers below; persist (recomputable lineage, so an
    # executor loss re-derives rather than failing the compaction)
    new_stats = new_stats.persist()
    affected = affected.persist()

    doc_stats = new_stats.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    g = doc_stats.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["a"] or 0.0)
    term_df = new_stats.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    if hot_df_threshold is None:
        hot_df_threshold = max(4 * meta.block_size, n_docs // 10)

    if incremental:
        aff_stats = new_stats.join(affected, "term", "left_semi")
        hot_aff = (
            term_df.filter(F.col("df") >= hot_df_threshold)
            .join(affected, "term", "left_semi")
            .select("term")
        )
        rebuilt = build_postings(
            aff_stats, avgdl=avgdl, hot_terms=hot_aff, k1=meta.k1, b=meta.b,
            block_size=meta.block_size, salt_shards=meta.salt_shards,
            with_positions=meta.with_positions,
        )
        untouched = idx.postings().join(affected, "term", "left_anti")
        postings = rescore_block_headers(
            untouched, avgdl, meta.k1, meta.b
        ).unionByName(rebuilt)
    else:
        hot = term_df.filter(F.col("df") >= hot_df_threshold).select("term")
        postings = build_postings(
            new_stats, avgdl=avgdl, hot_terms=hot, k1=meta.k1, b=meta.b,
            block_size=meta.block_size, salt_shards=meta.salt_shards,
            with_positions=meta.with_positions,
        )

    new_meta = IndexMeta(
        n_docs=n_docs, avgdl=avgdl, k1=meta.k1, b=meta.b,
        block_size=meta.block_size, salt_shards=meta.salt_shards,
        config=meta.config, with_positions=meta.with_positions,
        tables=meta.tables,
    )
    out = publish_tables(
        spark, index_dir,
        {
            "postings": postings,
            "term_stats": new_stats,
            "doc_stats": doc_stats,
            "term_df": term_df,
        },
        new_meta,
    )
    # the build-time checkpoint manifests describe the PRE-edit corpus;
    # invalidate them so a later build_index over the same inputs re-runs
    # instead of resuming outputs that no longer match the served index
    for stage in ("term_stats", "doc_stats", "term_df", "postings"):
        m = os.path.join(index_dir, f"{stage}.manifest.json")
        if os.path.exists(m):
            os.replace(m, m + f".consumed-{uuid.uuid4().hex[:8]}")
    # pending edits are folded in; retire them (rename, not delete, so a
    # crash between publish and retire only risks re-applying idempotent
    # edits, never losing them)
    if os.path.isdir(pend):
        os.replace(pend, pend + f".applied-{uuid.uuid4().hex[:8]}")
    for df in (new_stats, affected, ops):
        df.unpersist()
    return out
