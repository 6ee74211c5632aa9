"""Percolator: reverse search — match documents against REGISTERED queries.

ES's percolator stores queries in an index and, for each incoming
document, reports which stored queries it satisfies (alerting, saved
searches, routing). This is the transposed retrieval problem; supported
stored-query shape here is the term-set family (the ES percolator's
common case): positive terms with ``minimum_should_match`` plus optional
``must_not`` terms.

Scale shape: the registry is usually small (thousands of alerts) and
broadcasts; the document side streams through ONE analysis pass
(``build_term_stats``) and one (doc, query) partial-agg count — no
per-query scans, no posting index needed (incoming docs are matched
before/without indexing, exactly ES's percolate-then-index flow). A huge
registry degrades to a shuffle join on term, still posting-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
)


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    registered: list[tuple[int, str, int]] | list[tuple[int, str, int, str]],
    config: ComboConfig,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
    lang_col: str | None = None,
) -> DataFrame:
    """(doc_id, query_id, n_matched) for every (document, stored query)
    pair the document satisfies.

    ``registered``: (query_id, positive_text, minimum_should_match[,
    must_not_text]) — a doc matches when at least ``msm`` DISTINCT
    analyzed positive terms occur in it (msm<=0 means ALL of them, ES
    ``operator: and``) and no must_not term does. Queries whose positive
    text analyzes to zero terms never match (dropped, as ES rejects
    empty percolator queries)."""
    from elasticsearch_analysis_combo_spark.analysis.udfs import (
        build_term_stats,
    )

    pos_rows, not_rows, counts = [], [], []
    for entry in registered:
        qid, text, msm = entry[0], entry[1], int(entry[2])
        not_text = entry[3] if len(entry) > 3 else ""
        terms = sorted({t.term for t in analyze_text(text, config)})
        if not terms:
            continue
        # no clamp to the term count: a stored query demanding more
        # distinct matches than it has terms matches NOTHING, the
        # ES/Lucene minimum_should_match semantics for over-constrained
        # queries
        need = len(terms) if msm <= 0 else msm
        counts.append((qid, need))
        pos_rows += [(qid, t) for t in terms]
        not_rows += [
            (qid, t)
            for t in sorted({t.term for t in analyze_text(not_text, config)})
        ]
    if not pos_rows:
        return spark.createDataFrame(
            [], "doc_id long, query_id int, n_matched long"
        )
    doc_terms = (
        build_term_stats(
            docs, config, doc_id_col=doc_id_col, content_col=content_col,
            lang_col=lang_col,
        )
        .select("doc_id", "term")
    )
    pos = spark.createDataFrame(pos_rows, "query_id int, term string")
    need = spark.createDataFrame(counts, "query_id int, n_need int")
    matched = (
        doc_terms.join(F.broadcast(pos), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count("*").alias("n_matched"))  # (doc, term) rows are unique
        .join(F.broadcast(need), "query_id")
        .filter(F.col("n_matched") >= F.col("n_need"))
        .select("doc_id", "query_id", F.col("n_matched").cast("long"))
    )
    if not_rows:
        neg = spark.createDataFrame(not_rows, "query_id int, term string")
        excl = (
            doc_terms.join(F.broadcast(neg), "term")
            .select("doc_id", "query_id")
            .distinct()
        )
        matched = matched.join(excl, ["doc_id", "query_id"], "left_anti")
    return matched
