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

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

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
        return tiny_df(spark,
            [], "doc_id long, query_id int, n_matched long"
        )
    doc_terms = (
        build_term_stats(
            docs, config, doc_id_col=doc_id_col, content_col=content_col,
            lang_col=lang_col,
        )
        .select("doc_id", "term")
    )
    pos = tiny_df(spark, pos_rows, "query_id int, term string")
    need = tiny_df(spark, counts, "query_id int, n_need int")
    matched = (
        doc_terms.join(F.broadcast(pos), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count("*").alias("n_matched"))  # (doc, term) rows are unique
        .join(F.broadcast(need), "query_id")
        .filter(F.col("n_matched") >= F.col("n_need"))
        .select("doc_id", "query_id", F.col("n_matched").cast("long"))
    )
    if not_rows:
        neg = tiny_df(spark, not_rows, "query_id int, term string")
        excl = (
            doc_terms.join(F.broadcast(neg), "term")
            .select("doc_id", "query_id")
            .distinct()
        )
        matched = matched.join(excl, ["doc_id", "query_id"], "left_anti")
    return matched


# ---------------------------------------------------------------------------
# DSL-body percolation (round 5l): registered queries are real ES query
# DSL, compiled to ONE boolean expression per query over the document's
# analyzed token array + its metadata columns


def _perc_terms(text: str, config: ComboConfig) -> list[str]:
    return [t.term for t in analyze_text(text, config)]


def _perc_compile(node: dict, config: ComboConfig, content_col: str,
                  toks: str) -> str:
    """One DSL query node -> a boolean SQL expression over ``toks`` (the
    analyzed term array, position order) and the metadata columns.
    Text queries (match / match_phrase) must target ``content_col`` —
    the column the percolating analysis ran on; every other leaf is a
    metadata predicate delegated to the DSL filter compiler."""
    from elasticsearch_analysis_combo_spark.query.dsl import (
        _sql_lit,
        compile_filter,
    )

    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(f"query node must have exactly one key: {node!r}")
    (kind, body), = node.items()

    if kind == "match":
        (field, spec), = body.items()
        if field != content_col:
            raise ValueError(
                f"match percolates the analyzed column {content_col!r}, "
                f"got field {field!r} (use term/terms for metadata)"
            )
        if isinstance(spec, dict):
            text = spec["query"]
            op = spec.get("operator", "or")
            msm = int(spec.get("minimum_should_match", 1))
        else:
            text, op, msm = spec, "or", 1
        terms = sorted(set(_perc_terms(text, config)))
        if not terms:
            raise ValueError(f"match text analyzes to zero terms: {text!r}")
        arr = "array(" + ", ".join(_sql_lit(t) for t in terms) + ")"
        if op == "and":
            return "(" + " AND ".join(
                f"array_contains({toks}, {_sql_lit(t)})" for t in terms
            ) + ")"
        if op != "or":
            raise ValueError(f"unsupported match operator: {op!r}")
        if msm <= 1:
            return f"arrays_overlap({toks}, {arr})"
        return f"(size(array_intersect({toks}, {arr})) >= {msm})"

    if kind == "match_phrase":
        (field, spec), = body.items()
        if field != content_col:
            raise ValueError(
                f"match_phrase percolates {content_col!r}, got {field!r}"
            )
        text = spec["query"] if isinstance(spec, dict) else spec
        if isinstance(spec, dict) and int(spec.get("slop", 0)) != 0:
            raise ValueError(
                "percolate_dsl match_phrase supports slop 0 only (index "
                "the doc and use the positional evaluators for sloppy "
                "phrases)"
            )
        seq = _perc_terms(text, config)
        if not seq:
            raise ValueError(f"phrase analyzes to zero terms: {text!r}")
        if len(seq) == 1:
            return f"array_contains({toks}, {_sql_lit(seq[0])})"
        n = len(seq)
        conj = " AND ".join(
            f"element_at({toks}, i + {j}) = {_sql_lit(t)}"
            for j, t in enumerate(seq)
        )
        # guard: sequence(1, k) DESCENDS when k < 1 — never emit it
        return (
            f"(size({toks}) >= {n} AND "
            f"exists(sequence(1, size({toks}) - {n - 1}), i -> {conj}))"
        )

    if kind == "bool":
        parts = []
        for role in ("must", "filter"):
            cs = body.get(role, [])
            cs = cs if isinstance(cs, list) else [cs]
            parts += [
                "(" + _perc_compile(c, config, content_col, toks) + ")"
                for c in cs
            ]
        for c in (body.get("must_not", [])
                  if isinstance(body.get("must_not", []), list)
                  else [body["must_not"]]):
            parts.append(
                "(NOT (" + _perc_compile(c, config, content_col, toks)
                + "))"
            )
        should = body.get("should", [])
        should = should if isinstance(should, list) else [should]
        if should:
            msm = body.get("minimum_should_match")
            if msm is None:
                msm = 0 if parts else 1
            msm = int(msm)
            inds = [
                "(CASE WHEN "
                + _perc_compile(c, config, content_col, toks)
                + " THEN 1 ELSE 0 END)"
                for c in should
            ]
            if msm <= 0 and not parts:
                raise ValueError(
                    "minimum_should_match 0 with only should clauses "
                    "matches every document; register a filter instead"
                )
            if msm > 0:
                parts.append("((" + " + ".join(inds) + f") >= {msm})")
            # msm <= 0 next to must clauses: shoulds are pure optional
        if not parts:
            raise ValueError("empty bool percolator query")
        return "(" + " AND ".join(parts) + ")"

    # every other leaf is a metadata predicate (term/terms/range/
    # exists/ids/...) — the DSL filter compiler already speaks SQL
    return compile_filter({kind: body})


def percolate_dsl(
    spark: SparkSession,
    docs: DataFrame,
    registered: list[tuple[int, dict]],
    config: ComboConfig,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
    lang_col: str | None = None,
) -> DataFrame:
    """(doc_id, query_id) for every (document, stored DSL query) pair
    the document satisfies — the ES percolator with REAL query bodies:
    ``match`` (operator and/or + minimum_should_match), ``match_phrase``
    (slop 0; adjacency over the analyzed token SEQUENCE — coincides
    with position adjacency unless the analyzer stacks/gaps positions,
    documented), ``bool`` (must/filter/should/must_not + integer
    minimum_should_match), and any metadata filter leaf the DSL
    compiler accepts (term/terms/range/exists/...).

    Scale shape: ONE analysis pass over the incoming docs, then every
    registered query is a compiled boolean column over the token array
    + metadata — the whole percolation is a map-only projection
    (whole-stage codegen, no joins, no shuffle, no index), so 100 TB of
    incoming docs stream through at scan speed and the registry size
    only widens the projection. Matched query ids emit as one
    filtered-array explode per doc."""
    from elasticsearch_analysis_combo_spark.analysis.udfs import analyze

    if not registered:
        return tiny_df(spark, [], "doc_id long, query_id int")
    toks = "_perc_toks"
    exprs = [
        (int(qid), _perc_compile(body, config, content_col, toks))
        for qid, body in registered
    ]
    analyzed = analyze(
        docs, config, content_col=content_col, lang_col=lang_col,
        output_col="_perc_tok_structs",
    ).withColumn(
        toks, F.expr("transform(_perc_tok_structs, t -> t.term)")
    )
    matched_arr = (
        "filter(array("
        + ", ".join(f"IF({e}, {qid}, CAST(NULL AS INT))"
                    for qid, e in exprs)
        + "), x -> x IS NOT NULL)"
    )
    return analyzed.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(F.expr(matched_arr)).alias("query_id"),
    )
