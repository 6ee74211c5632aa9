"""Term suggester ("did you mean") — the ES `_search` suggest section.

Host behavior the reference's analyzers feed (a combo-analyzed index's
vocabulary is exactly what Lucene's DirectSpellChecker consults,
reference README.md:17-36 for the fielded mapping). For each input term,
candidate corrections are vocabulary terms within ``max_edits``
Levenshtein edits that share the first ``prefix_length`` characters
(Lucene's prefix pruning), ranked ES-style: edit distance ascending,
then document frequency descending, then term — top ``k`` per input.

Scale: the scan is over the term DICTIONARY (one row per vocabulary
term — tiny next to posting data even at 10^9 terms); the prefix and
length pre-filters push into the parquet scan before the JVM-side
``levenshtein`` runs, and all inputs share ONE dictionary pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.tinydf import tiny_df


def term_suggest(
    spark: SparkSession,
    term_df: DataFrame,
    inputs: list[tuple[int, str]],
    max_edits: int = 2,
    prefix_length: int = 1,
    min_doc_freq: int = 1,
    k: int = 5,
    include_exact: bool = False,
) -> DataFrame:
    """(query_id, input term) -> top-k ranked correction candidates.

    Returns (query_id, rank, suggestion, distance, df). By default an
    exact vocabulary hit is excluded from its own suggestions (ES
    ``suggest_mode: missing/popular`` both skip distance-0 self-matches;
    pass ``include_exact=True`` for ``always``-like behavior).
    """
    if not inputs:
        return tiny_df(spark,
            [], "query_id int, rank int, suggestion string, "
                "distance int, df long"
        )
    inputs_df = tiny_df(spark, inputs, "query_id int, input string")
    # ONE dictionary pass for all inputs: broadcast the tiny input table
    # against the vocabulary; the prefix + length-band predicates bound
    # Levenshtein from below and prune before the edit distance runs
    cand = (
        term_df.join(
            F.broadcast(inputs_df),
            F.col("term").startswith(
                F.substring("input", 1, prefix_length)
            )
            & (F.length("term") >= F.length("input") - max_edits)
            & (F.length("term") <= F.length("input") + max_edits),
        )
        .withColumn("distance", F.levenshtein(F.col("term"), F.col("input")))
        .filter(F.col("distance") <= max_edits)
        .select(
            "query_id",
            F.col("term").alias("suggestion"),
            F.col("distance").cast("int").alias("distance"),
            F.col("df").cast("long").alias("df"),
        )
    )
    if not include_exact:
        cand = cand.filter(F.col("distance") > 0)
    cand = cand.filter(F.col("df") >= min_doc_freq)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("suggestion")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "suggestion", "distance", "df")
    )


def phrase_suggest(
    spark: SparkSession,
    term_df: DataFrame,
    inputs: list[tuple[int, str]],
    max_edits: int = 1,
    prefix_length: int = 1,
    min_doc_freq: int = 1,
) -> DataFrame:
    """ES phrase suggester, greedy single-error variant: each whitespace
    token of the input keeps itself if it is in the vocabulary, else is
    replaced by its best term_suggest correction (distance, then df).
    Returns (query_id, suggestion) — the corrected phrase — plus
    ``n_corrections``. Whole-candidate-lattice reranking (the full ES
    phrase suggester scores candidate phrases against a language model) is
    out of scope; this covers the common single-typo query repair."""
    toks = []
    for qid, text in inputs:
        if not (0 <= qid < (1 << 15)):
            raise ValueError(f"query_id out of range [0, 2^15): {qid}")
        for i, t in enumerate(text.split()):
            if i >= (1 << 16):
                raise ValueError(f"more than {1 << 16} tokens in query {qid}")
            toks.append((qid, i, t))
    if not toks:
        return tiny_df(spark,
            [], "query_id int, suggestion string, n_corrections int"
        )
    # vocabulary membership: one isin filter over the dictionary
    distinct_toks = sorted({t for _, _, t in toks})
    known = {
        r["term"]
        for r in term_df.filter(
            F.col("term").isin(distinct_toks)
            & (F.col("df") >= min_doc_freq)
        ).select("term").collect()
    }
    need = [
        ((qid << 16) | i, t) for qid, i, t in toks if t not in known
    ]
    best = {}
    if need:
        # one dictionary pass for every unknown token (term_suggest
        # broadcasts the whole batch)
        for r in term_suggest(
            spark, term_df, need, max_edits=max_edits,
            prefix_length=prefix_length, min_doc_freq=min_doc_freq, k=1,
        ).collect():
            best[r["query_id"]] = r["suggestion"]
    out = []
    for qid, text in inputs:
        parts, fixes = [], 0
        for i, t in enumerate(text.split()):
            key = (qid << 16) | i
            if t in known or key not in best:
                parts.append(t)
            else:
                parts.append(best[key])
                fixes += 1
        out.append((qid, " ".join(parts), fixes))
    return tiny_df(spark,
        out, "query_id int, suggestion string, n_corrections int"
    )


def completion_suggest(
    spark: SparkSession,
    term_df: DataFrame,
    inputs: list[tuple[int, str]],
    k: int = 5,
    min_doc_freq: int = 1,
) -> DataFrame:
    """ES completion suggester (search-as-you-type): vocabulary terms
    completing each input prefix, ranked by document frequency
    descending (the ES weight default when index docs carry no explicit
    weight) with the term as tiebreak — top ``k`` per input.

    Scale: one dictionary pass for ALL prefixes; each branch's
    ``startswith`` filter pushes into the parquet scan (StringStartsWith
    — asserted by tools/explain_audit.py), so a dictionary clustered by
    term prunes to the prefix's row groups. The per-input top-k cut is
    a window over the (bounded) expansion, never a driver collect — ES
    serves this from an in-memory FST; at 10^9 vocabulary terms the
    pruned columnar scan is the Spark-shaped equivalent."""
    if not inputs:
        return tiny_df(spark,
            [], "query_id int, rank int, suggestion string, df long"
        )
    parts = []
    for qid, prefix in inputs:
        parts.append(
            term_df.filter(
                F.col("term").startswith(prefix)
                & (F.col("df") >= min_doc_freq)
            ).select(
                F.lit(qid).alias("query_id"),
                F.col("term").alias("suggestion"),
                F.col("df").cast("long").alias("df"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("df"), F.asc("suggestion")
    )
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "suggestion", "df")
    )


def terms_enum(
    term_df: DataFrame,
    string: str = "",
    size: int = 10,
    case_insensitive: bool = False,
    search_after: str | None = None,
) -> DataFrame:
    """ES 8 ``_terms_enum``: walk the index dictionary and return up to
    ``size`` terms starting with ``string``, ascending — the
    leading-edge autocomplete API (host surface behind the reference's
    fielded mapping, README.md:17-36: the combo-analyzed vocabulary IS
    the dictionary the walk reads). ``search_after`` resumes the walk
    strictly after a previous page's last term; ``case_insensitive``
    folds only the PREFIX comparison (returned terms keep their
    indexed form, exactly ES).

    Returns (term, doc_count) — ES's response carries just the term
    list, but the df column is free here (the dictionary row already
    holds it) and callers drop it if they want wire parity. ES's
    ``complete`` flag (did the walk exhaust the dictionary?) is the
    one omission: it needs a count past the cut; page until a short
    page instead.

    Scale: ONE dictionary scan (one row per vocabulary term — tiny
    next to postings even at 10^9 terms). The case-sensitive prefix
    and the search_after bound are sargable (StringStartsWith /
    GreaterThan push into the parquet dictionary scan); the ordered
    ``limit`` is a TakeOrderedAndProject — each task forwards at most
    ``size`` rows, no full sort."""
    if size < 1:
        raise ValueError(f"size must be >= 1: {size}")
    d = term_df
    if string:
        if case_insensitive:
            d = d.filter(F.lower(F.col("term")).startswith(string.lower()))
        else:
            d = d.filter(F.col("term").startswith(string))
    if search_after is not None:
        d = d.filter(F.col("term") > F.lit(search_after))
    return (
        d.select("term", F.col("df").cast("long").alias("doc_count"))
        .orderBy("term")
        .limit(size)
    )


def suggest_body(
    spark: SparkSession,
    term_df: DataFrame,
    suggest: dict,
    default_k: int = 5,
) -> DataFrame:
    """ES ``_search`` request-body ``suggest`` section: named entries of
    ``term`` / ``phrase`` / ``completion`` suggesters evaluated against
    one index vocabulary, returned as ONE long frame
    ``(name, kind, rank, suggestion, distance, df, n_corrections)``
    (nulls where a column doesn't apply to the kind: completion carries
    no distance, phrase carries rank 1 and no df). Host surface behind
    the reference's fielded mapping (README.md:17-36 — the
    combo-analyzed vocabulary IS what the suggesters consult).

    Entry shapes (the ES wire format)::

        {"fix":  {"text": "sprak",  "term":       {"field": "text", ...}},
         "tail": {"prefix": "cust", "completion": {"field": "text", "size": 3}},
         "did":  {"text": "sprak merge", "phrase": {"field": "text"}}}

    Options honored per kind: term — ``max_edits`` (ES
    ``max_edits``/``fuzziness``), ``prefix_length``, ``min_doc_freq``
    (absolute count), ``size``, ``suggest_mode`` ("always" includes
    exact vocabulary hits; "missing"/"popular" skip them, the
    term_suggest default); completion — ``size``, ``min_doc_freq``;
    phrase — ``max_edits``, ``prefix_length``, ``min_doc_freq``.
    ``field`` is accepted and ignored (this index has one analyzed
    field; use MultiFieldSearchEngine for fielded indexes).

    Scale: entries are BATCHED per (kind, option-set) — every term
    entry sharing options rides ONE dictionary pass (term_suggest
    broadcasts the whole input batch), likewise completions (each
    branch's ``startswith`` pushes into the dictionary scan). The
    dictionary is one row per vocabulary term — tiny next to posting
    data — so a suggest section costs O(option-sets) scans, never
    O(names)."""
    if not suggest:
        return tiny_df(spark,
            [], "name string, kind string, rank int, suggestion string, "
                "distance int, df long, n_corrections int",
        )
    names = list(suggest)
    qid_of = {n: i for i, n in enumerate(names)}
    # bucket entries by (kind, frozen options) so each bucket is one
    # batched evaluator call
    buckets: dict[tuple, list[tuple[int, str]]] = {}
    for n, entry in suggest.items():
        kinds = [k for k in ("term", "phrase", "completion") if k in entry]
        if len(kinds) != 1:
            raise ValueError(
                f"suggest entry {n!r} needs exactly one of "
                f"term/phrase/completion: {sorted(entry)}"
            )
        kind = kinds[0]
        opts = entry[kind] or {}
        text_key = "prefix" if kind == "completion" else "text"
        if text_key not in entry:
            raise ValueError(f"suggest entry {n!r} is missing {text_key!r}")
        if kind == "term":
            sig = (
                "term", int(opts.get("max_edits", 2)),
                int(opts.get("prefix_length", 1)),
                int(opts.get("min_doc_freq", 1)),
                int(opts.get("size", default_k)),
                str(opts.get("suggest_mode", "missing")),
            )
        elif kind == "phrase":
            sig = (
                "phrase", int(opts.get("max_edits", 1)),
                int(opts.get("prefix_length", 1)),
                int(opts.get("min_doc_freq", 1)),
            )
        else:
            sig = (
                "completion", int(opts.get("size", default_k)),
                int(opts.get("min_doc_freq", 1)),
            )
        buckets.setdefault(sig, []).append((qid_of[n], entry[text_key]))

    name_map = tiny_df(spark,
        [(q, n) for n, q in qid_of.items()], "query_id int, name string"
    )
    parts = []
    for sig, inputs in buckets.items():
        kind = sig[0]
        if kind == "term":
            _, me, pl, mdf, k, mode = sig
            out = term_suggest(
                spark, term_df, inputs, max_edits=me, prefix_length=pl,
                min_doc_freq=mdf, k=k, include_exact=(mode == "always"),
            ).select(
                "query_id", F.col("rank").cast("int").alias("rank"),
                "suggestion", F.col("distance").cast("int").alias("distance"),
                F.col("df").cast("long").alias("df"),
                F.lit(None).cast("int").alias("n_corrections"),
            )
        elif kind == "phrase":
            _, me, pl, mdf = sig
            out = phrase_suggest(
                spark, term_df, inputs, max_edits=me, prefix_length=pl,
                min_doc_freq=mdf,
            ).select(
                "query_id", F.lit(1).alias("rank"), "suggestion",
                F.lit(None).cast("int").alias("distance"),
                F.lit(None).cast("long").alias("df"),
                F.col("n_corrections").cast("int").alias("n_corrections"),
            )
        else:
            _, k, mdf = sig
            out = completion_suggest(
                spark, term_df, inputs, k=k, min_doc_freq=mdf,
            ).select(
                "query_id", F.col("rank").cast("int").alias("rank"),
                "suggestion", F.lit(None).cast("int").alias("distance"),
                F.col("df").cast("long").alias("df"),
                F.lit(None).cast("int").alias("n_corrections"),
            )
        parts.append(out.withColumn("kind", F.lit(kind)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.join(F.broadcast(name_map), "query_id")
        .select("name", "kind", "rank", "suggestion", "distance", "df",
                "n_corrections")
    )
