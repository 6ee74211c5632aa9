"""simple_query_string: the ES one-box query syntax over the index.

The host entry point most reference users type into first. Supported
subset (documented; no grouping parens, no ``~N`` fuzziness suffix):

* ``term``      — role from ``default_operator`` ("or" -> should,
                  "and" -> must)
* ``+term``     — must
* ``-term``     — must_not
* ``"a b c"``   — phrase clause (optionally ``+``/``-`` prefixed):
                  exact-adjacency filter over the positional postings
* ``term*``     — prefix clause: matches any vocabulary expansion

Semantics (SQL-replayable, shared with the gate oracle):

* scoring terms = the distinct analyzed terms of every non-negated
  clause (phrase constituents and prefix expansions included), each
  contributing plain BM25 once. (Simplification vs ES: a phrase clause
  scores by its constituent terms, not sloppyFreq — the phrase still
  FILTERS exactly.)
* membership is CLAUSE-level: a doc must match at least one positive
  clause (term present / phrase present / >=1 prefix expansion present)
  — so a should-phrase admits only docs containing the actual phrase,
  not its scattered constituents;
* every must clause must match, and no must_not clause.

Plan shape: scoring is the usual broadcast-dimension join + one
(query, doc) partial agg; each must/must_not clause lowers to a distinct
(query, clause, doc) indicator (term/prefix: term-filtered stats scan;
phrase: the batch-vectorized phrase matcher on composite query ids) and
a counted semi/anti join — no full-corpus pass beyond term-pruned scans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
)
from elasticsearch_analysis_combo_spark.query.bm25 import idf_expr
from elasticsearch_analysis_combo_spark.query.boolean import _rank_topk

_TOKEN_RE = re.compile(r'([+-]?)("([^"]*)"|\S+)')


@dataclass
class Clause:
    kind: str  # term | phrase | prefix
    role: str  # must | should | must_not
    text: str  # raw token / phrase body / prefix (without *)


@dataclass
class ParsedQuery:
    clauses: list[Clause] = field(default_factory=list)


def parse_simple_query_string(
    text: str, default_operator: str = "or"
) -> ParsedQuery:
    if default_operator not in ("or", "and"):
        raise ValueError(f"default_operator must be or|and: {default_operator}")
    default_role = "should" if default_operator == "or" else "must"
    out = ParsedQuery()
    for m in _TOKEN_RE.finditer(text):
        sign, raw, quoted = m.group(1), m.group(2), m.group(3)
        role = (
            "must" if sign == "+"
            else "must_not" if sign == "-"
            else default_role
        )
        if quoted is not None:
            if quoted.strip():
                out.clauses.append(Clause("phrase", role, quoted.strip()))
        elif raw.endswith("*") and len(raw) > 1:
            out.clauses.append(Clause("prefix", role, raw[:-1]))
        elif raw != "*":
            out.clauses.append(Clause("term", role, raw))
    return out


def _clause_terms(clause: Clause, config: ComboConfig) -> list[str]:
    return sorted({t.term for t in analyze_text(clause.text, config)})


def simple_query_string_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    postings: DataFrame | None,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    default_operator: str = "or",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    partitioned_phrases: bool = False,
    range_bits: int = 4,
) -> DataFrame:
    """Parse and evaluate simple_query_string queries. ``postings`` (with
    positions) is only required when a query contains phrase clauses;
    ``partitioned_phrases`` routes those through the doc-range fan-out
    evaluator (the scale-safe path for stop-word phrases)."""
    empty = spark.createDataFrame(
        [], "query_id int, rank int, doc_id long, score double"
    )
    parsed = {
        qid: parse_simple_query_string(text, default_operator)
        for qid, text in queries
    }
    for qid, pq in parsed.items():
        # composite phrase ids pack (qid, clause_id) into int32
        if pq.clauses and not (0 <= qid < (1 << 21)):
            raise ValueError(f"query_id out of range [0, 2^21): {qid}")
        if len(pq.clauses) > (1 << 10):
            raise ValueError(f"more than {1 << 10} clauses in query {qid}")
    score_rows: set[tuple[int, str]] = set()
    # (qid, clause_id, Clause) for indicator joins
    pos_specs: list[tuple[int, int, Clause]] = []
    must_specs: list[tuple[int, int, Clause]] = []
    not_specs: list[tuple[int, int, Clause]] = []
    prefix_exp_needed: list[tuple[int, int, str]] = []
    phrase_specs: list[tuple[int, int, Clause]] = []
    for qid, pq in parsed.items():
        for cid, cl in enumerate(pq.clauses):
            if cl.kind in ("term", "phrase") and not _clause_terms(cl, config):
                # a clause whose text analyzes to zero terms (e.g. a pure
                # stopword under a stop-stripping analyzer) is DROPPED,
                # as ES drops empty clauses — it must not veto the query
                continue
            if cl.role != "must_not":
                if cl.kind in ("term", "phrase"):
                    score_rows.update((qid, t) for t in _clause_terms(cl, config))
            if cl.kind == "prefix":
                prefix_exp_needed.append((qid, cid, cl.text))
            if cl.kind == "phrase":
                phrase_specs.append((qid, cid, cl))
            if cl.role == "must":
                must_specs.append((qid, cid, cl))
                pos_specs.append((qid, cid, cl))
            elif cl.role == "must_not":
                not_specs.append((qid, cid, cl))
            else:
                pos_specs.append((qid, cid, cl))

    # one dictionary job for ALL prefix expansions (per-branch pushdown)
    expansions: dict[tuple[int, int], list[str]] = {}
    if prefix_exp_needed:
        exp_union = None
        for qid, cid, pfx in prefix_exp_needed:
            part = term_df.filter(F.col("term").startswith(pfx)).select(
                F.lit(qid).alias("qid"), F.lit(cid).alias("cid"), "term"
            )
            exp_union = part if exp_union is None else exp_union.unionByName(part)
        for r in exp_union.collect():
            expansions.setdefault((r["qid"], r["cid"]), []).append(r["term"])
    for qid, pq in parsed.items():
        for cid, cl in enumerate(pq.clauses):
            if cl.kind == "prefix" and cl.role != "must_not":
                score_rows.update(
                    (qid, t) for t in expansions.get((qid, cid), [])
                )
    if not score_rows:
        return empty

    # phrase indicators: ALL phrase clauses in one batch matcher call via
    # composite query ids
    phrase_hits = None
    if phrase_specs:
        if postings is None:
            raise ValueError("phrase clauses require positional postings")
        from elasticsearch_analysis_combo_spark.query.phrase import (
            phrase_match,
            phrase_match_partitioned,
        )

        comp = [((qid << 10) | cid, cl.text) for qid, cid, cl in phrase_specs]
        if partitioned_phrases:
            ph = phrase_match_partitioned(
                spark, postings, comp, config, range_bits=range_bits
            )
        else:
            ph = phrase_match(spark, postings, comp, config)
        # persist: the hits feed up to three indicator joins (positive
        # membership, must counting, must_not exclusion) — without this
        # each one re-runs the whole positional evaluation (measured 3x
        # at 200k docs). MEMORY_AND_DISK so a huge hit set spills instead
        # of evicting; the cache is reclaimed by Spark's ContextCleaner
        # once the returned query plan (which references it) is released.
        from pyspark import StorageLevel

        phrase_hits = ph.select(
            F.shiftright("query_id", 10).alias("qid"),
            (F.col("query_id") % (1 << 10)).alias("cid"),
            "doc_id",
        ).persist(StorageLevel.MEMORY_AND_DISK)

    def _indicators(specs: list[tuple[int, int, Clause]]) -> DataFrame | None:
        """(qid, cid, doc_id) distinct rows where the clause matches."""
        parts = []
        term_rows = []
        for qid, cid, cl in specs:
            if cl.kind == "term":
                term_rows += [(qid, cid, t) for t in _clause_terms(cl, config)]
            elif cl.kind == "prefix":
                term_rows += [
                    (qid, cid, t) for t in expansions.get((qid, cid), [])
                ]
        if term_rows:
            ct = spark.createDataFrame(
                term_rows, "qid int, cid int, term string"
            )
            ind_terms = sorted({t for _, _, t in term_rows})
            parts.append(
                term_stats.filter(F.col("term").isin(ind_terms))
                .join(F.broadcast(ct), "term")
                .select("qid", "cid", "doc_id")
            )
        ph_ids = [
            (qid, cid) for qid, cid, cl in specs if cl.kind == "phrase"
        ]
        if ph_ids and phrase_hits is not None:
            sel = spark.createDataFrame(ph_ids, "qid int, cid int")
            parts.append(
                phrase_hits.join(F.broadcast(sel), ["qid", "cid"])
                .select("qid", "cid", "doc_id")
            )
        if not parts:
            return None
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u.distinct()

    qterms = spark.createDataFrame(
        sorted(score_rows), "query_id int, term string"
    )
    score_terms = sorted({t for _, t in score_rows})
    tdf = term_df.filter(F.col("term").isin(score_terms)).select("term", "df")
    scored = (
        term_stats.filter(F.col("term").isin(score_terms))
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(tdf), "term")
        .withColumn(
            "tscore",
            idf_expr(n_docs)
            * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tscore").alias("score"))
    )

    # clause-level membership: >=1 positive clause matches (matters when a
    # should-phrase's scattered constituents would otherwise admit a doc)
    has_phrase_should = any(
        cl.kind == "phrase" for _, _, cl in pos_specs if cl.role != "must"
    )
    if has_phrase_should:
        pos_ind = _indicators(pos_specs)
        if pos_ind is not None:
            member = pos_ind.select(
                F.col("qid").alias("query_id"), "doc_id"
            ).distinct()
            scored = scored.join(member, ["query_id", "doc_id"], "left_semi")

    must_ind = _indicators(must_specs)
    if must_ind is not None:
        n_must = {}
        for qid, _, _ in must_specs:
            n_must[qid] = n_must.get(qid, 0) + 1
        # queries without must clauses pass trivially (n_must 0 == count 0)
        counts = (
            must_ind.groupBy("qid", "doc_id")
            .agg(F.countDistinct("cid").alias("n_matched"))
            .withColumnRenamed("qid", "query_id")
        )
        need = spark.createDataFrame(
            [(q, n) for q, n in n_must.items()], "query_id int, n_need int"
        )
        scored = (
            scored.join(counts, ["query_id", "doc_id"], "left")
            .join(F.broadcast(need), "query_id", "left")
            .filter(
                F.coalesce(F.col("n_matched"), F.lit(0))
                == F.coalesce(F.col("n_need"), F.lit(0))
            )
            .select("query_id", "doc_id", "score")
        )
    not_ind = _indicators(not_specs)
    if not_ind is not None:
        excl = not_ind.select(
            F.col("qid").alias("query_id"), "doc_id"
        ).distinct()
        scored = scored.join(excl, ["query_id", "doc_id"], "left_anti")
    return _rank_topk(scored, k)
