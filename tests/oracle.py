"""Single-node pure-Python reference implementation (the rank-identity
oracle of SURVEY.md §7 M2): same analysis core, independent scoring path —
plain dicts and floats, no Spark, no numpy codec. Validates the distributed
posting build, BM25 math, and WAND pruning."""

from __future__ import annotations

import math

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
    term_stats,
)


def build_oracle_index(docs: list[tuple[int, str, str | None]], config: ComboConfig):
    """docs: (doc_id, content, lang) -> (postings, doc_len, n_docs, avgdl).
    postings: term -> {doc_id: (tf, positions)}."""
    postings: dict[str, dict[int, tuple[int, list[int]]]] = {}
    doc_len: dict[int, int] = {}
    for doc_id, content, lang in docs:
        toks = analyze_text(content or "", config, lang)
        stats, dl = term_stats(toks)
        if dl == 0:
            continue
        doc_len[doc_id] = dl
        for term, (tf, positions) in stats.items():
            postings.setdefault(term, {})[doc_id] = (tf, positions)
    n_docs = len(doc_len)
    avgdl = sum(doc_len.values()) / n_docs if n_docs else 0.0
    return postings, doc_len, n_docs, avgdl


def oracle_topk(
    docs: list[tuple[int, str, str | None]],
    config: ComboConfig,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Exhaustive BM25 top-k: [(rank, doc_id, score)]. Scores sum in
    ascending-term order (same convention as the WAND path)."""
    postings, doc_len, n_docs, avgdl = build_oracle_index(docs, config)
    qterms = sorted({t.term for t in analyze_text(query, config)})
    scores: dict[int, float] = {}
    for term in qterms:
        plist = postings.get(term)
        if not plist:
            continue
        df = len(plist)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for doc_id, (tf, _pos) in plist.items():
            dl = doc_len[doc_id]
            sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * sat
    ranked = sorted(scores.items(), key=lambda e: (-e[1], e[0]))[:k]
    return [(i + 1, doc_id, s) for i, (doc_id, s) in enumerate(ranked)]
