"""At-scale validation of the round-5i additions (200k docs).

* fielded multi_match type=phrase: the doc-range-PARTITIONED per-field
  scoring path (phrase_match_partitioned fan-out + external idf*satu
  projection) vs the single-task phrase_topk path — ROW IDENTITY
  (rank + 6-rounded score) at 200k docs, with wall times for both.
  This is the invariant that lets a big field fan out while a small
  sibling field keeps its cheap pass.
* fielded multi_match type=bool_prefix: at tie_breaker=0 the blend of
  FULL per-field sets must equal the cheap merge of per-field TOP-K
  results combined by max (the same containment argument the WAND
  best_fields path proves) — checked at 200k docs.
* significant_text through the aggs compiler vs the standalone
  facets.significant_text_agg on the same 200k-doc frame and
  predicate — IDENTITY of (term, fg, bg) and 9-rounded scores (two
  independent implementations of the same JLH contract).
* function_score functions-array single-fvf entry vs the one-function
  shorthand route — IDENTITY (two compiler paths, same math).

Run detached (~6-10 min), NEVER concurrently with another Spark job:
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r5i_features.py > /tmp/r5i_features.log 2>&1 &
Writes BENCH/at_scale_r5i_features.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig  # noqa: E402
from elasticsearch_analysis_combo_spark.analysis.udfs import (  # noqa: E402
    build_term_stats,
)
from elasticsearch_analysis_combo_spark.operators.postings import (  # noqa: E402
    build_segments,
    merge_segments,
)
from elasticsearch_analysis_combo_spark.query.multifield import (  # noqa: E402
    derive_fields,
    field_corpus_stats,
    multi_match_bool_prefix_topk,
    multi_match_phrase_topk,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 200_000
CFG = ComboConfig(["whitespace"])
PHRASES = [(0, "the if"), (1, "positions merging"), (2, "zzz qqq")]
BP = [(0, "the tok"), (1, "index_g")]
BOOSTS = {"title": 2.0, "body": 1.0}


def rows_of(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in df.collect()
    )


def main():
    report = {"n_docs": N_DOCS}
    spark = get_spark("r5i_features", cores=32, shuffle_partitions=32)

    corpus = ingest(generate_corpus(spark, N_DOCS, seed=9)).cache()
    corpus.count()
    d = derive_fields(corpus, content_col="content", title_tokens=8).cache()

    stats, tdfs, meta, post = {}, {}, {}, {}
    t0 = time.time()
    for f in ("title", "body"):
        s = build_term_stats(d, CFG, content_col=f).cache()
        s.count()
        stats[f] = s
        tdfs[f] = s.groupBy("term").agg(F.count("*").alias("df"))
        n, avgdl = field_corpus_stats(s)
        meta[f] = (n, avgdl)
        segs = build_segments(s, avgdl=avgdl, salt_shards=4,
                              block_size=128, with_positions=True)
        post[f] = merge_segments(segs, avgdl=avgdl, block_size=128,
                                 with_positions=True).cache()
        post[f].count()
    report["fielded_build_secs"] = round(time.time() - t0, 2)

    # ---- phrase: partitioned == single at 200k
    kw = dict(boosts=BOOSTS, tie_breaker=0.3, k=20)
    t0 = time.time()
    single = rows_of(multi_match_phrase_topk(
        spark, post, meta, PHRASES, CFG, partitioned=False, **kw))
    t_single = round(time.time() - t0, 2)
    t0 = time.time()
    part = rows_of(multi_match_phrase_topk(
        spark, post, meta, PHRASES, CFG, partitioned=True,
        range_bits=4, **kw))
    t_part = round(time.time() - t0, 2)
    report["phrase_partitioned_identity"] = single == part
    report["phrase_rows"] = len(single)
    report["phrase_single_secs"] = t_single
    report["phrase_partitioned_secs"] = t_part

    # ---- bool_prefix: tb=0 full-set blend == per-field top-k max merge
    t0 = time.time()
    full = rows_of(multi_match_bool_prefix_topk(
        spark, stats, tdfs, meta, BP, CFG, boosts=BOOSTS,
        tie_breaker=0.0, k=10))
    from elasticsearch_analysis_combo_spark.query.boolean import (
        match_bool_prefix_topk,
    )
    per = []
    for f, boost in BOOSTS.items():
        rows = match_bool_prefix_topk(
            spark, stats[f], tdfs[f], BP, CFG, meta[f][0], meta[f][1],
            k=10).collect()
        per.extend(
            (r["query_id"], r["doc_id"], boost * r["score"]) for r in rows
        )
    best = {}
    for qid, doc, s in per:
        best[(qid, doc)] = max(best.get((qid, doc), 0.0), s)
    merged = []
    for qid in {q for q, _ in best}:
        docs = sorted(
            ((d_, s) for (q, d_), s in best.items() if q == qid),
            key=lambda x: (-round(x[1], 6), x[0]),
        )[:10]
        merged.extend(
            (qid, i + 1, d_, round(s, 6))
            for i, (d_, s) in enumerate(docs)
        )
    report["bool_prefix_tb0_topk_merge_identity"] = (
        sorted(merged) == full
    )
    report["bool_prefix_secs"] = round(time.time() - t0, 2)

    # ---- significant_text: compiler vs standalone facets agg
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )
    from elasticsearch_analysis_combo_spark.query.facets import (
        significant_text_agg,
    )

    docs_tbl = corpus.select("doc_id", F.col("content").alias("text"),
                             "lang").cache()
    pred = "lang = 'java'"
    t0 = time.time()
    comp = dsl_search_aggs(docs_tbl, {
        "query": {"term": {"lang": "java"}},
        "aggs": {"st": {"significant_text": {
            "field": "text", "size": 10, "min_doc_count": 3}}},
    }).collect()
    comp_by = {}
    for r in comp:
        comp_by.setdefault(r["key"], {})[r["metric"]] = r["value"]
    alone = significant_text_agg(
        docs_tbl, pred, text_col="text", size=10, min_doc_count=3,
    ).collect()
    alone_by = {
        r["term"]: {"doc_count": float(r["fg_df"]),
                    "bg_count": float(r["bg_df"]), "score": r["score"]}
        for r in alone
    }
    same_terms = set(comp_by) == set(alone_by)
    same_vals = same_terms and all(
        comp_by[t]["doc_count"] == alone_by[t]["doc_count"]
        and comp_by[t]["bg_count"] == alone_by[t]["bg_count"]
        and round(comp_by[t]["score"], 9) == round(alone_by[t]["score"], 9)
        for t in comp_by
    )
    report["significant_text_compiler_vs_standalone"] = same_vals
    report["significant_text_terms"] = len(comp_by)
    report["significant_text_secs"] = round(time.time() - t0, 2)

    # ---- functions-array single fvf entry == one-function shorthand
    from elasticsearch_analysis_combo_spark.query.dsl import dsl_topk

    cstats = build_term_stats(corpus, CFG).cache()
    n_docs = cstats.select("doc_id").distinct().count()
    avgdl = cstats.select("doc_id", "dl").distinct().agg(
        F.avg("dl")).collect()[0][0]
    term_df = cstats.groupBy("term").agg(F.count("*").alias("df"))
    dmeta = corpus.select("doc_id", F.length("content").alias("n_chars"))
    fvf = {"field": "n_chars", "factor": 0.001, "modifier": "log1p"}

    def run(node, qid):
        out = dsl_topk(spark, cstats, term_df, None, [(qid, node)], CFG,
                       n_docs, avgdl, doc_meta=dmeta, k=20).collect()
        return sorted((r["rank"], r["doc_id"], round(r["score"], 6))
                      for r in out)

    t0 = time.time()
    short = run({"function_score": {
        "query": {"match": {"content": "the"}},
        "field_value_factor": fvf, "boost_mode": "multiply"}}, 0)
    arr = run({"function_score": {
        "query": {"match": {"content": "the"}},
        "functions": [{"field_value_factor": fvf}],
        "score_mode": "multiply", "boost_mode": "multiply"}}, 1)
    report["functions_array_vs_shorthand_identity"] = short == arr
    report["functions_array_secs"] = round(time.time() - t0, 2)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "at_scale_r5i_features.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
