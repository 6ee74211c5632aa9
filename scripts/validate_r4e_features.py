"""At-scale validation for the round-4e surfaces (200k docs / 200k vecs).

* span_within / span_containing on stop-grade clause terms over a 200k-doc
  positional index: range-partitioned == single-task (row identity), both
  timed — the containment algebra inherits the doc-range fan-out.
* repetition_stats (Gopher filters) over 200k synthetic docs, timed —
  the (doc, gram) groupBys must stay partial-aggregated scan-speed work.
* semantic_dedup_pairs over 200k synthetic 64-d embeddings at n_cells=256,
  timed + sanity (pair count, within-cell restriction) — the per-cell
  quadratic must be held down by the cell count, not corpus size.

Run detached (~6-10 min):
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r4e_features.py > /tmp/r4e_features.log 2>&1 &
Writes BENCH/at_scale_r4e_features.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig  # noqa: E402
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats  # noqa: E402
from elasticsearch_analysis_combo_spark.operators.postings import (  # noqa: E402
    build_postings,
)
from elasticsearch_analysis_combo_spark.operators.similarity import (  # noqa: E402
    semantic_dedup_pairs,
)
from elasticsearch_analysis_combo_spark.operators.text_quality import (  # noqa: E402
    repetition_stats,
)
from elasticsearch_analysis_combo_spark.query.spans import (  # noqa: E402
    span_containing_match,
    span_within_match,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 200_000
N_VECS = 200_000
EMB_DIM = 64
N_CELLS = 256
CFG = ComboConfig(["whitespace"])
# stop-grade big clause + common little clause
SPAN_WC = [(0, "return", "the if"), (1, "cache", "token stream")]
SLOP = 3


def _timed(out, label, fn, reps=3):
    times, res = [], None
    for _ in range(reps):
        t = time.time()
        res = fn()
        times.append(time.time() - t)
    out[label + "_p50_sec"] = round(sorted(times)[len(times) // 2], 3)
    return res


def main():
    spark = get_spark("r4e_features", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_docs": N_DOCS, "n_vecs": N_VECS, "n_cells": N_CELLS}

    corpus = ingest(generate_corpus(spark, N_DOCS)).cache()
    corpus.count()
    t0 = time.time()
    stats = build_term_stats(corpus, CFG, content_col="content")
    avgdl_row = stats.select(F.avg("dl")).collect()[0][0]
    # salted hot-term path, mirroring bench.py / build_index — without
    # it, stop-grade terms serialize into single encode tasks
    hot_list = [
        r["term"]
        for r in stats.sample(0.05, seed=42)
        .groupBy("term").agg(F.count("*").alias("df"))
        .filter(F.col("df") >= max(4, int((N_DOCS // 10) * 0.05)))
        .collect()
    ]
    hot = spark.createDataFrame(
        [(t,) for t in hot_list] or [("",)], "term string"
    )
    post = build_postings(
        stats, avgdl=float(avgdl_row), hot_terms=hot, salt_shards=8,
        with_positions=True,
    ).cache()
    post.count()
    out["index_build_sec"] = round(time.time() - t0, 2)

    def rows(df):
        return {
            (r["query_id"], r["doc_id"]): r["n_matches"] for r in df.collect()
        }

    for name, fn in (
        ("span_within", span_within_match),
        ("span_containing", span_containing_match),
    ):
        single = _timed(
            out, f"{name}_single",
            lambda fn=fn: rows(fn(spark, post, SPAN_WC, CFG, slop=SLOP)),
        )
        part = _timed(
            out, f"{name}_partitioned",
            lambda fn=fn: rows(
                fn(spark, post, SPAN_WC, CFG, slop=SLOP, range_bits=4)
            ),
        )
        out[f"{name}_equal"] = single == part
        out[f"{name}_rows"] = len(single)

    docs = corpus.selectExpr("doc_id", "content as text")
    # aggregate a joined column — count() would let Catalyst eliminate
    # the unique-key left joins and skip the gram work
    _timed(
        out, "repetition",
        lambda: repetition_stats(docs).agg(
            F.sum("top_ngram_char_frac"), F.sum("dup_ngram_char_frac")
        ).collect(),
    )

    def gen_vecs(batches):
        for pdf in batches:
            rng = np.random.RandomState(int(pdf["id"].iloc[0]) % 2**31)
            mat = rng.standard_normal((len(pdf), EMB_DIM)).astype(np.float32)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["id"].to_numpy(),
                    "embedding": pd.Series(list(mat), dtype=object),
                }
            )

    emb = (
        spark.range(N_VECS)
        .repartition(32)
        .mapInPandas(gen_vecs, "vec_id long, embedding array<float>")
        .cache()
    )
    emb.count()
    pairs = _timed(
        out, "semantic_dedup",
        lambda: semantic_dedup_pairs(
            emb, threshold=0.5, n_cells=N_CELLS, seed=42
        ).count(),
        reps=2,
    )
    out["semantic_dedup_pairs"] = pairs

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "at_scale_r4e_features.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
