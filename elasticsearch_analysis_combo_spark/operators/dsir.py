"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): pick raw-corpus documents whose hashed-n-gram
distribution matches a TARGET corpus (the "make pretraining data look
like Wikipedia/books" selector). The published recipe: featurize every
document as a bag of hashed unigrams+bigrams, fit bag-of-buckets
models p(target) and q(raw), score each raw doc with
``log p(doc)/q(doc) = sum_grams log(p[bucket]/q[bucket])``, then
Gumbel-top-k resample by the importance weights.

Everything is deterministic and engine-portable (the repo's md5 bucket
hash + hash-derived Gumbel noise), so the selection replays exactly in
plain SQL — and re-runs identically at any cluster size.

Scale shape (100 TB raw / small target): one array-side gram pass per
corpus (no window, no per-row Python), two bucket-count aggregations
whose results are ``num_buckets``-sized (default 10k rows — broadcast),
one broadcast join back to the exploded raw grams, one per-doc sum.
The target corpus is typically tiny next to raw; nothing row-scale
ever sorts globally, and the final top-k is an ordered limit over
(doc, weight) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.operators.text_quality import (
    _gram_col,
)

_TWO60 = 1 << 60


def _bucket(gram_col, num_buckets: int):
    """Portable md5 bucket of a gram string (same 60-bit-prefix trick as
    operators/sampling: DuckDB replays it as ('0x'||substr(md5(g),1,15))
    ::BIGINT % B)."""
    h = F.conv(F.substring(F.md5(gram_col), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(num_buckets))


def _doc_buckets(
    df: DataFrame, text_col: str, id_col: str, num_buckets: int
) -> DataFrame:
    """(doc_id, bucket) — one row per unigram+bigram occurrence. The
    token array materializes as its own column BEFORE the gram lambdas:
    HOFs are interpreted (CodegenFallback), so an expression captured
    inside the lambda re-evaluates per element — an inlined split()
    makes gram construction O(len^2) per doc (measured 80 s -> ~8 s at
    200k docs)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tok_df = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    )
    grams = F.concat(
        _gram_col(F.col("_toks"), 1), _gram_col(F.col("_toks"), 2)
    )
    return (
        tok_df.select("doc_id", F.explode(grams).alias("_g"))
        .filter(F.col("_g") != "")
        .select("doc_id", _bucket(F.col("_g"), num_buckets).alias("bucket"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """(doc_id, n_grams, log_weight) for every raw doc with >= 1 gram:
    ``log_weight = sum_grams [log p_target(bucket) - log q_raw(bucket)]``
    with add-``smoothing`` estimates over ``num_buckets`` hashed
    unigram+bigram buckets. Higher = more target-like.

    The two bucket-count frames reduce map-side to <= num_buckets rows;
    the per-gram log-ratio lookup is a broadcast join (every bucket a
    raw doc references exists on the raw side by construction, so the
    join is inner-complete); the per-doc sum is the only row-scale
    shuffle, keyed on doc_id."""
    rb = _doc_buckets(raw, text_col, id_col, num_buckets)
    tb = _doc_buckets(target, text_col, id_col, num_buckets)
    rawc = rb.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tgtc = tb.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    totals = rawc.agg(F.sum("rc")).collect()[0][0] or 0
    t_total = tgtc.agg(F.sum("tc")).collect()[0][0] or 0
    s, b = float(smoothing), float(num_buckets)
    ratio = (
        rawc.join(tgtc, "bucket", "left")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(s))
                    / F.lit(t_total + s * b)
                )
                - F.log((F.col("rc") + F.lit(s)) / F.lit(totals + s * b))
            ).alias("log_ratio"),
        )
    )
    return (
        rb.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("log_ratio").alias("log_weight"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 10_000,
    smoothing: float = 1.0,
    seed: int = 42,
    length_normalize: bool = False,
) -> DataFrame:
    """Gumbel-top-k importance resampling (the DSIR selection step):
    rank raw docs by ``log_weight + Gumbel(doc)`` and keep the top
    ``k`` — equivalent to sampling without replacement with probability
    proportional to the importance weights, but DETERMINISTIC: the
    Gumbel noise derives from the portable (seed, doc_id) md5 hash, so
    any engine / any partitioning / any cluster size selects the same
    documents. ``length_normalize`` divides the log weight by the gram
    count (per-gram average — damps the long-doc bias, a knob the paper
    discusses). Ranking compares the 6-rounded key (doc_id tiebreak) so
    near-tied floats cannot flip cross-engine order."""
    w = dsir_log_weights(
        raw, target, text_col=text_col, id_col=id_col,
        num_buckets=num_buckets, smoothing=smoothing,
    )
    lw = (
        F.col("log_weight") / F.col("n_grams")
        if length_normalize else F.col("log_weight")
    )
    u = (
        F.expr(
            f"conv(substr(md5(concat('{int(seed)}', ':', "
            f"cast(doc_id as string))), 1, 15), 16, 10)"
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(float(_TWO60))
    scored = w.select(
        "doc_id", "n_grams", "log_weight",
        (lw - F.log(-F.log(u))).alias("gumbel_key"),
    )
    topk = scored.orderBy(
        F.desc(F.round("gumbel_key", 6)), F.asc("doc_id")
    ).limit(k)
    from pyspark.sql import Window

    win = Window.orderBy(F.desc(F.round("gumbel_key", 6)), F.asc("doc_id"))
    return topk.withColumn(
        "rank", F.row_number().over(win).cast("long")
    ).select("rank", "doc_id", "n_grams", "log_weight", "gumbel_key")
