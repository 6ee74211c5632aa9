"""Text analysis operators for corpus curation (engine extensions:
language-ID, quality scoring, token counting, document fingerprinting).

All four are pure DataFrame/SQL expressions (JVM-side, codegen'd, no UDF) so
they run at scan speed and their semantics are mirror-expressible in the
DuckDB oracle. The fingerprint operator implements winnowing-style selection
(Schleimer et al. 2003) with window functions.

Portable hashing note: Spark's hash()/xxhash64() differ from DuckDB's
hash(), so oracle-checked fingerprints derive 63-bit ints from md5 hex
(identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# small per-language stopword marker sets for the n-gram/stopword-ratio
# language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "dans"],
    "es": ["el", "la", "los", "que", "es", "no", "una", "por"],
}


def tokens_col(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def lang_expr(text_col: str):
    """(pred_lang, best_score) Column pair — the language-ID argmax as
    pure expressions, composable into any projection (curation chains
    attach them with withColumn; no join, no extra scan)."""
    toks = tokens_col(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
        scores.append((lang, hits / n))
    cjk = (
        F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
        / F.greatest(F.length(F.col(text_col)), F.lit(1))
    )
    scores.append(("zh", cjk))
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # argmax with deterministic first-wins tie-break in declaration order
    for lang, s in reversed(scores):
        pred = F.when(s == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score <= 0.0, F.lit("und")).otherwise(pred)
    return pred, best_score


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: marker-word hit ratio per language, CJK
    codepoint share for zh; argmax with 'und' fallback when nothing fires.
    Pure SQL expressions — scan-speed at any scale."""
    pred, best_score = lang_expr(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("pred_lang"),
        F.round(best_score, 6).alias("lang_score"),
    )


def quality_expr(text_col: str):
    """The composite quality score as one Column (see quality_score) —
    composable into any projection without a join."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS["en"])))
    digits = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1))
    mean_tok_len = (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    digit_ratio = digits / F.greatest(n_chars, F.lit(1))
    return (
        F.when(n_tokens >= 20, 0.25).otherwise(n_tokens / 80.0)
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 0.25).otherwise(0.0)
        + F.least(stop_ratio * 2.5, F.lit(0.25))
        + (distinct_ratio * 0.25)
        - F.least(digit_ratio, F.lit(0.25))
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Composite quality heuristics: length, mean token length, stopword
    ratio, digit/punct share, repetition (distinct-token ratio)."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS["en"])))
    digits = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1))
    mean_tok_len = (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    digit_ratio = digits / F.greatest(n_chars, F.lit(1))
    score = (
        F.when(n_tokens >= 20, 0.25).otherwise(n_tokens / 80.0)
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 0.25).otherwise(0.0)
        + F.least(stop_ratio * 2.5, F.lit(0.25))
        + (distinct_ratio * 0.25)
        - F.least(digit_ratio, F.lit(0.25))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish subword unit count
    (letter-runs, digit-runs, and punctuation singletons — a deterministic
    proxy for byte-pair tokenizer load estimation)."""
    toks = tokens_col(text_col)
    bpe_units = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("ws_tokens"),
        bpe_units.alias("bpe_units"),
        (F.length(F.col(text_col)) / F.greatest(bpe_units, F.lit(1))).alias(
            "chars_per_unit"
        ),
    )


def _portable_hash63(col):
    """63-bit int from md5 hex — identical in Spark and DuckDB SQL."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fingerprint_winnow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints: hash every k-token shingle
    (rolling-hash equivalent via portable md5-derived 63-bit ints), then
    keep each sliding window's minimum hash (distinct). Output:
    (doc_id, fp_hash, pos of first selection). Window functions only —
    shuffles once on doc_id."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    grams = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(sh).alias("pos", "gram")
    ).withColumn("h", _portable_hash63(F.col("gram")))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    winmin = grams.withColumn("wmin", F.min("h").over(w))
    return (
        winmin.filter(F.col("h") == F.col("wmin"))
        .groupBy("doc_id", F.col("h").alias("fp_hash"))
        .agg(F.min("pos").alias("first_pos"))
    )


def _gram_col(toks, n: int):
    """All (overlapping) n-gram strings of a token array — empty array
    when the doc has fewer than n tokens (sequence() would otherwise
    run descending)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 quality filters), per doc:

    * ``dup_token_frac``      — ``1 - distinct/total`` whitespace tokens;
    * ``top_ngram_char_frac`` — characters covered by ALL occurrences of
      the single most frequent ``top_n``-gram, / total chars (ties break
      to the lexicographically greatest gram — a total order, so the
      pick is deterministic cross-engine);
    * ``dup_ngram_char_frac`` — characters covered by every ``dup_n``-gram
      occurring more than once, occurrence-counted (overlapping
      occurrences are NOT deduplicated — a documented simplification of
      Gopher's overlap-free character count; same filtering power,
      exactly SQL-replayable).

    Gram char length counts the joined gram text (tokens + single
    separators). Shape at 100 TB: two explode + partial-aggregated
    groupBys keyed on (doc, gram) — per-doc cardinality is bounded by
    doc length, no corpus-wide vocabulary state — then two map-side
    per-doc reduces rejoined on doc_id. Filters downstream consume the
    fractions (e.g. Gopher drops top_2gram_char_frac > 0.20)."""
    toks = tokens_col(text_col)
    base = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        (
            1.0
            - F.size(F.array_distinct(toks))
            / F.greatest(F.size(toks), F.lit(1)).cast("double")
        ).alias("dup_token_frac"),
    )

    def gram_counts(n: int):
        return (
            df.select(
                F.col(id_col), F.explode(_gram_col(toks, n)).alias("gram")
            )
            .groupBy(id_col, "gram")
            .agg(F.count("*").alias("cnt"))
        )

    top = (
        gram_counts(top_n)
        .groupBy(id_col)
        .agg(
            F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("_top")
        )
        .select(
            F.col(id_col),
            (
                F.col("_top.cnt") * F.length(F.col("_top.gram"))
            ).alias("_top_chars"),
        )
    )
    dup = (
        gram_counts(dup_n)
        .filter(F.col("cnt") >= 2)
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * F.length(F.col("gram"))).alias("_dup_chars")
        )
    )
    nc = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    return (
        base.join(top, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            "dup_token_frac",
            (F.coalesce(F.col("_top_chars"), F.lit(0)) / nc).alias(
                "top_ngram_char_frac"
            ),
            (F.coalesce(F.col("_dup_chars"), F.lit(0)) / nc).alias(
                "dup_ngram_char_frac"
            ),
        )
    )
