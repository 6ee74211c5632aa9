"""End-to-end corpus curation and sequence packing — the compositions a
large-scale LLM training-data pipeline runs over this repo's operators.

``curate_corpus`` chains the standard cleanup plan — language filter,
quality floor, exact dedup (keep-first by portable hash), per-source
sampling — as ONE declarative DataFrame plan: every step is a column
expression over the same scan (no joins), so Catalyst fuses the filters
into the scan and the whole chain costs one keyed aggregation + semi-join
(the exact-dedup exchange) regardless of how many steps are enabled.

``pack_sequences`` assigns documents to fixed-token-budget training
sequences ("offset packing": concatenate docs in a deterministic order,
cut at budget boundaries, assign each doc to the bin where it STARTS —
whole docs are never split). Packing is per-bucket so no global sort or
single-partition window exists: docs hash into ``n_buckets`` independent
streams, each packed by one window cumsum, and a sequence id is
``bucket * 2^32 + local_bin``. Deterministic and engine-replayable (the
order inside a bucket is the portable md5 hash), so the SAME packing
comes out of a laptop and a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.operators.sampling import _u60

#: offset applied to the dedup ORDERING hash seed so it is independent
#: of the sampling hash at the same user seed (see curate_corpus body)
DEDUP_SEED_SALT = 1_000_003


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: list[str] | None = None,
    min_quality: float | None = None,
    dedup: bool = True,
    sample_fractions: dict[str, float] | None = None,
    strata_col: str = "source",
    seed: int = 42,
    default_fraction: float = 1.0,
) -> DataFrame:
    """The curation chain, each stage optional:

    1. language filter (``lang_id`` argmax in ``languages``),
    2. quality floor (``quality_score >= min_quality``),
    3. exact dedup — ONE survivor per distinct text, chosen
       deterministically (lowest portable hash of ``id_col``; content
       identity is the md5 of the text, so the same corpus dedups the
       same way in any engine),
    4. per-stratum Bernoulli sampling (corpus mixing).

    Returns the surviving rows of ``docs`` with ``lang`` and
    ``quality_score`` columns attached. Filters 1/2/4 are pure
    predicates (pushed/codegen); only dedup shuffles (on the text
    hash — at 100 TB that is the unavoidable exact-dedup exchange, and
    it runs AFTER the cheap filters have already dropped their share)."""
    from elasticsearch_analysis_combo_spark.operators.text_quality import (
        lang_expr,
        quality_expr,
    )

    # derived lang / quality_score OVERWRITE any same-named input column
    # (the curation chain is the source of truth for both) and attach as
    # PROJECTIONS over the same scan — no joins, so the only exchange in
    # the whole chain is the dedup aggregation below
    out = docs
    if "lang" in out.columns:
        out = out.drop("lang")
    if "quality_score" in out.columns:
        out = out.drop("quality_score")
    pred_lang, _ = lang_expr(text_col)
    out = out.withColumn("lang", pred_lang)
    if languages is not None:
        out = out.filter(F.col("lang").isin(list(languages)))
    out = out.withColumn(
        "quality_score", F.round(quality_expr(text_col), 6)
    )
    if min_quality is not None:
        out = out.filter(F.col("quality_score") >= float(min_quality))
    if dedup:
        # survivor per distinct text = min (hash, id). Shuffle ONLY the
        # (text-md5, order-hash, id) triple — a window partitioned by
        # md5(text) would exchange the full document text; min_by over
        # the keyed projection moves ~50 bytes/row at any corpus size,
        # then a semi-join restores the surviving rows.
        # The ordering hash is SALTED away from the sampling hash: the
        # survivor of an n-way duplicate group has the MINIMUM of n
        # uniforms, so reusing the sampling hash would pass duplicated
        # docs through a downstream fraction-f cut with probability
        # 1-(1-f)^n instead of f — boilerplate would be oversampled,
        # the opposite of what curation wants
        keyed = out.select(
            F.md5(F.col(text_col)).alias("_k"),
            _u60(id_col, seed + DEDUP_SEED_SALT).alias("_h"),
            F.col(id_col).alias("_id"),
        )
        survivors = (
            keyed.groupBy("_k")
            .agg(
                F.min_by(
                    F.col("_id"), F.struct(F.col("_h"), F.col("_id"))
                ).alias(id_col)
            )
            .select(id_col)
        )
        out = out.join(survivors, id_col, "semi")
    if sample_fractions is not None:
        from elasticsearch_analysis_combo_spark.operators.sampling import (
            stratified_sample,
        )

        out = stratified_sample(
            out, strata_col, sample_fractions, key_col=id_col, seed=seed,
            default_fraction=default_fraction,
        )
    return out


def pack_sequences(
    docs_with_tokens: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Offset packing into ``budget``-token training sequences.

    Each doc lands in bucket ``u60(id) % n_buckets``; inside a bucket,
    docs order by (hash, id) and the doc's sequence is the bin its
    STARTING token offset falls in: ``local_bin = floor((cumsum -
    tokens) / budget)``. A bin may run over by at most one doc's tail
    (exactly the concat-then-chunk packing LLM loaders use, minus
    doc-splitting); docs longer than ``budget`` occupy their own bin(s)
    without blocking neighbors. Returns the input plus ``bucket``,
    ``seq_id`` (= bucket * 2^32 + local_bin), and ``start_offset``.

    Scale shape: ONE window cumsum per bucket (n_buckets independent
    partitions — no global sort), deterministic under any input
    partitioning because the order key is the portable hash."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    h = _u60(id_col, seed)
    bucket = F.pmod(h, F.lit(n_buckets)).cast("int")
    w = Window.partitionBy("bucket").orderBy(F.asc("_h"), F.asc(id_col))
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        docs_with_tokens.withColumn("_h", h)
        .withColumn("bucket", bucket)
        .withColumn("_cum", cum)
        .withColumn(
            "start_offset", (F.col("_cum") - F.col(token_col)).cast("long")
        )
        .withColumn(
            "seq_id",
            (
                F.col("bucket").cast("long") * F.lit(1 << 32)
                + F.floor(F.col("start_offset") / budget)
            ),
        )
        .drop("_h", "_cum")
    )
    return out


# (name, pattern, replacement) — patterns restricted to the syntax both
# Java regex (Spark) and RE2 (DuckDB oracle) implement identically: no
# backreferences, no lookaround; \b and (?:...) are fine in both.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d .-]{7,}\d", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Curation-time PII redaction: chained ``regexp_replace`` over the
    text column (emails, IPv4s, phone-shaped digit runs by default) —
    pure codegen projections, scan-speed and map-only at any scale.
    Pattern order matters (IPs are scrubbed before the looser phone
    digit-run pattern can eat them) and is applied identically in the
    oracle replay."""
    col = F.col(text_col)
    for _, pat, repl in patterns or PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(text_col, col)


def chunk_passages(
    df: DataFrame,
    size: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window passages — the
    retrieval/embedding chunking step of a RAG or training-data
    pipeline (ES 8's semantic_text chunking strategy: fixed ``size``
    windows advancing by ``size - overlap``). Returns (id, chunk_id,
    start_tok, n_tokens, text); the final window is the remainder (no
    padding), a doc shorter than ``size`` yields one chunk, empty text
    yields none. Map-only array algebra (split + sequence + slice per
    row), so chunking 100 TB is scan-bound with zero shuffle; chunk_id
    is deterministic (start offset order) on any cluster."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size: {overlap}, {size}")
    stride = size - overlap
    toks = F.split(F.col(text_col), r"\s+")
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ... while start < n AND the
    # previous chunk did not already cover the tail
    n_chunks = F.when(
        n <= size, F.lit(1)
    ).otherwise(
        F.ceil((n - F.lit(size)) / F.lit(float(stride))).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            (i * stride).alias("start_tok"),
            F.least(n - i * stride, F.lit(size)).alias("n_tokens"),
            F.array_join(
                F.slice(toks, i * stride + 1, size), " "
            ).alias("text"),
        ),
    )
    return (
        df.filter(F.length(text_col) > 0)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").cast("long").alias("chunk_id"),
            F.col("c.start_tok").cast("long").alias("start_tok"),
            F.col("c.n_tokens").cast("long").alias("n_tokens"),
            F.col("c.text").alias("text"),
        )
    )


#: default URL badwords — the C4 / RefinedWeb style keyword blocklist
#: (kept short and generic here; production swaps the full list in)
URL_BLOCK_KEYWORDS = ["casino", "porn", "viagra", "xxx"]


def url_filter(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocked_domains: list[str] | None = None,
    blocked_keywords: list[str] | None = None,
    max_path_depth: int = 12,
    require_scheme: bool = True,
) -> DataFrame:
    """C4 / RefinedWeb-style URL curation stage: per-document URL
    signals + a ``keep`` verdict, all MAP-ONLY column algebra over one
    scan (the stage a web-scale pipeline runs before ever reading the
    text — at 100 TB the URL column is orders of magnitude narrower
    than the content, so this filter is scan-speed and shuffles
    nothing).

    Signals (RefinedWeb §3.1's URL filtering, Penedo et al. 2023;
    C4's badword blocklist, Raffel et al. 2020):

    - ``domain``: the lowercased registered host (scheme and port
      stripped; empty when the value has no parseable host).
    - ``blocked_domain``: exact match or dot-suffix match against
      ``blocked_domains`` (``ads.example.com`` matches a blocked
      ``example.com`` — subdomains inherit the block, the blocklist
      convention).
    - ``blocked_keyword``: any of ``blocked_keywords`` occurs ANYWHERE
      in the lowercased URL (the C4 badword rule).
    - ``path_depth``: number of non-empty ``/`` segments after the
      host — crawler-trap URLs nest absurdly deep.
    - ``keep``: scheme parses (when ``require_scheme``), domain
      non-empty, not blocked either way, depth <= ``max_path_depth``.

    Every predicate is a deterministic Spark-SQL expression restricted
    to the Java-regex ∩ RE2 ∩ DuckDB dialect so an engine oracle
    replays the verdicts byte-identically (same contract as
    ``scrub_pii``)."""
    blocked_domains = [d.lower() for d in (blocked_domains or [])]
    blocked_keywords = [
        k.lower() for k in (
            URL_BLOCK_KEYWORDS if blocked_keywords is None
            else blocked_keywords
        )
    ]
    u = F.lower(F.col(url_col))
    has_scheme = u.rlike("^[a-z][a-z0-9+.-]*://")
    # strip the scheme FIRST (an optional non-capturing scheme group
    # would backtrack — "https://h" can re-parse as authority "https:"
    # + path "//h" — and RE2 has no possessive quantifiers to forbid
    # it; anchored strip + unanchored extract is dialect-portable)
    rest = F.regexp_replace(u, "^[a-z][a-z0-9+.-]*://", "")
    # host = before the first / ? # or :port
    host = F.regexp_extract(rest, r"^([^/?#:]+)", 1)
    # path = first /-to-end after the authority, query/fragment cut
    path = F.regexp_extract(rest, r"^[^/?#]*(/[^?#]*)", 1)
    # non-empty segment count: length difference trick is fragile with
    # multi-char segments; filter the split array instead
    depth = F.size(
        F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    )
    if blocked_domains:
        bd = None
        for d in blocked_domains:
            c = (host == F.lit(d)) | host.endswith("." + d)
            bd = c if bd is None else (bd | c)
    else:
        bd = F.lit(False)
    if blocked_keywords:
        bk = None
        for kw in blocked_keywords:
            c = u.contains(kw)
            bk = c if bk is None else (bk | c)
    else:
        bk = F.lit(False)
    keep = (
        (host != F.lit(""))
        & ~bd & ~bk
        & (depth <= F.lit(max_path_depth))
    )
    if require_scheme:
        keep = keep & has_scheme
    return docs.select(
        F.col(id_col).alias("doc_id"),
        host.alias("domain"),
        bd.alias("blocked_domain"),
        bk.alias("blocked_keyword"),
        depth.cast("int").alias("path_depth"),
        keep.alias("keep"),
    )
