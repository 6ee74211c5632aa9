"""Deduplication operators for large-scale training-data pipelines.

Engine extensions beyond the reference (which deduplicates *tokens at one
position*, A14) — these deduplicate *documents across the corpus*, the
standard toolbox for 100TB-scale corpus curation:

* exact duplicates       — sha256 hash-groupBy (one shuffle of hashes only)
* n-gram Jaccard pairs   — shingle explode + self-join (exact, small scale /
                           verification stage)
* MinHash + LSH          — shingle -> H minhash sigs -> band buckets ->
                           candidate pairs without the quadratic join
* SimHash                — 64-bit sign-of-weighted-sum fingerprint + banded
                           Hamming buckets

All steps are DataFrame algebra (JVM-side, codegen) except SimHash's
bit-twiddle, which is one vectorized numpy pass per Arrow batch.
Scale notes per function docstrings: the only quadratic operator
(ngram_jaccard_pairs) exists as the verifier for LSH candidates and for
small corpora; LSH/banding is the 100TB path (shuffle keyed on
(band, bucket-hash), bucket sizes bounded by band width).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a narrow input (single-file scan, small in-memory
    relation) to the cluster's parallelism so CPU-heavy map work (shingle
    explode + H hash exprs, simhash batches) uses every core. No-ops for
    wide scans — a real multi-file corpus already parallelizes, and the
    repartition must not add a shuffle there."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(par) if n < par else df


def exact_duplicate_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ids: int = 1000,
) -> DataFrame:
    """Groups of byte-identical documents: (content_hash, n_docs, doc_ids).
    Only hashes cross the shuffle. ``doc_ids`` is capped at ``max_ids``
    (smallest ids kept) BEFORE aggregation — ids beyond the cap are
    filtered by a window rank, so neither the output row nor the
    collect_list aggregation buffer grows with duplicate multiplicity (a
    10^8-times-duplicated boilerplate file buffers ``max_ids`` ids, not
    10^8); ``n_docs`` stays exact. The window and the groupBy share the
    content_hash partitioning, so Catalyst reuses one exchange. For the
    full membership use :func:`exact_duplicate_members` (scalar rows) or
    :func:`dedup_exact_keep_first`."""
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash")
    ranked = (
        df.select(F.sha2(F.col(text_col), 256).alias("content_hash"), F.col(id_col))
        .withColumn("_n", F.count("*").over(w))
        .withColumn("_rn", F.row_number().over(w.orderBy(F.col(id_col))))
        .filter(F.col("_n") > 1)
    )
    return (
        ranked.filter(F.col("_rn") <= max_ids)
        .groupBy("content_hash")
        .agg(
            F.first("_n").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


def exact_duplicate_members(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate membership as scalar rows: (content_hash, n_docs,
    doc_id), one row per duplicated document. A window count over the hash —
    one shuffle, no per-group arrays, so row width is constant at any
    duplicate multiplicity (the 100 TB-safe shape of
    :func:`exact_duplicate_groups`)."""
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash")
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_hash"),
                  F.col(id_col).alias("doc_id"))
        .withColumn("n_docs", F.count("*").over(w))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact_keep_first(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup keeping the smallest id per identical content (window
    row_number over the hash — one shuffle)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """k-token shingles per doc: (doc_id, shingle). Tokenization is
    a simple whitespace split done JVM-side; shingle assembly uses
    transform+slice over the token array (no UDF).

    ``distinct`` dedupes per (doc, shingle) — one full shuffle of the
    shingle stream, required by set-Jaccard. Consumers whose aggregation
    is duplicate-insensitive (minhash: min over a multiset == min over its
    set) pass ``distinct=False`` and skip that shuffle entirely."""
    # split materialized as a column BEFORE the shingle lambda: HOFs are
    # interpreted (CodegenFallback), so an expression captured inside the
    # lambda re-evaluates per element — inlining the split would make
    # shingling O(len^2) per doc
    tok_df = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), r"\s+").alias("_toks"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    out = (
        tok_df.select("doc_id", F.explode(sh).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard >= threshold: (doc_a, doc_b, jaccard).

    Self-join on shingle — quadratic in docs-per-shingle, so this is the
    *verification* stage for LSH candidates or a small-corpus tool; at scale
    run minhash_lsh_candidates first and verify only candidate pairs."""
    sh = shingles(df, text_col, id_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    bq = sh.alias("b")
    inter = (
        a.join(bq, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_expr(i: int, portable: bool):
    if portable:
        # md5-derived 63-bit int: bit-identical in DuckDB SQL
        # (('0x'||substr(md5(shingle||'#i'),1,15))::bigint)
        return F.conv(
            F.substring(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}"))), 1, 15),
            16, 10,
        ).cast("long")
    return F.xxhash64(F.col("shingle"), F.lit(i))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    portable: bool = False,
) -> DataFrame:
    """(doc_id, sig: array<long>) — sig[i] = min over shingles of
    hash(shingle, i). One explode + one groupBy; the H mins are H parallel
    agg expressions (JVM-side, partial-aggregated map-side). ``portable``
    switches xxhash64 (fastest) to an md5-derived hash reproducible in
    other engines (used by the DuckDB oracle gate).

    The shingle stream is NOT deduplicated: min(hash) is identical over a
    multiset and its set, and skipping the distinct removes the widest
    shuffle of the pipeline — the per-doc partial min aggregation happens
    map-side inside the scan stage, so only (doc_id, H mins) rows ever
    shuffle."""
    sh = shingles(_spread(df), text_col, id_col, k, distinct=False)
    aggs = [
        F.min(_minhash_expr(i, portable)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs)
    return sigs.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH:
    (doc_a, doc_b, n_bands_matched).

    Sig of H hashes split into `bands` bands of H/bands rows; docs sharing
    any band bucket become candidates. The band join shuffles on
    (band_idx, bucket_hash) — no quadratic blowup unless true near-dups are
    quadratic. Verify candidates with ngram_jaccard_pairs semantics.
    ``portable`` makes BOTH the minhash and the band bucket hash md5-derived
    and bit-reproducible in other engines (DuckDB oracle); default xxhash64
    is the fast production path."""
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, k, num_hashes, portable)

    def bucket_expr(bi: int):
        joined = F.concat_ws(
            ",",
            *[
                F.col("sig").getItem(bi * rows + ri).cast("string")
                for ri in range(rows)
            ],
        )
        if portable:
            return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")
        return F.xxhash64(joined)

    band_arr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                bucket_expr(bi).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sigs.select("doc_id", F.explode(band_arr).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.alias("a")
    bq = buckets.alias("b")
    return (
        a.join(bq, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands_matched"))
    )


def lsh_bucket_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """(doc_id, band, bucket) — the LSH band buckets of every doc,
    computed MAP-ONLY (per-row array expressions, zero shuffle): the
    streaming-safe variant of the signature+banding stage. Buckets are
    bit-identical to :func:`minhash_lsh_candidates`'s construction (same
    per-hash min, same joined-band hash), so batch and stream agree.

    The per-row sig is array_min over the shingle array per hash — the
    same multiset-min as the exploded groupBy path, just evaluated
    in-row (interpreted HOF; the work is identical, the shuffle is
    gone). Short docs produce one truncated shingle exactly like the
    batch :func:`shingles` path; only empty-text docs emit no rows."""
    # PYSPARK PITFALL: closing over a loop variable with a default arg
    # (lambda s, i=i: ...) turns the HOF lambda into the BINARY
    # (element, index) form — i silently binds to the ELEMENT INDEX,
    # not the loop value (verified: transform(arr, lambda s, i=7: lit(i))
    # yields [0, 1]). SQL-parsed lambdas sidestep the trap entirely, so
    # the kernel is built with selectExpr.
    rows = num_hashes // bands
    # token array materialized BEFORE the shingle lambda (an inlined
    # split() re-evaluates per element in interpreted HOFs — O(len^2))
    base = df.selectExpr(
        f"{id_col} AS doc_id",
        f"split({text_col}, '\\\\s+') AS _toks",
    ).selectExpr(
        "doc_id",
        f"filter(transform(sequence(0, greatest(size(_toks) - {k}, 0)), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {k}))), "
        "s -> length(s) > 0) AS _sh",
    ).filter(F.size("_sh") > 0)

    def h_sql(i: int) -> str:
        if portable:
            return (
                f"cast(conv(substr(md5(concat(x, '#{i}')), 1, 15), "
                f"16, 10) as long)"
            )
        return f"xxhash64(x, {i})"

    hashed = base.selectExpr(
        "doc_id",
        *[
            f"array_min(transform(_sh, x -> {h_sql(i)})) AS _h{i}"
            for i in range(num_hashes)
        ],
    )

    def bucket_sql(bi: int) -> str:
        joined = ", ".join(
            f"cast(_h{bi * rows + ri} as string)" for ri in range(rows)
        )
        if portable:
            return (
                f"cast(conv(substr(md5(concat_ws(',', {joined})), 1, 15),"
                f" 16, 10) as long)"
            )
        return f"xxhash64(concat_ws(',', {joined}))"

    bucketed = hashed.selectExpr(
        "doc_id",
        "explode(array(" + ", ".join(
            f"struct({bi} AS band, {bucket_sql(bi)} AS bucket)"
            for bi in range(bands)
        ) + ")) AS bb",
    )
    return bucketed.select(
        "doc_id", F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """The standard two-stage near-dup pipeline: MinHash-LSH candidate
    generation, then EXACT n-gram Jaccard verification restricted to the
    candidate pairs: (doc_a, doc_b, jaccard >= threshold).

    Scale shape: the only joins are the banded bucket join (no quadratic
    blowup) and a semi-join of shingles onto candidate docs — the full
    pairwise Jaccard never materializes."""
    cand = minhash_lsh_candidates(
        df, text_col, id_col, k=k, num_hashes=num_hashes, bands=bands,
        portable=portable,
    ).select("doc_a", "doc_b")
    sh = shingles(df, text_col, id_col, k)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_c = sh.join(cand_docs, "doc_id", "left_semi")
    sizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh_c.alias("a")
    bq = sh_c.alias("b")
    inter = (
        a.join(bq, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
        .join(cand, ["doc_a", "doc_b"], "left_semi")  # candidates only
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    checkpoint: str = "local",
) -> DataFrame:
    """Connected components over candidate pairs: (doc_id, component_id)
    where component_id is the smallest doc_id reachable — the clustering
    step between near-dup pair generation and per-cluster dedup.

    Min-label propagation: every vertex repeatedly takes the min of its own
    and its neighbors' labels until a fixpoint — exact components in
    O(cluster diameter) rounds (near-dup clusters are shallow; a 25-round
    cap covers diameter-25 chains and warns if hit). Each round is one join
    + one aggregation on the (symmetrized) edge list; lineage is cut per
    round so plans don't grow with iterations. Rounds are serial by nature
    (each needs the previous labels); the per-round driver ``count()`` is
    the convergence check on an already-materialized result.

    ``checkpoint``: ``"local"`` truncates lineage with localCheckpoint
    (fast, but executor loss during a long run loses blocks and fails the
    job); ``"reliable"`` uses reliable ``DataFrame.checkpoint()`` — the
    100 TB setting — and requires ``spark.sparkContext.setCheckpointDir``
    to point at fault-tolerant storage."""
    import warnings

    if checkpoint not in ("local", "reliable"):
        raise ValueError(f"checkpoint must be 'local' or 'reliable': {checkpoint}")

    def cut(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint == "reliable" else df.localCheckpoint()

    edges = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = cut(edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct())
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("nl")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nl").alias("nbr_label"))
        )
        new_labels = cut(
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_chg"),
            )
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    else:
        warnings.warn(
            f"connected_components hit max_iter={max_iter} before converging"
        )
    return labels.select(F.col("u").alias("doc_id"),
                         F.col("label").alias("component_id"))


def dedup_near_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster-level near-dup dedup: group docs into connected components of
    the candidate pairs, keep the highest-``score_col`` doc per component
    (ties -> smallest id), and pass through every doc not in any pair.
    The standard 'keep the best representative' policy for training-data
    corpora (vs keep-first, which is content-blind)."""
    from pyspark.sql import Window

    comps = connected_components(pairs, max_iter=max_iter)
    in_comp = df.join(
        comps.withColumnRenamed("doc_id", id_col), id_col
    )
    w = Window.partitionBy("component_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    best = (
        in_comp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "component_id")
    )
    rest = df.join(comps.withColumnRenamed("doc_id", id_col), id_col, "left_anti")
    return best.unionByName(rest)


SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc (Charikar 2002): sign of the tf-weighted sum
    of term-hash bit vectors. Fully batch-vectorized: one factorize over the
    batch's tokens, one md5 per batch-vocabulary term (memoized across
    batches), one (vocab x 64) unpackbits, one np.add.at scatter into the
    (docs x 64) accumulator, one packbits back — no per-doc or per-bit
    Python loops."""
    src = _spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        memo: dict[str, int] = {}

        def hash_vocab(uniq) -> np.ndarray:
            out = np.empty(len(uniq), dtype=np.uint64)
            for i, t in enumerate(uniq):
                h = memo.get(t)
                if h is None:
                    h = int.from_bytes(
                        hashlib.md5(t.encode()).digest()[:8], "little"
                    )
                    memo[t] = h
                out[i] = h
            return out

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            tok_lists = [(t or "").split() for t in pdf["_text"]]
            lens = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            fps = np.zeros(len(ids), dtype=np.int64)
            if lens.sum() > 0:
                flat = np.array(
                    [tok for toks in tok_lists for tok in toks], dtype=object
                )
                doc_idx = np.repeat(np.arange(len(ids)), lens)
                codes, uniq = pd.factorize(flat)
                hs = hash_vocab(uniq)
                # (vocab x 64) sign matrix: bit -> +1 / -1
                signs = (
                    np.unpackbits(
                        hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
                    ).astype(np.int64) * 2 - 1
                )
                acc = np.zeros((len(ids), 64), dtype=np.int64)
                # per-occurrence accumulate == tf-weighted sum of term signs
                np.add.at(acc, doc_idx, signs[codes])
                fps = (
                    np.packbits(acc > 0, axis=1, bitorder="little")
                    .copy().view(np.int64).ravel()
                )
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "simhash": pd.Series(fps, dtype="int64")}
            )

    return src.mapInPandas(gen, schema=SIMHASH_SCHEMA)


def simhash_near_dup_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bands: int = 4
) -> DataFrame:
    """Hamming-near candidates: split the 64-bit simhash into `bands`
    16-bit bands; docs sharing any band are candidates (catches all pairs
    within Hamming distance bands-1). Band join only — the 100TB path."""
    width = 64 // bands
    sh = simhash(df, text_col, id_col)
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), bi * width)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sh.select("doc_id", F.explode(band_arr).alias("bb")).select(
        "doc_id", "bb.band", "bb.bucket"
    )
    a = buckets.alias("a")
    bq = buckets.alias("b")
    return (
        a.join(bq, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def find_contaminated(
    train: DataFrame,
    eval_docs: DataFrame,
    k: int = 13,
    min_overlaps: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
) -> DataFrame:
    """Train/eval DECONTAMINATION: training docs sharing at least
    ``min_overlaps`` distinct ``k``-token shingles with any evaluation
    document — the standard 13-gram contamination rule of LLM data
    pipelines (a train doc containing a benchmark question verbatim
    shares its shingles and must be dropped before training).

    Returns (doc_id, eval_id, n_overlaps) per contaminated pair. Scale
    shape: the eval set is small by definition, so its shingle table
    BROADCASTS — the training corpus is one shingle projection + a
    broadcast-hash semi-ish join, never an all-pairs comparison, and no
    shuffle of the train shingle stream is needed (the aggregation keys
    arrive partition-local post-join, Catalyst partial-aggregates)."""
    ev_text = eval_text_col or text_col
    ev_id = eval_id_col or id_col
    # distinct=False on the TRAIN side: a distinct() here would shuffle
    # the full train shingle stream before the join; instead only
    # join-surviving rows shuffle, and countDistinct restores the
    # distinct-shared-shingle semantics post-join
    t_sh = shingles(
        train, text_col=text_col, id_col=id_col, k=k, distinct=False
    )
    e_sh = shingles(
        eval_docs.select(
            F.col(ev_id).alias("eval_id"), F.col(ev_text).alias("_et")
        ),
        text_col="_et", id_col="eval_id", k=k,
    ).withColumnRenamed("doc_id", "eval_id")
    return (
        t_sh.join(F.broadcast(e_sh), "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.countDistinct("shingle").alias("n_overlaps"))
        .filter(F.col("n_overlaps") >= min_overlaps)
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    k: int = 13,
    min_overlaps: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Drop contaminated training docs: anti-join against
    :func:`find_contaminated`'s doc list. The returned plan is the
    train scan minus a broadcast hash anti-join — decontaminating
    100 TB costs one pass."""
    bad = find_contaminated(
        train, eval_docs, k=k, min_overlaps=min_overlaps,
        text_col=text_col, id_col=id_col, **kw,
    ).select(F.col("doc_id").alias(id_col)).distinct()
    return train.join(bad, id_col, "left_anti")


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = ". ",
    min_len: int = 0,
) -> DataFrame:
    """Corpus-level exact line/sentence dedup (the C4/RefinedWeb "drop
    repeated lines across documents" pass): split every doc into units
    on ``sep``, keep each distinct unit's FIRST occurrence (lowest
    (doc_id, position) — deterministic on any cluster), drop every
    later copy (including within-doc repeats), and reassemble the
    surviving units in original order. Units shorter than ``min_len``
    characters are exempt (kept everywhere) so ubiquitous short
    fragments don't vaporize the corpus.

    Shape at 100 TB: one explode, ONE md5-keyed groupBy (the shuffle
    carries (hash, doc, pos) triples, never the text), a hash join back,
    and a per-doc reassembly groupBy — no corpus-wide state beyond the
    distinct-unit hash space, the same ledger exact_duplicate_groups
    keeps at doc granularity."""
    import re as _re

    pat = _re.escape(sep)
    u = df.select(
        F.col(id_col).alias("_d"),
        F.posexplode(F.split(F.col(text_col), pat)).alias("_p", "_u"),
    )
    win = (
        u.filter(F.length("_u") >= min_len)
        .groupBy(F.md5(F.col("_u")).alias("_h"))
        .agg(F.min(F.struct("_d", "_p")).alias("_w"))
    )
    kept = (
        u.withColumn("_uh", F.md5(F.col("_u")))
        .join(win, F.col("_uh") == F.col("_h"), "left")
        .filter(
            F.col("_h").isNull()
            | ((F.col("_w._d") == F.col("_d")) & (F.col("_w._p") == F.col("_p")))
        )
    )
    out = (
        kept.groupBy("_d")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "_u"))),
                    lambda s: s["_u"],
                ),
                sep,
            ).alias("_t")
        )
    )
    return (
        df.select(F.col(id_col))
        .join(out, F.col(id_col) == F.col("_d"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_t"), F.lit("")).alias(text_col),
        )
    )


# polynomial rolling hash over per-token hashes, all arithmetic mod 2^64
_RH_BASE = np.uint64(0x9E3779B97F4A7C15 | 1)  # odd -> invertible mod 2^64


def _uint64_inverse(b: np.uint64) -> np.uint64:
    """Multiplicative inverse of an odd b modulo 2^64 (Newton iteration:
    correct bits double each step; odd^2 === 1 mod 8 seeds 3 bits).
    Python ints avoid numpy's scalar-overflow warnings."""
    bi, x, mask = int(b), int(b), (1 << 64) - 1
    for _ in range(5):
        x = (x * (2 - bi * x)) & mask
    return np.uint64(x)


_RH_BASE_INV = _uint64_inverse(_RH_BASE)


def _rolling_hash_sites(
    df: DataFrame, text_col: str, id_col: str, window: int
) -> DataFrame:
    """(doc_id, pos, _h): 64-bit polynomial rolling hash of every
    ``window``-token sequence, O(tokens) per doc — window STRINGS are
    never materialized (the naive concat-per-window path copies each
    token ``window`` times: a 20x write amplification that dominated at
    200M tokens). Per-token hashes come from pandas' deterministic
    hash_array; window hash H_i = sum T[i+j] * B^(w-1-j) computed with
    one cumsum of T[j] * B^(-j) and a power rescale — three vectorized
    passes per doc, uint64 wraparound IS the mod-2^64 arithmetic."""
    w = window

    def gen(batches):
        state = {
            "bp": np.ones(1, dtype=np.uint64),
            "binvp": np.ones(1, dtype=np.uint64),
        }

        def powers(n):
            if len(state["bp"]) < n:
                m = n - len(state["bp"])
                ext = np.cumprod(np.full(m, _RH_BASE), dtype=np.uint64)
                state["bp"] = np.concatenate(
                    [state["bp"], state["bp"][-1] * ext]
                )
                ext_i = np.cumprod(
                    np.full(m, _RH_BASE_INV), dtype=np.uint64
                )
                state["binvp"] = np.concatenate(
                    [state["binvp"], state["binvp"][-1] * ext_i]
                )
            return state["bp"], state["binvp"]

        for pdf in batches:
            # ONE flat token stream per Arrow batch, zero per-doc Python:
            # the range-sum hash (C[i..i+w-1] * B^(end)) depends only on
            # the tokens and their distance from the window END, so a
            # GLOBAL cumsum hashes identical windows identically in any
            # doc at any offset; windows crossing a doc boundary are
            # masked out by comparing doc ordinals w-1 apart.
            texts = pdf[text_col].to_numpy()
            tok_lists = [t.split() for t in texts]
            lens = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64,
                count=len(tok_lists),
            )
            n_total = int(lens.sum())
            if n_total < w:
                continue
            flat = np.empty(n_total, dtype=object)
            off = 0
            for tl in tok_lists:
                flat[off:off + len(tl)] = tl
                off += len(tl)
            starts = np.concatenate(
                [np.zeros(1, dtype=np.int64), np.cumsum(lens)]
            )
            ords = np.repeat(np.arange(len(lens)), lens)

            bp, binvp = powers(n_total)
            t = pd.util.hash_array(flat)
            cs = np.cumsum(t * binvp[:n_total], dtype=np.uint64)
            m = n_total - w + 1
            upper = cs[w - 1:]
            lower = np.concatenate(
                [np.zeros(1, dtype=np.uint64), cs[:m - 1]]
            )
            h = (upper - lower) * bp[w - 1:n_total]
            valid = ords[:m] == ords[w - 1:]
            if not valid.any():
                continue
            idx = np.nonzero(valid)[0]
            d = ords[idx]
            ids = pdf[id_col].to_numpy()[d]
            yield pd.DataFrame({
                "doc_id": ids.astype(np.int64),
                "pos": (idx - starts[d]).astype(np.int32),
                "_h": h[idx].view(np.int64),
            })

    return df.select(
        F.col(id_col).cast("long").alias(id_col), text_col
    ).mapInPandas(gen, schema="doc_id long, pos int, _h long")


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
    portable: bool = False,
) -> DataFrame:
    """Cross-corpus repeated-passage finder — the ExactSubstr dedup of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022), rolling-window form: every ``window``-token sequence that
    occurs at more than one (doc, position) site in the corpus marks all
    its NON-canonical sites (canonical = lowest (doc_id, pos), so one
    copy always survives, deterministically on any cluster). Overlapping
    flagged windows per doc merge into maximal spans.

    Returns (doc_id, span_start, span_end, n_windows) with 0-based
    INCLUSIVE token indexes. The suffix-array construction of the paper
    finds duplicates of ANY length >= threshold; the rolling-window form
    finds exactly the same token ranges for duplicates >= ``window``
    tokens (every such range is a union of duplicated windows) and is
    embarrassingly parallel.

    Shape at 100 TB: one Arrow pass to (hash, doc, pos) triples via an
    O(tokens) rolling polynomial hash (window strings are NEVER built —
    the concat-per-window alternative writes every token ``window``
    times; both flag via 64-bit hash equality, same collision space),
    one hash-keyed groupBy for the canonical-site ledger, a hash join
    back, then a per-doc window merge — the dedup_lines shuffle
    discipline at window granularity. ``portable`` switches site
    hashing to md5 over the window text (JVM-side, slower, cross-engine
    replayable — the DuckDB oracle path; int ids only either way)."""
    if portable:
        tok_df = df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.split(F.col(text_col), r"\s+").alias("_toks"),
        )
        # split materialized BEFORE the HOF lambda (interpreted HOFs
        # re-eval captured expressions per element — the shingles() lesson)
        toks = F.col("_toks")
        n = F.size(toks)
        win_text = F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, window)),
        )
        sites = (
            tok_df.filter(n >= window)
            .select("doc_id", F.posexplode(win_text).alias("pos", "_w"))
            .select("doc_id", "pos", F.md5(F.col("_w")).alias("_h"))
        )
    else:
        sites = _rolling_hash_sites(df, text_col, id_col, window)
    from pyspark.sql import Window

    # canonical ledger as ONE hash-partitioned window pass: count + min
    # site within each hash group, no second shuffle and no join-back
    # (the agg + join-back formulation re-shuffles all 200M+ sites a
    # second time; measured 2x wall on a 206M-token corpus)
    w_h = Window.partitionBy("_h")
    dup = (
        sites.withColumn("_c", F.count("*").over(w_h))
        .withColumn("_w0", F.min(F.struct("doc_id", "pos")).over(w_h))
        .filter(
            (F.col("_c") >= 2)
            & ~(
                (F.col("_w0.doc_id") == F.col("doc_id"))
                & (F.col("_w0.pos") == F.col("pos"))
            )
        )
        .select("doc_id", "pos")
    )

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w_doc).isNull()
        | (F.col("pos") > F.lag("pos").over(w_doc) + window),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        dup.withColumn("_i", F.sum(brk).over(w_doc))
        .groupBy("doc_id", "_i")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + window - 1).cast("long").alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .drop("_i")
    )


def remove_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut the token ranges flagged by duplicate_spans out of each doc
    (canonical copies survive by construction). Docs with no flagged
    span pass through untouched; a fully-covered doc becomes ''. The
    span list joins back pre-grouped per doc (bounded: spans are
    disjoint, so there are at most len/window of them) and tokens are
    filtered array-side — no shuffle beyond the one span join."""
    sp = spans.groupBy(F.col(id_col).alias("_d")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_sp")
    )
    tok_df = (
        df.join(sp, F.col(id_col) == F.col("_d"), "left")
        .select(
            F.col(id_col),
            F.split(F.col(text_col), r"\s+").alias("_toks"),
            F.coalesce(
                "_sp", F.array().cast(
                    "array<struct<span_start:long,span_end:long>>"
                )
            ).alias("_spans"),
        )
    )
    spans_col = F.col("_spans")
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.exists(
            spans_col,
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    return tok_df.select(
        F.col(id_col), F.array_join(kept, " ").alias(text_col)
    )
