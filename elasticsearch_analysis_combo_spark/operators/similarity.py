"""Similarity search over embedding columns (engine extension for
training-data pipelines; array<float> embeddings as in the driver's
``embeddings`` table).

* brute_force_cosine_topk — exact top-k, two forms:
    - ``matmul``: mapInPandas + numpy GEMM against a broadcast query matrix.
      The 100TB baseline: streams the corpus once, no shuffle until the
      final per-query top-k (a tree-aggregated window over k*Q rows).
    - the per-row ``F.aggregate`` dot product is available for SQL-oracle
      parity (same results, JVM-side, slower constant).
* lsh_cosine_candidates — random-hyperplane signatures (deterministic seed),
  banded bucket join: the approximate scale path; candidates then reranked
  exactly within buckets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

SIM_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def _topk_window(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def brute_force_cosine_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Queries ship to executors as a (Q x d) float64 matrix inside the UDF
    closure (broadcast by Spark's task serializer); each Arrow batch does a
    single GEMM: (batch x d) @ (d x Q). Per-partition candidates could be
    pre-pruned to k before the window at larger Q."""
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)

    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_vec"]])
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            sims = (mat / norms) @ qnorm.T  # (batch x Q)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "vec_id": np.tile(pdf["vec_id"].to_numpy(), len(qids)),
                    "cosine": sims.T.reshape(-1),
                }
            )

    scored = src.mapInPandas(gen, schema=SIM_SCHEMA)
    return _topk_window(scored, k)


def filtered_cosine_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    filter_expr: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ES filtered kNN (``knn`` with ``filter``): exact cosine top-k
    restricted to vectors satisfying a metadata predicate, with
    PRE-filter semantics — the filter cuts the candidate set before
    scoring, so the result always holds k matching vectors (post-filter
    kNN can come up short). The predicate is applied before the Arrow
    scoring pass, so Catalyst pushes it into the parquet scan
    (row-group pruning on the metadata column) and the GEMM only sees
    surviving rows. At IVF/LSH scale apply the same pre-filter to the
    candidate set before the exact rerank."""
    return brute_force_cosine_topk(
        emb.filter(F.expr(filter_expr)), queries, k=k,
        id_col=id_col, vec_col=vec_col,
    )


def cosine_expr(vec_a, vec_b):
    """JVM-side cosine via zip_with + aggregate (for SQL-oracle parity and
    whole-stage-codegen paths)."""
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(vec_a, F.lit(0.0), lambda a, x: a + x * x))
    nb = F.sqrt(F.aggregate(vec_b, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (na * nb)


def _plane_signatures(
    emb: DataFrame, planes: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    """(vec_id, sig): sign signature of each embedding against the planes."""
    n_planes = planes.shape[0]
    sig_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("sig", T.LongType()),
        ]
    )
    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_vec"]])
            bits = (mat @ planes.T) > 0  # (batch x planes)
            weights = (1 << np.arange(n_planes, dtype=np.int64))
            sig = (bits.astype(np.int64) * weights).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(), "sig": sig})

    return src.mapInPandas(gen, schema=sig_schema)


def _band_buckets(sigs: DataFrame, n_planes: int, bands: int) -> DataFrame:
    width = n_planes // bands
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftrightunsigned(F.col("sig"), bi * width)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    return sigs.select("vec_id", F.explode(band_arr).alias("bb")).select(
        "vec_id", "bb.band", "bb.bucket"
    )


def lsh_cosine_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    n_planes: int = 64,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: LSH bucket probe + exact rerank.

    The query signatures (computed driver-side — Q is small) broadcast-join
    the corpus band buckets, so only vectors colliding with a query in >=1
    band are scored; scoring is the exact GEMM cosine restricted to those
    candidates. Per-query recall depends on bands/width like
    lsh_cosine_candidates; increase ``bands`` for higher recall. The 100 TB
    shape: one corpus scan for signatures, a broadcast semi-join, exact
    scoring only on the candidate subset."""
    rng = np.random.RandomState(seed)
    dim = len(queries[0][1])
    planes = rng.standard_normal((n_planes, dim))
    spark = emb.sparkSession

    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
    qbits = (qmat @ planes.T) > 0
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    qsig = (qbits.astype(np.int64) * weights).sum(axis=1)

    width = n_planes // bands
    mask = (1 << width) - 1
    qbucket_rows = [
        (int(qid), bi, int((int(s) >> (bi * width)) & mask))
        for qid, s in zip(qids, qsig)
        for bi in range(bands)
    ]
    qbuckets = tiny_df(spark,
        qbucket_rows, "query_id long, band int, bucket long"
    )

    corpus_buckets = _band_buckets(
        _plane_signatures(emb, planes, id_col, vec_col), n_planes, bands
    )
    cand = (
        corpus_buckets.join(F.broadcast(qbuckets), ["band", "bucket"])
        .select("query_id", "vec_id")
        .distinct()
    )
    cand_emb = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec")
    ).join(cand, "vec_id")
    return _topk_window(_exact_rerank(cand_emb, qids, qnorm), k)


def _exact_rerank(cand_emb: DataFrame, qids: np.ndarray, qnorm: np.ndarray) -> DataFrame:
    """Exact cosine over candidate rows (query_id, vec_id, _vec): one
    vectorized pass, each row scored against its own query's unit vector."""
    qpos = {int(q): i for i, q in enumerate(qids)}

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_vec"]])
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            qi = np.array([qpos[int(q)] for q in pdf["query_id"]], dtype=np.int64)
            cos = ((mat / norms) * qnorm[qi]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cosine": cos,
                }
            )

    return cand_emb.mapInPandas(score, schema=SIM_SCHEMA)


def _seeded_unit_centroids(
    emb: DataFrame, n_cells: int, seed: int, id_col: str, vec_col: str
) -> np.ndarray:
    """n_cells L2-normalized centroid rows picked by deterministic md5
    hash order — cheap, seedable, and replayable in other engines (the
    DuckDB gate oracles re-derive the same centroid set); orderBy+limit
    compiles to TakeOrderedAndProject (no full sort)."""
    # key on the post-alias "vec_id" column (id_col is renamed below)
    cent_key = F.conv(
        F.substring(
            F.md5(F.concat_ws(
                "#", F.col("vec_id").cast("string"), F.lit(str(seed))
            )),
            1, 15,
        ), 16, 10,
    ).cast("long")
    cents = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
        .orderBy(cent_key, F.col("vec_id"))
        .limit(n_cells)
        .collect()
    )
    cmat = np.asarray([np.asarray(r["_v"], dtype=np.float64) for r in cents])
    return cmat / np.maximum(
        np.linalg.norm(cmat, axis=1, keepdims=True), 1e-30
    )


def ivf_cosine_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    n_cells: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
    filter_expr: str | None = None,
) -> DataFrame:
    """IVF-style approximate cosine top-k (the inverted-file ANN scale
    path, complementing the LSH one):

      1. centroids = n_cells corpus vectors picked by deterministic hash
         order (cheap, seedable), optionally refined by ``kmeans_iters``
         rounds of spherical Lloyd iteration (each round = one extra
         corpus pass: assign + per-cell mean; empty cells keep their
         centroid) — balanced cells raise recall at a fixed probe budget;
      2. one corpus pass assigns every vector to its nearest-centroid cell
         (GEMM against the broadcast centroid matrix);
      3. each query probes its ``n_probe`` nearest cells; only vectors in
         probed cells are scored — exactly, via the shared reranker.

    At 10^9+ vectors assignment passes are the only full scans; queries
    touch ~n_probe/n_cells of the corpus. Recall rises with n_probe
    (n_probe = n_cells degrades gracefully to brute force, refined or
    not). The refinement is deterministic but engine-internal — the
    DuckDB gate oracle replays only the hash-seeded ``kmeans_iters=0``
    configuration."""
    if filter_expr is not None:
        # ES filtered kNN at IVF scale: PRE-filter semantics — the
        # metadata predicate cuts the searched corpus before centroid
        # selection, assignment, and probing (pushed into the scan), so
        # every probed cell holds only matching vectors and the exact
        # rerank needs no post-filter. Query vectors are caller-supplied
        # and unaffected.
        emb = emb.filter(F.expr(filter_expr))
    cnorm = _seeded_unit_centroids(emb, n_cells, seed, id_col, vec_col)

    src0 = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec"))
    dim = cnorm.shape[1]
    for _ in range(kmeans_iters):
        cn = cnorm  # bind current centroids into the closure

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["_vec"]]
                )
                norms = np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-30
                )
                cell = np.argmax((mat / norms) @ cn.T, axis=1)
                sums = np.zeros((cn.shape[0], mat.shape[1]))
                np.add.at(sums, cell, mat / norms)
                counts = np.bincount(cell, minlength=cn.shape[0])
                live = np.nonzero(counts)[0]
                yield pd.DataFrame(
                    {
                        "cell": live.astype(np.int32),
                        "n": counts[live].astype(np.int64),
                        "s": pd.Series(list(sums[live]), dtype=object),
                    }
                )

        part_schema = "cell int, n long, s array<double>"
        agg = (
            src0.mapInPandas(partials, schema=part_schema)
            .groupBy("cell")
            .agg(
                F.sum("n").alias("n"),
                *[
                    F.sum(F.col("s")[i]).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = cnorm.copy()
        for r in agg:
            vec = np.array([r[f"s{i}"] for i in range(dim)]) / r["n"]
            nrm = np.linalg.norm(vec)
            if nrm > 1e-12:
                new[r["cell"]] = vec / nrm
        cnorm = new

    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)

    assign_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )
    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec"))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_vec"]])
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            cells = np.argmax((mat / norms) @ cnorm.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "cell": cells}
            )

    cells = src.mapInPandas(assign, schema=assign_schema)
    # driver-side probe list: Q x n_probe (tiny)
    qsims = qnorm @ cnorm.T
    probe_rows = [
        (int(qid), int(c))
        for qi, qid in enumerate(qids)
        for c in np.argsort(-qsims[qi], kind="stable")[:n_probe]
    ]
    spark = emb.sparkSession
    probes = tiny_df(spark, probe_rows, "query_id long, cell int")
    cand = (
        cells.join(F.broadcast(probes), "cell")
        .select("query_id", "vec_id")
    )
    cand_emb = src.join(cand, "vec_id")
    return _topk_window(_exact_rerank(cand_emb, qids, qnorm), k)


def ivf_quantized_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    n_cells: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_expr: str | None = None,
) -> DataFrame:
    """IVF ANN with int8-quantized candidate scoring and exact rerank of
    only the final ``k * rerank_factor`` survivors per query — the raw
    float vectors never feed the hot scoring path.

    At 10^9+ embeddings :func:`ivf_cosine_topk`'s exact rerank reads the
    raw float vectors of EVERY vector in a probed cell (~n_probe/n_cells
    of the corpus per query). Here the scan quantizes each unit vector to
    int8 (``floor(u * 127 + 0.5)`` per component — deterministic,
    replayable in plain SQL) and scores candidates with the SYMMETRIC
    integer dot product qv . qq: integer arithmetic, so the candidate
    ordering is bit-identical across engines (no float-sum tie
    ambiguity at the cut boundary). Only the top ``k * rerank_factor``
    per query by (qscore desc, vec_id) are re-scored exactly from their
    raw floats — a bounded gather, not a cell scan. SIZE
    ``rerank_factor`` past the int8 near-tie band: on clustered corpora
    O(cluster-size) candidates sit within quantization noise of each
    other, and a cut inside that band loses true neighbors (measured at
    200k x 64d, 256 clusters: recall@10 0.84 at rerank_factor=4 vs 1.00
    at 16 — BENCH/at_scale_r5_features.json); 16 still reads ~1% of the
    probed cells. In a persisted
    deployment the (cell, int8 vector) table is written once at index
    build, shrinking the per-query scan 4-8x vs raw floats.

    One fused corpus pass does assignment + quantization + masked
    per-query scoring (a vector is scored only for queries probing its
    cell — no cells/probes join materializes); the only shuffles are the
    two bounded top-k windows. Same hash-seeded centroids as
    :func:`ivf_cosine_topk`; ``filter_expr`` keeps ES pre-filter
    semantics."""
    if rerank_factor < 1:
        raise ValueError("rerank_factor must be >= 1")
    if filter_expr is not None:
        emb = emb.filter(F.expr(filter_expr))
    cnorm = _seeded_unit_centroids(emb, n_cells, seed, id_col, vec_col)
    n_cells_eff = cnorm.shape[0]

    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qnorm = qmat / np.maximum(
        np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30
    )
    qq = np.floor(qnorm * 127.0 + 0.5).astype(np.int64)  # Q x d int8 range
    # probe mask[q, cell]: stable argsort == cosine DESC, cell ASC
    qsims = qnorm @ cnorm.T
    probe_mask = np.zeros((qids.size, n_cells_eff), dtype=bool)
    for qi in range(qids.size):
        probe_mask[qi, np.argsort(-qsims[qi], kind="stable")[:n_probe]] = True

    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec"))
    qs_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("qscore", T.LongType()),
        ]
    )

    def qscore(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_vec"]]
            )
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            u = mat / norms
            cells = np.argmax(u @ cnorm.T, axis=1)
            qv = np.floor(u * 127.0 + 0.5).astype(np.int64)
            s = qv @ qq.T  # B x Q integer scores
            keep = probe_mask[:, cells].T  # B x Q: query probes this cell
            bi, qi = np.nonzero(keep)
            if bi.size == 0:
                continue
            yield pd.DataFrame(
                {
                    "query_id": qids[qi],
                    "vec_id": pdf["vec_id"].to_numpy()[bi],
                    "qscore": s[bi, qi],
                }
            )

    cand = (
        src.mapInPandas(qscore, schema=qs_schema)
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("qscore"), F.asc("vec_id")
                )
            ),
        )
        .filter(F.col("_r") <= k * rerank_factor)
        .select("query_id", "vec_id")
    )
    # bounded gather: broadcast the k*c*Q survivors against the raw scan
    cand_emb = src.join(F.broadcast(cand), "vec_id")
    return _topk_window(_exact_rerank(cand_emb, qids, qnorm), k)


def cosine_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 64,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH band collisions
    (lsh_cosine_candidates) verified with the EXACT cosine, keeping
    pairs >= ``threshold`` — the embedding-space analogue of
    ``dedup.near_duplicates`` (MinHash->Jaccard). The exact check is
    candidate-restricted (never all-pairs) and stays JVM-side via
    cosine_expr, so the verify step is whole-stage codegen over the
    collision set only. Recall follows the band/width geometry of
    lsh_cosine_candidates: defaults (64 planes / 4 bands / 16-bit
    buckets) collide vectors within ~25 degrees with high probability —
    comfortably above any dedup-grade threshold."""
    cand = lsh_cosine_candidates(
        emb, n_planes=n_planes, bands=bands, seed=seed,
        id_col=id_col, vec_col=vec_col, max_bucket_size=max_bucket_size,
    )
    ea = emb.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va")
    )
    eb = emb.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb")
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn(
            "cosine",
            cosine_expr(
                F.col("_va").cast("array<double>"),
                F.col("_vb").cast("array<double>"),
            ),
        )
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("vec_a", "vec_b", "cosine")
    )


def lsh_cosine_candidates(
    emb: DataFrame,
    n_planes: int = 64,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: (vec_a, vec_b) candidate pairs whose sign
    signatures collide in >=1 of `bands` bands (signature width
    n_planes/bands per band). Deterministic planes from the seed. The
    join shuffles on (band, bucket) only — the ANN scale path; rerank
    candidates exactly with cosine_expr or the GEMM scorer.

    Selectivity: defaults give 16-bit buckets (65,536 per band) — wide
    enough that unrelated vectors essentially never collide; narrower
    widths degrade toward the all-pairs join. ``max_bucket_size`` drops
    band buckets holding more than that many vectors (degenerate buckets —
    e.g. all-zero embeddings — would contribute size² pairs each; dropping
    them bounds the join output while true near-neighbors still collide in
    their other, non-degenerate bands)."""
    dim_row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    buckets = _band_buckets(
        _plane_signatures(emb, planes, id_col, vec_col), n_planes, bands
    )
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bucket")
        buckets = (
            buckets.withColumn("_n", F.count("*").over(w))
            .filter(F.col("_n") <= max_bucket_size)
            .drop("_n")
        )
    a = buckets.alias("a")
    bq = buckets.alias("b")
    return (
        a.join(bq, ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )


def semantic_dedup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_cells: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023):
    cluster the corpus into ``n_cells`` IVF cells, then compare pairs
    ONLY within a cell with the exact cosine, keeping pairs >=
    ``threshold``. The clustering complements the LSH route
    (cosine_near_duplicates): LSH recall is geometric in band width,
    cell-restricted compare is exhaustive within a cluster — the
    published recipe for semantic dedup of training corpora.

    Centroids are the same deterministic md5-ordered corpus sample as
    ivf_cosine_topk (seedable, DuckDB-replayable); assignment is one
    map-only GEMM pass against the broadcast centroid matrix; vectors
    shuffle ONCE on cell, then each cell runs a row-chunked BLAS GEMM
    (applyInPandas) emitting only pairs >= threshold — ~10x over a
    per-pair expression join at 200k vectors, memory bounded at
    O(chunk x cell) regardless of cell size. Per-cell work is
    quadratic in cell size by design — n_cells is the scale knob
    (E[cell] = N/n_cells; SemDeDup runs ~100k cells at billions of
    docs), and cells never leave their shuffle partition. GEMM
    summation order can differ from a sequential dot product by ~1 ulp;
    the 6-decimal gate rounding is unaffected (flip needs a pair within
    ~1e-14 of a rounding edge)."""
    cent_key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "#", F.col(id_col).cast("string"), F.lit(str(seed))
                )
            ),
            1, 15,
        ), 16, 10,
    ).cast("long")
    cents = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
        .orderBy(cent_key, F.col("vec_id"))
        .limit(n_cells)
        .collect()
    )
    cmat = np.asarray([np.asarray(r["_v"], dtype=np.float64) for r in cents])
    cnorm = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-30)

    assign_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )
    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec"))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_vec"]]
            )
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            cells = np.argmax((mat / norms) @ cnorm.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "cell": cells}
            )

    cells = src.mapInPandas(assign, schema=assign_schema)
    keyed = cells.join(src, "vec_id")
    th = float(threshold)

    pair_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # one BLAS GEMM per cell instead of a row-pair expression join:
        # ~10x over the per-pair JVM aggregate at 200k vecs. Row-chunked
        # (CHUNK x cell) so memory stays O(CHUNK * cell) whatever the
        # cell size; emitted pairs are threshold-cut inside the kernel.
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["_vec"]]
        )[order]
        nrm = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-30
        )
        cell = np.int32(pdf["cell"].iloc[0])
        out_a, out_b, out_c = [], [], []
        chunk = 2048
        for s0 in range(0, len(ids), chunk):
            sims = nrm[s0:s0 + chunk] @ nrm.T
            ii, jj = np.nonzero(sims >= th)
            keep = s0 + ii < jj  # upper triangle: vec_a < vec_b
            out_a.append(ids[s0 + ii[keep]])
            out_b.append(ids[jj[keep]])
            out_c.append(sims[ii[keep], jj[keep]])
        if not out_a:
            return pd.DataFrame(
                {"cell": [], "vec_a": [], "vec_b": [], "cosine": []}
            ).astype({"cell": "int32", "vec_a": "int64",
                      "vec_b": "int64", "cosine": "float64"})
        a = np.concatenate(out_a)
        return pd.DataFrame(
            {
                "cell": np.full(a.size, cell, dtype=np.int32),
                "vec_a": a,
                "vec_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    return keyed.groupBy("cell").applyInPandas(cell_pairs, pair_schema)
