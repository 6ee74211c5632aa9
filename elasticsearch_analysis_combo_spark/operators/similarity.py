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


def lsh_cosine_candidates(
    emb: DataFrame,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: (vec_a, vec_b) candidate pairs whose sign
    signatures collide in >=1 of `bands` bands (signature width
    n_planes/bands per band). Deterministic planes from the seed. The
    join shuffles on (band, bucket) only — the ANN scale path; rerank
    candidates exactly with cosine_expr or the GEMM scorer."""
    dim_row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))

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
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "sig": sig}
            )

    sigs = src.mapInPandas(gen, schema=sig_schema)
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
    buckets = sigs.select("vec_id", F.explode(band_arr).alias("bb")).select(
        "vec_id", "bb.band", "bb.bucket"
    )
    a = buckets.alias("a")
    bq = buckets.alias("b")
    return (
        a.join(bq, ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
