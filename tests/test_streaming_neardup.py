"""Streaming MinHash-LSH near-dup: map-only bucket rows match the batch
construction, and the stateful operator's flagged set equals the batch
spec regardless of micro-batch boundaries (incl. the retroactive
dethrone case)."""

from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.operators.dedup import (
    lsh_bucket_rows,
    minhash_lsh_candidates,
    minhash_signatures,
)

DOCS = [
    (10, "the quick brown fox jumps over the lazy dog tonight"),
    (20, "the quick brown fox jumps over the lazy dog tonight"),
    (30, "a completely different document about spark shuffles"),
    (40, "the quick brown fox jumps over the lazy cat tonight"),
    (50, "short doc"),  # < k tokens: ONE truncated shingle, same as
    # the batch shingles() path (sequence uses greatest(n-k, 0))
]
SCHEMA = "doc_id long, text string"


def test_bucket_rows_match_batch_signature_path(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    rows = lsh_bucket_rows(df, k=3, num_hashes=16, bands=4).collect()
    assert {r["doc_id"] for r in rows} == {10, 20, 30, 40, 50}
    # identical docs share EVERY band bucket
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add((r["band"], r["bucket"]))
    assert by_doc[10] == by_doc[20]
    # signature parity with the exploded groupBy path
    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(df, k=3, num_hashes=16).collect()
    }
    assert sigs[10] == sigs[20] and sigs[10] != sigs[30]
    # candidate parity: docs sharing any bucket == batch LSH candidates
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(
            df, k=3, num_hashes=16, bands=4
        ).collect()
    }
    shared = set()
    for a in by_doc:
        for b in by_doc:
            if a < b and by_doc[a] & by_doc[b]:
                shared.add((a, b))
    assert cands == shared


def test_stateful_near_dup_across_batches(spark, tmp_path):
    """Batch 1 delivers the LARGER twin first; batch 2 dethrones it —
    the retroactive emission must flag the old owner, converging to the
    batch spec (doc_id > min per bucket) despite the adversarial
    arrival order."""
    from elasticsearch_analysis_combo_spark.streaming.stateful import (
        stateful_near_dup,
    )

    b1 = [DOCS[1], DOCS[2]]           # 20 (twin), 30 (unique)
    b2 = [DOCS[0], DOCS[3]]           # 10 (smaller twin!), 40 (near)
    drop = str(tmp_path / "drop")
    spark.createDataFrame(b1, SCHEMA).write.parquet(f"{drop}/b1")
    spark.createDataFrame(b2, SCHEMA).write.parquet(f"{drop}/b2")

    stream = spark.readStream.schema(SCHEMA).format("parquet") \
        .option("maxFilesPerTrigger", 1).load(f"{drop}/*")
    q = (
        stateful_near_dup(lsh_bucket_rows(stream, k=3, num_hashes=16,
                                          bands=4))
        .writeStream.outputMode("update").format("memory")
        .queryName("neardup_tmp")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    flagged = {
        r["doc_id"]
        for r in spark.table("neardup_tmp").select("doc_id").distinct()
        .collect()
    }
    # batch spec over the same corpus
    batch = lsh_bucket_rows(
        spark.createDataFrame(b1 + b2, SCHEMA), k=3, num_hashes=16,
        bands=4,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    want = {
        r["doc_id"]
        for r in batch.withColumn("mn", F.min("doc_id").over(w))
        .filter(F.col("doc_id") > F.col("mn"))
        .select("doc_id").distinct().collect()
    }
    assert flagged == want
    assert 20 in flagged  # the retroactively dethroned owner
    assert 10 not in flagged  # the true owner survives
