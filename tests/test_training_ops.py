"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — correctness against brute-force Python."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.operators import dedup, multimodal, similarity
from elasticsearch_analysis_combo_spark.operators.text_quality import (
    fingerprint_winnow,
    lang_id,
    quality_score,
    token_counts,
)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),          # near dup
        (3, "der schnelle braune fuchs und das faule tier ist nicht da"),
        (4, "completely different content about spark query engines"),
        (5, "le chat est dans la maison et il est pas content"),
        (6, "12345 67890 11111 22222 33333"),
        (7, "el perro es una mascota que no es por la calle"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs_df):
    groups = dedup.exact_duplicate_groups(docs_df).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [0, 1]
    kept = dedup.dedup_exact_keep_first(docs_df).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 2, 3, 4, 5, 6, 7]


def test_ngram_jaccard(docs_df):
    pairs = dedup.ngram_jaccard_pairs(docs_df, k=3, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 2) in got and 0.5 <= got[(0, 2)] < 1.0
    # brute-force check of the (0,2) value
    def sh(s, k=3):
        t = s.split()
        return {" ".join(t[i:i + k]) for i in range(len(t) - k + 1)}
    a, b = sh("the quick brown fox jumps over the lazy dog"), sh(
        "the quick brown fox jumps over the lazy cat")
    assert abs(got[(0, 2)] - len(a & b) / len(a | b)) < 1e-12


def test_minhash_lsh_finds_near_dups(docs_df):
    cand = dedup.minhash_lsh_candidates(docs_df, k=3, num_hashes=32, bands=8).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in cand}
    assert (0, 1) in pairs          # identical docs always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup: high jaccard
    # unrelated docs should not flood the candidate set
    assert (4, 6) not in pairs


def test_simhash_near_dup(docs_df):
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs_df).collect()}
    assert fps[0] == fps[1]
    ham_02 = bin((fps[0] ^ fps[2]) & ((1 << 64) - 1)).count("1")
    ham_04 = bin((fps[0] ^ fps[4]) & ((1 << 64) - 1)).count("1")
    assert ham_02 < ham_04
    cands = {(r["doc_a"], r["doc_b"])
             for r in dedup.simhash_near_dup_candidates(docs_df).collect()}
    assert (0, 1) in cands


def test_brute_force_cosine_topk(spark):
    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((50, 8)).astype(np.float64)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = [(0, vecs[3].tolist()), (1, rng.standard_normal(8).tolist())]
    got = similarity.brute_force_cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    # numpy oracle
    for qid, qv in queries:
        q = np.asarray(qv) / np.linalg.norm(qv)
        sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ q
        order = sorted(range(50), key=lambda i: (-sims[i], i))[:5]
        have = sorted(by_q[qid])
        assert [v for _, v, _ in have] == order
        for (_, v, c) in have:
            assert abs(c - sims[v]) < 1e-12
    assert by_q[0][0][1] == 3  # self match first


def test_lsh_cosine_candidates(spark):
    rng = np.random.RandomState(11)
    base = rng.standard_normal((20, 16))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    # 100..119: tiny perturbations of 0..19 -> near-certain candidates
    rows += [(100 + i, (v + 1e-4 * rng.standard_normal(16)).tolist())
             for i, v in enumerate(base)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cands = {(r["vec_a"], r["vec_b"])
             for r in similarity.lsh_cosine_candidates(emb, n_planes=16, bands=4).collect()}
    hits = sum((i, 100 + i) in cands for i in range(20))
    assert hits >= 18  # sign signatures identical up to perturbation


def test_lsh_cosine_selectivity_and_recall(spark):
    """Default 16-bit band width: planted near-dup pairs (cosine ~0.999)
    are recalled >=0.9 while the candidate set stays far below all-pairs
    (random vectors essentially never share a 16-bit bucket)."""
    rng = np.random.RandomState(3)
    n, d = 200, 32
    base = rng.standard_normal((n, d))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    planted = 40
    rows += [(1000 + i, (base[i] + 0.03 * rng.standard_normal(d)).tolist())
             for i in range(planted)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cands = {(r["vec_a"], r["vec_b"])
             for r in similarity.lsh_cosine_candidates(emb).collect()}
    recall = sum((i, 1000 + i) in cands for i in range(planted)) / planted
    assert recall >= 0.9
    total = len(rows)
    all_pairs = total * (total - 1) // 2
    assert len(cands) < 0.05 * all_pairs


def test_lsh_cosine_bucket_cap_drops_degenerate(spark):
    """Zero vectors all hash to the same bucket in every band; the cap
    drops those buckets so they don't contribute size^2 pairs, while real
    planted neighbors keep colliding."""
    rng = np.random.RandomState(5)
    d = 16
    base = rng.standard_normal((30, d))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    rows += [(100 + i, (base[i] + 1e-3 * rng.standard_normal(d)).tolist())
             for i in range(30)]
    rows += [(500 + i, [0.0] * d) for i in range(40)]  # degenerate bucket
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cands = {(r["vec_a"], r["vec_b"])
             for r in similarity.lsh_cosine_candidates(
                 emb, max_bucket_size=35).collect()}
    assert not any(a >= 500 and b >= 500 for a, b in cands)
    hits = sum((i, 100 + i) in cands for i in range(30))
    assert hits >= 27


def test_lsh_cosine_topk_matches_brute_force_on_neighbors(spark):
    """LSH probe + exact rerank: for queries with planted near-duplicates,
    the top hit agrees with brute force and cosines are exact."""
    rng = np.random.RandomState(9)
    n, d = 150, 24
    base = rng.standard_normal((n, d))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = [(0, (base[7] + 0.02 * rng.standard_normal(d)).tolist()),
               (1, (base[42] + 0.02 * rng.standard_normal(d)).tolist())]
    got = similarity.lsh_cosine_topk(emb, queries, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    normed = base / np.linalg.norm(base, axis=1, keepdims=True)
    for qid, qv in queries:
        q = np.asarray(qv) / np.linalg.norm(qv)
        sims = normed @ q
        top = by_q[qid][0] if by_q.get(qid) else None
        assert top is not None
        rank, vec_id, cos = sorted(by_q[qid])[0]
        assert vec_id == int(np.argmax(sims))  # planted neighbor found
        assert abs(cos - sims[vec_id]) < 1e-12  # rerank is exact


def test_connected_components_chains_and_keep_best(spark):
    """Min-label propagation finds exact components on multi-hop chains
    (label must travel the full diameter), and keep-best retains the
    highest-score doc per component plus all unpaired docs."""
    # chain 1-2-3-4-5, triangle 10-11-12, pair (20,21), isolated 30
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    comp = {r["doc_id"]: r["component_id"]
            for r in dedup.connected_components(pairs).collect()}
    assert {comp[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert {comp[i] for i in (10, 11, 12)} == {10}
    assert {comp[i] for i in (20, 21)} == {20}
    assert 30 not in comp  # only paired docs get components

    docs = spark.createDataFrame(
        [(i, float(i % 7)) for i in [1, 2, 3, 4, 5, 10, 11, 12, 20, 21, 30]],
        "doc_id long, score double",
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup.dedup_near_keep_best(docs, pairs, "score").collect()
    )
    # chain: max score is doc 5 (5%7=5); triangle: doc 12 (12%7=5);
    # pair: doc 21 (21%7=0) vs 20 (20%7=6) -> 20; isolated 30 passes through
    assert kept == [5, 12, 20, 30]


def test_ivf_cosine_topk_recall_and_exactness(spark):
    """IVF probe: planted near-duplicates land in their base's cell, so the
    top hit matches brute force; reranked cosines are exact; probing all
    cells degrades to brute force exactly."""
    rng = np.random.RandomState(21)
    n, d = 200, 24
    base = rng.standard_normal((n, d))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = [(0, (base[11] + 0.01 * rng.standard_normal(d)).tolist()),
               (1, (base[77] + 0.01 * rng.standard_normal(d)).tolist())]
    normed = base / np.linalg.norm(base, axis=1, keepdims=True)

    got = similarity.ivf_cosine_topk(emb, queries, k=3, n_cells=16, n_probe=4)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    for qid, qv in queries:
        q = np.asarray(qv) / np.linalg.norm(qv)
        sims = normed @ q
        rank, vec_id, cos = sorted(by_q[qid])[0]
        assert vec_id == int(np.argmax(sims))
        assert abs(cos - sims[vec_id]) < 1e-12

    # n_probe == n_cells -> exactly brute force
    full = similarity.ivf_cosine_topk(emb, queries, k=5, n_cells=8, n_probe=8)
    bf = similarity.brute_force_cosine_topk(emb, queries, k=5)
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])  # noqa: E731
    assert sorted(map(key, full.collect())) == sorted(map(key, bf.collect()))


def test_ivf_kmeans_refinement(spark):
    """Lloyd refinement: on clustered data the refined centroids recover
    the true cluster structure, so recall@1 with a tight probe budget is
    at least as good as the unrefined seeding; n_probe == n_cells stays
    exactly brute force regardless of refinement."""
    rng = np.random.RandomState(5)
    d, per = 16, 40
    centers = rng.standard_normal((6, d)) * 4
    pts = np.vstack([
        c + 0.3 * rng.standard_normal((per, d)) for c in centers
    ])
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    queries = [
        (qi, (centers[qi] + 0.2 * rng.standard_normal(d)).tolist())
        for qi in range(6)
    ]
    normed = pts / np.linalg.norm(pts, axis=1, keepdims=True)

    def recall1(out):
        hit = 0
        for r in out.collect():
            if r["rank"] != 1:
                continue
            q = np.asarray(queries[r["query_id"]][1])
            truth = int(np.argmax(normed @ (q / np.linalg.norm(q))))
            hit += r["vec_id"] == truth
        return hit

    plain = recall1(similarity.ivf_cosine_topk(
        emb, queries, k=1, n_cells=6, n_probe=1, kmeans_iters=0))
    refined = recall1(similarity.ivf_cosine_topk(
        emb, queries, k=1, n_cells=6, n_probe=1, kmeans_iters=3))
    assert refined >= plain
    assert refined == 6  # refined cells align with the true clusters

    full = similarity.ivf_cosine_topk(
        emb, queries, k=5, n_cells=6, n_probe=6, kmeans_iters=2)
    bf = similarity.brute_force_cosine_topk(emb, queries, k=5)
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])  # noqa: E731
    assert sorted(map(key, full.collect())) == sorted(map(key, bf.collect()))


def test_lang_id(docs_df):
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs_df).collect()}
    assert got[0] == "en"
    assert got[3] == "de"
    assert got[5] == "fr"
    assert got[7] == "es"
    assert got[6] == "und"  # numbers only


def test_quality_and_token_counts(docs_df):
    q = {r["doc_id"]: r for r in quality_score(docs_df).collect()}
    assert q[6]["digit_ratio"] > 0.7
    assert q[0]["quality_score"] > q[6]["quality_score"]
    assert q[0]["stopword_ratio"] > 0.2
    t = {r["doc_id"]: r for r in token_counts(docs_df).collect()}
    assert t[0]["ws_tokens"] == 9
    assert t[6]["bpe_units"] == 5


def test_fingerprint_winnow(spark, docs_df):
    fps = fingerprint_winnow(docs_df, k=3, window=2).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    # identical docs -> identical fingerprint sets
    assert by_doc[0] == by_doc[1]
    # near dup shares most fingerprints, disjoint doc shares none
    inter_02 = len(by_doc[0] & by_doc[2]) / len(by_doc[0] | by_doc[2])
    inter_04 = len(by_doc[0] & by_doc[4] if 4 in by_doc else set())
    assert inter_02 >= 0.3
    assert inter_04 == 0


def test_multimodal_plumbing(spark):
    media = multimodal.synthesize_media(spark, 30)
    assert media.count() == 30
    feats = multimodal.extract_features(media, dim=16, fake=True).collect()
    assert len(feats) == 30
    assert all(len(r["feature"]) == 16 for r in feats)
    # deterministic: same media_id -> same feature across runs
    feats2 = {r["media_id"]: r["feature"]
              for r in multimodal.extract_features(media, dim=16, fake=True).collect()}
    for r in feats:
        assert feats2[r["media_id"]] == r["feature"]
    frames = multimodal.sample_frames(media, every_ms=1000)
    fr = frames.collect()
    assert all(len(r["frame_bytes"]) == 16 for r in fr)
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # real decode is an explicit stub
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx", {}, fake=False)


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint='reliable' (fault-tolerant lineage cut) produces the
    same components as the default localCheckpoint mode."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a long, doc_b long",
    )
    local = {r["doc_id"]: r["component_id"]
             for r in dedup.connected_components(pairs).collect()}
    reliable = {r["doc_id"]: r["component_id"]
                for r in dedup.connected_components(
                    pairs, checkpoint="reliable").collect()}
    assert reliable == local
    assert {reliable[i] for i in (1, 2, 3, 4)} == {1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.connected_components(pairs, checkpoint="bogus")


def test_exact_duplicate_groups_cap_bounds_buffer(spark):
    """doc_ids caps at max_ids (smallest kept) while n_docs stays exact —
    and the cap is applied pre-aggregation (window rank), so the agg
    buffer never holds the full membership."""
    rows = [(i, "dup text") for i in range(50)] + [(100, "unique text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_duplicate_groups(df, max_ids=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 50
    assert r["doc_ids"] == [0, 1, 2, 3, 4]
