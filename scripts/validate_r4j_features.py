"""At-scale validation for the round-4j ExactSubstr dedup (200k docs).

Corpus: the deterministic 200k-doc generated corpus with a KNOWN
duplication layer injected — every 20th doc gets one of 10 shared
40-token passages appended, so ground truth is checkable:

* duplicate_spans(window=20) must flag, for every non-canonical carrier
  of a passage, a span covering its appended passage (subset check,
  exact); natural generator repeats are counted separately.
* remove_duplicate_spans is applied and a SECOND pass is run — the
  leftover span count is reported (removal creates new token
  adjacencies, so a small residue is legitimate; the injected layer
  must be gone).
* North-rule evidence: the SAME job timed at local[8] and local[32]
  over the same input, throughput at both + scaling efficiency.

Run detached (~6-10 min):
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r4j_features.py > /tmp/r4j_features.log 2>&1 &
Writes BENCH/at_scale_r4j_features.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elasticsearch_analysis_combo_spark.operators.dedup import (  # noqa: E402
    duplicate_spans,
    remove_duplicate_spans,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 200_000
WINDOW = 20
PASSAGE_LEN = 40
N_PASSAGES = 10
EVERY = 20  # every 20th doc carries a passage


def _passage(k: int) -> str:
    return " ".join(f"dup{k}tok{j}" for j in range(PASSAGE_LEN))


def _carrier(doc_id):
    # ingest() assigns HASH doc_ids (possibly negative) — all selectors
    # must be pmod integer arithmetic, never float division
    return F.pmod(doc_id, F.lit(EVERY)) == 0


def _pid(doc_id):
    # carriers have pmod(id, EVERY) == 0, so pmod(id, EVERY*N) is an
    # exact multiple of EVERY — integer-exact passage index
    return (
        F.pmod(doc_id, F.lit(EVERY * N_PASSAGES)) / EVERY
    ).cast("int")


def _build_docs(spark):
    docs = ingest(generate_corpus(spark, N_DOCS)).select(
        "doc_id", F.col("content").alias("text")
    )
    passages = F.array(*[F.lit(_passage(k)) for k in range(N_PASSAGES)])
    return docs.select(
        "doc_id",
        F.when(
            _carrier(F.col("doc_id")),
            F.concat_ws(
                " ", "text",
                F.element_at(passages, _pid(F.col("doc_id")) + 1),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )


def main():
    out = {"n_docs": N_DOCS, "window": WINDOW}

    for cores in (8, 32):
        spark = get_spark(
            f"r4j_{cores}", cores=cores, shuffle_partitions=cores
        )
        spark.sparkContext.setLogLevel("ERROR")
        docs = _build_docs(spark).cache()
        n_tokens = docs.select(
            F.sum(F.size(F.split("text", r"\s+")))
        ).collect()[0][0]
        out["n_tokens"] = int(n_tokens)

        times = []
        for _ in range(3):
            t0 = time.time()
            n_spans = duplicate_spans(docs, window=WINDOW).count()
            times.append(time.time() - t0)
        p50 = sorted(times)[1]
        out[f"dup_spans_local{cores}_p50_sec"] = round(p50, 3)
        out[f"dup_spans_local{cores}_mtok_per_sec"] = round(
            n_tokens / p50 / 1e6, 3
        )
        out[f"dup_spans_local{cores}_spans"] = int(n_spans)

        if cores == 32:
            # ground-truth subset check at full parallelism
            sp = duplicate_spans(docs, window=WINDOW).cache()
            tok_len = docs.select(
                "doc_id", F.size(F.split("text", r"\s+")).alias("n")
            )
            carriers = tok_len.filter(_carrier(F.col("doc_id"))).select(
                "doc_id", _pid(F.col("doc_id")).alias("pid"),
                (F.col("n") - PASSAGE_LEN).alias("a"),
                (F.col("n") - 1).alias("b"),
            ).cache()
            # the canonical carrier of each passage = min doc_id among
            # its carriers (hash ids, so computed, not enumerated)
            canon = carriers.groupBy("pid").agg(
                F.min("doc_id").alias("canon_id")
            )
            expected = carriers.join(canon, "pid").filter(
                F.col("doc_id") != F.col("canon_id")
            )
            covered = expected.join(sp, "doc_id").filter(
                (F.col("span_start") <= F.col("a"))
                & (F.col("span_end") >= F.col("b"))
            ).select("doc_id").distinct().count()
            out["injected_carriers_expected"] = expected.count()
            out["injected_carriers_covered"] = int(covered)
            out["injected_ok"] = (
                covered == out["injected_carriers_expected"]
            )
            # canonical docs may carry NATURAL generator repeats; the
            # exact claim is: no span overlaps their appended passage
            canon_cov = (
                carriers.join(canon, "pid")
                .filter(F.col("doc_id") == F.col("canon_id"))
                .join(sp, "doc_id")
                .filter(
                    (F.col("span_start") <= F.col("b"))
                    & (F.col("span_end") >= F.col("a"))
                )
                .count()
            )
            out["canonical_passage_unflagged"] = canon_cov == 0

            # removal + second pass residue
            clean = remove_duplicate_spans(docs, sp).cache()
            clean.count()
            t0 = time.time()
            residue = duplicate_spans(clean, window=WINDOW).count()
            out["second_pass_sec"] = round(time.time() - t0, 3)
            out["second_pass_residual_spans"] = int(residue)
            out["first_pass_spans"] = int(sp.count())
            clean.unpersist()
            sp.unpersist()
            carriers.unpersist()

        docs.unpersist()
        spark.stop()

    eff = (
        out["dup_spans_local8_p50_sec"]
        / out["dup_spans_local32_p50_sec"] / 4.0
    )
    out["scaling_efficiency_8_to_32_raw"] = round(eff, 3)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/at_scale_r4j_features.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
