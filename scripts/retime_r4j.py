"""Timing-only re-run of the r4j duplicate_spans scaling legs.

The first r4j run recorded local[32] SLOWER than local[8] (333.6s vs
181.0s) — anomalous for an embarrassingly-parallel hash pass + one
shuffle. Re-time both legs on a quiet host (3 repeats, p50) over the
SAME injected corpus to separate host contention from a real defect.

Run detached:
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/retime_r4j.py > /tmp/retime_r4j.log 2>&1 &
Writes BENCH/retime_r4j.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elasticsearch_analysis_combo_spark.operators.dedup import (  # noqa: E402
    duplicate_spans,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402

from validate_r4j_features import N_DOCS, WINDOW, _build_docs  # noqa: E402


def main():
    out = {"n_docs": N_DOCS, "window": WINDOW}
    for cores in (8, 32):
        spark = get_spark(
            f"r4j_retime_{cores}", cores=cores, shuffle_partitions=cores
        )
        spark.sparkContext.setLogLevel("ERROR")
        docs = _build_docs(spark).cache()
        n_tokens = int(
            docs.select(F.sum(F.size(F.split("text", r"\s+")))).collect()[0][0]
        )
        out["n_tokens"] = n_tokens
        times = []
        for i in range(3):
            t0 = time.time()
            n_spans = duplicate_spans(docs, window=WINDOW).count()
            dt = time.time() - t0
            times.append(dt)
            print(f"local[{cores}] iter {i}: {dt:.1f}s spans={n_spans}",
                  flush=True)
        p50 = sorted(times)[1]
        out[f"local{cores}_p50_sec"] = round(p50, 3)
        out[f"local{cores}_times"] = [round(t, 2) for t in times]
        out[f"local{cores}_mtok_per_sec"] = round(n_tokens / p50 / 1e6, 3)
        docs.unpersist()
        spark.stop()
    out["scaling_efficiency_8_to_32_raw"] = round(
        out["local8_p50_sec"] / out["local32_p50_sec"] / 4.0, 3
    )
    with open("BENCH/retime_r4j.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
