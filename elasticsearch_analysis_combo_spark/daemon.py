"""Preloading Python-worker daemon.

PySpark forks one worker per task from a daemon process
(``pyspark/daemon.py``); each forked worker then imports, at first UDF
deserialization, everything the UDF body needs — for this engine that is
numpy + pandas + pyarrow (~0.7 s wall each, mostly page-faulting shared
libraries) plus the package's analysis/codec modules. On a local[32] run
that cold-start is paid 32 times concurrently and lands entirely inside
the FIRST timed stage (guide §4.5: heavyweight init once per task — this
moves it earlier still, to once per *daemon*).

Importing the heavy modules HERE, before ``manager()`` starts forking,
makes every worker inherit the already-initialized modules through fork
copy-on-write: imports in the child become dictionary lookups.

Wired up by ``session.get_spark`` via ``spark.python.daemon.module``
(a public Spark conf; spark-core reads it in PythonWorkerFactory). The
preload is best-effort: any import failure falls through to a vanilla
daemon rather than breaking worker launch.
"""

from __future__ import annotations

try:  # pragma: no cover - exercised by every Spark stage, not unit-testable
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    # the engine's own hot modules (UDF bodies resolve these on unpickle)
    import elasticsearch_analysis_combo_spark.analysis.combo  # noqa: F401
    import elasticsearch_analysis_combo_spark.analysis.tokenizers  # noqa: F401
    import elasticsearch_analysis_combo_spark.analysis.udfs  # noqa: F401
    import elasticsearch_analysis_combo_spark.operators.codec  # noqa: F401
    import elasticsearch_analysis_combo_spark.operators.grouped  # noqa: F401
    import elasticsearch_analysis_combo_spark.operators.postings  # noqa: F401
except Exception:  # noqa: BLE001 - never block worker launch on a preload
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
