"""Small dimension frames as LocalTableScan (guide §4: eliminate the
Python boundary).

``spark.createDataFrame(list_of_tuples, schema)`` materializes through
``sc.parallelize`` — a *plain-pickle Python-RDD* scan with
``defaultParallelism`` slices, so every evaluation (each broadcast build,
each collect) launches a stage of N near-empty Python tasks. Query
operators build many such tiny frames (query terms, cursors, clause
dimensions), and on local[32] each evaluation costs ~0.3-0.6 s of pure
worker round-trips.

Routing the same rows through a pandas DataFrame instead makes PySpark's
Arrow path convert them ON THE DRIVER into a ``LocalTableScan``: zero
Python workers at evaluation time, broadcast builds read in-memory rows
directly, and Catalyst can see the values. Conversion errors (exotic
nested values, disabled Arrow) fall back to the classic path — eagerly,
since the pandas conversion happens at creation time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SCHEMA_CACHE: dict[str, T.StructType] = {}


def _as_struct(schema) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    st = _SCHEMA_CACHE.get(schema)
    if st is None:
        st = T.StructType.fromDDL(schema)
        _SCHEMA_CACHE[schema] = st
    return st


def tiny_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Build a small DataFrame that evaluates as a LocalTableScan.

    Drop-in for ``spark.createDataFrame(rows, schema)`` for small
    driver-side row lists (query dims, cursors, lookup tables). ``schema``
    is a DDL string or StructType; ``rows`` any iterable of tuples."""
    rows = rows if isinstance(rows, list) else list(rows)
    try:
        import pandas as pd

        st = _as_struct(schema)
        names = [f.name for f in st.fields]
        if rows:
            pdf = pd.DataFrame(rows, columns=names)
        else:
            pdf = pd.DataFrame({n: pd.Series([], dtype=object) for n in names})
        return spark.createDataFrame(pdf, schema=st)
    except Exception:  # noqa: BLE001 - always fall back to the classic path
        return spark.createDataFrame(rows, schema)
