"""PySpark-native combo-analysis + inverted-index + BM25 engine.

A from-scratch re-expression (NOT a port) of the capabilities of
yakaz/elasticsearch-analysis-combo: multi-analyzer tokenization whose token
streams are merged position-by-position with optional same-position
deduplication (reference: ComboTokenStream.java:35-168, ComboAnalyzer.java),
plus the host-engine stages the reference delegates to Lucene/ES — posting
list build, segment compression/merge, BM25 block-max-WAND top-k — built
Spark-first on DataFrames + vectorized pandas/Arrow UDFs.
"""

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_batch,
    analyze_text,
)
from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
    ANALYZER_REGISTRY,
    register_analyzer,
)

__version__ = "0.1.0"

__all__ = [
    "ComboConfig",
    "analyze_text",
    "analyze_batch",
    "ANALYZER_REGISTRY",
    "register_analyzer",
]
