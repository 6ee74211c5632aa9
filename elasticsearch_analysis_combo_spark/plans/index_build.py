"""End-to-end index build plan (reference lifecycle EP1, SURVEY.md §3).

corpus -> combo analysis + per-doc aggregation (one mapInPandas pass)
       -> doc-stats + corpus stats (N, avgdl)
       -> salted compressed segments -> merged posting table
all stages checkpointed with lineage (B6), resumable mid-pipeline.

Physical-plan shape (local[N] or a real cluster — identical):
  * 1 Arrow-batched analysis pass over the corpus scan (no shuffle)
  * 1 shuffle to (term, salt) for segment encode — skew-bounded by salt
  * 1 shuffle to (term) for the log-structured merge (S rows per term max)
  * docstats/termdf are partial-aggregated map-side by Catalyst
The posting table is written sorted by term (repartitionByRange +
sortWithinPartitions) so query-time term lookups prune row groups via
parquet min/max statistics.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats
from elasticsearch_analysis_combo_spark.operators.checkpoint import (
    CheckpointManager,
    fingerprint,
)
from elasticsearch_analysis_combo_spark.operators.postings import build_postings


@dataclass
class IndexMeta:
    n_docs: int
    avgdl: float
    k1: float
    b: float
    block_size: int
    salt_shards: int
    config: dict
    with_positions: bool
    #: logical table name -> subdirectory under index_dir. None (legacy /
    #: fresh batch build) means each table lives in its bare-named dir.
    #: Versioned publishers (streaming compaction, delete compaction) point
    #: entries at generation dirs like "postings-3f9a12e0" so a publish is
    #: a pure meta.json swap — readers holding the old meta keep valid
    #: paths for their whole lifetime.
    tables: dict | None = None

    @staticmethod
    def load(index_dir: str) -> "IndexMeta":
        with open(os.path.join(index_dir, "meta.json")) as f:
            return IndexMeta(**json.load(f))

    def table_dir(self, index_dir: str, name: str) -> str:
        sub = (self.tables or {}).get(name, name)
        return os.path.join(index_dir, sub)


def publish_tables(
    spark: SparkSession,
    index_dir: str,
    tables: dict[str, DataFrame],
    meta: IndexMeta,
    keep_previous: int = 1,
) -> "InvertedIndex":
    """Atomically publish a new index generation.

    Each DataFrame writes to a fresh ``<name>-<token>`` dir; the new
    meta.json (pointing at the new dirs) replaces the old one with a single
    ``os.replace`` — the only mutation existing paths ever see. Readers
    that loaded an earlier meta keep reading their generation's dirs
    (still on disk). A ``meta.history.jsonl`` records every published
    generation's table map; dirs referenced only by generations more than
    ``keep_previous`` publishes back are deleted. On a real deployment
    index_dir is shared storage and the same swap applies (object stores:
    write new prefixes + swap a pointer object)."""
    import shutil
    import uuid

    token = uuid.uuid4().hex[:8]
    new_tables = dict(meta.tables or {})
    meta_path = os.path.join(index_dir, "meta.json")
    for name, df in tables.items():
        sub = f"{name}-{token}"
        df.write.mode("overwrite").parquet(os.path.join(index_dir, sub))
        new_tables[name] = sub
    meta.tables = new_tables
    meta_tmp = meta_path + f".tmp-{token}"
    with open(meta_tmp, "w") as f:
        json.dump(asdict(meta), f, indent=1)
    os.replace(meta_tmp, meta_path)
    # generation ledger: GC keeps every dir referenced by the newest
    # keep_previous+1 published generations (in-flight readers of those
    # metas finish undisturbed; older readers are assumed gone)
    hist_path = os.path.join(index_dir, "meta.history.jsonl")
    with open(hist_path, "a") as f:
        f.write(json.dumps(new_tables) + "\n")
    live = set(new_tables.values()) | set(tables.keys())
    try:
        recent = open(hist_path).read().splitlines()[-(keep_previous + 1):]
        for ln in recent:
            live |= set(json.loads(ln).values())
    except Exception:
        return InvertedIndex(spark, index_dir)  # ledger unreadable: GC nothing
    for entry in os.listdir(index_dir):
        base = entry.rsplit("-", 1)[0]
        if (
            base in tables
            and entry not in live
            and "-" in entry
            and os.path.isdir(os.path.join(index_dir, entry))
        ):
            shutil.rmtree(os.path.join(index_dir, entry), ignore_errors=True)
    return InvertedIndex(spark, index_dir)


def _config_dict(config: ComboConfig) -> dict:
    def enc(sub):
        if isinstance(sub, ComboConfig):
            return _config_dict(sub)
        # factory-made analyzers (synonym/html_strip) carry a stable
        # registered name — record THAT, not the callable's memory repr
        # (which would break fingerprint resume and query-time recovery)
        stable = getattr(sub, "analyzer_name", None)
        return stable if stable else str(sub)

    out = {
        "sub_analyzers": [enc(s) for s in config.sub_analyzers],
        "deduplication": config.deduplication,
        "name": config.name,
    }
    # settings digests of factory-made analyzers: changing a synonym map
    # under the SAME registered name must change the build fingerprint
    # (else checkpoint resume silently serves the old settings). Included
    # only when present so plain-name configs keep their fingerprints.
    digests = [
        getattr(s, "analyzer_fingerprint", None)
        for s in config.sub_analyzers
    ]
    if any(digests):
        out["analyzer_digests"] = digests
    return out


class InvertedIndex:
    """Handle over a built index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = IndexMeta.load(index_dir)

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.meta.table_dir(self.index_dir, "postings"))

    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(self.meta.table_dir(self.index_dir, "term_stats"))

    def doc_stats(self) -> DataFrame:
        return self.spark.read.parquet(self.meta.table_dir(self.index_dir, "doc_stats"))

    def term_df(self) -> DataFrame:
        return self.spark.read.parquet(self.meta.table_dir(self.index_dir, "term_df"))


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    config: ComboConfig,
    index_dir: str,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
    lang_col: str | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = 128,
    salt_shards: int = 8,
    with_positions: bool = True,
    hot_df_threshold: int | None = None,
    input_fingerprint: str = "",
) -> InvertedIndex:
    """Build (or resume) the full index at ``index_dir``.

    ``input_fingerprint`` ties checkpoint resume to the CORPUS, not just the
    config: left empty, a content fingerprint (row count + bit_xor of
    xxhash64(doc_id, content)) is derived with one extra corpus scan, so
    rebuilding into an existing index_dir with changed data re-runs the
    stages instead of silently resuming a stale index. Callers with a cheap
    external identity (snapshot id, table version) should pass it to skip
    the scan."""
    os.makedirs(index_dir, exist_ok=True)
    ckpt = CheckpointManager(spark, index_dir)
    cfg = _config_dict(config)
    if not input_fingerprint:
        r = corpus.agg(
            F.count("*").alias("n"),
            F.expr(
                f"bit_xor(xxhash64(`{doc_id_col}`, `{content_col}`))"
            ).alias("x"),
        ).collect()[0]
        input_fingerprint = f"auto:{r['n']}:{r['x']}"
    # "statsfmt=2": term_stats positions became pre-packed pos_data binary;
    # the salt invalidates checkpoints of the old array-typed stage outputs
    base_fp = fingerprint(cfg, input_fingerprint, k1, b, block_size,
                          salt_shards, with_positions, "statsfmt=2")

    stats = ckpt.run(
        "term_stats",
        fingerprint(base_fp, "term_stats"),
        lambda: build_term_stats(
            corpus, config, doc_id_col=doc_id_col,
            content_col=content_col, lang_col=lang_col,
        ),
        checksum_cols=["doc_id", "term", "tf"],
    )

    docstats = ckpt.run(
        "doc_stats",
        fingerprint(base_fp, "doc_stats"),
        lambda: stats.groupBy("doc_id").agg(F.first("dl").alias("dl")),
        checksum_cols=["doc_id", "dl"],
    )

    g = docstats.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"] or 0.0)

    meta = IndexMeta(
        n_docs=n_docs, avgdl=avgdl, k1=k1, b=b, block_size=block_size,
        salt_shards=salt_shards, config=cfg, with_positions=with_positions,
    )
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(asdict(meta), f, indent=1)

    term_df = ckpt.run(
        "term_df",
        fingerprint(base_fp, "term_df"),
        # (term, doc) unique after per-doc aggregation -> df = row count;
        # Catalyst does partial (map-side) aggregation automatically
        lambda: stats.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        ),
        checksum_cols=["term", "df"],
    )

    # skew defusal (B3): only terms whose posting list is long enough to
    # hurt a single task get salted; the hot list is a tiny broadcast
    if hot_df_threshold is None:
        hot_df_threshold = max(4 * block_size, n_docs // 10)
    hot_terms = term_df.filter(F.col("df") >= hot_df_threshold).select("term")

    ckpt.run(
        "postings",
        fingerprint(base_fp, "postings"),
        # build_postings output is already term-hash-partitioned and sorted
        # by term within partitions (grouped_map_sorted), so written files
        # are term-clustered and parquet row-group min/max stats prune
        # query-time term lookups — no extra shuffle needed
        lambda: build_postings(
            stats, avgdl=avgdl, hot_terms=hot_terms, k1=k1, b=b,
            block_size=block_size, salt_shards=salt_shards,
            with_positions=with_positions,
        ),
        checksum_cols=["term", "df", "cf"],
    )

    return InvertedIndex(spark, index_dir)


def index_stats(term_stats: DataFrame) -> DataFrame:
    """ES ``_stats`` / ``_count`` readback over the index's stats table:
    one row of corpus-level figures — doc count, vocabulary size,
    posting count, total token count, average document length. Two
    partial-aggregated passes (postings-grain and doc-grain) joined as
    1x1 rows; at 100 TB swap countDistinct for approx_count_distinct if
    the ±0.5% trade is acceptable — schema identical."""
    from pyspark.sql import functions as F

    grain = term_stats.agg(
        F.countDistinct("term").alias("vocabulary_size"),
        F.count("*").alias("posting_count"),
        F.sum("tf").alias("token_count"),
    )
    docs = (
        term_stats.select("doc_id", "dl").distinct()
        .agg(
            F.count("*").alias("doc_count"),
            F.avg("dl").alias("avgdl"),
        )
    )
    return grain.crossJoin(docs).select(
        "doc_count", "vocabulary_size", "posting_count", "token_count",
        "avgdl",
    )
