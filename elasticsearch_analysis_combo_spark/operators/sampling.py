"""Deterministic, engine-portable sampling for training-data pipelines.

A 100 TB corpus is never shuffled to sample it: every operator here is a
map-only predicate (or a per-stratum bounded top-k) over a seeded hash
of the row key, so

* the same (seed, key) always lands in the same split — samples are
  REPRODUCIBLE across runs, engines, and cluster sizes (no RNG state,
  no partition-order dependence, unlike ``DataFrame.sample``);
* membership is decidable per-row — predicates stay inside whole-stage
  codegen and push no shuffle;
* splits by construction partition the data (train/val are exact
  complements), which ``sample()`` twice cannot guarantee.

The hash is the repo's portable 60-bit md5 prefix (see
``operators/dedup.py`` portable mode): ``conv(substr(md5(k),1,15),16,10)``
in Spark == ``('0x' || substr(md5(k),1,15))::BIGINT`` in DuckDB — a
uniform integer in [0, 2^60), so ``hash < fraction * 2^60`` samples at
``fraction`` exactly and portably (1e-18 quantization, far below any
real sampling tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TWO60 = 1 << 60


def _u60(key_col: str, seed: int):
    """Uniform int64 in [0, 2^60) from (seed, key) — portable md5
    prefix, JVM-side, whole-stage codegen."""
    return F.expr(
        f"conv(substr(md5(concat('{int(seed)}', ':', "
        f"cast({key_col} as string))), 1, 15), 16, 10)"
    ).cast("long")


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Bernoulli sample at ``fraction``, keyed on ``key_col`` — a pure
    filter (no shuffle, no RNG state), reproducible and engine-portable.
    The SAME rows are selected no matter the partitioning or cluster
    size."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1]: {fraction}")
    return df.filter(_u60(key_col, seed) < int(fraction * _TWO60))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli rates (the corpus-mixing knob of LLM data
    pipelines: upsample rare sources, downsample boilerplate). Still one
    map-only filter: the per-stratum threshold is a broadcast-free CASE
    chain on ``strata_col``; strata absent from ``fractions`` get
    ``default_fraction``."""
    for s, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction must be in [0,1]: {s}={f_}")
    thresh = F.lit(int(default_fraction * _TWO60))
    for s, f_ in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(s), F.lit(int(f_ * _TWO60))
        ).otherwise(thresh)
    return df.filter(_u60(key_col, seed) < thresh)


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACTLY min(n, |stratum|) rows per stratum: rank rows by the
    portable hash inside each stratum and keep the first n — a uniform
    without-replacement sample that is deterministic across engines.
    One shuffle on ``strata_col``; the ``row_number() <= n`` filter
    triggers Spark's rank-limit pushdown (WindowGroupLimit, Spark 3.5+)
    so each map task keeps only its local top-n per stratum BEFORE the
    exchange — the shuffle carries O(n * strata * tasks) rows, not the
    corpus. For extreme strata, pre-thin with :func:`stratified_sample`
    at ~(n / |stratum|) * safety first."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    w = Window.partitionBy(strata_col).orderBy(
        F.asc("_h"), F.asc(key_col)
    )
    return (
        df.withColumn("_h", _u60(key_col, seed))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_h", "_rk")
    )


def train_val_split(
    df: DataFrame,
    val_fraction: float,
    key_col: str = "doc_id",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(train, val) as EXACT complements of one hash predicate — every
    row lands in exactly one side, stable under reruns and appends
    (new rows don't reshuffle old assignments, the property that makes
    hash splits the standard for dataset versioning)."""
    if not 0.0 <= val_fraction <= 1.0:
        raise ValueError(f"val_fraction must be in [0,1]: {val_fraction}")
    cut = int(val_fraction * _TWO60)
    h = _u60(key_col, seed)
    return df.filter(h >= cut), df.filter(h < cut)


def oracle_hash_sql(key_col: str, seed: int) -> str:
    """The DuckDB replay of :func:`_u60` — exposed so gates/oracles
    share one definition."""
    return (
        f"('0x' || substr(md5('{int(seed)}' || ':' || "
        f"CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT"
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    max_per_key: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """C4/RefinedWeb-style per-key document cap: keep at most
    ``max_per_key`` rows per ``key_col`` value (per-host/per-domain
    caps — the anti-boilerplate knob of web-scale corpus curation),
    chosen DETERMINISTICALLY by the portable md5 order of ``id_col``
    (so the same rows survive on any cluster and the cap is
    engine-replayable, unlike a first-N-seen race). One window rank
    per key — the row_number filter triggers WindowGroupLimit rank
    pushdown, so each map task forwards at most ``max_per_key`` rows
    per key before the shuffle."""
    if max_per_key < 1:
        raise ValueError(f"max_per_key must be >= 1: {max_per_key}")
    w = Window.partitionBy(key_col).orderBy(
        _u60(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_cap_rk", F.row_number().over(w))
        .filter(F.col("_cap_rk") <= max_per_key)
        .drop("_cap_rk")
    )


def sample_to_token_budget(
    df: DataFrame,
    strata_col: str,
    budgets: dict[str, int],
    token_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    default_budget: int = 0,
    n_buckets: int = 64,
) -> DataFrame:
    """Mixture sampling by TOKEN budget, not doc count — the shape a
    training-data mixture actually executes (per-source token quotas
    from a mixing recipe, e.g. DoReMi-style weights x total budget):
    within each ``strata_col`` value, documents are taken in the
    deterministic portable-md5 order until the stratum's cumulative
    ``token_col`` reaches its budget. The document that CROSSES the
    budget is included (budgets are met, never silently undershot by a
    boundary doc), matching the usual pack-then-truncate pipelines.
    Strata missing from ``budgets`` get ``default_budget`` (0 = drop).

    Scale shape — two-phase bucketed prefix sum, never one task per
    stratum: the uniform 60-bit hash is RANGE-bucketed into
    ``n_buckets`` slices by its high bits (bucket i's rows all precede
    bucket i+1's in the global (hash, id) order, so per-bucket cumsums
    compose exactly). Phase 1 aggregates per-(stratum, bucket) token
    subtotals — a strata x n_buckets frame — whose exclusive running
    sum over buckets is each bucket's base offset; phase 2 broadcasts
    the offsets back and runs the cumsum window per (stratum, bucket),
    so the widest window partition is ~1/n_buckets of a stratum
    instead of the whole stratum. Identical survivors to the
    single-window definition (the DuckDB oracle replays that form) at
    any ``n_buckets``; no collects, no iteration, and the same
    documents survive at any partitioning or cluster size, so a 100 TB
    mixture is reproducible and auditable."""
    for s, b_ in budgets.items():
        if b_ < 0:
            raise ValueError(f"budget must be >= 0: {s}={b_}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    budget_expr = F.lit(default_budget)
    for s, b_ in sorted(budgets.items()):
        budget_expr = F.when(
            F.col(strata_col) == s, F.lit(b_)
        ).otherwise(budget_expr)
    # ceil-width integer division keeps bucket ids in [0, n_buckets)
    # and monotone in _h even when n_buckets doesn't divide 2^60;
    # `div` (not `/`) because double division loses bits at 2^60.
    width = (_TWO60 + n_buckets - 1) // n_buckets
    keyed = (
        df.withColumn("_budget", budget_expr)
        # zero-budget strata drop BEFORE any shuffle — the predicate
        # fuses into the scan, so dropped sources never move.
        .filter(F.col("_budget") > 0)
        .withColumn("_h", _u60(id_col, seed))
        .withColumn("_bk", F.expr(f"_h div {width}").cast("int"))
    )
    bases = (
        keyed.groupBy(strata_col, "_bk")
        .agg(F.sum(F.col(token_col)).alias("_sub"))
        .withColumn(
            "_base",
            F.coalesce(
                F.sum("_sub").over(
                    Window.partitionBy(strata_col)
                    .orderBy(F.asc("_bk"))
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(strata_col, "_bk", "_base")
    )
    w = Window.partitionBy(strata_col, "_bk").orderBy(
        F.asc("_h"), F.asc(id_col)
    )
    local = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        keyed.join(F.broadcast(bases), [strata_col, "_bk"])
        .withColumn("_run", F.col("_base") + local)
        .filter(F.col("_run") - F.col(token_col) < F.col("_budget"))
        .drop("_h", "_bk", "_base", "_run", "_budget")
    )


def temperature_allocation(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    total_budget: float,
    temperature: float = 1.0,
    max_epochs: float = 1.0,
) -> DataFrame:
    """Temperature-scaled mixture allocation with an epoch cap — the
    UniMax-style (Chung et al. 2023) recipe that turns raw per-source
    token counts into per-source token budgets: weight each source
    ``w_s = n_s^(1/temperature)`` (temperature 1 = proportional,
    higher = flatter toward uniform), allocate ``total_budget`` in
    proportion, but cap every source at ``max_epochs x n_s`` tokens (a
    low-resource source cannot be asked for more repetition than the
    cap) and water-fill the freed budget into the uncapped sources.

    The water-filling threshold has the standard closed form: sort
    sources by ``cap_s / w_s`` ascending (the order caps bind); with
    the first ``i-1`` sources capped the candidate threshold is
    ``t_i = (B - sum_{j<i} cap_j) / sum_{j>=i} w_j``, and the solution
    is the FIRST ``i`` where ``t_i <= cap_i / w_i`` (if none, every
    source caps). budget_s = min(cap_s, w_s * t). All of it runs as
    windows over the REDUCED strata frame (one row per source — the
    heavy pass is the single partial-aggregated groupBy computing
    ``n_s``), fully deterministic and SQL-replayable.

    Returns (strata_col, n_tokens, weight, budget) — budget in tokens,
    double-typed (floor it for :func:`sample_to_token_budget`)."""
    if temperature <= 0.0:
        raise ValueError(f"temperature must be positive: {temperature}")
    if max_epochs <= 0.0:
        raise ValueError(f"max_epochs must be positive: {max_epochs}")
    if total_budget < 0.0:
        raise ValueError(f"total_budget must be >= 0: {total_budget}")
    inv_t = 1.0 / float(temperature)
    src = df.groupBy(strata_col).agg(
        F.sum(F.col(token_col)).cast("double").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    src = src.select(
        strata_col, "n_tokens",
        F.expr(f"pow(n_tokens, {inv_t!r})").alias("weight"),
        (F.col("n_tokens") * F.lit(float(max_epochs))).alias("_cap"),
    )
    # strata-frame windows: one row per source, never row-scale data
    w_ord = Window.orderBy(
        (F.col("_cap") / F.col("weight")).asc(), F.col(strata_col).asc()
    )
    ranked = src.withColumn(
        "_cum_cap_prev",
        F.coalesce(
            F.sum("_cap").over(
                w_ord.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ),
    ).withColumn(
        "_w_from",
        F.sum("weight").over(
            w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        ),
    ).withColumn(
        "_t_cand",
        (F.lit(float(total_budget)) - F.col("_cum_cap_prev"))
        / F.col("_w_from"),
    )
    # the solving threshold: the FIRST valid candidate in cap/weight
    # order. Once a candidate validates (t_i <= cap_i/w_i) every later
    # candidate is also valid and NO LARGER (freed budget only shrinks
    # t), so first-valid == max(valid) — a plain max aggregate, no
    # ordered scan needed. If none qualifies every source caps.
    t_valid = F.when(
        F.col("_t_cand") <= F.col("_cap") / F.col("weight"),
        F.col("_t_cand"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    solved = ranked.withColumn("_t", F.max(t_valid).over(w_all))
    budget = F.when(
        F.col("_t").isNull(), F.col("_cap")
    ).otherwise(F.least(F.col("_cap"), F.col("weight") * F.col("_t")))
    return solved.select(
        strata_col, "n_tokens", "weight",
        F.greatest(budget, F.lit(0.0)).alias("budget"),
    )


def temperature_budgets(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    total_budget: float,
    temperature: float = 1.0,
    max_epochs: float = 1.0,
) -> dict[str, int]:
    """Collect :func:`temperature_allocation` into the ``budgets`` dict
    :func:`sample_to_token_budget` consumes (floored to ints). The
    collect is one row PER SOURCE — a mixture has tens of sources, not
    row-scale data."""
    rows = temperature_allocation(
        df, strata_col, token_col, total_budget,
        temperature=temperature, max_epochs=max_epochs,
    ).collect()
    return {r[strata_col]: int(r["budget"]) for r in rows}


def training_order(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 0,
    epoch: int = 0,
    n_shards: int = 1024,
) -> DataFrame:
    """Deterministic training-data ordering: assign every row a
    ``shard`` (which data-parallel reader consumes it) and a
    ``sort_key`` (its position within the shard), both pure functions
    of ``(seed, epoch, key)`` via the portable 60-bit md5 hash. This is
    the shuffled-and-sharded read order a 1000-reader training job
    needs, with the properties ``DataFrame.orderBy(rand())`` lacks:

    * REPRODUCIBLE — the same (seed, epoch, corpus) yields the same
      order on any cluster size, any partitioning, any engine (the
      hash replays in DuckDB; a resumed run re-derives its order);
    * RESHUFFLED PER EPOCH — ``epoch`` feeds the hash, so each epoch
      is an independent uniform permutation with no state carried;
    * SHUFFLE-FREE HERE — this is a map-only projection. Materializing
      the order is the WRITER's one unavoidable exchange:
      ``.repartition(n_shards, "shard").sortWithinPartitions("sort_key")
      .write.partitionBy("shard")`` — a per-shard sort of corpus/1024,
      never a global sort (no rebalance to one ordered axis).

    Shard assignment uses the hash's LOW bits (pmod) and the sort key
    the full hash, so within-shard order is uniform and independent of
    the shard split. Collisions (same key twice) tie-break by the key
    itself downstream — pass a unique key.

    Returns the input columns + (shard int, sort_key long)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0: {epoch}")
    hashed = df.withColumn(
        "_to_h",
        F.expr(
            f"conv(substr(md5(concat('{int(seed)}', ':', '{int(epoch)}', "
            f"':', cast({key_col} as string))), 1, 15), 16, 10)"
        ).cast("long"),
    )
    return hashed.select(
        "*",
        F.pmod(F.col("_to_h"), F.lit(int(n_shards)))
        .cast("int")
        .alias("shard"),
        F.col("_to_h").alias("sort_key"),
    ).drop("_to_h")
