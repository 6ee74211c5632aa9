"""ES ``_search`` request-body hit sections: ``slice``, ``track_total_hits``,
``_source`` / ``fields`` projection.

Host surface behind the reference's plugin registration
(AnalysisComboPlugin.java:30-42 — these body sections wrap whatever
analyzer built the index; the engine's hits frames are what they
decorate). All three are deliberately tiny compositions over frames the
engine already has:

- ``slice_predicate``: ES sliced scroll (``{"slice": {"id": i, "max":
  m}}``) — a DETERMINISTIC 1/m partition of the match set so m export
  workers can walk disjoint pages in parallel (the 100 TB dump path).
  ES slices on the murmur3 of ``_id``; this engine uses the repo's
  portable md5-60bit hash of ``doc_id`` so a DuckDB oracle replays the
  assignment byte-for-byte. Map-only: one sargable-free but
  codegen'd projection, no shuffle, stable under repartition/appends.
- ``attach_total_hits``: ES ``track_total_hits`` — exact when ``true``;
  an integer N caps the reported value at N with relation ``gte``
  (the ES wire shape). ONE count over the id-only membership frame
  (never the text), broadcast onto the hits rows.
- ``project_fields``: ES ``_source`` filtering + ``fields`` — join the
  requested metadata/runtime columns onto the top-k hits. The join is
  k rows vs the metadata scan: Spark broadcasts the hit side, so the
  scan prunes to the requested columns (ReadSchema) and never
  materializes unrequested ones. Trailing-``*`` wildcards resolve
  against the metadata schema at compile time (ES field-pattern
  subset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the repo-wide portable Spark<->DuckDB 60-bit hash (CLAUDE.md):
# conv(substr(md5(x),1,15),16,10) == ('0x'||substr(md5(x),1,15))::BIGINT
_MD5_60 = "conv(substr(md5(cast({col} as string)),1,15),16,10)"


def slice_predicate(slice_spec: dict, id_col: str = "doc_id") -> str:
    """SQL predicate selecting slice ``id`` of ``max`` — pmod of the
    portable md5 hash, so every doc lands in exactly one slice and the
    assignment replays identically in DuckDB (``pmod`` because Spark's
    ``%`` is negative on negative longs under ANSI)."""
    sid = int(slice_spec["id"])
    smax = int(slice_spec["max"])
    if not (0 <= sid < smax):
        raise ValueError(f"slice id must be in [0, max): {sid} / {smax}")
    if smax < 2:
        raise ValueError(f"slice max must be >= 2: {smax}")
    h = _MD5_60.format(col=id_col)
    return f"pmod({h}, {smax}) = {sid}"


def attach_total_hits(
    hits: DataFrame, members: DataFrame, track
) -> DataFrame:
    """Broadcast the match-set cardinality onto every hit row as
    ``(total_hits, total_relation)``. ``track`` is ES's
    ``track_total_hits``: ``True`` = exact (relation ``eq``); an int N
    = count up to N (value capped at N, relation ``gte`` beyond —
    the early-terminating collector's wire shape, computed exactly
    here since the id-only count is one partial-agg shuffle)."""
    cnt = members.agg(F.count("*").cast("long").alias("_n"))
    if track is True:
        tot = cnt.select(
            F.col("_n").alias("total_hits"),
            F.lit("eq").alias("total_relation"),
        )
    else:
        n = int(track)
        if n < 1:
            raise ValueError(f"track_total_hits must be true or >= 1: {n}")
        tot = cnt.select(
            F.least(F.col("_n"), F.lit(n).cast("long")).alias("total_hits"),
            F.when(F.col("_n") > n, F.lit("gte"))
            .otherwise(F.lit("eq")).alias("total_relation"),
        )
    return hits.crossJoin(F.broadcast(tot))


def resolve_field_patterns(
    patterns, columns: list[str], id_col: str = "doc_id"
) -> list[str]:
    """Expand an ES ``_source`` / ``fields`` list against the metadata
    schema: plain names must exist (unknown names raise — ES silently
    omits, but silence here would un-oracle a typo); a trailing ``*``
    matches the prefix. Returns schema-ordered unique columns, the id
    column excluded (hits already carry it)."""
    if isinstance(patterns, str):
        patterns = [patterns]
    want: list[str] = []
    for p in patterns:
        name = p if isinstance(p, str) else p["field"]
        if name.endswith("*"):
            pre = name[:-1]
            hit = [c for c in columns if c.startswith(pre) and c != id_col]
            if not hit:
                raise ValueError(f"field pattern {name!r} matches nothing")
            want += hit
        else:
            if name not in columns:
                raise ValueError(f"unknown field {name!r}")
            if name != id_col:
                want.append(name)
    # schema order, first occurrence wins
    seen = set()
    out = []
    for c in columns:
        if c in want and c not in seen:
            seen.add(c)
            out.append(c)
    return out


def project_fields(
    hits: DataFrame,
    doc_meta: DataFrame,
    source_spec=None,
    fields_spec=None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``_source`` filtering + ``fields`` on the hits: left-join the
    resolved metadata columns (runtime mappings included when the
    caller passes the runtime-decorated frame) onto the top-k rows.
    ``_source: false`` with no ``fields`` is a no-op (the default —
    hits already carry ids/rank/score only)."""
    cols: list[str] = []
    if source_spec not in (None, False, True):
        cols += resolve_field_patterns(
            source_spec, doc_meta.columns, id_col
        )
    if fields_spec:
        cols += resolve_field_patterns(
            fields_spec, doc_meta.columns, id_col
        )
    if not cols:
        return hits
    seen = set()
    cols = [c for c in cols if not (c in seen or seen.add(c))]
    # sort/slice-path hits already carry the metadata columns (base =
    # meta + rank): joining them back in would make every reference
    # ambiguous (AMBIGUOUS_REFERENCE on Spark 4). Keep only the columns
    # the hits frame is missing; if none are missing the hits already
    # ARE the projection.
    cols = [c for c in cols if c not in hits.columns]
    if not cols:
        return hits
    # broadcast the HITS side (k rows) and stream the metadata scan —
    # the join shape that never shuffles a 100 TB metadata table for a
    # top-k page. Inner join: every hit id exists in the doc table the
    # engine indexed from (hits were derived from it), so inner ==
    # left here, and only inner lets the k-row side be the broadcast
    # build side. The scan is pruned to id + requested columns
    # (ReadSchema, audited).
    out = doc_meta.select(id_col, *cols).join(
        F.broadcast(hits), id_col
    )
    return out.select(*hits.columns, *cols)
