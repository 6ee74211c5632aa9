"""Combo analysis: N sub-analyzers merged position-by-position.

Functional core of the engine's analysis stage. Re-expresses, with identical
observable semantics, the reference's priority-queue merge:

* merge order — the reference's min-heap pops streams ordered by
  (position, startOffset, endOffset) (PositionedTokenStream.java:89-118,
  ComboTokenStream.java:98-126, KEEP_STREAM_IF_SAME_POSITION=false at :42).
  We produce the same sequence with a single stable sort on the total key
  ``(pos, start, end, analyzer_idx)`` — see SURVEY.md §2 determinism note:
  whenever the 3-part reference key differs the order is identical; residual
  ties are attribute-equal tokens whose relative order cannot affect
  positions, offsets, term frequencies, or dedup outcome.
* position increment re-derivation — emitted posInc = max(0, pos - last)
  (ComboTokenStream.java:108).
* same-position dedup — optional; a token whose term already appeared at the
  same absolute position is dropped, keeping the first under the sort order
  (ES UniqueTokenFilter(onlyOnSamePosition=true) wired at
  ComboAnalyzer.java:266-267; golden vector TestComboAnalyzer.java:69-82).
* config surface — ``sub_analyzers`` required (ComboAnalyzerWrapper.java:74-76
  raises), unknown analyzer names are warned about and skipped
  (ComboAnalyzerWrapper.java:78-85), combos nest (cascade golden vector
  TestComboAnalyzer.java:101-116), repeated analyzers are allowed
  (TestComboAnalyzer.java:85-98) — trivially safe here because tokenizers are
  pure functions, which also obsoletes the reference's caching/reuse
  machinery (CachingTokenStream.java, ReusableTokenStreamComponents.java).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Callable, Sequence, Union

from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
    ANALYZER_REGISTRY,
    LANG_DEFAULT,
    LANG_DISPATCH,
    Token,
    TokenizerFn,
)

logger = logging.getLogger(__name__)

SubAnalyzer = Union[str, "ComboConfig", TokenizerFn]


@dataclass(frozen=True)
class ComboConfig:
    """Engine-side equivalent of the reference's dynamic settings
    ``{type: combo, sub_analyzers: [...], deduplication: bool}``
    (ComboAnalyzerWrapper.java:72-95). ``tokenstream_caching`` has no
    equivalent — streams are always materialized, vectorized."""

    sub_analyzers: tuple = ()
    deduplication: bool = False
    name: str = "combo"

    def __post_init__(self):
        if not self.sub_analyzers:
            raise ValueError(
                "Analyzer of type combo, must have a \"sub_analyzers\" list "
                "property (reference: ComboAnalyzerWrapper.java:74-76)"
            )
        object.__setattr__(self, "sub_analyzers", tuple(self.sub_analyzers))


def _resolve(sub: SubAnalyzer) -> Callable[[str, str | None], list[Token]] | None:
    """Resolve one sub-analyzer to a ``(text, lang) -> [Token]`` callable.
    Unknown names are skipped with a warning (ComboAnalyzerWrapper.java:78-85)."""
    if isinstance(sub, ComboConfig):
        fns = resolve_config(sub)

        def run_nested(text: str, lang: str | None, _fns=fns, _cfg=sub):
            return merge_token_lists(
                [f(text, lang) for f in _fns], deduplication=_cfg.deduplication
            )

        return run_nested
    if isinstance(sub, str):
        if sub == "lang":
            def run_lang(text: str, lang: str | None):
                name = LANG_DISPATCH.get(lang or "", LANG_DEFAULT)
                return ANALYZER_REGISTRY[name](text)
            return run_lang
        fn = ANALYZER_REGISTRY.get(sub)
        if fn is None:
            logger.warning(
                "combo analyzer: sub-analyzer %r not found, skipping "
                "(reference behavior: ComboAnalyzerWrapper.java:78-85)", sub
            )
            return None
        return lambda text, lang, _fn=fn: _fn(text)
    # raw callable (e.g. replay fixture)
    return lambda text, lang, _fn=sub: _fn(text)


def resolve_config(config: ComboConfig) -> list[Callable]:
    fns = [_resolve(s) for s in config.sub_analyzers]
    return [f for f in fns if f is not None]


def merge_token_lists(
    streams: Sequence[list[Token]], deduplication: bool = False
) -> list[Token]:
    """K-way merge of N already-position-absolute token lists.

    The reference does this lazily with a PriorityQueue
    (ComboTokenStream.java:98-126); each input stream is non-decreasing in
    (pos, start, end), so a global stable sort by the total key
    (pos, start, end, analyzer_idx) yields the same emission order wherever
    the reference's 3-part comparator determines it."""
    merged: list[tuple[int, int, int, int, Token]] = []
    for aidx, toks in enumerate(streams):
        if not toks:  # failed/empty sub-analyzer slot tolerated
            continue  # (reference: ComboTokenStream.java:56,85)
        for t in toks:
            merged.append((t.pos, t.start, t.end, aidx, t))
    merged.sort(key=lambda e: e[:4])
    out = [e[4] for e in merged]
    if deduplication:
        seen: set[tuple[int, str]] = set()
        kept = []
        for t in out:
            k = (t.pos, t.term)
            if k in seen:
                continue
            seen.add(k)
            kept.append(t)
        out = kept
    return out


def analyze_text(
    text: str, config: ComboConfig, lang: str | None = None
) -> list[Token]:
    """Run the full combo analysis over one text. Tokens carry absolute
    positions; use :func:`to_pos_increments` for the Lucene-style view."""
    fns = resolve_config(config)
    return merge_token_lists(
        [f(text, lang) for f in fns], deduplication=config.deduplication
    )


def analyze_batch(
    texts: Sequence[str],
    config: ComboConfig,
    langs: Sequence[str | None] | None = None,
) -> list[list[Token]]:
    """Batch entry point used by the pandas UDFs: resolve the config once
    per Arrow batch (the analogue of the reference's per-thread analyzer
    reuse, ComboAnalyzer.java:74-76 — setup amortized per batch, not per
    row)."""
    fns = resolve_config(config)
    dedup = config.deduplication
    if langs is None:
        langs = [None] * len(texts)
    return [
        merge_token_lists([f(t, lg) for f in fns], deduplication=dedup)
        if t is not None else []
        for t, lg in zip(texts, langs)
    ]


def to_pos_increments(tokens: list[Token]) -> list[int]:
    """Re-delta-encode absolute positions exactly as the merged stream does:
    posInc = max(0, pos - lastPosition), lastPosition starting at 0
    (reference: ComboTokenStream.java:108)."""
    out = []
    last = 0
    for t in tokens:
        out.append(max(0, t.pos - last))
        last = t.pos
    return out


def resolve_fast_config(config: ComboConfig):
    """Build the fast (term, pos)-only evaluator for this config, or None
    if any sub-analyzer lacks a fast variant (then the full Token path is
    used). See FAST_TERM_POS_REGISTRY in tokenizers.py — posting builds
    never need offsets/types/emission order."""
    from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
        FAST_TERM_POS_REGISTRY,
    )

    evals = []
    for sub in config.sub_analyzers:
        if isinstance(sub, ComboConfig):
            nested = resolve_fast_config(sub)
            if nested is None:
                return None
            evals.append(nested)
        elif isinstance(sub, str):
            if sub == "lang":
                def eval_lang(text, lang):
                    name = LANG_DISPATCH.get(lang or "", LANG_DEFAULT)
                    fn = FAST_TERM_POS_REGISTRY.get(name)
                    if fn is None:  # dispatch target without fast variant
                        toks = ANALYZER_REGISTRY[name](text)
                        return [(t.term, t.pos) for t in toks]
                    terms, poses = fn(text)
                    if poses is None:
                        return list(zip(terms, range(1, len(terms) + 1)))
                    return list(zip(terms, poses))
                evals.append(eval_lang)
            else:
                fn = FAST_TERM_POS_REGISTRY.get(sub)
                if fn is None:
                    if sub in ANALYZER_REGISTRY:
                        logger.warning(
                            "no fast variant for analyzer %r; term_stats "
                            "falls back to the full token path", sub
                        )
                    return None

                def eval_leaf(text, lang, _fn=fn):
                    terms, poses = _fn(text)
                    if poses is None:
                        return list(zip(terms, range(1, len(terms) + 1)))
                    return list(zip(terms, poses))
                evals.append(eval_leaf)
        else:
            return None  # raw callable: no fast contract

    dedup = config.deduplication

    def eval_combo(text: str, lang: str | None) -> list[tuple[str, int]]:
        pairs: list[tuple[str, int]] = []
        for ev in evals:
            pairs.extend(ev(text, lang))
        if dedup:
            seen: set[tuple[str, int]] = set()
            kept = []
            for p in pairs:
                if p in seen:
                    continue
                seen.add(p)
                kept.append(p)
            pairs = kept
        return pairs

    eval_combo._n_subs = len(evals)  # single-analyzer => positions pre-sorted
    return eval_combo


def term_stats_from_pairs(
    pairs: list[tuple[str, int]], presorted: bool
) -> tuple[dict[str, tuple[int, list[int]]], int]:
    """(term, pos) pairs -> term -> (tf, sorted positions), doc length."""
    by_term: dict[str, list[int]] = {}
    for term, pos in pairs:
        lst = by_term.get(term)
        if lst is None:
            by_term[term] = [pos]
        else:
            lst.append(pos)
    if not presorted:
        for lst in by_term.values():
            lst.sort()
    return {t: (len(p), p) for t, p in by_term.items()}, len(pairs)


def term_stats(tokens: list[Token]) -> tuple[dict[str, tuple[int, list[int]]], int]:
    """Aggregate one doc's merged tokens to ``term -> (tf, positions)`` plus
    doc length (token count) — the per-document half of the posting build
    (SURVEY.md §2 B2), done here so the distributed stage ships one shuffle
    of pre-aggregated rows instead of raw tokens."""
    stats: dict[str, tuple[int, list[int]]] = {}
    for t in tokens:
        cur = stats.get(t.term)
        if cur is None:
            stats[t.term] = (1, [t.pos])
        else:
            tf, positions = cur
            positions.append(t.pos)
            stats[t.term] = (tf + 1, positions)
    return stats, len(tokens)
