"""Property test: the engine's sort-based combo merge must equal an
independently-written priority-queue merge that mirrors the reference
algorithm structurally (min-heap keyed by (pos, start, end), emit-min /
advance / re-enqueue — ComboTokenStream.java:98-126), on randomized
scripted streams. Ties beyond the 3-part key are compared order-insensitively
per the SURVEY §2 determinism note."""

import heapq
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
    to_pos_increments,
)
from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
    Token,
    make_replay_tokenizer,
)


def heap_merge(streams, deduplication=False):
    """Reference-shaped merge: lazy heap of per-stream cursors."""
    heap = []
    for sidx, toks in enumerate(streams):
        if toks:
            t = toks[0]
            heapq.heappush(heap, ((t.pos, t.start, t.end), sidx, 0))
    out = []
    seen = set()
    while heap:
        (_, sidx, i) = heapq.heappop(heap)
        t = streams[sidx][i]
        if not deduplication or (t.pos, t.term) not in seen:
            seen.add((t.pos, t.term))
            out.append(t)
        if i + 1 < len(streams[sidx]):
            nt = streams[sidx][i + 1]
            heapq.heappush(heap, ((nt.pos, nt.start, nt.end), sidx, i + 1))
    return out


@st.composite
def scripted_stream(draw):
    """Valid analyzer output: non-decreasing (pos, start, end) — the
    contract every real token stream satisfies (tokens are emitted in
    reading order; stacked same-position tokens in offset order)."""
    n = draw(st.integers(0, 12))
    toks = []
    pos, last_start, last_end = 0, 0, 0
    for _ in range(n):
        inc = draw(st.integers(0, 3))  # posInc 0..3 (gaps + stacking)
        if pos == 0:
            inc = max(inc, 1)  # first token advances from 0
        pos += inc
        if inc > 0:
            start = last_start + draw(st.integers(0, 3))
            end = start + draw(st.integers(1, 5))
        else:
            start = last_start + draw(st.integers(0, 2))
            if start == last_start:
                end = last_end + draw(st.integers(0, 3))
            else:
                end = start + draw(st.integers(1, 5))
        last_start, last_end = start, end
        term = draw(st.sampled_from("abcdef")) * draw(st.integers(1, 2))
        toks.append(Token(term, start, end, pos, "word"))
    return toks


@settings(max_examples=200, deadline=None)
@given(st.lists(scripted_stream(), min_size=1, max_size=5), st.booleans())
def test_sort_merge_equals_heap_merge(streams, dedup):
    from elasticsearch_analysis_combo_spark.analysis.combo import merge_token_lists

    got = merge_token_lists(streams, deduplication=dedup)
    exp = heap_merge(streams, deduplication=dedup)
    # same multiset overall
    assert sorted(got) == sorted(exp)
    # identical sequence of 3-part keys (the reference-determined order)
    assert [(t.pos, t.start, t.end) for t in got] == [
        (t.pos, t.start, t.end) for t in exp
    ]
    # within each equal-key run, same multiset of terms
    def runs(toks):
        out, cur, key = [], [], None
        for t in toks:
            k = (t.pos, t.start, t.end)
            if k != key:
                if cur:
                    out.append(sorted(x.term for x in cur))
                cur, key = [], k
            cur.append(t)
        if cur:
            out.append(sorted(x.term for x in cur))
        return out

    assert runs(got) == runs(exp)
    # posInc re-derivation is non-negative and reproduces absolute positions
    incs = to_pos_increments(got)
    acc, last = [], 0
    for inc in incs:
        last = last + inc if inc > 0 else last
        acc.append(last)
    assert all(i >= 0 for i in incs)


def test_random_text_merge_positions_monotone():
    rng = random.Random(7)
    words = ["the", "Fast", "getFoo", "snake_case", "42", "schön", "tests"]
    for _ in range(50):
        text = " ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
        cfg = ComboConfig(
            ["whitespace", "standard", "english", "identifier"],
            deduplication=rng.random() < 0.5,
        )
        toks = analyze_text(text, cfg)
        assert all(a.pos <= b.pos for a, b in zip(toks, toks[1:]))
        incs = to_pos_increments(toks)
        assert all(i >= 0 for i in incs)
        assert len(toks) == len(set((id(t) for t in toks)))
