"""Property tests for the VW transaction grammar (parse_vw_line after
the r6 collection_parser.cc fidelity pass): driver-side, no Spark jobs.

Invariants pinned against the reference rules (collection_parser.cc
:595-733, verified line-for-line by the TransactionVowpalWabbit port):

1. total mass: sum of parsed weights == sum of written token weights
   (group-flush accumulation only merges duplicates, never drops mass);
2. plain tokens (outside any ``||`` block) are singleton transactions;
3. a bare-``||``-closed group is ONE transaction whose duplicate
   (class, token) pairs accumulate;
4. a ``||name``-interrupted run dumps each pending token as its own
   singleton transaction under the OLD typename;
5. transaction ids are dense per doc: 0..max with no gaps;
6. modality resets to @default_class at every ``||`` boundary.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from bigartm_spark.sources.vw import parse_vw_line

TOK = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
CLS = st.sampled_from(["", "|author", "|label"])
WEIGHT = st.integers(min_value=1, max_value=5)


@st.composite
def vw_line(draw):
    """A doc line mixing plain tokens, modality switches, and ||-blocks."""
    parts = ["doc0"]
    total = 0.0
    n_segments = draw(st.integers(min_value=1, max_value=5))
    for _ in range(n_segments):
        kind = draw(st.sampled_from(["plain", "group", "named"]))
        if kind == "named":
            parts.append("||t" + str(draw(st.integers(0, 2))))
        cls = draw(CLS)
        if cls:
            parts.append(cls)
        for _ in range(draw(st.integers(min_value=1, max_value=4))):
            t = draw(TOK)
            w = draw(WEIGHT)
            parts.append(f"{t}:{w}")
            total += w
        if kind == "group":
            parts.append("||")
    return " ".join(parts), total


@settings(max_examples=200, deadline=None)
@given(vw_line())
def test_vw_mass_and_dense_transaction_ids(line_total):
    line, total = line_total
    rows = parse_vw_line(line)
    got = sum(r[4] for r in rows)
    assert abs(got - total) < 1e-9, (line, got, total)
    tids = sorted({r[6] for r in rows})
    assert tids == list(range(len(tids))), (line, tids)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(TOK, WEIGHT), min_size=1, max_size=8))
def test_plain_tokens_are_singletons(tokens):
    line = "doc0 " + " ".join(f"{t}:{w}" for t, w in tokens)
    rows = parse_vw_line(line)
    # one row per written token, each its own transaction, default class
    assert len(rows) == len(tokens)
    assert len({r[6] for r in rows}) == len(tokens)
    assert all(r[2] == "@default_class" for r in rows)
    assert all(r[7] == "@default_transaction" for r in rows)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(TOK, WEIGHT), min_size=1, max_size=8))
def test_bare_closed_group_is_one_transaction_with_accumulation(tokens):
    line = "doc0 ||t1 " + " ".join(f"{t}:{w}" for t, w in tokens) + " ||"
    rows = parse_vw_line(line)
    assert {r[6] for r in rows} == {0}
    assert all(r[7] == "t1" for r in rows)
    want = defaultdict(float)
    for t, w in tokens:
        want[t] += w
    got = {r[3]: r[4] for r in rows}
    assert got == dict(want)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(TOK, WEIGHT), min_size=1, max_size=6))
def test_named_boundary_dumps_singletons_under_old_typename(tokens):
    # pending tokens before '||t2' each become their own transaction
    # typed @default_transaction (the typename in effect while pending)
    line = (
        "doc0 "
        + " ".join(f"{t}:{w}" for t, w in tokens)
        + " ||t2 closer ||"
    )
    rows = parse_vw_line(line)
    pend = [r for r in rows if r[3] != "closer"]
    assert len(pend) == len(tokens)
    assert len({r[6] for r in pend}) == len(tokens)
    assert all(r[7] == "@default_transaction" for r in pend)
    [closer] = [r for r in rows if r[3] == "closer"]
    assert closer[7] == "t2"


@settings(max_examples=100, deadline=None)
@given(st.sampled_from(["||", "||t1"]))
def test_modality_resets_at_boundaries(boundary):
    line = f"doc0 |author early {boundary} late ||"
    rows = parse_vw_line(line)
    by_tok = {r[3]: r[2] for r in rows}
    assert by_tok["early"] == "author"
    assert by_tok["late"] == "@default_class"
