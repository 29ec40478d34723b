"""Gopher repetition filters (Rae et al. 2021 §A1.1): repetition_signals
vs a brute-force python oracle, hypothesis sweep, JVM-only plan gate."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from searchenginer_spark.functions.textstats import repetition_signals
from tests._repetition_oracles import merge as _merge
from tests._repetition_oracles import tok as _tok


def _oracle(t: str, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)) -> dict[str, float]:
    lines = t.split("\n")
    nl, nd = len(lines), len(set(lines))
    lc = sum(len(x) for x in lines)
    dc = sum(len(x) for x in set(lines))
    exp = {
        "dup_line_frac": (nl - nd) / nl if nl else 0.0,
        "dup_line_char_frac": (lc - dc) / lc if lc else 0.0,
    }
    ts = _tok(t)
    tl = [len(x) for x in ts]
    total = sum(tl)
    for n in top_ns:
        c = Counter(tuple(ts[p : p + n]) for p in range(len(ts) - n + 1))
        if c and total:
            mx = max(c.values())
            chars = max(sum(len(w) for w in g) for g, k in c.items() if k == mx)
            exp[f"top_{n}gram_char_frac"] = mx * chars / total
        else:
            exp[f"top_{n}gram_char_frac"] = 0.0
    for n in dup_ns:
        c = Counter(tuple(ts[p : p + n]) for p in range(len(ts) - n + 1))
        dup = [p for p in range(len(ts) - n + 1) if c[tuple(ts[p : p + n])] >= 2]
        cov = sum(sum(tl[s:e]) for s, e in _merge(dup, n))
        exp[f"dup_{n}gram_char_frac"] = cov / total if total else 0.0
    return exp


DOCS = [
    (0, "the cat sat\nthe cat sat\non the mat\n"),
    (1, "foo bar baz foo bar baz foo bar baz qux"),
    (2, "all unique words here today my friend ok then"),
    (3, ""),  # empty: every frac must be 0.0, never a div-by-zero (ANSI)
    (4, "x\nx\nx\ny"),
    (5, "a b a b a b a b a b a b"),  # fully self-duplicated at every n
    (6, "lead " + "w1 w2 w3 w4 w5 " * 2 + "tail words differ here"),
    # long unique prose: every signal small — the doc a Gopher gate keeps
    (7, " ".join(f"word{i:03d}" for i in range(80))),
]


def _got(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sig = repetition_signals(F.col("text"))
    cols = [F.col("doc_id")] + [c.alias(k) for k, c in sig.items()]
    return {r["doc_id"]: r.asDict() for r in df.select(*cols).collect()}


def test_signals_match_bruteforce(spark):
    got = _got(spark, DOCS)
    for i, t in DOCS:
        exp = _oracle(t)
        for k, v in exp.items():
            assert abs(got[i][k] - v) < 1e-9, (i, k, got[i][k], v)


def test_gopher_gate_composition(spark):
    """The published thresholds compose as plain column predicates: the
    pathological self-repeating docs fail, clean prose passes."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    sig = repetition_signals(F.col("text"))
    gate = (
        (sig["dup_line_frac"] <= 0.30)
        & (sig["top_2gram_char_frac"] <= 0.20)
        & (sig["dup_5gram_char_frac"] <= 0.15)
    )
    keep = {r["doc_id"] for r in df.filter(gate).collect()}
    assert 7 in keep and 3 in keep  # long unique prose + empty doc pass
    assert 1 not in keep and 5 not in keep  # self-repeating docs fail
    # Gopher caveat, pinned: on a SHORT doc even a count-1 "most frequent"
    # 2-gram exceeds 20% of chars — doc 2 (9 tokens) fails the gate by
    # design; length gating (quality_score's 10-token band) runs first
    assert 2 not in keep


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    sig = repetition_signals(F.col("text"))
    out = df.select("doc_id", *[c.alias(k) for k, c in sig.items()])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange" not in plan  # per-row math: a narrow map, no shuffle


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    st.lists(
        st.sampled_from("aa bb cc dd ee \n".split(" ")), min_size=0, max_size=60
    )
)
def test_signals_property(spark, pieces):
    """Random tiny-alphabet texts (with newlines in the mix) match the
    brute force on every signal."""
    t = " ".join(pieces)
    got = _got(spark, [(0, t)])[0]
    for k, v in _oracle(t).items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v, t)
