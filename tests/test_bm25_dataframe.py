from __future__ import annotations

import pytest

from searchenginer_spark.plans.bm25_dataframe import (
    Bm25DataFrameIndex,
    bm25_oracle_python,
)

QUERIES = [
    "data",                 # single common term
    "spark query",          # 2-term conjunction
    "the fast key order",   # 4-term conjunction
    "for for for",          # repeated-term query (query tf)
    "zzz_not_in_corpus",    # absent term -> empty (AND semantics)
    "data zzz_not_in_corpus",
]


@pytest.fixture(scope="module")
def index(docs_sf0001):
    return Bm25DataFrameIndex.build(docs_sf0001, text_col="text")


@pytest.fixture(scope="module")
def pydocs(docs_sf0001):
    return [(r["doc_id"], r["text"]) for r in docs_sf0001.select("doc_id", "text").collect()]


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("mode", ["and", "or"])
def test_rank_identical_vs_python_oracle(index, pydocs, query, mode):
    got = [(r["doc_id"], r["score"]) for r in index.search(query, k=10, mode=mode).collect()]
    want = bm25_oracle_python(pydocs, query, k=10, mode=mode)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6


def test_hand_computed_bm25(spark):
    # 3 docs, query 'a': df(a)=2, N=3, dl=[2,3,1], avgdl=2
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a a c"), (2, "d")], "doc_id long, text string"
    )
    idx = Bm25DataFrameIndex.build(docs, persist=False)
    rows = idx.search("a", k=10).collect()
    import math

    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    s0 = idf * 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 2))
    s1 = idf * 2 * 2.2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / 2))
    got = {r["doc_id"]: r["score"] for r in rows}
    assert abs(got[0] - s0) < 1e-9 and abs(got[1] - s1) < 1e-9
    assert [r["doc_id"] for r in rows] == sorted(got, key=lambda d: (-got[d], d))


def test_empty_query(index):
    assert index.search("  ;; 123 ", k=10).count() == 0
