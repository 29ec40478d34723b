"""Vector path: hash embedding, doc vectors, text-query search.

Pins the Spark plans against a pure-Python oracle implementing the
reference semantics (MakePage.cpp:247-398 doc vectors; cut_weight.cpp:16-69
query weighting; server.pb_skeleton.cc:63-93 query embedding).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from searchenginer_spark.functions.tokenize import IDENT_RE
from searchenginer_spark.operators.vectors import (
    _hash_component_py,
    doc_vectors,
    query_vector,
    vector_search_text,
)
from searchenginer_spark.plans.bm25_dataframe import Bm25DataFrameIndex

DOCS = [
    (0, "merge sort data for the index build"),
    (1, "query data and return the result value"),
    (2, "merge merge merge conflict in the data"),
    (3, "unrelated tokens about streaming windows"),
    (4, "sort order and merge policy for data"),
]
DIM = 8


def _py_doc_vectors(docs, dim=DIM):
    rx = re.compile(IDENT_RE)
    tfs = {d: Counter(rx.findall(t.lower())) for d, t in docs}
    n = len(tfs)
    dfs: Counter = Counter()
    for c in tfs.values():
        dfs.update(set(c))
    out = {}
    for d, c in tfs.items():
        accum = [0.0] * dim
        any_w = False
        for t, tf in c.items():
            w = tf * math.log2(n / (dfs[t] + 1))
            if w <= 0:
                continue
            any_w = True
            for i in range(dim):
                accum[i] += w * _hash_component_py(t, i)
        if not any_w:
            continue
        nrm = math.sqrt(sum(x * x for x in accum))
        out[d] = [x / nrm if nrm > 0 else 0.0 for x in accum]
    return out, dict(dfs), n


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return Bm25DataFrameIndex.build(df, text_col="text", persist=False)


def test_doc_vectors_match_python_oracle(spark, idx):
    got = {
        r["doc_id"]: list(r["vec"])
        for r in doc_vectors(idx.tf, idx.dft, idx.stats, dim=DIM).collect()
    }
    want, _, _ = _py_doc_vectors(DOCS)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)
        assert sum(x * x for x in got[d]) == pytest.approx(1.0, abs=1e-9)


def test_doc_vectors_deterministic_across_partitioning(spark):
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = a.repartition(7)
    ia = Bm25DataFrameIndex.build(a, text_col="text", persist=False)
    ib = Bm25DataFrameIndex.build(b, text_col="text", persist=False)
    va = {r["doc_id"]: list(r["vec"]) for r in doc_vectors(ia.tf, ia.dft, ia.stats, DIM).collect()}
    vb = {r["doc_id"]: list(r["vec"]) for r in doc_vectors(ib.tf, ib.dft, ib.stats, DIM).collect()}
    assert set(va) == set(vb)
    for d in va:
        assert va[d] == pytest.approx(vb[d], abs=1e-12)


def test_vector_search_matches_python_oracle(spark, idx):
    q = "merge data"
    res = vector_search_text(q, doc_vectors(idx.tf, idx.dft, idx.stats, DIM),
                             idx.dft, idx.stats, k=3, dim=DIM).collect()
    vecs, dfs, n = _py_doc_vectors(DOCS)
    qv = query_vector(q, dfs, n, dim=DIM)
    want = sorted(
        ((d, sum(a * b for a, b in zip(v, qv))) for d, v in vecs.items()),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    assert [r["doc_id"] for r in res] == [d for d, _ in want]
    for r, (_, cos) in zip(res, want):
        assert r["cos"] == pytest.approx(cos, abs=1e-9)


def test_query_vector_unknown_terms_df_zero():
    # a term absent from the corpus still contributes with df=0
    # (cut_weight.cpp:31-44) — the vector is non-zero and unit-length
    qv = query_vector("zzz_not_in_corpus", {}, n_docs=100, dim=DIM)
    assert sum(x * x for x in qv) == pytest.approx(1.0, abs=1e-12)


def test_vector_search_lsh_recall(spark):
    """SRP-bucketed text search over CONSTRUCTED doc vectors (the scale
    path) recalls most of the exact top-k on a realistic corpus."""
    from pyspark.sql import functions as F

    from searchenginer_spark.operators.ann import srp_buckets
    from searchenginer_spark.operators.vectors import (
        doc_vectors as dv_op,
        vector_search_text_lsh,
    )
    from searchenginer_spark.sources.corpus import build_docs

    docs = build_docs(spark, 600, seed=42, num_partitions=4).select(
        "doc_id", F.col("content").alias("text")
    )
    i = Bm25DataFrameIndex.build(docs, text_col="text", persist=False)
    dv = dv_op(i.tf, i.dft, i.stats, dim=16).persist()
    exact = vector_search_text("int return value", dv, i.dft, i.stats, k=10, dim=16)
    want = {r["doc_id"] for r in exact.collect()}
    b = srp_buckets(dv, n_planes=4, seed=42, vec_col="vec").persist()
    got = {
        r["doc_id"]
        for r in vector_search_text_lsh(
            "int return value", b, i.dft, i.stats, k=10, dim=16, n_planes=4, seed=42
        ).collect()
    }
    assert len(got) == 10
    assert len(got & want) >= 6  # recall@10 >= 0.6 with 4 planes + hamming-1 probe
