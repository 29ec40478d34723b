"""Trained PPMI embeddings (operators/embed): count correctness vs a
brute-force oracle, determinism, semantic structure, and the trained
doc-vector path."""

from __future__ import annotations

import numpy as np
import pytest

from searchenginer_spark.operators.embed import (
    cooccurrence_counts,
    doc_vectors_from,
    train_ppmi_vectors,
)

CORPUS = [
    (0, "apple banana apple banana cherry"),
    (1, "banana apple banana apple"),
    (2, "car truck car truck engine"),
    (3, "truck car truck car"),
    (4, "apple banana fruit market"),
    (5, "car truck road highway"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _brute_counts(window):
    from collections import Counter

    import re

    cnt = Counter()
    for _, text in CORPUS:
        toks = re.findall("[a-z_][a-z0-9_]*", text.lower())
        for i, w in enumerate(toks):
            for d in range(1, window + 1):
                if i + d < len(toks):
                    cnt[(w, toks[i + d])] += 1
    return cnt


@pytest.mark.parametrize("window", [1, 2, 4])
def test_cooccurrence_counts_match_bruteforce(docs, window):
    got = {
        (r["w"], r["c"]): r["n"]
        for r in cooccurrence_counts(docs, window=window).collect()
    }
    assert got == dict(_brute_counts(window))


def test_cooccurrence_plan_is_jvm_only(docs):
    plan = cooccurrence_counts(docs, window=3)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan  # pure codegen
    assert "HashAggregate" in plan


def test_train_deterministic_and_structured(docs):
    cooc = cooccurrence_counts(docs, window=2)
    tv1 = {r["term"]: np.array(r["vec"]) for r in
           train_ppmi_vectors(cooc, dim=4).collect()}
    tv2 = {r["term"]: np.array(r["vec"]) for r in
           train_ppmi_vectors(cooc, dim=4).collect()}
    assert set(tv1) == set(tv2)
    for t in tv1:
        assert np.array_equal(tv1[t], tv2[t]), t  # bit-identical runs
    # rows are L2-normalized
    for t, v in tv1.items():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9 or np.linalg.norm(v) == 0.0
    # semantic structure: in-cluster cosine beats cross-cluster
    cos = lambda a, b: float(tv1[a] @ tv1[b])  # noqa: E731
    assert cos("apple", "banana") > cos("apple", "car")
    assert cos("car", "truck") > cos("truck", "banana")


def test_vocab_cap(docs):
    import pytest as _pytest

    cooc = cooccurrence_counts(docs, window=2)
    tv = train_ppmi_vectors(cooc, dim=2, top_vocab=3)
    assert tv.count() == 3
    # cap keeps the highest co-occurrence-mass terms
    kept = {r["term"] for r in tv.collect()}
    assert {"apple", "banana"} <= kept or {"car", "truck"} <= kept
    # dim beyond the usable vocabulary fails fast instead of returning
    # short vectors that blow up downstream element_at reads (ANSI)
    with _pytest.raises(ValueError, match="exceeds the usable vocabulary"):
        train_ppmi_vectors(cooc, dim=4, top_vocab=3)


def test_doc_vectors_from_trained(docs, spark):
    from searchenginer_spark.operators import stats as S

    tf = S.term_frequencies(docs, text_col="text")
    dft = S.document_frequencies(tf)
    st = S.corpus_stats(S.doc_lengths(tf))
    tv = train_ppmi_vectors(cooccurrence_counts(docs, window=2), dim=4)
    dv = {r["doc_id"]: np.array(r["vec"]) for r in
          doc_vectors_from(tf, dft, st, tv, dim=4).collect()}
    assert dv, "some docs must carry TF-IDF signal"
    for v in dv.values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    # fruit docs resemble each other more than vehicle docs
    if {0, 1, 2} <= set(dv):
        assert float(dv[0] @ dv[1]) > float(dv[0] @ dv[2])
