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


def test_cooccurrence_plan_shape(docs):
    """r7 shape: per-batch Arrow partial counts (vectorized numpy combine,
    never a row-at-a-time UDF) feeding exactly ONE (w, c) hash-aggregate
    exchange — the explode-every-pair plan is gone."""
    plan = cooccurrence_counts(docs, window=3)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan  # batch-vectorized partial counting
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "HashAggregate" in plan  # final (w, c) merge
    assert "Generate explode" not in plan  # pair stream never exploded
    # one exchange total: the final pair aggregate (AQE wrapper may print
    # the exchange once in the adaptive plan)
    body = plan.split("AdaptiveSparkPlan")[-1]
    assert body.count("Exchange hashpartitioning") <= 1


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


def test_distributed_svd_matches_eigh_path(spark):
    """r6: the randomized block eigendecomposition over the distributed
    PPMI COO (train_ppmi_vectors_distributed) must reproduce the
    driver-eigh vectors — cosine >= 0.99 per term up to sign — while
    never densifying V x V anywhere (the COO row count IS the densest
    object; asserted below) and keeping every stage JVM-codegen.

    Corpus note: per-term eigenvector parity is only defined when the
    top-dim eigenvalues are NON-degenerate (inside a degenerate pair any
    rotation is an equally valid eigenbasis, so two exact solvers can
    legitimately disagree per term). The module CORPUS is perfectly
    mirror-symmetric (every eigenvalue doubled), so this test uses an
    asymmetric corpus whose top spectrum is 4.46 > 3.70 >> 1.15 and
    compares at dim=2 — a clean gap above the cut."""
    from searchenginer_spark.operators.dedup import release_intermediates
    from searchenginer_spark.operators.embed import (
        ppmi_coo,
        train_ppmi_vectors_distributed,
    )

    rows = []
    words_a = ["apple", "banana", "cherry", "fruit", "market", "vendor"]
    words_b = ["car", "truck", "engine"]
    hub = ["the", "sells", "fresh"]
    for i in range(30):
        wa = [words_a[(i * 5 + j) % len(words_a)] for j in range(4)]
        rows.append((i, f"{hub[i%3]} {wa[0]} {wa[1]} {hub[(i+1)%3]} {wa[2]} {wa[3]}"))
    for i in range(30, 45):
        wb = [words_b[(i * 2 + j) % len(words_b)] for j in range(3)]
        rows.append((i, f"{hub[i%3]} {wb[0]} {wb[1]} {wb[2]} road"))
    adocs = spark.createDataFrame(rows, "doc_id long, text string")

    cooc = cooccurrence_counts(adocs, window=2).persist()
    want = {r["term"]: np.array(r["vec"]) for r in
            train_ppmi_vectors(cooc, dim=2, top_vocab=1000).collect()}
    got_df = train_ppmi_vectors_distributed(
        cooc, dim=2, oversample=8, power_iters=4, seed=7
    )
    got = {r["term"]: np.array(r["vec"]) for r in got_df.collect()}
    assert set(got) == set(want)
    for t in want:
        nw, ng = np.linalg.norm(want[t]), np.linalg.norm(got[t])
        if nw < 1e-12 or ng < 1e-12:
            continue
        cos = abs(float(want[t] @ got[t])) / (nw * ng)
        assert cos >= 0.99, (t, cos, want[t], got[t])
    release_intermediates(got_df)

    # no V x V densification: the PPMI COO carries only observed pairs
    # (<= nnz of the symmetric count matrix), and the whole distributed
    # path is DataFrame algebra over it — spot-check the sparsity bound
    ppmi, margins = ppmi_coo(cooc)
    v = margins.count()
    nnz = ppmi.count()
    sym_nnz = (
        cooc.select("w", "c").unionByName(
            cooc.select(cooc.c.alias("w"), cooc.w.alias("c"))
        ).distinct().count()
    )
    assert nnz <= sym_nnz < v * v
    release_intermediates(ppmi)
    margins.unpersist()
    cooc.unpersist()


def test_ppmi_coo_matches_dense_pipeline(spark, docs):
    """The distributed symmetrized-PPMI COO must equal the driver path's
    dense matrix entry for entry (the per-entry two-orientation formula
    replaces the (P + P^T)/2 self-join — only valid because the count
    matrix is symmetric; this pins it)."""
    from searchenginer_spark.operators.dedup import release_intermediates
    from searchenginer_spark.operators.embed import ppmi_coo

    cooc = cooccurrence_counts(docs, window=2).persist()
    rows = cooc.collect()
    vocab = sorted({r["w"] for r in rows} | {r["c"] for r in rows})
    idx = {t: i for i, t in enumerate(vocab)}
    V = len(vocab)
    M = np.zeros((V, V))
    for r in rows:
        M[idx[r["w"]], idx[r["c"]]] += r["n"]
    M = M + M.T
    total = M.sum()
    pw = M.sum(1) / total
    ctx = M.sum(0) ** 0.75
    pc = ctx / ctx.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((M / total) / np.outer(pw, pc))
    P = np.where(np.isfinite(pmi) & (pmi > 0), pmi, 0.0)
    P = (P + P.T) / 2

    ppmi, margins = ppmi_coo(cooc)
    D = np.zeros((V, V))
    for r in ppmi.collect():
        D[idx[r["w"]], idx[r["c"]]] = r["v"]
    assert np.abs(P - D).max() < 1e-12
    release_intermediates(ppmi)
    margins.unpersist()
    cooc.unpersist()


def test_distributed_svd_plan_is_jvm_only(spark, docs):
    """Every distributed stage of the randomized factorization (matmul,
    Gram, right-multiply, sign/normalize) is codegen column math — no
    Python/Arrow eval anywhere in the executed plan. The cooc INPUT is
    checkpointed first: its own (r7) Arrow partial-count stage is pinned
    by test_cooccurrence_plan_shape, and this test is about the
    factorization stages only."""
    from searchenginer_spark.operators.dedup import release_intermediates
    from searchenginer_spark.operators.embed import train_ppmi_vectors_distributed

    cooc = cooccurrence_counts(docs, window=2).localCheckpoint()
    tv = train_ppmi_vectors_distributed(cooc, dim=2, oversample=4, power_iters=1)
    plan = tv._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    release_intermediates(tv)


def test_distributed_svd_scales_past_driver_cap_shape(spark):
    """The point of the distributed path: no top_vocab argument exists,
    and a vocabulary larger than a tiny driver cap trains fine — every
    term gets a unit vector. (Scale stand-in: 600 distinct terms beats
    any cap we could densify in this test's budget; the structural
    guarantee — driver holds only r x r — is what the plan/sparsity
    tests above pin.)"""
    from searchenginer_spark.operators.dedup import release_intermediates
    from searchenginer_spark.operators.embed import train_ppmi_vectors_distributed

    rows = [
        (i, " ".join(f"tok{(i * 13 + j) % 600}" for j in range(30)))
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tv = train_ppmi_vectors_distributed(
        cooccurrence_counts(docs, window=2), dim=8, power_iters=1
    )
    got = tv.collect()
    assert len(got) == 600
    for r in got:
        n = np.linalg.norm(np.array(r["vec"]))
        assert abs(n - 1.0) < 1e-9 or n == 0.0
    release_intermediates(tv)


def test_empty_pair_pull_raises(spark):
    """A co-occurrence table whose pairs all fall outside the capped
    vocab (degenerate, but reachable with tiny top_vocab on a skewed
    table) must raise, not emit NaN PPMI vectors. Simplest reachable
    empty-pull: a cooc table with zero rows after the vocab semi-join is
    impossible without an empty vocab, so drive it with an empty table —
    and separately check total==0 can't slip through on an all-zero-count
    table (n=0 rows are the degenerate fold output)."""
    import pytest as _pytest

    zero = spark.createDataFrame(
        [("a", "b", 0), ("b", "a", 0)], "w string, c string, n long"
    )
    with _pytest.raises(ValueError, match="no in-vocabulary co-occurrences"):
        train_ppmi_vectors(zero, dim=2, top_vocab=2)


def test_doc_vectors_from_trained(docs, spark):
    from searchenginer_spark.operators import stats as S

    tf = S.term_frequencies(docs, text_col="text")
    dft = S.document_frequencies(tf)
    st = S.corpus_stats(S.doc_lengths(tf))
    tv = train_ppmi_vectors(cooccurrence_counts(docs, window=2), dim=4)
    # default = NO broadcast hint on term_vecs (an uncapped distributed
    # model must not be force-collected; AQE still broadcasts small
    # tables at runtime) — and the hinted capped path is value-identical
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        unhinted = doc_vectors_from(tf, dft, st, tv, dim=4)
        rows = unhinted.collect()
        plan = unhinted._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in plan
    hinted = {r["doc_id"]: np.array(r["vec"]) for r in
              doc_vectors_from(tf, dft, st, tv, dim=4,
                               broadcast_vectors=True).collect()}
    dv = {r["doc_id"]: np.array(r["vec"]) for r in rows}
    assert set(dv) == set(hinted)
    for d in dv:  # join strategy reorders float sums; values agree to fp
        assert np.abs(dv[d] - hinted[d]).max() < 1e-9, d
    assert dv, "some docs must carry TF-IDF signal"
    for v in dv.values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    # fruit docs resemble each other more than vehicle docs
    if {0, 1, 2} <= set(dv):
        assert float(dv[0] @ dv[1]) > float(dv[0] @ dv[2])
