"""Product-quantization ANN: codebook training determinism, encode parity
vs a numpy oracle, ADC exactness when the codebook covers the data,
recall on real embeddings, IVF-PQ composition, JVM-only query plan."""

from __future__ import annotations

import numpy as np
import pytest

from searchenginer_spark.operators.ann import (
    cosine_topk,
    ivf_build,
    ivf_pq_build,
    ivf_pq_topk,
    pq_encode,
    pq_topk,
    pq_train,
)


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def codebooks(embeddings):
    return pq_train(embeddings, m=8, n_codes=16, seed=42)


@pytest.fixture(scope="module")
def coded(embeddings, codebooks):
    return pq_encode(embeddings, codebooks).persist()


def test_pq_train_shape_and_determinism(embeddings, codebooks):
    assert codebooks.shape == (8, 16, 8)
    again = pq_train(embeddings, m=8, n_codes=16, seed=42)
    assert np.array_equal(codebooks, again)


def test_pq_encode_matches_numpy_argmin(embeddings, codebooks, coded):
    rows = {r["vec_id"]: r for r in coded.collect()}
    mat = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in embeddings.collect()}
    m, _, ds = codebooks.shape
    for vid in list(mat)[:50]:
        v = mat[vid].reshape(m, ds)
        want = [int(((codebooks[j] - v[j]) ** 2).sum(-1).argmin()) for j in range(m)]
        assert rows[vid]["codes"] == want


def test_adc_exact_when_codebook_covers(spark):
    """Subvectors drawn from <=4 distinct values per subspace: k-means
    converges onto them, PQ reconstruction is lossless, so ADC inner
    product == true inner product and the top-k is exact."""
    rng = np.random.default_rng(7)
    vocab = rng.standard_normal((4, 4, 4))  # [subspace, choice, ds]
    picks = rng.integers(0, 4, size=(64, 4))
    vecs = np.stack([np.concatenate([vocab[j, picks[i, j]] for j in range(4)])
                     for i in range(64)])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cb = pq_train(df, m=4, n_codes=4, seed=1, sample=64, max_iter=25)
    coded = pq_encode(df, cb)
    q = vecs[5]
    got = pq_topk(coded, cb, q, k=10).collect()
    ip = vecs @ q
    order = np.lexsort((np.arange(64), -ip))[:10]
    assert [r["vec_id"] for r in got] == order.tolist()
    for r in got:
        assert abs(r["score"] - ip[r["vec_id"]]) < 1e-9


def test_pq_recall_vs_exact(embeddings, codebooks, coded):
    q = embeddings.limit(1).collect()[0]["embedding"]
    exact = [r["vec_id"] for r in cosine_topk(embeddings, q, k=10).collect()]
    approx = [r["vec_id"] for r in pq_topk(coded, codebooks, q, k=10).collect()]
    # vectors are unit-norm so cosine == inner product; 8x16 codebooks on
    # dim-64 reconstruct well enough for decent compressed-domain recall
    assert len(set(exact) & set(approx)) / 10 >= 0.4


def test_ivf_pq_compose(embeddings, codebooks):
    centroids, bucketed = ivf_build(embeddings, n_lists=8, seed=42)
    coded = pq_encode(bucketed, codebooks).persist()
    q = embeddings.limit(1).collect()[0]["embedding"]
    exact = [r["vec_id"] for r in cosine_topk(embeddings, q, k=10).collect()]
    # hand-rolled raw composition (ivf_build + pq_encode on raw vectors)
    # must OPT OUT of the residual default that matches ivf_pq_build
    got = ivf_pq_topk(
        coded, centroids, codebooks, q, k=10, nprobe=4, residual=False
    ).collect()
    assert len(got) == 10
    assert len(set(exact) & {r["vec_id"] for r in got}) / 10 >= 0.3
    coded.unpersist()


def test_pq_topk_batch_matches_per_query(embeddings, codebooks, coded):
    """The one-job batch probe must return exactly the per-query pq_topk
    results (same scores, same doc order) for every query in the batch."""
    from searchenginer_spark.operators.ann import pq_topk_batch

    vecs = {r["vec_id"]: list(r["embedding"])
            for r in embeddings.filter("vec_id < 5").collect()}
    batch = {f"q{i}": v for i, v in vecs.items()}
    got = pq_topk_batch(coded, codebooks, batch, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(batch)
    for i, v in vecs.items():
        want = pq_topk(coded, codebooks, v, k=10).collect()
        rows = sorted(by_q[f"q{i}"], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in want]
        for a, b in zip(rows, want):
            assert abs(a["score"] - b["score"]) < 1e-9


def test_ivf_pq_residual_build_and_score(embeddings):
    """Residual IVF-PQ: codes quantize v - centroid[list]; the Spark ADC
    score must equal the numpy reconstruction score <q, c + dequant(codes)>
    exactly (same formula, literal LUTs), and recall vs exact cosine holds."""
    centroids, codebooks, coded = ivf_pq_build(
        embeddings, n_lists=8, m=8, n_codes=16, seed=42
    )
    coded = coded.persist()
    rows = {r["vec_id"]: r for r in coded.collect()}
    q = np.asarray(
        embeddings.filter("vec_id = 0").first()["embedding"], dtype=np.float64
    )
    got = ivf_pq_topk(coded, centroids, codebooks, q.tolist(),
                      k=10, nprobe=8, residual=True).collect()
    assert len(got) == 10
    m, _, ds = codebooks.shape
    for r in got:
        codes = rows[r["vec_id"]]["codes"]
        recon = centroids[rows[r["vec_id"]]["list_id"]] + np.concatenate(
            [codebooks[j, codes[j]] for j in range(m)]
        )
        assert abs(r["score"] - float(recon @ q)) < 1e-9
    exact = [r["vec_id"] for r in cosine_topk(embeddings, q.tolist(), k=10).collect()]
    assert len(set(exact) & {r["vec_id"] for r in got}) / 10 >= 0.4
    coded.unpersist()


def test_residual_codes_beat_raw_reconstruction(embeddings):
    """The point of residual encoding: with an identical m x n_codes
    budget, quantizing v - centroid[list] reconstructs closer than
    quantizing v directly (aggregate squared error over the corpus)."""
    centroids, codebooks, coded = ivf_pq_build(
        embeddings, n_lists=8, m=8, n_codes=16, seed=42
    )
    raw_cb = pq_train(embeddings, m=8, n_codes=16, seed=42)
    raw_coded = pq_encode(embeddings, raw_cb)
    m, _, ds = codebooks.shape
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in embeddings.collect()}

    def sse(rows, recon):
        return sum(float(((recon(r) - vecs[r["vec_id"]]) ** 2).sum()) for r in rows)

    res_err = sse(
        coded.collect(),
        lambda r: centroids[r["list_id"]]
        + np.concatenate([codebooks[j, r["codes"][j]] for j in range(m)]),
    )
    raw_err = sse(
        raw_coded.collect(),
        lambda r: np.concatenate([raw_cb[j, r["codes"][j]] for j in range(m)]),
    )
    assert res_err < raw_err


def test_pq_refine_improves_recall(embeddings, codebooks, coded):
    """Exact re-rank of refine*k ADC candidates: recall must be at least
    the pure-PQ recall, and every returned score is the TRUE cosine."""
    from searchenginer_spark.operators.ann import pq_refine_topk

    q = embeddings.limit(1).collect()[0]["embedding"]
    exact = [r["vec_id"] for r in cosine_topk(embeddings, q, k=10).collect()]
    pq_only = {r["vec_id"] for r in pq_topk(coded, codebooks, q, k=10).collect()}
    refined = pq_refine_topk(coded, embeddings, codebooks, q, k=10, refine=8).collect()
    r_ids = [r["vec_id"] for r in refined]
    assert len(set(exact) & set(r_ids)) >= len(set(exact) & pq_only)
    assert r_ids[0] == 0  # the query vector itself survives refinement
    assert abs(refined[0]["cos"] - 1.0) < 1e-9  # true cosine, not ADC


def test_ivf_pq_partitioned_layout_prunes(spark, embeddings, tmp_path_factory):
    """The write-side promise (ann.py ivf_build docstring): the coded
    table written partitionBy('list_id') turns the probe's list_id
    filter into PARTITION PRUNING — the scan plan carries the predicate
    as a PartitionFilter and the files actually read all live under the
    probed list_id directories. Also: the stored handle carries the
    residual flag, so a reopened index probes its own code space, and
    results match the in-memory probe exactly."""
    import re

    from pyspark.sql import functions as F

    from searchenginer_spark.operators.ann import (
        ivf_pq_open,
        ivf_pq_query,
        ivf_pq_write,
    )

    path = str(tmp_path_factory.mktemp("ivfpq")) + "/idx"
    centroids, codebooks, coded = ivf_pq_build(
        embeddings, n_lists=8, m=8, n_codes=16, seed=42
    )
    ivf_pq_write(path, centroids, codebooks, coded, residual=True)
    idx = ivf_pq_open(spark, path)
    assert idx.residual is True
    assert np.allclose(idx.centroids, centroids)
    assert np.allclose(idx.codebooks, codebooks)

    q = np.asarray(
        embeddings.filter("vec_id = 0").first()["embedding"], dtype=np.float64
    )
    probes = np.argsort(((centroids - q) ** 2).sum(axis=1))[:3].tolist()
    got = ivf_pq_query(idx, q.tolist(), k=10, nprobe=3).collect()
    want = ivf_pq_topk(
        coded, centroids, codebooks, q.tolist(), k=10, nprobe=3, residual=True
    ).collect()
    assert [(r["vec_id"], round(r["score"], 9)) for r in got] == [
        (r["vec_id"], round(r["score"], 9)) for r in want
    ]

    # plan-level proof: the list_id predicate is a PartitionFilter on the
    # parquet scan (pruned at file-listing time, not a post-scan Filter)
    pruned = idx.coded.filter(F.col("list_id").isin(probes))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "list_id" in pf.group(1), plan
    # file-level proof: every file the pruned scan reads lives under a
    # probed list_id= directory, and unprobed lists contribute none
    files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert files
    seen_lists = {int(re.search(r"list_id=(\d+)", f).group(1)) for f in files}
    assert seen_lists <= set(probes)


def test_ivfpq_recall_at_documented_default(spark):
    """The accuracy claim PLANS.md §9 documents: residual IVF-PQ at the
    default search setting (nprobe=4 of 32 lists, refine=2 exact
    re-rank) achieves recall@10 >= 0.9 on a planted-neighbor corpus
    (the honest recall fixture — scripts/pq_recall_grid.py measures the
    full 100k grid; this is the same construction at test scale, driven
    through the REAL Spark probe: ivf_pq_topk candidates -> exact
    cosine re-rank of refine*k rows)."""
    import pandas as pd

    from searchenginer_spark.operators.ann import ivf_pq_build

    n, dim, n_q, plant = 20_000, 64, 8, 15
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((64, dim))
    x = centers[rng.integers(0, 64, size=n)] + 0.35 * rng.standard_normal((n, dim))
    queries = rng.standard_normal((n_q, dim))
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    x[: n_q * plant] = np.concatenate(
        [q[None] + 0.03 * rng.standard_normal((plant, dim)) for q in queries]
    )
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(x)})
    )
    centroids, codebooks, coded = ivf_pq_build(
        emb, n_lists=32, m=8, n_codes=16, seed=42
    )
    coded = coded.persist()
    coded.count()

    hits = 0
    for qi in range(n_q):
        q = queries[qi]
        exact = set(np.argsort(-(x @ q))[:10].tolist())
        cand = [
            r["vec_id"]
            for r in ivf_pq_topk(
                coded, centroids, codebooks, q.tolist(), k=20, nprobe=4
            ).collect()
        ]
        re_ranked = cosine_topk(
            emb.filter(emb.vec_id.isin(cand)), q.tolist(), k=10
        ).collect()
        hits += len({r["vec_id"] for r in re_ranked} & exact)
    coded.unpersist()
    assert hits / (10 * n_q) >= 0.9, hits / (10 * n_q)


def test_pq_query_plan_jvm_only(coded, codebooks):
    """The probe path must be codegen element_at lookups over the codes
    column — no Python/Arrow eval, no shuffle beyond the top-k take."""
    q = np.zeros(64)
    q[0] = 1.0
    plan = (
        pq_topk(coded.select("vec_id", "codes"), codebooks, q.tolist(), k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # everything under InMemoryRelation is the cached ENCODE build plan
    # (where the one Arrow pass legitimately lives); the probe side above
    # it must be pure codegen over the codes column
    probe = plan.split("InMemoryRelation")[0]
    assert "Python" not in probe and "Arrow" not in probe
    assert "TakeOrderedAndProject" in probe
    assert "element_at" in probe
