"""Trained word embeddings from the corpus itself — PPMI + truncated
eigendecomposition (count-based vectors), dependency-free and Spark-native.

The reference ships a fastText binary artifact (loaded in
/root/reference/Make_Page/MakePage.cpp:247-398); model blobs cannot exist
in this sandbox, so rounds 2-4 stood in a deterministic hash embedding
(operators/vectors.py). This module closes the gap with a REAL trainer
built only from public results and the corpus:

  1. co-occurrence counting (the only corpus-sized pass) is pure JVM
     codegen — per doc, for each offset d <= window, pair token i with
     token i+d via arrays_zip(slice, slice), flatten, ONE explode, one
     groupBy((w, c)).count() shuffle. No UDF, no per-row Python.
  2. PPMI weighting with context-distribution smoothing (alpha = 0.75)
     — the Levy & Goldberg (2014) result that PPMI-factorized vectors
     match word2vec's implicit objective; all public.
  3. truncated eigendecomposition of the SYMMETRIZED (dense,
     vocab-capped) PPMI matrix on the driver (smoothing breaks exact
     symmetry; word/context roles are averaged): vec(w) = top-k
     eigenvectors scaled by
     sqrt(eigenvalue), rows L2-normalized, eigenvector SIGNS fixed
     deterministically (largest-|component| positive) so two runs — or
     two clusters — produce bit-identical vectors.

Scale shape: the counting pass is fully distributed and the only one that
touches the corpus; the densified matrix is vocab-capped (``top_vocab``,
default 2048 -> 32 MB driver dense; 16k -> 2 GB, the practical driver
ceiling). Web-scale vocabularies swap step 3 for randomized block SVD
over the distributed COO counts (Halko, Martinsson & Tropp 2011 — public
algorithm; the counting output here is already the COO table it needs) —
that seam is the boundary of this module, exactly like the reference's
model-file boundary.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import IDENT_RE


def cooccurrence_counts(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 4,
    pattern: str = IDENT_RE,
) -> DataFrame:
    """(w, c, n) — ordered co-occurrence counts: token ``w`` at position i,
    token ``c`` at i+d for 1 <= d <= window, summed over the corpus.
    Ordered counts halve the shuffle volume; consumers needing symmetric
    counts add the transpose (train_ppmi_vectors does, in numpy).

    Whole-stage-codegen plan: tokenize -> per-offset arrays_zip of two
    slices -> flatten -> one explode -> hash-aggregate with map-side
    partial counts. One shuffle total, keyed by the (w, c) pair — hot
    pairs ('int','return') are exactly the salt-needing keys, and the
    partial aggregation absorbs them before the exchange."""
    toks = F.array_compact(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), F.lit(0))
    )
    d = docs.select(toks.alias("_t"), F.size(toks).alias("_n"))
    pair_arrays = [
        F.arrays_zip(
            F.slice("_t", 1, F.greatest(F.col("_n") - off, F.lit(0))).alias("w"),
            F.slice("_t", off + 1, F.greatest(F.col("_n") - off, F.lit(0))).alias("c"),
        )
        for off in range(1, window + 1)
    ]
    return (
        d.select(F.explode(F.flatten(F.array(*pair_arrays))).alias("p"))
        .select(F.col("p.w").alias("w"), F.col("p.c").alias("c"))
        .groupBy("w", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_ppmi_vectors(
    cooc: DataFrame,
    dim: int = 16,
    top_vocab: int = 2048,
    alpha: float = 0.75,
) -> DataFrame:
    """(term, vec array<double>) — PPMI-factorized word vectors.

    ``cooc``: output of :func:`cooccurrence_counts`. The vocabulary is
    capped to the ``top_vocab`` most frequent terms (by total
    co-occurrence mass — one tiny aggregate); the dense PPMI matrix for
    that vocab is built driver-side and eigendecomposed. Deterministic:
    vocab order is (count desc, term asc), eigenvector signs are fixed,
    numpy eigh is reproducible for a fixed matrix.
    """
    # the counts table feeds two consumers (vocab totals + the filtered
    # pull) — persist it so the corpus-sized counting pass runs ONCE
    cooc = cooc.persist()
    try:
        totals = (
            cooc.groupBy("w").agg(F.sum("n").alias("m"))
            .unionByName(
                cooc.groupBy(F.col("c").alias("w")).agg(F.sum("n").alias("m"))
            )
            .groupBy("w").agg(F.sum("m").alias("m"))
        )
        vocab_rows = (
            totals.orderBy(F.desc("m"), F.asc("w")).limit(top_vocab).collect()
        )
        vocab = [r["w"] for r in vocab_rows]
        index = {t: i for i, t in enumerate(vocab)}
        V = len(vocab)
        if V == 0:
            raise ValueError("empty co-occurrence table")
        if V < dim:
            # silently returning V-dim vectors would make downstream
            # element_at('vec', d+1) reads throw under ANSI mode
            raise ValueError(
                f"dim={dim} exceeds the usable vocabulary ({V} terms); "
                "lower dim or provide more text"
            )
        spark = cooc.sparkSession
        # broadcast semi-joins, NOT isin(V literals): a 2048-literal In
        # expression costs seconds of driver planning and defeats codegen;
        # Arrow toPandas moves the ~V^2-bounded pair list in columnar
        # batches instead of py4j row objects
        vocab_df = spark.createDataFrame([(t,) for t in vocab], "t string")
        pairs = (
            cooc.join(F.broadcast(vocab_df), cooc["w"] == vocab_df["t"], "leftsemi")
            .join(F.broadcast(vocab_df), cooc["c"] == vocab_df["t"], "leftsemi")
            .select("w", "c", "n")
            .toPandas()
        )
    finally:
        cooc.unpersist()
    M = np.zeros((V, V), dtype=np.float64)
    np.add.at(
        M,
        (pairs["w"].map(index).to_numpy(), pairs["c"].map(index).to_numpy()),
        pairs["n"].to_numpy(dtype=np.float64),
    )
    M = M + M.T  # symmetric counts

    total = M.sum()
    pw = M.sum(axis=1) / total
    ctx = M.sum(axis=0) ** alpha
    pc = ctx / ctx.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((M / total) / np.outer(pw, pc))
    ppmi = np.where(np.isfinite(pmi) & (pmi > 0), pmi, 0.0)
    # context-distribution smoothing makes pc != pw, so this PPMI matrix
    # is NOT symmetric — and eigh silently reads only one triangle.
    # Factorize the symmetric part (word/context roles averaged), the
    # standard move for eigendecomposing a smoothed PPMI
    ppmi = (ppmi + ppmi.T) / 2.0

    vals, vecs = np.linalg.eigh(ppmi)  # ascending eigenvalues
    top = np.argsort(-vals)[:dim]
    vals_t = np.maximum(vals[top], 0.0)
    U = vecs[:, top] * np.sqrt(vals_t)
    # deterministic sign: the largest-|component| entry of each column >= 0
    for j in range(U.shape[1]):
        i = int(np.argmax(np.abs(U[:, j])))
        if U[i, j] < 0:
            U[:, j] = -U[:, j]
    norms = np.linalg.norm(U, axis=1)
    norms[norms == 0] = 1.0
    U = U / norms[:, None]

    return spark.createDataFrame(
        [(t, U[i].tolist()) for t, i in index.items()],
        "term string, vec array<double>",
    )


def doc_vectors_from(
    tf: DataFrame,
    dft: DataFrame,
    stats: DataFrame,
    term_vecs: DataFrame,
    dim: int,
) -> DataFrame:
    """(doc_id, vec) — the MakePage.cpp:247-398 doc-vector semantics
    (TF-IDF-weighted average of per-term vectors, non-positive weights
    skipped, L2-normalized) over a TRAINED term-vector table instead of
    the hash embedding. Same shuffle shape as operators/vectors.doc_vectors:
    the vector components ride the dft join (broadcast — term_vecs is
    vocab-capped by construction), accumulation is ``dim`` parallel SUM
    aggregates in one hash-aggregate pass."""
    tv = dft.join(F.broadcast(term_vecs), "term").select(
        "term",
        "df",
        *[F.element_at("vec", d + 1).alias(f"_v{d}") for d in range(dim)],
    )
    weighted = (
        tf.join(tv, "term")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .withColumn("_w", F.col("tf") * F.log2(F.col("n_docs") / (F.col("df") + 1)))
        .filter(F.col("_w") > 0)
    )
    sums = weighted.groupBy("doc_id").agg(
        *[F.sum(F.col(f"_v{d}") * F.col("_w")).alias(f"_s{d}") for d in range(dim)]
    )
    nrm = F.sqrt(sum(F.col(f"_s{d}") * F.col(f"_s{d}") for d in range(dim)))
    vec = F.array(
        *[
            F.when(nrm > 0, F.col(f"_s{d}") / nrm).otherwise(F.lit(0.0))
            for d in range(dim)
        ]
    )
    return sums.select("doc_id", vec.alias("vec"))
