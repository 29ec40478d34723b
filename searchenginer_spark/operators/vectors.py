"""Document/query vectors — the reference's fastText+FAISS path, Spark-native.

Reference behavior this reproduces:

  - /root/reference/Make_Page/MakePage.cpp:247-398 (makefasttextmodel):
    per-doc vector = TF-IDF-weighted average of per-term word vectors
    (weights from the inverted index; non-positive weights skipped),
    L2-normalized, exported for a FAISS IndexFlatIP.
  - /root/reference/srpc/PageSearch/cut_weight.cpp:16-69: query-side term
    weight = tf * log2((N + 1) / (df + 1)), weight vector L2-normalized.
  - /root/reference/srpc/PageSearch/server.pb_skeleton.cc:63-93,160-178:
    query vector = sum of weight * word-vector, L2-normalized, then
    inner-product top-10 against the doc vectors (IndexFlatIP over
    L2-normalized vectors == cosine top-k).

The fastText model itself is an external binary artifact the reference
loads from disk; its stand-in here is a deterministic HASH EMBEDDING:
component d of term t is md5(f"{d}:{t}") -> first 8 hex chars -> uint32 ->
uniform [-1, 1). That makes the entire pipeline a pure function of the
corpus — identical on every executor, on the driver (hashlib), and in the
DuckDB oracle (SQL md5) — while preserving the structural property the
reference relies on: one fixed vector per term, shared across documents.

Scale shape: the per-term vector components are attached to the SAME
dft-join the TF-IDF weight already needs (zero extra shuffles), and the
per-doc accumulation is `dim` parallel SUM aggregates in one hash-aggregate
pass (map-side partial aggregation, whole-stage codegen) — never a
dim-times row explosion.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import IDENT_RE
from ..plans.bm25_dataframe import tokenize_query

DEFAULT_DIM = 16

_U32 = float(1 << 32)


def hash_component(term: Column | str, d: int) -> Column:
    """Deterministic term-vector component d in [-1, 1), JVM-side.

    md5 is computed per (term, d); Catalyst subexpression elimination plus
    the vocab-sized input (this runs on dft, not tf) keep it off any hot
    path. Must stay bit-identical to ``_hash_component_py`` and the DuckDB
    SQL form in __spark_entry__.py.
    """
    t = F.col(term) if isinstance(term, str) else term
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{d}:"), t)), 1, 8), 16, 10)
    return (h.cast("long") / F.lit(_U32)) * 2.0 - 1.0


def _hash_component_py(term: str, d: int) -> float:
    """Driver-side twin of :func:`hash_component` (exact same bits)."""
    x = int(hashlib.md5(f"{d}:{term}".encode("utf-8")).hexdigest()[:8], 16)
    return (x / _U32) * 2.0 - 1.0


def term_vectors(terms: DataFrame, dim: int = DEFAULT_DIM, term_col: str = "term") -> DataFrame:
    """terms + ``vec`` array<double>: the fixed per-term hash embedding."""
    return terms.withColumn(
        "vec", F.array(*[hash_component(term_col, d) for d in range(dim)])
    )


def doc_vectors(
    tf: DataFrame,
    dft: DataFrame,
    stats: DataFrame,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """(doc_id, vec array<double>) — L2-normalized TF-IDF-weighted average
    of per-term vectors (MakePage.cpp:247-398 semantics).

    weight(t, doc) = tf * log2(N / (df + 1)); non-positive weights are
    skipped exactly as the reference skips them (MakePage.cpp:355). Docs
    whose every term-weight is non-positive (each term in >= N-1 docs) are
    dropped — they carry no TF-IDF signal.

    The component frame is broadcast under the tfidf_top_keywords size
    gate (persisted dft with a bounded row count — the count is then a
    cache scan), removing the tf-side term exchange; unbounded or
    unpersisted vocabularies fall back to the shuffle join (AQE still
    free to broadcast at runtime).
    """
    from pyspark import StorageLevel

    bcast = dft.storageLevel != StorageLevel.NONE and dft.count() <= 2_000_000
    tv = dft.select(
        "term",
        "df",
        *[hash_component("term", d).alias(f"_v{d}") for d in range(dim)],
    )
    return weighted_doc_vectors(tf, tv, stats, dim, broadcast_tv=bcast)


def weighted_doc_vectors(
    tf: DataFrame, tv: DataFrame, stats: DataFrame, dim: int,
    broadcast_tv: bool | None = None,
) -> DataFrame:
    """THE doc-vector aggregation (MakePage.cpp:247-398 semantics) over a
    prepared (term, df, _v0.._v{dim-1}) component frame: doc weight
    tf*log2(n_docs/(df+1)) with non-positive weights dropped, ``dim``
    parallel SUM aggregates in one hash-aggregate pass, then row L2
    normalization. Shared by the hash-embedding path (:func:`doc_vectors`)
    and the trained-vector path (embed.doc_vectors_from); the SQL oracle
    twins (__spark_entry__._vec_comp_sql/_DOCVEC_CTES) pin exactly this
    math, so it must live in one place.

    ``broadcast_tv`` (r7): hint the vocab-sized component frame broadcast
    so the tf side is never exchanged for the join (the
    tfidf_top_keywords rationale — AQE learns the aggregate's true size
    only after the tf shuffle has started). None = no hint (AQE decides);
    callers that size-gate the vocabulary pass True (doc_vectors does)."""
    tv_side = F.broadcast(tv) if broadcast_tv else tv
    weighted = (
        tf.join(tv_side, "term")
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


def lookup_df(dft: DataFrame, terms: list[str]) -> dict[str, int]:
    """Small df probe for query-side weighting (isin pushdown, k rows)."""
    if not terms:
        return {}
    rows = dft.filter(F.col("term").isin(terms)).select("term", "df").collect()
    return {r["term"]: r["df"] for r in rows}


def query_vector(
    query: str,
    dfs: dict[str, int],
    n_docs: int,
    dim: int = DEFAULT_DIM,
    pattern: str = IDENT_RE,
) -> list[float]:
    """Driver-side query embedding (queries are tiny — cut_weight.cpp analog).

    weight(t) = qtf * log2((N + 1) / (df + 1)), summed into the hash
    embedding and L2-normalized. Terms absent from the corpus contribute
    with df = 0, exactly like cut_weight.cpp:31-44.
    """
    accum = [0.0] * dim
    for term, qtf in tokenize_query(query, pattern):
        w = qtf * math.log2((n_docs + 1.0) / (dfs.get(term, 0) + 1.0))
        if w == 0.0:
            continue
        for d in range(dim):
            accum[d] += w * _hash_component_py(term, d)
    nrm = math.sqrt(sum(x * x for x in accum))
    if nrm > 0:
        accum = [x / nrm for x in accum]
    return accum


def vector_search_text(
    query: str,
    doc_vecs: DataFrame,
    dft: DataFrame,
    stats: DataFrame,
    k: int = 10,
    dim: int = DEFAULT_DIM,
    pattern: str = IDENT_RE,
    round_to: int | None = None,
) -> DataFrame:
    """Text query -> query vector -> cosine top-k over the doc vectors.

    This is the reference's PRIMARY search path (PageSuggest RPC,
    server.pb_skeleton.cc:160-178): embed the query text with the same
    TF-IDF weighting the doc vectors used, then IndexFlatIP top-k — here a
    distributed scan + TakeOrderedAndProject (exact, broadcast-free).
    """
    from .ann import cosine_topk

    terms = [t for t, _ in tokenize_query(query, pattern)]
    n_docs = stats.select("n_docs").first()["n_docs"]
    qvec = query_vector(query, lookup_df(dft, terms), n_docs, dim, pattern)
    return cosine_topk(
        doc_vecs, qvec, k=k, id_col="doc_id", vec_col="vec", round_to=round_to
    )


def vector_search_text_lsh(
    query: str,
    bucketed_doc_vecs: DataFrame,
    dft: DataFrame,
    stats: DataFrame,
    k: int = 10,
    dim: int = DEFAULT_DIM,
    n_planes: int = 12,
    seed: int = 42,
    pattern: str = IDENT_RE,
) -> DataFrame:
    """Approximate text-query search: the 100 TB path.

    Same query embedding as :func:`vector_search_text`, but the corpus side
    is a doc-vector table pre-bucketed with ``ann.srp_buckets`` (written
    partitioned by ``bucket`` at scale), so the probe reads only the query
    bucket and its hamming-1 neighbors instead of scanning every vector —
    the SRP-LSH stand-in for the reference's in-memory FAISS index, with
    recall traded for bucket pruning.
    """
    from .ann import ann_lsh_topk

    terms = [t for t, _ in tokenize_query(query, pattern)]
    n_docs = stats.select("n_docs").first()["n_docs"]
    qvec = query_vector(query, lookup_df(dft, terms), n_docs, dim, pattern)
    return ann_lsh_topk(
        bucketed_doc_vecs, qvec, k=k, n_planes=n_planes, seed=seed,
        id_col="doc_id", vec_col="vec",
    )
