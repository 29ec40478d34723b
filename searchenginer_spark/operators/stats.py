"""Corpus term statistics: tf, df, dl, avgdl, N.

Rebuilds the reference's two in-memory passes
(/root/reference/Make_Page/MakePage.cpp:111-194: pass 1 accumulates
``wordCount[doc][word]`` + ``docFrequency[word]``, pass 2 derives weights)
as declarative aggregations. Spark gives partial+final hash aggregation
(map-side combine) for free, so per-doc tf never ships raw token rows
through the shuffle — only (doc_id, term) partial counts.

At 100 TB the token explode is the widest point of the DAG; everything
here is groupBy on (doc_id, term) → (term), which AQE sizes at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import IDENT_RE, explode_tokens


def term_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = IDENT_RE,
    with_positions: bool = False,
    tokenizer: str | None = None,
) -> DataFrame:
    """(doc_id, term, tf[, positions]) — per-document term frequency.

    Reference: Make_Page/MakePage.cpp:111-137 (wordCount[doc][word]++).

    ``tokenizer='jieba'`` swaps in real dictionary CJK segmentation on
    clusters with jieba installed (functions.tokenize.jieba_tokens_pandas_udf)
    with no other code changes; 'cjk_bigram' is the dependency-free fallback.
    """
    toks = explode_tokens(docs, text_col, id_col, pattern, with_positions, tokenizer)
    aggs = [F.count(F.lit(1)).alias("tf")]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return toks.groupBy(id_col, "term").agg(*aggs)


def doc_lengths(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) — document length in tokens (BM25 ``dl``)."""
    return tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))


def document_frequencies(tf: DataFrame, approximate: bool = False) -> DataFrame:
    """(term, df, cf) — document frequency and collection frequency.

    Exact count-distinct is free here because ``tf`` is already grouped by
    (doc_id, term): df = row count per term. Reference computes the same via
    a seen-in-doc set (Make_Page/MakePage.cpp:113-144).

    ``approximate=True`` switches df to a HyperLogLog++ sketch
    (``approx_count_distinct``, 5% rsd) — the scalable alternative when the
    pipeline feeds df straight from raw token rows without the pre-grouped
    tf table (BM25 idf tolerates small df error).
    """
    if approximate:
        return tf.groupBy("term").agg(
            F.approx_count_distinct("doc_id", 0.05).alias("df"),
            F.sum("tf").alias("cf"),
        )
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


def corpus_stats(dl: DataFrame) -> DataFrame:
    """Single-row (n_docs, avgdl). Kept as a DataFrame (not a collected
    scalar) so query plans can cross-join it lazily and the same shape is
    SQL-oracle-expressible."""
    return dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
