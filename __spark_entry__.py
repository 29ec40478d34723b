"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). One entry per implemented operator from SURVEY.md §2.

Score columns are rounded (4 dp) on BOTH sides and ranked by the rounded
value with doc_id tie-break, so floating-point summation-order jitter can
never flip top-k membership between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchenginer_spark.operators.dict import build_term_dict
from searchenginer_spark.operators.postings import build_postings
from searchenginer_spark.plans.bm25 import Bm25CompressedIndex
from searchenginer_spark.plans.bm25_dataframe import Bm25DataFrameIndex, tokenize_query

IDENT_SQL_RE = "[A-Za-z_][A-Za-z0-9_]*"

_IDX_CACHE: dict[tuple[int, str], Bm25DataFrameIndex] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _index(spark: SparkSession, sf_dir: str) -> Bm25DataFrameIndex:
    key = (id(spark), sf_dir)
    if key not in _IDX_CACHE:
        _IDX_CACHE[key] = Bm25DataFrameIndex.build(_docs(spark, sf_dir), text_col="text")
    return _IDX_CACHE[key]


_CIDX_CACHE: dict[tuple[int, str], Bm25CompressedIndex] = {}


def _cindex(spark: SparkSession, sf_dir: str) -> Bm25CompressedIndex:
    """Compressed block-max index over the same documents table."""
    key = (id(spark), sf_dir)
    if key not in _CIDX_CACHE:
        m1 = _index(spark, sf_dir)
        term_dict = build_term_dict(m1.dft).persist()
        postings = build_postings(m1.tf, m1.dl, term_dict, m1.stats, docs_per_part=128)
        _CIDX_CACHE[key] = Bm25CompressedIndex(spark, postings.persist(), term_dict)
    return _CIDX_CACHE[key]


# ---------------------------------------------------------------- oracle SQL

_TOKS_CTE = f"""
toks AS (
  SELECT doc_id, lower(u.t) AS term
  FROM documents, unnest(regexp_extract_all(text, '{IDENT_SQL_RE}')) AS u(t)
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY 1)
"""


def _bm25_sql(query: str, mode: str, k: int = 10) -> str:
    terms = tokenize_query(query)
    values = ", ".join(f"('{t}', {c})" for t, c in terms)
    m_filter = f"WHERE m = {len(terms)}" if mode == "and" else ""
    return f"""
WITH {_TOKS_CTE},
q(term, qtf) AS (VALUES {values}),
scored AS (
  SELECT tf.doc_id,
         sum(q.qtf
             * ln(((SELECT n_docs FROM st) - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM st)))) AS score,
         count(*) AS m
  FROM tf JOIN q USING (term) JOIN dft USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored {m_filter}
ORDER BY round(score, 4) DESC, doc_id
LIMIT {k}
"""


FLAGSHIP_QUERY = "query data"


# ------------------------------------------------------------------ queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 conjunctive top-10 over sf0.001 documents."""
    idx = _index(spark, "/root/testdata/sf0.001")
    return idx.search(FLAGSHIP_QUERY, k=10, mode="and", round_to=4)


def _q_bm25_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _index(spark, sf_dir).search(FLAGSHIP_QUERY, k=10, mode="and", round_to=4)


def _q_bm25_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _index(spark, sf_dir).search("spark merge window", k=10, mode="or", round_to=4)


def _q_bm25_repeated_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _index(spark, sf_dir).search("the the fast", k=10, mode="and", round_to=4)


def _q_bm25_compressed_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same flagship query through the compressed block-max index — checked
    against the identical SQL oracle as the DataFrame path."""
    return _cindex(spark, sf_dir).search(FLAGSHIP_QUERY, k=10, mode="and", round_to=4)


def _q_bm25_compressed_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cindex(spark, sf_dir).search("spark merge window", k=10, mode="or", round_to=4)


def _q_term_df_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    return (
        idx.dft.orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
        .select("term", "df", "cf")
    )


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    return idx.stats.select("n_docs", F.round("avgdl", 4).alias("avgdl"))


def _q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    return idx.dl.orderBy(F.desc("dl"), F.asc("doc_id")).limit(25).select("doc_id", "dl")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_and_topk": _q_bm25_and,
        "bm25_or_topk": _q_bm25_or,
        "bm25_repeated_term": _q_bm25_repeated_term,
        "bm25_compressed_and_topk": _q_bm25_compressed_and,
        "bm25_compressed_or_topk": _q_bm25_compressed_or,
        "term_df_stats": _q_term_df_stats,
        "doc_stats": _q_doc_stats,
        "doc_lengths_topk": _q_doc_lengths,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_and_topk": _bm25_sql(FLAGSHIP_QUERY, "and"),
        "bm25_or_topk": _bm25_sql("spark merge window", "or"),
        "bm25_repeated_term": _bm25_sql("the the fast", "and"),
        "bm25_compressed_and_topk": _bm25_sql(FLAGSHIP_QUERY, "and"),
        "bm25_compressed_or_topk": _bm25_sql("spark merge window", "or"),
        "term_df_stats": f"""
WITH {_TOKS_CTE}
SELECT term, df, cf FROM dft ORDER BY df DESC, term LIMIT 50
""",
        "doc_stats": f"""
WITH {_TOKS_CTE}
SELECT n_docs, round(avgdl, 4) AS avgdl FROM st
""",
        "doc_lengths_topk": f"""
WITH {_TOKS_CTE}
SELECT doc_id, dl FROM dl ORDER BY dl DESC, doc_id LIMIT 25
""",
    }
