"""External term dictionary: term -> dense term_id + corpus stats + prefix.

Reference shape: word dictionaries with frequencies and a first-character
index for prefix pruning (/root/reference/Make_dir/MakeDictAndIndex.cpp:
112-125 writes `word freq` lines sorted by std::map order; :203-209 writes
the first-char -> dict-row-ids index). Our term_dict carries the same
information columnar: term_id = dense rank over sorted term (so ids are
reproducible), df/cf stats for BM25 idf, and a ``prefix`` column whose role
as partition/sort key gives the same candidate-space pruning the reference's
index file gave (min/max parquet stats or partition pruning on prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ids import assign_sequential_ids

#: default English stopword set — the same function-word list
#: functions/textstats.py scores against, so one list drives both quality
#: scoring and dict-time stopword removal (reference ships its stopword file
#: next to the dict, Make_dir/MakeDictAndIndex.cpp:80-94).
DEFAULT_STOPWORDS: tuple[str, ...] = (
    "the", "and", "of", "to", "is", "in", "that", "it",
    "a", "an", "was", "for", "on", "with", "as",
)


def stopwords_df(spark: SparkSession, words: tuple[str, ...] = DEFAULT_STOPWORDS) -> DataFrame:
    """One-column (term) stopword table for build_term_dict/build_index."""
    return spark.createDataFrame([(w,) for w in words], "term string")


def build_term_dict(
    dft: DataFrame,
    stopwords: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """term_dict(term, term_id, df, cf, prefix) from a (term, df, cf) table.

    Stop-word removal is a broadcast left-anti join (reference applies its
    stopword set at dict-write time, MakeDictAndIndex.cpp:118-125).
    """
    if stopwords is not None:
        dft = dft.join(F.broadcast(stopwords.select("term")), "term", "left_anti")
    with_ids = assign_sequential_ids(dft, ["term"], "term_id", num_partitions)
    return with_ids.select(
        "term",
        "term_id",
        "df",
        "cf",
        F.substring("term", 1, 1).alias("prefix"),
    )
