from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginer_spark.operators import stats as S
from searchenginer_spark.operators.dict import DEFAULT_STOPWORDS, stopwords_df
from searchenginer_spark.plans.build_index import IndexPaths, build_index, open_index


@pytest.fixture(scope="module")
def stop_index(spark, docs_sf0001, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stopidx"))
    build_index(
        docs_sf0001.select("doc_id", "text"),
        root,
        text_col="text",
        docs_per_part=128,
        stopwords=stopwords_df(spark),
    )
    return open_index(spark, root), root


def test_stopwords_absent_from_dict_and_postings(spark, stop_index):
    idx, _ = stop_index
    assert idx.term_dict.filter(F.col("term").isin(list(DEFAULT_STOPWORDS))).count() == 0
    # no posting row can reference a dropped term (postings join via dict ids)
    dict_ids = {r["term_id"] for r in idx.term_dict.select("term_id").collect()}
    post_ids = {r["term_id"] for r in idx.postings.select("term_id").distinct().collect()}
    assert post_ids <= dict_ids


def test_stopword_query_contributes_nothing(stop_index):
    idx, _ = stop_index
    assert idx.search("the", k=10, mode="or").count() == 0
    with_stop = idx.search("the data", k=10, mode="or", round_to=4).collect()
    without = idx.search("data", k=10, mode="or", round_to=4).collect()
    assert [(r["doc_id"], r["score"]) for r in with_stop] == [
        (r["doc_id"], r["score"]) for r in without
    ]


def test_doc_lengths_are_analyzer_consistent(spark, docs_sf0001, stop_index):
    """Analyzer semantics (Lucene StopFilter analog): stopwords leave the
    token stream entirely, so the stored avgdl — and the dl inside every
    per-posting impact — count only non-stop tokens."""
    _, root = stop_index
    tf = S.term_frequencies(docs_sf0001.select("doc_id", "text"), text_col="text")
    tf = tf.filter(~F.col("term").isin(list(DEFAULT_STOPWORDS)))
    expected = S.corpus_stats(S.doc_lengths(tf)).first()
    got = spark.read.parquet(IndexPaths(root).stats).first()
    assert got["n_docs"] == expected["n_docs"]
    assert abs(got["avgdl"] - expected["avgdl"]) < 1e-9
