"""SURVEY.md §5.3 invariant tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginer_spark.operators import stats as S
from searchenginer_spark.operators.dict import build_term_dict
from searchenginer_spark.operators.postings import build_postings
from searchenginer_spark.sources.corpus import build_docs


@pytest.fixture(scope="module")
def built(spark):
    docs = build_docs(spark, 400, seed=42, num_partitions=4).persist()
    tf = S.term_frequencies(docs, text_col="content").persist()
    dl = S.doc_lengths(tf)
    dft = S.document_frequencies(tf)
    stats = S.corpus_stats(dl)
    term_dict = build_term_dict(dft).persist()
    postings = build_postings(tf, dl, term_dict, stats, docs_per_part=64).persist()
    return docs, tf, dft, term_dict, postings


def test_df_equals_count_distinct_docs(spark, built):
    docs, tf, dft, _, _ = built
    from searchenginer_spark.functions.tokenize import explode_tokens

    direct = (
        explode_tokens(docs, "content", "doc_id")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df2"))
    )
    bad = dft.join(direct, "term").filter(F.col("df") != F.col("df2")).count()
    assert bad == 0


def test_postings_cover_all_tf_rows(built):
    _, tf, _, term_dict, postings = built
    n_postings = postings.agg(F.sum("n")).first()[0]
    assert n_postings == tf.count()


def test_term_ids_dense_and_sorted(built):
    _, _, _, term_dict, _ = built
    rows = term_dict.select("term", "term_id").orderBy("term").collect()
    assert [r["term_id"] for r in rows] == list(range(len(rows)))


def test_hot_term_group_sizes_bounded(built):
    """Skew guarantee: no (term_id, part) posting group exceeds
    docs_per_part — the doc-range part IS the salt for hot terms."""
    _, _, _, _, postings = built
    assert postings.agg(F.max("n")).first()[0] <= 64
    # hot terms really do split across every part
    hot = (
        postings.groupBy("term_id")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.sum("n").alias("total"))
        .filter(F.col("total") > 300)
    )
    assert hot.filter(F.col("n_parts") < 7).count() == 0


def test_content_sha_invariant(built):
    docs = built[0]
    assert docs.filter(F.sha2("content", 256) != F.col("content_sha256")).count() == 0


def test_release_plan_checkpoints_unpersists_id_minting(spark):
    """assign_sequential_ids pins partitions via localCheckpoint;
    release_plan_checkpoints on a derived DataFrame must find and
    unpersist exactly that storage (session-lifetime leak otherwise)."""
    from searchenginer_spark.operators.ids import (
        assign_sequential_ids,
        release_plan_checkpoints,
    )

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_persisted()
    df = spark.range(500).selectExpr("concat('t', id) AS term")
    ids = assign_sequential_ids(df, ["term"], "term_id")
    derived = ids.selectExpr("term_id", "upper(term) AS u")
    assert derived.count() == 500
    assert n_persisted() == base + 1
    assert release_plan_checkpoints(derived) == 1
    import time

    for _ in range(20):
        if n_persisted() <= base:
            break
        time.sleep(0.25)
    assert n_persisted() <= base
