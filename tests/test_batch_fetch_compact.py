from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchenginer_spark.operators import stats as S
from searchenginer_spark.operators.dict import build_term_dict
from searchenginer_spark.operators.postings import build_postings
from searchenginer_spark.plans.bm25 import Bm25CompressedIndex
from searchenginer_spark.plans.build_index import build_index, compact_indexes, open_index
from searchenginer_spark.sources.corpus import build_docs

QUERIES = {
    "q_hot": "data",
    "q_and": "spark query",
    "q_absent": "zzz_nope data",
    "q_rep": "for for the",
}


@pytest.fixture(scope="module")
def cidx(spark, docs_sf0001):
    tf = S.term_frequencies(docs_sf0001, text_col="text").persist()
    dl = S.doc_lengths(tf)
    dft = S.document_frequencies(tf)
    st = S.corpus_stats(dl)
    td = build_term_dict(dft).persist()
    return Bm25CompressedIndex(
        spark, build_postings(tf, dl, td, st, docs_per_part=128).persist(), td
    )


@pytest.mark.parametrize("mode", ["and", "or"])
def test_batch_matches_single(cidx, mode):
    batch = cidx.search_batch(QUERIES, k=10, mode=mode).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, text in QUERIES.items():
        single = [(r["doc_id"], r["score"]) for r in cidx.search(text, k=10, mode=mode).collect()]
        got = by_q.get(qid, [])
        assert [d for d, _ in got] == [d for d, _ in single], (qid, mode)
        for (_, a), (_, b) in zip(got, single):
            assert abs(a - b) < 1e-9


def test_fetch_docs(cidx, docs_sf0001):
    topk = cidx.search("spark query", k=5)
    out = cidx.fetch_docs(topk, docs_sf0001, cols=["lang", "n_chars"]).collect()
    assert len(out) == 5
    assert set(out[0].asDict()) == {"doc_id", "score", "lang", "n_chars"}
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_compact_equals_monolithic(spark, tmp_path_factory):
    docs = build_docs(spark, 300, seed=42, num_partitions=4).persist()
    a, b, merged, mono = (str(tmp_path_factory.mktemp(x)) for x in "abmn")
    build_index(docs.filter(F.col("doc_id") < 150), a, docs_per_part=64)
    build_index(docs.filter(F.col("doc_id") >= 150), b, docs_per_part=64)
    compact_indexes(spark, [a, b], merged, docs_per_part=64)
    build_index(docs, mono, docs_per_part=64)

    got = [(r["doc_id"], round(r["score"], 9))
           for r in open_index(spark, merged).search("int return", k=20).collect()]
    want = [(r["doc_id"], round(r["score"], 9))
            for r in open_index(spark, mono).search("int return", k=20).collect()]
    assert got == want
