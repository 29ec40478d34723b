from __future__ import annotations

import re

import numpy as np
import pytest

from searchenginer_spark.operators import stats as S
from searchenginer_spark.operators.dict import build_term_dict
from searchenginer_spark.operators.postings import (
    build_postings,
    decode_positions,
    decode_tfs,
)
from searchenginer_spark.plans.bm25 import Bm25CompressedIndex
from searchenginer_spark.plans.bm25_dataframe import IDENT_RE


@pytest.fixture(scope="module")
def pindex(spark, docs_sf0001):
    tf = S.term_frequencies(docs_sf0001, text_col="text", with_positions=True).persist()
    dl = S.doc_lengths(tf)
    dft = S.document_frequencies(tf)
    stats = S.corpus_stats(dl)
    term_dict = build_term_dict(dft).persist()
    postings = build_postings(tf, dl, term_dict, stats, docs_per_part=128).persist()
    return Bm25CompressedIndex(spark, postings, term_dict)


def _phrase_docs_oracle(docs, phrase):
    """All doc_ids whose token sequence contains the phrase contiguously."""
    rx = re.compile(IDENT_RE)
    want = rx.findall(phrase.lower())
    out = set()
    for d, t in docs:
        toks = rx.findall((t or "").lower())
        for i in range(len(toks) - len(want) + 1):
            if toks[i : i + len(want)] == want:
                out.add(d)
                break
    return out


@pytest.fixture(scope="module")
def pydocs(docs_sf0001):
    return [(r["doc_id"], r["text"]) for r in docs_sf0001.select("doc_id", "text").collect()]


@pytest.mark.parametrize(
    "phrase",
    ["merge part", "the fast key", "data data", "query spark zzz_absent", "row"],
)
def test_phrase_matches_oracle(pindex, pydocs, phrase):
    got = {r["doc_id"] for r in pindex.search_phrase(phrase, k=1000).collect()}
    want = _phrase_docs_oracle(pydocs, phrase)
    assert got == want, phrase


def test_phrase_ranking_and_k(pindex):
    rows = pindex.search_phrase("merge part", k=3).collect()
    assert len(rows) <= 3
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_positions_roundtrip(pindex):
    row = pindex.postings.filter(pindex.postings.n > 3).first()
    tfs = decode_tfs(row["tfs"])
    pos = decode_positions(row["positions"], tfs)
    assert len(pos) == row["n"]
    for p, t in zip(pos, tfs):
        assert len(p) == t
        assert np.all(np.diff(p) > 0)  # strictly increasing within a doc


def test_non_phrase_path_ignores_positions(pindex, docs_sf0001):
    # AND search on a positions-enabled index still works and matches the
    # positions-free engine
    from searchenginer_spark.plans.bm25_dataframe import Bm25DataFrameIndex

    m1 = Bm25DataFrameIndex.build(docs_sf0001, text_col="text", persist=False)
    want = [r["doc_id"] for r in m1.search("spark query", k=10).collect()]
    got = [r["doc_id"] for r in pindex.search("spark query", k=10).collect()]
    assert got == want
