from __future__ import annotations

import numpy as np
import pytest

from searchenginer_spark.operators import stats as S
from searchenginer_spark.operators.dict import build_term_dict
from searchenginer_spark.operators.postings import (
    BLOCK,
    build_postings,
    decode_blocks,
    decode_doc_ids,
    decode_scores,
    decode_tfs,
)
from searchenginer_spark.plans.bm25 import Bm25CompressedIndex
from searchenginer_spark.plans.bm25_dataframe import Bm25DataFrameIndex

QUERIES = [
    ("data", "and"),
    ("data", "or"),
    ("spark query", "and"),
    ("spark query group", "or"),
    ("the fast key order", "and"),
    ("for for for", "and"),
    ("zzz_not_here", "and"),
    ("zzz_not_here data", "or"),  # one absent term, OR still scores the other
]


@pytest.fixture(scope="module")
def engines(spark, docs_sf0001):
    m1 = Bm25DataFrameIndex.build(docs_sf0001, text_col="text")
    term_dict = build_term_dict(m1.dft)
    # small docs_per_part so multiple parts + multi-block rows are exercised
    postings = build_postings(m1.tf, m1.dl, term_dict, m1.stats, docs_per_part=128)
    comp = Bm25CompressedIndex(spark, postings.persist(), term_dict.persist())
    return m1, comp


@pytest.mark.parametrize("query,mode", QUERIES)
def test_rank_identical_to_dataframe_engine(engines, query, mode):
    m1, comp = engines
    want = [(r["doc_id"], r["score"]) for r in m1.search(query, k=10, mode=mode).collect()]
    got = [(r["doc_id"], r["score"]) for r in comp.search(query, k=10, mode=mode).collect()]
    assert [d for d, _ in got] == [d for d, _ in want], f"{query}/{mode}"
    for (_, g), (_, w) in zip(got, want):
        assert abs(g - w) < 1e-9


def test_posting_row_layout(engines):
    m1, _ = engines
    # single part covering all 500 docs -> hot terms give multi-block rows
    term_dict = build_term_dict(m1.dft)
    postings = build_postings(m1.tf, m1.dl, term_dict, m1.stats, docs_per_part=1 << 16)
    row = postings.filter(postings.n > BLOCK).orderBy("term_id", "part").first()
    assert row is not None, "need a multi-block posting row for this test"
    ids = decode_doc_ids(row["docs"], row["n"])
    assert len(ids) == row["n"]
    assert np.all(np.diff(ids) > 0), "doc ids strictly increasing"
    tfs = decode_tfs(row["tfs"])
    scores = decode_scores(row["scores"])
    assert len(tfs) == row["n"] and len(scores) == row["n"]
    assert (tfs >= 1).all() and (scores > 0).all()
    # block metadata consistency
    nblocks = -(-row["n"] // BLOCK)
    assert len(row["block_last"]) == nblocks == len(row["block_max"])
    assert row["block_last"][-1] == ids[-1]
    for b in range(nblocks):
        lo, hi = b * BLOCK, min((b + 1) * BLOCK, row["n"])
        assert row["block_last"][b] == ids[hi - 1]
        assert abs(row["block_max"][b] - scores[lo:hi].max()) < 1e-12
    # selective block decode == slice of full decode
    sel, pos = decode_blocks(
        row["docs"], np.asarray(row["block_doc_off"]), row["n"], np.array([nblocks - 1])
    )
    assert np.array_equal(sel, ids[(nblocks - 1) * BLOCK :])
    assert np.array_equal(pos, np.arange((nblocks - 1) * BLOCK, row["n"]))


def test_parts_cover_disjoint_doc_ranges(engines):
    _, comp = engines
    from pyspark.sql import functions as F

    rows = comp.postings.select("part", "block_last").collect()
    for r in rows:
        for d in r["block_last"]:
            assert d // 128 == r["part"]
