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


@pytest.fixture(scope="module")
def multiblock(spark):
    """Positions index where hot terms span MANY 128-posting blocks (one
    giant part), exercising the block_pos_off skip-decode path."""
    from pyspark.sql import functions as F

    from searchenginer_spark.sources.corpus import build_docs

    docs = build_docs(spark, 600, seed=7, num_partitions=4).select(
        "doc_id", F.col("content").alias("text")
    ).persist()
    tf = S.term_frequencies(docs, text_col="text", with_positions=True)
    dl = S.doc_lengths(tf)
    term_dict = build_term_dict(S.document_frequencies(tf)).persist()
    postings = build_postings(
        tf, dl, term_dict, S.corpus_stats(dl), docs_per_part=1 << 16
    ).persist()
    pydocs = [(r["doc_id"], r["text"]) for r in docs.collect()]
    return Bm25CompressedIndex(spark, postings, term_dict), pydocs


def test_decode_positions_blocks_matches_full(multiblock):
    from searchenginer_spark.operators.postings import (
        BLOCK,
        decode_positions_blocks,
        decode_positions_flat,
    )

    idx, _ = multiblock
    row = idx.postings.filter(idx.postings.n > 3 * BLOCK).first()
    assert row is not None, "fixture needs a >3-block hot term"
    tfs = decode_tfs(row["tfs"])
    flat_full, starts_full, counts_full = decode_positions_flat(row["positions"], tfs)
    nblocks = len(row["block_pos_off"])
    # every strided subset of blocks decodes to the full decode's values
    for needed in (np.array([0]), np.array([nblocks - 1]), np.arange(0, nblocks, 2)):
        flat, starts, counts, pidx = decode_positions_blocks(
            row["positions"], row["tfs"],
            np.asarray(row["block_pos_off"]), np.asarray(row["block_tf_off"]),
            row["n"], needed,
        )
        for local, g in enumerate(pidx.tolist()):
            a = flat[starts[local] : starts[local] + counts[local]]
            b = flat_full[starts_full[g] : starts_full[g] + counts_full[g]]
            assert np.array_equal(a, b), (g, needed)


@pytest.mark.parametrize("phrase", ["int return", "def id42", "return return"])
def test_phrase_multiblock_matches_oracle(multiblock, phrase):
    idx, pydocs = multiblock
    got = {r["doc_id"] for r in idx.search_phrase(phrase, k=100000).collect()}
    want = _phrase_docs_oracle(pydocs, phrase)
    assert got == want, phrase


def test_non_phrase_path_ignores_positions(pindex, docs_sf0001):
    # AND search on a positions-enabled index still works and matches the
    # positions-free engine
    from searchenginer_spark.plans.bm25_dataframe import Bm25DataFrameIndex

    m1 = Bm25DataFrameIndex.build(docs_sf0001, text_col="text", persist=False)
    want = [r["doc_id"] for r in m1.search("spark query", k=10).collect()]
    got = [r["doc_id"] for r in pindex.search("spark query", k=10).collect()]
    assert got == want
