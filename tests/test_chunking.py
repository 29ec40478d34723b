"""Sliding-window document chunking (functions/chunking.py)."""

from __future__ import annotations

import pytest

from searchenginer_spark.functions.chunking import chunk_documents


def _chunks_py(toks, max_tokens, overlap):
    """Independent pure-python window oracle."""
    if not toks:
        return []
    stride = max_tokens - overlap
    n = len(toks)
    if n <= max_tokens:
        n_chunks = 1
    else:
        n_chunks = -(-(n - max_tokens) // stride) + 1
    return [toks[i * stride: i * stride + max_tokens] for i in range(n_chunks)]


def test_chunking_matches_python_oracle(spark):
    texts = {
        1: " ".join(f"w{i}" for i in range(25)),   # multi-chunk
        2: " ".join(f"w{i}" for i in range(10)),   # exactly max_tokens
        3: "one two",                              # single short chunk
        4: " ".join(f"w{i}" for i in range(11)),   # one token past boundary
        5: "!!! ...",                              # zero tokens -> dropped
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = chunk_documents(docs, max_tokens=10, overlap=3).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        )
    assert 5 not in got
    for doc_id, text in texts.items():
        if doc_id == 5:
            continue
        toks = text.split()
        want = _chunks_py(toks, 10, 3)
        rows = sorted(got[doc_id])
        assert len(rows) == len(want), doc_id
        for (cid, ntok, ctext), wtoks in zip(rows, want):
            assert ntok == len(wtoks) and ctext == " ".join(wtoks), (doc_id, cid)
    # every token covered + overlap honored on the multi-chunk doc
    rows = sorted(got[1])
    assert rows[0][2].split()[-3:] == rows[1][2].split()[:3]  # 3-token overlap
    assert rows[-1][2].split()[-1] == "w24"


def test_chunking_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=8, overlap=8)


def test_pack_chunks_contiguous_fill(spark):
    from searchenginer_spark.functions.chunking import pack_chunks

    rows = [(d, c, 30) for d in range(4) for c in range(3)]  # 12 x 30 tokens
    chunks = spark.createDataFrame(rows, "doc_id long, chunk_id int, n_tokens int")
    out = pack_chunks(chunks, budget=100, group_docs=2).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["group"], r["example_id"]) for r in out}
    # group 0 = docs 0-1 (6 chunks x 30): before = 0,30,60,90,120,150
    # -> example floor(before/100) = 0,0,0,0,1,1
    assert [got[(0, c)][1] for c in range(3)] == [0, 0, 0]
    assert got[(1, 0)] == (0, 0) and got[(1, 1)] == (0, 1) and got[(1, 2)] == (0, 1)
    # packing restarts per group: docs 2-3 are group 1, examples start at 0
    assert got[(2, 0)] == (1, 0)
    # overflow-by-one-chunk semantics: example 0 carries 4x30=120 > budget
    tot = sum(30 for (d, c), (g, e) in got.items() if g == 0 and e == 0)
    assert tot == 120
