"""Learned BPE (operators/bpe): training vs a pure-Python Sennrich
oracle, encode/decode invariants, determinism, Spark paths."""

from __future__ import annotations

from collections import Counter

import pytest

from searchenginer_spark.operators.bpe import (
    EOW,
    bpe_token_counts,
    encode_word,
    train_bpe,
    word_frequencies,
)

CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wide wider widest wide"),
    (3, "low new wide slow slower"),
]


def _word_freq_py():
    import re

    c = Counter()
    for _, t in CORPUS:
        c.update(re.findall("[a-z_][a-z0-9_]*", t.lower()))
    return c


def _train_py(n_merges):
    vocab = {tuple(w) + (EOW,): n for w, n in _word_freq_py().items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        out = {}
        for syms, n in vocab.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    new.append(best[0] + best[1])
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            t = tuple(new)
            out[t] = out.get(t, 0) + n
        vocab = out
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_word_frequencies_match(docs):
    got = {r["word"]: r["n"] for r in word_frequencies(docs).collect()}
    assert got == dict(_word_freq_py())


def test_training_matches_python_oracle(docs):
    wf = word_frequencies(docs)
    for n in (5, 25, 80):
        assert train_bpe(wf, n_merges=n) == _train_py(n), n


def test_training_deterministic_and_learns_structure(docs):
    wf = word_frequencies(docs)
    m1 = train_bpe(wf, n_merges=40)
    m2 = train_bpe(wf, n_merges=40)
    assert m1 == m2
    # frequent subwords become single merged symbols
    merged_symbols = {a + b for a, b in m1}
    assert "low" + EOW in merged_symbols or "low" in merged_symbols


def test_encode_word_invariants(docs):
    merges = train_bpe(word_frequencies(docs), n_merges=30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in ["low", "lowest", "newer", "slower", "unseen_zzz", ""]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW  # lossless
        assert all(toks)
    # a fully-merged frequent word becomes ONE token
    assert encode_word("low", ranks) == ["low" + EOW]


def test_bpe_token_counts_spark(docs, spark):
    merges = train_bpe(word_frequencies(docs), n_merges=30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_counts(docs, merges).collect()}
    import re

    for doc_id, text in CORPUS:
        want = sum(len(encode_word(w, ranks))
                   for w in re.findall("[a-z_][a-z0-9_]*", text.lower()))
        assert got[doc_id] == want, doc_id
    # fewer merges -> never fewer tokens (merges only ever join symbols)
    few = train_bpe(word_frequencies(docs), n_merges=5)
    got_few = {r["doc_id"]: r["n_bpe_tokens"]
               for r in bpe_token_counts(docs, few).collect()}
    assert all(got_few[d] >= got[d] for d in got)
