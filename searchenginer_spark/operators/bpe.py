"""Learned BPE tokenizer — train on the corpus, encode at scale.

The training-data stack's token accounting so far used a BPE-ish regex
(functions/textstats.bpe_ish_token_count); this module learns a REAL
byte-pair-encoding merge table from the corpus, the published algorithm
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units") in its scalable decomposition:

  1. the ONLY corpus-sized pass is a word-frequency count (tokenize ->
     explode -> groupBy(word)) — one shuffle, map-side partials;
  2. the merge loop runs over the DISTINCT-WORD table (vocab-sized, not
     corpus-sized — the original algorithm's own trick): each round
     counts adjacent symbol pairs weighted by word frequency and merges
     the most frequent pair. Deterministic tie-break (count desc, pair
     lexicographic) so two trainings of the same corpus produce the
     same merge table.
  3. encoding ships the merge table in an Arrow UDF closure (the same
     worker-holds-model shape as the CJK dictionary segmenter) and
     applies merges by rank — greedy lowest-rank-first, the standard
     BPE inference.

Scale notes: the driver holds the distinct-word frequency table capped
at ``max_words`` (highest-frequency words; at 100 TB the head of the
word distribution carries almost all pair mass, and the cap bounds
driver memory exactly like the embedding module's vocab cap). Encoding
is embarrassingly parallel.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.tokenize import IDENT_RE

#: end-of-word marker (Sennrich's </w>): keeps word-final subwords
#: distinct from word-internal ones; cannot collide with IDENT_RE tokens
EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", pattern: str = IDENT_RE
) -> DataFrame:
    """(word, n) over the corpus — the single corpus-sized training pass."""
    toks = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), F.lit(0))
    )
    return (
        docs.select(toks.alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    word_freq: DataFrame,
    n_merges: int = 200,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learned merge table (ordered) from a (word, n) frequency table.

    Pure Sennrich training over the driver-collected head of the word
    distribution (``max_words`` most frequent words). Deterministic:
    word order, pair counting, and tie-breaks are all fixed."""
    rows = (
        word_freq.orderBy(F.desc("n"), F.asc("word")).limit(max_words).collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        symbols = tuple(r["word"]) + (EOW,)
        vocab[symbols] = vocab.get(symbols, 0) + r["n"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for symbols, n in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for symbols, n in vocab.items():
            syms: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    syms.append(merged)
                    i += 2
                else:
                    syms.append(symbols[i])
                    i += 1
            t = tuple(syms)
            out[t] = out.get(t, 0) + n
        vocab = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE inference for one word: repeatedly merge the
    lowest-rank adjacent pair (the standard algorithm)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_pandas_udf(
    merges: list[tuple[str, str]], pattern: str = IDENT_RE
):
    """Arrow-vectorized encoder (factory — pandas_udf needs a session):
    text -> array<string> of subword tokens. The merge table rides the
    closure; a per-worker word cache amortizes repeated words (Zipf)."""
    import re as _re

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # compiled regex + word cache live in the FACTORY closure (both
    # pickle fine), so they persist for the python worker's lifetime —
    # inside _enc they would be rebuilt per Arrow batch and the Zipf-head
    # amortization the docstring promises would never happen
    rx = _re.compile(pattern)
    cache: dict[str, list[str]] = {}

    @pandas_udf("array<string>")
    def _enc(text: pd.Series) -> pd.Series:
        def run(t: str) -> list[str]:
            out: list[str] = []
            for w in rx.findall(t.lower()):
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return text.fillna("").map(run)

    return _enc


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = IDENT_RE,
) -> DataFrame:
    """(doc_id, n_bpe_tokens) under the LEARNED tokenizer — the exact
    token accounting a training-data budget needs (replaces the
    regex approximation when a trained merge table is available)."""
    from ..deploy import ship_package

    ship_package(docs.sparkSession)  # UDF closure imports this package
    enc = bpe_encode_pandas_udf(merges, pattern)
    return docs.select(
        F.col(id_col), F.size(enc(F.col(text_col))).alias("n_bpe_tokens")
    )
