"""Tokenizers.

The reference's core scalar function is its tokenizer pair
(/root/reference/Make_dir/MakeDictAndIndex.cpp:40-64 — EN alpha-run
lowercasing tokenizer; /root/reference/include/cppjieba — CN dict
segmentation). For the source-code corpus the primary tokenizer is the
identifier tokenizer ``[A-Za-z_][A-Za-z0-9_]*``.

Design rule: stay JVM-side. ``F.regexp_extract_all`` + ``explode`` keeps
tokenization inside whole-stage codegen — faster than any Python UDF and
exactly mirrorable in the DuckDB oracle (same regex). A vectorized Arrow
pandas UDF variant is provided for parity testing and for tokenizers that
genuinely need Python (CJK segmentation would plug in there).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: identifier tokenizer for source code — also used verbatim in DuckDB oracles
IDENT_RE = "[A-Za-z_][A-Za-z0-9_]*"
#: EN alpha-run tokenizer (reference Make_dir/MakeDictAndIndex.cpp:40-64:
#: alpha runs, lowercased, everything else is a delimiter)
ALPHA_RE = "[A-Za-z]+"


def tokens(col: Column | str, pattern: str = IDENT_RE, lowercase: bool = True) -> Column:
    """array<string> of tokens, JVM-side (codegen), no Python."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
        pattern = pattern.lower() if pattern is ALPHA_RE else pattern
    return F.regexp_extract_all(c, F.lit(pattern), F.lit(0))


def token_column(
    text_col: str, pattern: str = IDENT_RE, tokenizer: str | None = None
) -> Column:
    """array<string> token Column for ``text_col`` under the selected
    ``tokenizer`` — the single token-source dispatch shared by
    :func:`explode_tokens` and the narrow tf pass
    (operators/stats.term_frequencies), so every consumer tokenizes
    identically.

    ``tokenizer``: None (default) = JVM regex ``pattern``; 'cjk_bigram' =
    identifier runs + CJK bigrams (JVM); 'dict_cjk' = dictionary
    segmentation, MP max-probability DAG route plus a derived-BEMS HMM
    pass over OOV runs (pure-Python Arrow UDF,
    functions/cjk_segment.MixSegmenter — the reference's MixSegment
    composition, runnable in-sandbox with the bundled mini-dictionary);
    'jieba' = real dictionary segmentation via the jieba package (Arrow
    pandas UDF) — plug-in parity with the reference's cppjieba MixSegment
    on clusters where jieba is installed; raises ImportError otherwise.
    """
    if tokenizer is None:
        return tokens(text_col, pattern)
    if tokenizer == "cjk_bigram":
        return cjk_tokens(text_col)
    if tokenizer == "dict_cjk":
        from .cjk_segment import dict_cjk_tokens_pandas_udf

        return dict_cjk_tokens_pandas_udf()(F.col(text_col))
    if tokenizer == "jieba":
        return jieba_tokens_pandas_udf()(F.col(text_col))
    raise ValueError(
        f"unknown tokenizer {tokenizer!r} "
        "(None, 'cjk_bigram', 'dict_cjk', or 'jieba')"
    )


def explode_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = IDENT_RE,
    with_positions: bool = False,
    tokenizer: str | None = None,
) -> DataFrame:
    """(id_col, term[, pos]) — one row per token occurrence.

    ``pos`` is the 0-based token ordinal (the reference records occurrence
    order implicitly by accumulation order, Make_Page/MakePage.cpp:111-137).

    ``tokenizer`` selects the token source — see :func:`token_column`.
    """
    toks = token_column(text_col, pattern, tokenizer)
    if with_positions:
        return df.select(id_col, F.posexplode(toks).alias("pos", "term"))
    return df.select(id_col, F.explode(toks).alias("term"))


def tokens_pandas_udf():
    """Arrow-vectorized tokenizer — parity/fallback path only.

    Semantics identical to ``tokens()`` with IDENT_RE + lowercase. Built
    lazily (pandas_udf needs an active SparkSession to parse its DDL type).
    """

    @pandas_udf("array<string>")
    def _tok(text: pd.Series) -> pd.Series:
        rx = re.compile(IDENT_RE)
        return text.fillna("").map(lambda s: rx.findall(s.lower()))

    return _tok


def cjk_tokens(col: Column | str) -> Column:
    """CJK-aware tokenizer: identifier runs for Latin text + overlapping
    CJK character bigrams (the standard dictionary-free CJK indexing
    fallback when a segmenter like the reference's cppjieba is unavailable;
    jieba would plug in as a pandas UDF where available).

    JVM-side: extracts identifier runs and CJK runs in one pass, then
    expands each CJK run into bigrams with `transform` over a `sequence`.
    """
    c = F.col(col) if isinstance(col, str) else col
    pattern = "[A-Za-z_][A-Za-z0-9_]*|[\\u4e00-\\u9fff]+"
    runs = F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0))

    def expand(run):
        is_cjk = run.rlike("^[\\u4e00-\\u9fff]+$")
        n = F.length(run)
        bigrams = F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: run.substr(i, F.least(F.lit(2), n - i + 1)),
        )
        return F.when(is_cjk & (n >= 2), bigrams).otherwise(F.array(run))

    return F.flatten(F.transform(runs, expand))


def jieba_tokens_pandas_udf():
    """Dictionary CJK segmentation via jieba — the plug-in parity path for
    the reference's cppjieba MixSegment (dict-trie DAG + HMM,
    /root/reference/include/cppjieba/MixSegment.hpp:46-86).

    jieba is not installable in every environment (this sandbox included);
    where it is absent this factory raises ImportError with a clear message
    and ``cjk_tokens`` (bigram fallback) remains the default CJK path.
    Semantics: lowercase, jieba accurate mode with HMM, keep only tokens
    containing at least one word character (drops whitespace/punctuation).
    """
    try:
        import jieba
    except ImportError as e:  # pragma: no cover - exercised where jieba absent
        raise ImportError(
            "tokenizer='jieba' requires the jieba package (pip install jieba); "
            "without it use the default identifier tokenizer or the "
            "'cjk_bigram' fallback"
        ) from e

    jieba.initialize()  # driver-side warm check; workers re-import lazily

    @pandas_udf("array<string>")
    def _jb(text: pd.Series) -> pd.Series:
        import jieba as _j

        word = re.compile(r"\w", re.UNICODE)
        return text.fillna("").map(
            lambda s: [t for t in _j.cut(s.lower(), HMM=True) if word.search(t)]
        )

    return _jb


def codepoints_pandas_udf():
    """Split into unicode codepoints (reference UTF-8 query char split,
    srpc/WordSearch/server.pb_skeleton.cc:23-46). Python str iteration is
    already codepoint-correct."""

    @pandas_udf("array<string>")
    def _cp(text: pd.Series) -> pd.Series:
        return text.fillna("").map(list)

    return _cp
