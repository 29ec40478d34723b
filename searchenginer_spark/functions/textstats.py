"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting. All pure JVM column expressions (codegen; no UDFs), so each
has an exact SQL oracle.

These extend the reference's capabilities toward large-scale corpus
curation; its closest analog is the ASCII-ratio language predicate
(/root/reference/srpc/WordSearch/server.pb_skeleton.cc:49-57) and the
stop-word machinery (Make_dir/MakeDictAndIndex.cpp:80-150).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker stopwords per language — deterministic n-gram/stopword heuristic.
# zh deliberately has NO ASCII marker list: real Chinese text contains no
# \b-delimited pinyin romanizations, and the former pinyin markers
# ('de', 'le', 'men'...) collided with Romance-language function words —
# French text classified as zh, Chinese as und. zh scores by Han
# codepoint count instead (one hit per CJK char, see lang_scores).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pas"],
    "es": ["el", "la", "los", "es", "una", "que", "por", "con"],
}

#: strip-everything-but-Han pattern (CJK Unified Ideographs block); the
#: SQL oracle twins embed the identical range
CJK_NOT_HAN = "[^一-鿿]"

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "an", "was", "for", "on", "with", "as"]


def _marker_hits(text: Column, markers: list[str]) -> Column:
    """Count of marker-word occurrences (word-bounded, case-insensitive)."""
    pat = "(?i)\\b(" + "|".join(markers) + ")\\b"
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))


def lang_scores(text: Column) -> dict[str, Column]:
    scores = {lang: _marker_hits(text, m) for lang, m in LANG_MARKERS.items()}
    scores["zh"] = F.length(F.regexp_replace(text, CJK_NOT_HAN, ""))
    return scores


def lang_id(text: Column) -> Column:
    """Predicted language = argmax marker-hit count ('und' if all zero).

    Deterministic tie-break: language name ascending wins on equal scores.
    """
    scores = lang_scores(text)
    # array_max compares structs fieldwise: (score, -index) prefers the
    # alphabetically-first language on score ties
    ranked = F.array(
        *[
            F.struct(
                scores[lang].alias("score"),
                F.lit(-i).alias("rank"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(sorted(scores))
        ]
    )
    top = F.array_max(ranked)
    return F.when(top["score"] > 0, top["lang"]).otherwise(F.lit("und"))


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, "\\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: word pieces + digits runs + punctuation each
    count as one token (GPT-style pre-tokenizer regex, simplified)."""
    pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    hits = _marker_hits(text, STOPWORDS_EN)
    toks = ws_token_count(text)
    return F.when(toks > 0, hits / toks).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    toks = ws_token_count(text)
    letters = F.length(F.regexp_replace(text, "\\s+", ""))
    return F.when(toks > 0, letters / toks).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    sane punctuation + sane mean word length. Deterministic column math —
    the shape of Gopher/C4-style quality filters (public recipes)."""
    n_tok = ws_token_count(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(text) >= 0.01, 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    mwl = mean_word_len(text)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.0)
    return (len_ok + stop_ok + punct_ok + mwl_ok) / F.lit(4.0)
