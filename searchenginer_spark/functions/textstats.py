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


# --------------------------------------------------------------------------
# Gopher repetition filters (Rae et al. 2021, §A1.1 — public recipe, also
# shipped as RedPajama "quality signals"): per-doc duplicate-line fractions,
# most-frequent-n-gram character fraction (n=2..4), and the fraction of
# characters covered by any duplicated n-gram (n=5..10, overlap-merged so
# characters are never double-counted). Everything below is PER-ROW Catalyst
# higher-order-function math over the standard lowercased identifier token
# stream — zero shuffles, zero Python: the whole signal family scales as a
# narrow map over the corpus. Character fractions count TOKEN characters
# (no whitespace); the SQL oracle twins mirror that definition exactly.


def _sorted_gram_runs(toks: Column, tok_lens: Column, n: int) -> Column:
    """struct(best_cnt, best_chars, dup) for one n: sort the doc's n-gram
    (xxhash64, pos) pairs by hash, then two LINEAR passes over the sorted
    array — `best` is the most frequent gram (ties: larger char length,
    the only tie rule observable in the output frac = cnt*chars/total) via
    a scalar-accumulator fold, and `dup` (every gram position whose gram
    occurs >= 2 times in the doc) via a neighbor-equality scan. Both are
    O(len log len) per row with NO array accumulation in the fold — the
    earlier concat-per-run-close version went quadratic in element copies
    on exactly the boilerplate/spam docs this filter exists to catch."""
    np_ = F.size(toks) - n + 1
    pairs = F.when(
        np_ >= 1,
        F.transform(
            F.sequence(F.lit(0), np_ - 1),
            lambda i: F.struct(
                F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))).alias("h"),
                i.cast("int").alias("p"),
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<h:bigint,p:int>>)"))
    srt = F.array_sort(pairs)
    m = F.size(srt)

    def run_chars(first_p):
        # identical hash => identical token slice (w.h.p.), so the run's
        # char length is the slice sum at its first position
        return F.aggregate(
            F.slice(tok_lens, first_p + 1, n), F.lit(0), lambda a, x: a + x
        )

    # dup positions: element k of the hash-sorted array is duplicated iff
    # it shares its hash with either sorted neighbor (CaseWhen bounds
    # guards keep ANSI element_at in range); output order is hash order —
    # callers re-sort by position before interval-merging
    def _dup_cond(k):
        cur = F.element_at(srt, k + 1)["h"]
        prev_eq = F.when(k > 0, F.element_at(srt, k)["h"] == cur).otherwise(F.lit(False))
        next_eq = F.when(k < m - 1, F.element_at(srt, k + 2)["h"] == cur).otherwise(
            F.lit(False)
        )
        return prev_eq | next_eq

    dup = F.transform(
        F.filter(F.sequence(F.lit(0), m - 1), _dup_cond),
        lambda k: F.element_at(srt, k + 1)["p"],
    )
    dup = F.when(m >= 1, dup).otherwise(F.expr("CAST(array() AS array<int>)"))

    # best run: scalar accumulator only (prev_h, current run length + first
    # position, best count + chars) — close the open run on hash change
    # and once more in the finish lambda
    init = F.struct(
        F.lit(0).cast("bigint").alias("prev_h"),
        F.lit(0).alias("run"),
        F.lit(0).alias("first_p"),
        F.lit(0).alias("best_cnt"),
        F.lit(0).alias("best_chars"),
    )

    def close_run(acc):
        chars = F.when(acc["run"] >= 1, run_chars(acc["first_p"])).otherwise(F.lit(0))
        better = (acc["run"] > acc["best_cnt"]) | (
            (acc["run"] == acc["best_cnt"]) & (chars > acc["best_chars"])
        )
        return F.struct(
            F.when(better, acc["run"]).otherwise(acc["best_cnt"]).alias("best_cnt"),
            F.when(better, chars).otherwise(acc["best_chars"]).alias("best_chars"),
        )

    def merge(acc, e):
        same = (acc["run"] > 0) & (e["h"] == acc["prev_h"])
        closed = close_run(acc)
        return F.when(
            same,
            F.struct(
                acc["prev_h"].alias("prev_h"),
                (acc["run"] + 1).alias("run"),
                acc["first_p"].alias("first_p"),
                acc["best_cnt"].alias("best_cnt"),
                acc["best_chars"].alias("best_chars"),
            ),
        ).otherwise(
            F.struct(
                e["h"].alias("prev_h"),
                F.lit(1).alias("run"),
                e["p"].alias("first_p"),
                closed["best_cnt"].alias("best_cnt"),
                closed["best_chars"].alias("best_chars"),
            )
        )

    best = F.aggregate(srt, init, merge, close_run)
    return F.struct(
        best["best_cnt"].alias("best_cnt"),
        best["best_chars"].alias("best_chars"),
        dup.alias("dup"),
    )


def repetition_signals(
    text: Column,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> dict[str, Column]:
    """dict of named repetition-signal Columns for one text column:

    - ``dup_line_frac``: fraction of the doc's newline-split lines that are
      repeats of an earlier identical line (1 - distinct/total).
    - ``dup_line_char_frac``: fraction of line characters sitting in those
      repeated occurrences (total line chars minus each distinct line
      counted once).
    - ``top_{n}gram_char_frac``: chars of the most frequent n-gram times
      its count, over total token chars (Gopher's "fraction of characters
      contained in the most frequently-occurring n-gram").
    - ``dup_{n}gram_char_frac``: fraction of token chars covered by ANY
      n-gram occurring >= 2 times in the doc, overlapping grams merged via
      the same interval fold ExactSubstr uses (no double counting).

    Pure per-row column math (see module comment); compose with
    :func:`quality_score` and the Gopher thresholds (0.30/0.20,
    0.20/0.18/0.16, 0.15..0.10) to gate documents.
    """
    from ..functions.tokenize import tokens as _tokens
    from .spans import merge_token_spans

    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    distinct_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda a, x: a + F.length(x)
    )
    out: dict[str, Column] = {
        "dup_line_frac": F.when(
            n_lines > 0, (n_lines - n_distinct) / n_lines.cast("double")
        ).otherwise(F.lit(0.0)),
        "dup_line_char_frac": F.when(
            line_chars > 0,
            (line_chars - distinct_chars) / line_chars.cast("double"),
        ).otherwise(F.lit(0.0)),
    }

    toks = _tokens(text)
    tok_lens = F.transform(toks, F.length)
    total_chars = F.aggregate(tok_lens, F.lit(0), lambda a, x: a + x)

    for n in top_ns:
        runs = _sorted_gram_runs(toks, tok_lens, n)
        out[f"top_{n}gram_char_frac"] = F.when(
            total_chars > 0,
            runs["best_cnt"].cast("double") * runs["best_chars"] / total_chars,
        ).otherwise(F.lit(0.0))
    for n in dup_ns:
        runs = _sorted_gram_runs(toks, tok_lens, n)
        spans = merge_token_spans(F.array_sort(runs["dup"]), n)
        covered = F.aggregate(
            spans,
            F.lit(0),
            lambda a, s: a
            + F.aggregate(
                F.slice(tok_lens, s["s"] + 1, s["e"] - s["s"]),
                F.lit(0),
                lambda b, x: b + x,
            ),
        )
        out[f"dup_{n}gram_char_frac"] = F.when(
            total_chars > 0, covered / total_chars.cast("double")
        ).otherwise(F.lit(0.0))
    return out
