"""Result-page snippet generation: first-match context windows.

The reference assembles result pages from doc title/content slices
(/root/reference/Make_Page/MakePage.cpp page records;
srpc/PageSearch/server.pb_skeleton.cc:214-241 returns content for the hit
list). The Spark form: join the k-row hit list to the docs table
(broadcast, like fetch_docs) and compute the snippet as pure JVM column
math — ``locate``/``least``/``substring`` — so the operator stays inside
whole-stage codegen and is exactly reproducible in ANSI SQL
(strpos/least/substr), i.e. oracle-checkable.

Semantics (deterministic, engine-neutral):
  * match position = the smallest 1-based char offset of ANY query term in
    lower(text) (0 means no term occurs — possible for OR-mode hits).
  * match_term = the lexicographically first term whose offset equals the
    match position ('' when no match).
  * snippet = ``width`` chars of the ORIGINAL text starting ``lead`` chars
    before the match (clamped to the text start).
  * matches (``with_matches=True``) = EVERY term's first offset, not just
    the winner — the per-term highlight list the reference's result page
    renders (Make_Page/MakePage.cpp marks each query word). Serialized
    "pos:term|pos:term" sorted by (pos, term): engine-neutral, ANSI-SQL
    reproducible (per-term strpos), and trivially split client-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: "term absent" marker for the position min — larger than any real offset
SENTINEL = 2_147_483_647


def _masked_locate(term: str, lowered: Column) -> Column:
    loc = F.locate(term, lowered)
    return F.when(loc == 0, F.lit(SENTINEL)).otherwise(loc)


def first_match_position(text: Column, terms: list[str]) -> Column:
    """Smallest 1-based offset of any term in lower(text); SENTINEL if none
    (including ``terms == []`` — e.g. a query that tokenized to nothing)."""
    if not terms:
        return F.lit(SENTINEL)
    lowered = F.lower(text)
    locs = [_masked_locate(t, lowered) for t in terms]
    return locs[0] if len(locs) == 1 else F.least(*locs)


def match_spans(text: Column, terms: list[str]) -> Column:
    """Per-term highlight list: "pos:term|pos:term" over the terms that
    occur in lower(text) (first offset each), sorted by (pos, term).
    Empty string when none match. Pure JVM column math — array_sort on
    (pos, term) structs stays inside codegen."""
    if not terms:
        return F.lit("")
    lowered = F.lower(text)
    structs = F.array(
        *[
            F.struct(
                _masked_locate(t, lowered).cast("int").alias("pos"),
                F.lit(t).alias("term"),
            )
            for t in terms
        ]
    )
    present = F.array_sort(F.filter(structs, lambda s: s["pos"] != SENTINEL))
    return F.array_join(
        F.transform(present, lambda s: F.concat_ws(":", s["pos"], s["term"])), "|"
    )


def snippets(
    hits: DataFrame,
    docs: DataFrame,
    terms: list[str],
    width: int = 80,
    lead: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_matches: bool = False,
) -> DataFrame:
    """hits(doc_id, score) -> (doc_id, score, pos, match_term, snippet
    [, matches]).

    The k-row hit side is broadcast, so the docs table is probed, never
    shuffled — same join shape as Bm25CompressedIndex.fetch_docs.
    ``with_matches`` adds the per-term highlight-span column
    (:func:`match_spans`).
    """
    terms = sorted(set(terms))
    t = F.col(text_col)
    lowered = F.lower(t)
    pos = first_match_position(t, terms)
    match_term = F.lit("")
    for term in reversed(terms):
        match_term = F.when(_masked_locate(term, lowered) == pos, F.lit(term)).otherwise(
            match_term
        )
    match_term = F.when(pos == SENTINEL, F.lit("")).otherwise(match_term)
    start = F.greatest(F.lit(1), pos - F.lit(lead))
    cols = [
        id_col,
        "score",
        F.when(pos == SENTINEL, F.lit(0)).otherwise(pos).alias("pos"),
        match_term.alias("match_term"),
        F.when(pos == SENTINEL, t.substr(F.lit(1), F.lit(width)))
        .otherwise(t.substr(start, F.lit(width)))
        .alias("snippet"),
    ]
    if with_matches:
        cols.append(match_spans(t, terms).alias("matches"))
    return (
        F.broadcast(hits)
        .join(docs.select(id_col, text_col), id_col)
        .select(*cols)
        .orderBy(F.desc("score"), F.asc(id_col))
    )
