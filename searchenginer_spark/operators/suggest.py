"""Keyword suggestion: edit-distance ranking over the term dictionary.

Reference lifecycle (/root/reference/srpc/WordSearch/server.pb_skeleton.cc:
62-188): split query into codepoints, union the dict rows indexed by each
first-character, rank candidates by similarity 1 - lev/maxlen (descending,
lexicographic tie-break, SimilarityComparator.h:63-97), return top-10.

Spark shape: prefix-pruned filter on term_dict (partition/min-max pruning on
the ``prefix`` column = the reference's first-char index), built-in
codepoint-aware ``F.levenshtein``, TakeOrderedAndProject top-k. The
reference pads results to exactly 10 with "" (fixed-width RPC response,
server.pb_skeleton.cc:169-185); ``pad=True`` reproduces that wire shape,
the default returns only real candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest(
    term_dict: DataFrame,
    query: str,
    k: int = 10,
    prefix_prune: bool = True,
    round_to: int | None = None,
    pad: bool = False,
) -> DataFrame:
    """Top-k (term, sim) suggestions for a (possibly misspelled) query term.

    ``pad=True``: always exactly ``k`` rows — missing slots filled with
    ('', 0.0), the reference server's fixed-width response contract."""
    # the dictionary stores lowercased terms/prefixes — fold user input
    # like every other query surface does, or a merely capitalized word
    # prunes away its own first-letter bucket AND pays a phantom edit
    query = query.lower()
    cand = term_dict
    if prefix_prune and query:
        chars = list(dict.fromkeys(query))  # unique codepoints, order kept
        cand = cand.filter(F.col("prefix").isin(chars))
    sim = 1.0 - F.levenshtein(F.col("term"), F.lit(query)) / F.greatest(
        F.length("term"), F.lit(len(query))
    )
    sim = F.round(sim, round_to) if round_to is not None else sim
    out = (
        cand.select("term", sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("term"))
        .limit(k)
    )
    if pad:
        spark = term_dict.sparkSession
        # pad rows sort strictly AFTER every real candidate (explicit pad
        # rank — a '' term would otherwise win lexicographic ties at sim 0)
        filler = spark.createDataFrame([("", 0.0)] * k, "term string, sim double")
        out = (
            out.withColumn("_pad", F.lit(0))
            .unionByName(filler.withColumn("_pad", F.lit(1)))
            .orderBy("_pad", F.desc("sim"), F.asc("term"))
            .limit(k)
            .drop("_pad")
        )
    return out
