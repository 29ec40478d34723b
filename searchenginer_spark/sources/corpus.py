"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Generates the Iceberg-shaped input table
``corpus(repo, path, commit, lang, content)`` entirely Spark-side:
``spark.range(n)`` + column expressions for metadata, one Arrow pandas UDF
(numpy-vectorized across the whole batch, no per-row Python loops) for
content. Content is a pure function of (seed, doc index) — partitioning,
parallelism, and retries cannot change a single byte, which is what makes
the sha256 per-row invariant and resumability tests meaningful.

Vocabulary deliberately contains the hot terms the north rule calls out
(``int``, ``return``, ``def``, ``for``, ``if``) at Zipf-like frequency plus
a long tail of rare identifiers — this is what exercises the skew handling
(salting) in the postings builder.

Duplicate injection (FIXTURES F1): every id with ``id % DUP_EVERY == 1``
is an exact byte-copy of ``id-1``; every id whose post-dup-redirect base
satisfies ``base % NEARDUP_EVERY == 2`` is ``base-1`` with one identifier
renamed (hamming<=3 on simhash by construction of the top-20-keyword
fingerprint). Deciding the rename on the redirected base keeps the
exact-dup byte-identity invariant even where the two rules chain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EXTS = ["py", "c", "cc", "java", "go"]
LANGS = {"py": "python", "c": "c", "cc": "cpp", "java": "java", "go": "go"}

HOT = ["int", "return", "def", "for", "if", "while", "void", "self", "value", "result"]
N_RARE = 20000  # id0000..id19999 long-tail identifiers
DUP_EVERY = 97
NEARDUP_EVERY = 101

_M = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant — public-domain mixer


def _mix(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uniform u64 from a counter."""
    x = (x + _M).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _content_for(ids: np.ndarray, seed: int) -> list[str]:
    """Vectorized content synthesis for a batch of doc indices."""
    ids = ids.astype(np.uint64)
    base1 = np.where(ids % DUP_EVERY == 1, ids - 1, ids)
    # rename decision comes from the POST-dup-redirect id: an exact dup of a
    # renamed doc must itself be renamed, or the byte-identity invariant for
    # ids with id%DUP_EVERY==1 breaks once chains hit the near-dup rule
    rename = base1 % NEARDUP_EVERY == 2
    src = base1 - np.uint64(1)
    # the near-dup partner must be a stream some doc actually DISPLAYS:
    # when src is itself an exact-dup redirect (src%97==1 shows src-1),
    # follow the redirect — otherwise ids with base1 % (97*101) == 2
    # would have no un-renamed partner in the corpus and the FIXTURES
    # hamming<=3 pair-by-construction invariant silently fails there.
    # One hop suffices: (src-1)%97 == 0 and (src-1)%101 != 2 by modular
    # arithmetic, so the resolved stream is displayed verbatim by doc src
    src = np.where(src % DUP_EVERY == 1, src - np.uint64(1), src)
    base = np.where(rename, src, base1)
    seed64 = np.uint64(seed)

    # token count per doc: 5..200 "lines" of ~6 tokens
    n_lines = 5 + (_mix(base * np.uint64(3) + seed64) % np.uint64(196)).astype(np.int64)
    n_toks = n_lines * 6
    total = int(n_toks.sum())

    doc_idx = np.repeat(np.arange(len(ids)), n_toks)
    pos = np.arange(total, dtype=np.uint64)
    starts = np.repeat(np.cumsum(n_toks) - n_toks, n_toks).astype(np.uint64)
    local_pos = pos - starts

    ctr = base[doc_idx] * np.uint64(1_000_003) + local_pos + seed64 * np.uint64(7919)
    u = _mix(ctr)
    # ~45% hot tokens, else log-uniform (Zipf-ish) rank into the rare tail
    is_hot = (u % np.uint64(100)) < np.uint64(45)
    hot_idx = (_mix(u) % np.uint64(len(HOT))).astype(np.int64)
    frac = (_mix(u + np.uint64(13))).astype(np.float64) / float(2**64)
    rare_rank = np.minimum(
        N_RARE - 1, (np.exp(frac * np.log(N_RARE)) - 1.0).astype(np.int64)
    )

    hot_arr = np.array(HOT)
    tok = np.where(
        is_hot,
        hot_arr[hot_idx],
        np.char.add("id", rare_rank.astype("U8")),
    )
    out: list[str] = []
    off = 0
    for i, n in enumerate(n_toks):
        words = tok[off : off + int(n)].tolist()
        off += int(n)
        # near-dup: rename one identifier occurrence (list, not ndarray —
        # fixed-width numpy U-dtype would truncate the replacement)
        if rename[i]:
            words[-1] = "renamed_ident"
        lines = [" ".join(words[j : j + 6]) for j in range(0, len(words), 6)]
        out.append("\n".join(lines))
    return out


def _content_udf(seed: int):
    @pandas_udf("string")
    def content_udf(ids: pd.Series) -> pd.Series:
        return pd.Series(_content_for(ids.to_numpy(), seed))

    return content_udf


def corpus_meta(spark: SparkSession, n_docs: int) -> DataFrame:
    """(_i, repo, path, commit, lang) — metadata only, pure column math."""
    df = spark.range(n_docs).withColumnRenamed("id", "_i")
    ext = F.element_at(F.array(*[F.lit(e) for e in EXTS]), (F.col("_i") % 5 + 1).cast("int"))
    lang = F.element_at(
        F.array(*[F.lit(LANGS[e]) for e in EXTS]), (F.col("_i") % 5 + 1).cast("int")
    )
    repo = F.concat(F.lit("org"), F.col("_i") % 7, F.lit("/repo"), F.col("_i") % 23)
    path = F.concat(
        F.lit("src/d"), (F.col("_i") / 50).cast("long"), F.lit("/f"), F.col("_i"),
        F.lit("."), ext,
    )
    return df.select(
        "_i", repo.alias("repo"), path.alias("path"), lang.alias("lang")
    ).withColumn("commit", F.substring(F.sha2(F.concat_ws(":", "repo", "path"), 256), 1, 40))


def generate_corpus(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """corpus(repo, path, commit, lang, content) — deterministic, Spark-side."""
    from ..deploy import ship_package

    ship_package(spark)
    return corpus_meta(spark, n_docs).select(
        "repo",
        "path",
        "commit",
        "lang",
        _content_udf(seed)(F.col("_i")).alias("content"),
    )


def build_docs(
    spark: SparkSession, n_docs: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """docs(doc_id, repo, path, commit, lang, content, content_sha256).

    Mints doc_ids over the *metadata-only* corpus (small rows shuffle through
    the rank assignment), then synthesizes content afterwards — at scale you
    never want the heavy content column riding through a range-repartition
    it doesn't influence.
    """
    from ..deploy import ship_package
    from ..operators.ids import assign_sequential_ids

    ship_package(spark)
    meta = corpus_meta(spark, n_docs)
    minted = assign_sequential_ids(meta, ["repo", "path"], "doc_id", num_partitions)
    return (
        minted.withColumn("content", _content_udf(seed)(F.col("_i")))
        .withColumn("content_sha256", F.sha2("content", 256))
        .drop("_i")
        .select("doc_id", "repo", "path", "commit", "lang", "content", "content_sha256")
    )


def mint_doc_ids(corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """docs = corpus + (doc_id, content_sha256, doc_len-ready content).

    doc_id = dense 0-based rank over sorted (repo, path) — the deterministic
    replacement for the reference's file-order 1-based docid
    (/root/reference/Make_Page/rcc.cpp:186-202). Uses the scalable
    sequential-id operator (range partition + offsets, no global window).
    """
    from ..operators.ids import assign_sequential_ids

    out = assign_sequential_ids(corpus, ["repo", "path"], "doc_id", num_partitions)
    return out.withColumn("content_sha256", F.sha2("content", 256))
