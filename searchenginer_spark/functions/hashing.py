"""Fingerprinting: SimHash, MinHash signatures, rolling document fingerprints.

SimHash reproduces the reference's dedup fingerprint
(/root/reference/include/Simhasher.hpp:26-78: top-N TF-IDF keywords, 64-bit
hash per keyword, weighted bit vote, sign -> bit) with two Spark-native
substitutions: xxhash64 instead of Jenkins lookup3 (both public-domain-style
64-bit hashes; xxhash64 is builtin + stable across executors), and the bit
vote as 64 JVM-side conditional sums (whole-stage codegen) instead of a
per-row C++ loop — no Python in the pipeline at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIMHASH_BITS = 64


def tfidf_top_keywords(
    tf: DataFrame, dft: DataFrame, stats: DataFrame, top_n: int = 20
) -> DataFrame:
    """(doc_id, term, weight): top-N keywords per doc by TF-IDF.

    Reference: KeywordExtractor topN=20 (/root/reference/Make_Page/rcc.cpp:148,
    include/cppjieba/KeywordExtractor.hpp:58-93); idf = log2(N/(df+1)) as in
    Make_Page/MakePage.cpp:166-172. Ties broken by term for determinism.
    """
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("term"))
    return (
        tf.join(dft.select("term", "df"), "term")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .withColumn("weight", F.col("tf") * F.log2(F.col("n_docs") / (F.col("df") + 1)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_n)
        .select("doc_id", "term", "weight")
    )


def simhash(keywords: DataFrame) -> DataFrame:
    """(doc_id, simhash) from (doc_id, term, weight) keyword rows.

    Weighted bit vote, entirely JVM-side: for each of the 64 bits, sum
    +weight where the keyword hash has the bit set, else -weight; the sign
    of each sum becomes the bit. 64 conditional-sum aggregates stay inside
    one hash-aggregate with codegen — this is the vectorized form of
    Simhasher.hpp:51-78.
    """
    h = F.xxhash64("term")
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, F.col("weight"))
            .otherwise(-F.col("weight"))
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    voted = keywords.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: xor == or
    return voted.select("doc_id", fp.alias("simhash"))


def hamming(a, b):
    """Hamming distance between two 64-bit columns (JVM bit_count)."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)) if isinstance(a, str) else a.bitwiseXOR(b))


def simhash_bands(df: DataFrame, fp_col: str = "simhash", n_bands: int = 4) -> DataFrame:
    """Explode a 64-bit fingerprint into (band_idx, band_val) rows.

    Pigeonhole: hamming <= n_bands-1 guarantees at least one identical band,
    so a band-equality self-join finds every pair within the reference's
    hamming<=3 threshold (Simhasher.hpp:80-84) without the O(n^2) scan of
    rcc.cpp:165-183.
    """
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.shiftrightunsigned(F.col(fp_col), i * width).bitwiseAND(F.lit(mask))
            for i in range(n_bands)
        ]
    )
    return df.select("*", F.posexplode(bands).alias("band_idx", "band_val"))


def minhash_signatures(
    doc_shingles: DataFrame, num_hashes: int = 64
) -> DataFrame:
    """(doc_id, sig array<long>) MinHash signatures from (doc_id, shingle).

    h_j(s) = xxhash64(s, j); sig[j] = min over shingles. Implemented as
    num_hashes parallel MIN aggregates in ONE hash-aggregate pass (partial
    aggregation + codegen) — no seed cross-join, so the shingle rows are
    never multiplied by num_hashes (a 64x shuffle-volume saving at scale).
    """
    # hash the (possibly long) shingle string ONCE, then derive the
    # num_hashes family by mixing the 64-bit value with each seed — string
    # hashing is the expensive part, long+seed mixing is a few instructions
    pre = doc_shingles.select("doc_id", F.xxhash64("shingle").alias("_sh"))
    mins = [
        F.min(F.xxhash64("_sh", F.lit(j))).alias(f"_h{j}")
        for j in range(num_hashes)
    ]
    return (
        pre.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[F.col(f"_h{j}") for j in range(num_hashes)]).alias("sig"),
        )
    )


def token_shingles(tokens_df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct token n-grams from (doc_id, toks array)."""
    toks = F.col("toks")
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return tokens_df.select("doc_id", F.explode(shingles).alias("shingle")).distinct()


def rolling_fingerprints(
    tokens_df: DataFrame, window: int = 8, keep_mod: int = 16
) -> DataFrame:
    """(doc_id, fingerprint) winnowing-style document fingerprints.

    Rolling hash over token windows, keeping hashes = 0 (mod keep_mod) — the
    standard content-defined sampling used for plagiarism/near-dup detection
    (Schleimer et al. winnowing, public). JVM-side: window n-grams hashed
    with xxhash64, modular selection as a filter.
    """
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - window),
            lambda i: F.xxhash64(
                F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(window)])
            ),
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks))))
    out = tokens_df.select("doc_id", F.explode(grams).alias("fingerprint"))
    return out.filter(F.pmod(F.col("fingerprint"), F.lit(keep_mod)) == 0).distinct()
