"""Fingerprinting: SimHash, MinHash signatures, rolling document fingerprints.

SimHash reproduces the reference's dedup fingerprint
(/root/reference/include/Simhasher.hpp:26-78: top-N TF-IDF keywords, 64-bit
hash per keyword, weighted bit vote, sign -> bit) with two Spark-native
substitutions: an md5-derived 64-bit hash instead of Jenkins lookup3, and
the bit vote as 64 JVM-side conditional sums (whole-stage codegen) instead
of a per-row C++ loop — no Python in the pipeline at all.

Hash family choice: every primitive here derives from md5 (builtin, JVM,
stable across executors) rather than xxhash64 because md5 is ALSO available
in ANSI SQL engines — the DuckDB oracle recomputes the exact same
fingerprints/signatures/buckets, which is what upgrades these operators
from rows-only to full value-checked correctness rows. md5 on short tokens
is a few hundred ns; none of these paths hash document-length strings more
than once per shingle/term.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 64

#: Mersenne prime 2^31 - 1 — modulus of the universal-hash family used for
#: the MinHash function stream ((a*x + b) mod p, Carter-Wegman, public).
MOD31 = (1 << 31) - 1


def md5_int(col: Column | str, nhex: int = 15) -> Column:
    """First ``nhex`` hex chars of md5 as a non-negative long (4 bits/char).

    nhex <= 15 keeps the value under 2^60 so downstream arithmetic never
    overflows a BIGINT (Spark ANSI mode makes overflow a hard failure).
    DuckDB twin: ``('0x' || substring(md5(x), 1, nhex))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, nhex), 16, 10).cast("long")


def minhash_params(num_hashes: int = 64, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs for the (a*x + b) mod 2^31-1 family.

    Fixed seed => the constants are compile-time literals on BOTH engines
    (Spark expressions here, SQL text in the oracle builder).
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MOD31 - 1, size=num_hashes)
    b = rng.integers(0, MOD31 - 1, size=num_hashes)
    return list(zip(a.tolist(), b.tolist()))


def term_hash_bit(term: Column | str, b: int) -> Column:
    """Bit ``b`` (0..63) of the term's 64-bit md5-derived hash.

    Bit b lives in hex nibble b//4 of the md5 digest; extraction is
    substring + base-16 conv + shift/mask — pure codegen, and expressible
    verbatim in the SQL oracle.
    """
    t = F.col(term) if isinstance(term, str) else term
    nib = F.conv(F.substring(F.md5(t), b // 4 + 1, 1), 16, 10).cast("int")
    return F.shiftright(nib, b % 4).bitwiseAND(F.lit(1))


def tfidf_top_keywords(
    tf: DataFrame,
    dft: DataFrame,
    stats: DataFrame,
    top_n: int = 20,
    broadcast_dft: bool | None = None,
    broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    """(doc_id, term, weight): top-N keywords per doc by TF-IDF.

    Reference: KeywordExtractor topN=20 (/root/reference/Make_Page/rcc.cpp:148,
    include/cppjieba/KeywordExtractor.hpp:58-93); idf = log2(N/(df+1)) as in
    Make_Page/MakePage.cpp:166-172. Ties broken by term for determinism.

    Top-N is a grouped aggregate (collect_list -> sort_array -> slice), NOT
    a row_number window: the window would sort every shuffle partition by
    (doc_id, weight), while the aggregate sorts only each doc's own term
    list (bounded by doc length) inside one hash-aggregate pass — the same
    answer for a fraction of the sort work, and no skew on hot partitions.
    Ordering trick: sort ascending on struct(-weight, term) == weight desc
    with term-asc tie-break.

    ``broadcast_dft`` (r7): the tf-side join is the whole pass's only
    corpus-sized exchange, and AQE cannot avoid it — by the time the dft
    aggregate's runtime size is known, the tf shuffle has already started
    (both join inputs materialize as parallel query stages). A broadcast
    of the (term, df) side removes the tf exchange outright, but a hard
    hint on a web-scale vocabulary would OOM (the score_docs trap), so
    the hint is SIZE-GATED per the ngram_lm pattern: None (default)
    hints only when ``dft`` is already persisted (the count is then a
    cache scan, not a recompute) and holds at most ``broadcast_max_rows``
    rows; True/False force. Callers that materialize dft anyway (the
    dedup build, the bench's shared stats tables) get the broadcast for
    free."""
    from pyspark import StorageLevel

    if broadcast_dft is None:
        broadcast_dft = (
            dft.storageLevel != StorageLevel.NONE
            and dft.count() <= broadcast_max_rows
        )
    side = dft.select("term", "df")
    if broadcast_dft:
        side = F.broadcast(side)
    kw = F.struct((-F.col("weight")).alias("nw"), F.col("term").alias("term"))
    return (
        tf.join(side, "term")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .withColumn("weight", F.col("tf") * F.log2(F.col("n_docs") / (F.col("df") + 1)))
        .groupBy("doc_id")
        .agg(F.slice(F.sort_array(F.collect_list(kw)), 1, top_n).alias("_kw"))
        .select("doc_id", F.explode("_kw").alias("_s"))
        .select("doc_id", F.col("_s.term").alias("term"), (-F.col("_s.nw")).alias("weight"))
    )


def simhash(keywords: DataFrame) -> DataFrame:
    """(doc_id, simhash) from (doc_id, term, weight) keyword rows.

    Weighted bit vote, entirely JVM-side: for each of the 64 bits, sum
    +weight where the keyword hash has the bit set, else -weight; the sign
    of each sum becomes the bit. 64 conditional-sum aggregates stay inside
    one hash-aggregate with codegen — this is the vectorized form of
    Simhasher.hpp:51-78.
    """
    # one md5 + TWO base-16 conversions per keyword row, projected BEFORE
    # the aggregate (subexpression elimination does not reach across
    # aggregate expressions): hex chars 1-15 pack into a 60-bit long, char
    # 16 into a nibble; the 64 vote expressions below are then pure long
    # shift/mask — no string work inside the aggregate. Bit numbering is
    # identical to term_hash_bit (hex char b//4+1, bit b%4 of the nibble):
    # char p sits at bits 4*(15-p)..4*(15-p)+3 of the 60-bit value.
    pre = keywords.withColumn("_h", F.md5("term")).select(
        "doc_id",
        "weight",
        F.conv(F.substring("_h", 1, 15), 16, 10).cast("long").alias("_hi"),
        F.conv(F.substring("_h", 16, 1), 16, 10).cast("long").alias("_n16"),
    )

    def _bit(b: int):
        p, s = b // 4 + 1, b % 4
        src, off = ("_hi", 4 * (15 - p) + s) if p <= 15 else ("_n16", s)
        return F.shiftright(F.col(src), off).bitwiseAND(F.lit(1))

    votes = [
        F.sum(
            F.when(_bit(b) == 1, F.col("weight")).otherwise(-F.col("weight"))
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    voted = pre.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: xor == or
    return voted.select("doc_id", fp.alias("simhash"))


def hamming(a, b):
    """Hamming distance between two 64-bit columns (JVM bit_count).
    Accepts column names or Columns in EITHER argument — the old
    first-arg-only dispatch turned hamming(col, "name") into XOR with a
    string LITERAL."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


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

    h_j(s) = (a_j * base(s) + b_j) mod 2^31-1 with base(s) = 28-bit
    md5-derived int; sig[j] = min over shingles. Implemented as num_hashes
    parallel MIN aggregates in ONE hash-aggregate pass (partial aggregation
    + codegen) — no seed cross-join, so the shingle rows are never
    multiplied by num_hashes (a 64x shuffle-volume saving at scale).
    a_j*base + b_j < 2^59 + 2^31, so ANSI-mode overflow is impossible.
    """
    # hash the (possibly long) shingle string ONCE, then derive the
    # num_hashes family by affine mixing — string hashing is the expensive
    # part, the (a*x+b) mod p stream is a few instructions each
    pre = doc_shingles.select("doc_id", md5_int("shingle", 7).alias("_sh"))
    mins = [
        F.min((F.lit(a) * F.col("_sh") + F.lit(b)) % F.lit(MOD31)).alias(f"_h{j}")
        for j, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    return (
        pre.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[F.col(f"_h{j}") for j in range(num_hashes)]).alias("sig"),
        )
    )


def token_shingles(tokens_df: DataFrame, n: int = 3, distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) token n-grams from (doc_id, toks array).

    ``distinct=True`` gives set semantics (required by exact Jaccard).
    MinHash callers pass ``distinct=False``: min over a multiset equals min
    over its set, so the signatures are IDENTICAL while the (doc_id,
    string)-keyed distinct — a full shuffle of every shingle string — is
    skipped entirely; the only shuffle left in the signature pipeline is
    the 64-longs-per-doc partial-aggregated min.
    """
    toks = F.col("toks")
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    out = tokens_df.select("doc_id", F.explode(shingles).alias("shingle"))
    return out.distinct() if distinct else out


def rolling_fingerprints(
    tokens_df: DataFrame, window: int = 8, keep_mod: int = 16
) -> DataFrame:
    """(doc_id, fingerprint) winnowing-style document fingerprints.

    Rolling hash over token windows, keeping hashes = 0 (mod keep_mod) — the
    standard content-defined sampling used for plagiarism/near-dup detection
    (Schleimer et al. winnowing, public). JVM-side: window n-grams hashed
    with the md5-derived 60-bit int (oracle-reproducible), modular selection
    as a filter.
    """
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - window),
            lambda i: md5_int(
                F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(window)])
            ),
        ),
    ).otherwise(F.array(md5_int(F.concat_ws(" ", toks))))
    out = tokens_df.select("doc_id", F.explode(grams).alias("fingerprint"))
    return out.filter(F.pmod(F.col("fingerprint"), F.lit(keep_mod)) == 0).distinct()
