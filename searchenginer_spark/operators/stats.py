"""Corpus term statistics: tf, df, dl, avgdl, N.

Rebuilds the reference's two in-memory passes
(/root/reference/Make_Page/MakePage.cpp:111-194: pass 1 accumulates
``wordCount[doc][word]`` + ``docFrequency[word]``, pass 2 derives weights).

Shuffle shape (r7): per-doc tf is a NARROW map — every token of a doc
already lives in that doc's own row, so grouping by (doc_id, term) needs
no exchange at all. Tokenization stays JVM-side (regexp codegen, identical
to explode_tokens), and the per-doc counting runs as one Arrow batch pass
(dictionary-encode + one argsort per batch, all C/numpy). The old
explode + groupBy(doc_id, term) shape shuffled every token occurrence of
the corpus (partial aggregation cannot combine across docs when doc_id is
in the key) — at 100 TB that exchange was the single widest shuffle of the
whole build DAG, and it is now simply gone. df/dl remain term-/doc-keyed
aggregations over the tf rows, which AQE sizes at runtime.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as _pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import IDENT_RE, token_column


def term_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = IDENT_RE,
    with_positions: bool = False,
    tokenizer: str | None = None,
) -> DataFrame:
    """(doc_id, term, tf[, positions]) — per-document term frequency.

    Reference: Make_Page/MakePage.cpp:111-137 (wordCount[doc][word]++).

    Zero-shuffle shape: tokenize in the JVM (token_column — bit-identical
    to the explode path), then count per doc inside one ``mapInArrow``
    batch pass: pyarrow dictionary-encodes the batch's flat token stream
    (string work in C, each distinct string hashed once), a single stable
    argsort over (row, code) keys groups occurrences, and group lengths
    are the tfs. ``positions`` (0-based token ordinals, ascending — the
    stable sort preserves stream order within each group) fall out of the
    same sort, replacing the old posexplode + sort_array(collect_list)
    aggregation that shuffled and re-sorted every token occurrence.

    ``tokenizer='jieba'`` swaps in real dictionary CJK segmentation on
    clusters with jieba installed (functions.tokenize.jieba_tokens_pandas_udf)
    with no other code changes; 'cjk_bigram' is the dependency-free fallback.
    """
    from ..deploy import ship_package

    ship_package(docs.sparkSession)
    toks = token_column(text_col, pattern, tokenizer)
    # explode(NULL) emits no rows, so a null-text doc must vanish here too:
    # coalesce to the empty array (zero tokens -> zero groups -> absent)
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.coalesce(toks, F.array().cast("array<string>")).alias("_toks"),
    )
    id_type = base.schema["_id"].dataType.simpleString()
    schema = f"{id_col} {id_type}, term string, tf long"
    if with_positions:
        schema += ", positions array<int>"

    def count_batches(batches):
        for b in batches:
            ids = b.column(0)
            tl = b.column(1)
            # compute kernels (not the raw offsets buffer): correct even
            # for sliced/offset list arrays
            counts = _pc.list_value_length(tl).to_numpy(
                zero_copy_only=False
            )
            flat = _pc.list_flatten(tl)
            if len(flat) == 0:
                continue
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            rowidx = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
            # batch-local (row, term-code) key: dictionary indices are
            # int32, so the packed 64-bit key is collision-free
            key = (rowidx << 32) | codes
            order = np.argsort(key, kind="stable")
            ks = key[order]
            gstart = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
            gends = np.concatenate((gstart[1:], [len(ks)]))
            gkey = ks[gstart]
            out_id = ids.take(pa.array(gkey >> 32))
            out_term = enc.dictionary.take(pa.array(gkey & np.int64(0xFFFFFFFF)))
            cols = [out_id, out_term, pa.array(gends - gstart, type=pa.int64())]
            names = [id_col, "term", "tf"]
            if with_positions:
                starts = np.repeat(
                    np.concatenate(([0], np.cumsum(counts)[:-1])), counts
                )
                pos = (np.arange(len(codes), dtype=np.int64) - starts).astype(
                    np.int32
                )
                cols.append(
                    pa.ListArray.from_arrays(
                        pa.array(
                            np.concatenate((gstart, [len(ks)])).astype(np.int32)
                        ),
                        pa.array(pos[order], type=pa.int32()),
                    )
                )
                names.append("positions")
            yield pa.RecordBatch.from_arrays(cols, names)

    return base.mapInArrow(count_batches, schema=schema)


def doc_lengths(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) — document length in tokens (BM25 ``dl``)."""
    return tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))


def document_frequencies(tf: DataFrame, approximate: bool = False) -> DataFrame:
    """(term, df, cf) — document frequency and collection frequency.

    Exact count-distinct is free here because ``tf`` is already grouped by
    (doc_id, term): df = row count per term. Reference computes the same via
    a seen-in-doc set (Make_Page/MakePage.cpp:113-144).

    ``approximate=True`` switches df to a HyperLogLog++ sketch
    (``approx_count_distinct``, 5% rsd) — the scalable alternative when the
    pipeline feeds df straight from raw token rows without the pre-grouped
    tf table (BM25 idf tolerates small df error).
    """
    if approximate:
        return tf.groupBy("term").agg(
            F.approx_count_distinct("doc_id", 0.05).alias("df"),
            F.sum("tf").alias("cf"),
        )
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


def corpus_stats(dl: DataFrame) -> DataFrame:
    """Single-row (n_docs, avgdl). Kept as a DataFrame (not a collected
    scalar) so query plans can cross-join it lazily and the same shape is
    SQL-oracle-expressible."""
    return dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
