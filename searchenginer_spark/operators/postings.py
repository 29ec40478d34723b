"""Compressed posting-list construction and decode.

Layout (one row per (term_id, part)):

    term_id    long      dense term id (term_dict)
    part       int       doc-range partition: part = doc_id // docs_per_part
    n          long      number of postings in this row
    docs       binary    varbyte(delta(doc_id)) — delta restarts at every
                         block boundary so blocks decode independently
    tfs        binary    varbyte(tf)
    scores     binary    float64 LE array — precomputed BM25 per-posting
                         impact: idf(df) * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)).
                         k1/b/df/avgdl are build-time constants of a static
                         index, so the full per-(term,doc) score is known at
                         build time (impact-ordered index technique).
    block_last array<long>   last doc_id of each 128-posting block (skip ptr)
    block_max  array<double> max score per block (block-max WAND pruning)
    block_doc_off/block_tf_off array<long> byte offset of each block inside
                         docs/tfs — enables decoding ONLY the blocks a query
                         needs

Reference counterpart: text postings `word \\t (docid weight)*` sorted by
docid (/root/reference/Make_Page/MakePage.cpp:196-215, ReadPage.h:55 —
std::set ordering). The *weight-precomputed-at-build* idea is the
reference's own (it stores tf-idf weights, not tfs); we store exact-float64
BM25 impacts plus tfs.

Skew: the doc-range `part` key IS the salt — a hot term ('int', 'return')
with postings in every doc is split into one bounded group per part
(<= docs_per_part postings each), so no groupBy task ever sees more than
one part of one term. No separate salting pass is needed, and parts are
doc-disjoint so query-side per-part top-k merges exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codec import varbyte_decode, varbyte_encode_raw
from ..plans.bm25_dataframe import B, K1

BLOCK = 128

POSTINGS_SCHEMA = (
    "term_id long, part int, n long, docs binary, tfs binary, scores binary, "
    "block_last array<long>, block_max array<double>, "
    "block_doc_off array<long>, block_tf_off array<long>"
)

POSTING_COLS = [
    "term_id", "part", "n", "docs", "tfs", "scores",
    "block_last", "block_max", "block_doc_off", "block_tf_off",
]

#: positions variant: two extra columns — ``positions`` concats over postings
#: varbyte(delta(token positions)) with the delta restarting at every
#: POSTING (first value absolute), so any block boundary decodes
#: independently; per-posting slicing derives from the tf counts (posting i
#: holds tf_i values). ``block_pos_off`` stores each block's byte offset
#: inside ``positions`` (same skip-pointer pattern as block_doc_off), so
#: phrase queries decode ONLY the blocks holding conjunctive candidates.
#: ``positions`` is kept as the LAST column so plans that don't need
#: positions prune it at the parquet scan (SURVEY §7.4.4).
POSTINGS_POS_SCHEMA = POSTINGS_SCHEMA + ", block_pos_off array<long>, positions binary"


def _encode_part(pdf: pd.DataFrame, n_docs: float, avgdl: float) -> pd.DataFrame:
    """Encode every term's postings for ONE doc-range part.

    One Python invocation per part; everything inside is numpy-vectorized
    across the entire part (varbyte of all terms' postings in one call,
    sliced per term by byte offsets).

    Doc length and the BM25 impact are computed HERE, part-locally:
    ``part = doc_id // docs_per_part``, so this part holds every
    dictionary-term row of its docs and dl is a groupby over the part's own
    rows — no doc_id-keyed dl join (a full extra shuffle of the widest
    table in the DAG) ever happens. n_docs/avgdl arrive as two closed-over
    scalars."""
    part = int(pdf["part"].iloc[0])
    tid_raw = pdf["term_id"].to_numpy()
    did_raw = pdf["doc_id"].to_numpy().astype(np.int64)
    tf_raw = pdf["tf"].to_numpy().astype(np.int64)
    dfv = pdf["df"].to_numpy().astype(np.float64)
    # part-local doc lengths over the dict-filtered token stream
    _, inv = np.unique(did_raw, return_inverse=True)
    dlv = np.bincount(inv, weights=tf_raw)[inv]
    idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
    sc_raw = idf * tf_raw * (K1 + 1.0) / (tf_raw + K1 * (1.0 - B + B * dlv / avgdl))

    order = np.lexsort((did_raw, tid_raw))
    tid = tid_raw[order]
    did = did_raw[order]
    tfv = tf_raw[order].astype(np.uint64)
    sc = sc_raw[order]
    n_all = len(tid)

    with_pos = "positions" in pdf.columns
    if with_pos:
        pos_lists = pdf["positions"].to_numpy()[order]
        flat_pos = (
            np.concatenate([np.asarray(p, dtype=np.uint64) for p in pos_lists])
            if n_all
            else np.empty(0, dtype=np.uint64)
        )
        # delta within each posting's position list (first value absolute)
        counts = tfv.astype(np.int64)
        pstarts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pdeltas = flat_pos.copy()
        if flat_pos.size > 1:
            pdeltas[1:] = flat_pos[1:] - flat_pos[:-1]
        pdeltas[pstarts] = flat_pos[pstarts] if flat_pos.size else pdeltas[pstarts]
        pos_bytes, pos_lens = varbyte_encode_raw(pdeltas)
        # byte offset of each POSTING's position run
        pos_byte_off = np.concatenate(([0], np.cumsum(pos_lens)))
        posting_pos_off = pos_byte_off[pstarts]
        posting_pos_end = pos_byte_off[np.cumsum(counts)]

    gstart = np.flatnonzero(np.concatenate(([True], tid[1:] != tid[:-1])))
    gend = np.concatenate((gstart[1:], [n_all]))
    glen = gend - gstart

    # position of each posting within its term group
    local = np.arange(n_all) - np.repeat(gstart, glen)
    is_block_start = (local % BLOCK) == 0

    deltas = did.astype(np.uint64).copy()
    if n_all > 1:
        deltas[1:] = (did[1:] - did[:-1]).astype(np.uint64)
    deltas[is_block_start] = did[is_block_start].astype(np.uint64)

    doc_bytes, doc_lens = varbyte_encode_raw(deltas)
    tf_bytes, tf_lens = varbyte_encode_raw(tfv)
    doc_off = np.concatenate(([0], np.cumsum(doc_lens)))
    tf_off = np.concatenate(([0], np.cumsum(tf_lens)))

    # block metadata for ALL groups in single vectorized passes (one
    # reduceat over the whole part instead of one per term — the per-term
    # Python loop below only slices precomputed lists): block boundaries
    # never cross term groups because every group starts a new block.
    bstart_idx = np.flatnonzero(is_block_start)
    blk_group = np.searchsorted(gstart, bstart_idx, "right") - 1
    blk_end = np.minimum(bstart_idx + BLOCK, gend[blk_group])
    abl = did[blk_end - 1].tolist()
    abm = np.maximum.reduceat(sc, bstart_idx).tolist() if n_all else []
    ado = (doc_off[bstart_idx] - doc_off[gstart[blk_group]]).tolist()
    ato = (tf_off[bstart_idx] - tf_off[gstart[blk_group]]).tolist()
    if with_pos:
        apo = (posting_pos_off[bstart_idx] - posting_pos_off[gstart[blk_group]]).tolist()
    bof = np.concatenate(
        ([0], np.cumsum(np.bincount(blk_group, minlength=len(gstart))))
    ).tolist()

    rows = []
    for gi, (s, e) in enumerate(zip(gstart.tolist(), gend.tolist())):
        b0, b1 = bof[gi], bof[gi + 1]
        row = (
            int(tid[s]),
            part,
            e - s,
            doc_bytes[doc_off[s] : doc_off[e]].tobytes(),
            tf_bytes[tf_off[s] : tf_off[e]].tobytes(),
            sc[s:e].tobytes(),
            abl[b0:b1],
            abm[b0:b1],
            ado[b0:b1],
            ato[b0:b1],
        )
        if with_pos:
            row = row + (
                apo[b0:b1],
                pos_bytes[posting_pos_off[s] : posting_pos_end[e - 1]].tobytes(),
            )
        rows.append(row)
    cols = POSTING_COLS + (["block_pos_off", "positions"] if with_pos else [])
    return pd.DataFrame(rows, columns=cols)


def build_postings(
    tf: DataFrame,
    dl: DataFrame,
    term_dict: DataFrame,
    stats: DataFrame,
    docs_per_part: int = 1 << 16,
) -> DataFrame:
    """postings(term_id, part, ...) from the stats tables.

    ONE shuffle total: tf rows pick up (term_id, df) from the term_dict
    join (broadcast below the threshold, term-keyed shuffle join above it),
    then hash-exchange once on ``part`` into the Arrow encoder. Doc length
    and the per-posting BM25 impact are computed inside the encoder
    (part-local, see :func:`_encode_part`) — the previous design's
    doc_id-keyed dl join re-shuffled the entire tf table a second time,
    which measured as the non-scaling stage of the build. n_docs/avgdl are
    two scalars collected once from ``stats`` and closed over.

    ``dl`` is accepted for signature stability but never joined.

    Output rows are naturally sorted by term_id within each part (lexsort
    in the encoder), which gives parquet min/max row-group pruning on
    term_id probes.
    """
    from ..deploy import ship_package

    ship_package(tf.sparkSession)
    row = stats.first()
    n_docs, avgdl = float(row["n_docs"]), float(row["avgdl"])
    extra = ["positions"] if "positions" in tf.columns else []
    sp = (
        tf.join(term_dict.select("term", "term_id", "df"), "term")
        .select("term_id", "doc_id", "tf", "df", *extra)
        .withColumn("part", (F.col("doc_id") / F.lit(docs_per_part)).cast("int"))
    )
    schema = POSTINGS_POS_SCHEMA if extra else POSTINGS_SCHEMA

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_part(pdf, n_docs, avgdl)

    return sp.groupBy("part").applyInPandas(encode, schema=schema)


# ------------------------------------------------------------------- decode


def decode_doc_ids(docs: bytes, n: int) -> np.ndarray:
    """Full decode of one row's doc ids (block-local deltas -> absolute)."""
    v = varbyte_decode(docs)
    cs = np.cumsum(v, dtype=np.uint64)
    nblocks = math.ceil(n / BLOCK) if n else 0
    starts = np.arange(0, n, BLOCK)
    # base[b] = prefix sum before block start (so cs - base == within-block cumsum)
    base = cs[starts] - v[starts]
    out = cs - np.repeat(base, np.minimum(BLOCK, n - starts))
    return out.astype(np.int64)


def decode_blocks(
    docs: bytes, block_doc_off: np.ndarray, n: int, needed: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode only ``needed`` block indices -> (doc_ids, global positions).

    This is the skip-pointer read path: byte-slices per block, nothing else
    touched. Positions index into the row's full posting order (for score
    lookup into the fixed-width scores array)."""
    buf = np.frombuffer(docs, dtype=np.uint8)
    offs = np.asarray(block_doc_off, dtype=np.int64)
    ids_parts = []
    pos_parts = []
    for b in needed.tolist():
        lo = offs[b]
        hi = offs[b + 1] if b + 1 < len(offs) else len(buf)
        v = varbyte_decode(buf[lo:hi])
        ids_parts.append(np.cumsum(v, dtype=np.uint64).astype(np.int64))
        pos_parts.append(np.arange(b * BLOCK, b * BLOCK + len(v)))
    if not ids_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(ids_parts), np.concatenate(pos_parts)


def decode_scores(scores: bytes) -> np.ndarray:
    return np.frombuffer(scores, dtype="<f8")


def decode_tfs(tfs: bytes) -> np.ndarray:
    return varbyte_decode(tfs).astype(np.int64)


def decode_positions_flat(
    positions: bytes, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a row's positions blob -> (flat, starts, counts).

    Posting i's sorted absolute positions are ``flat[starts[i] :
    starts[i] + counts[i]]`` (delta-encoded, first value absolute; split
    points fall at cumsum(tfs), no per-posting offsets are stored). The
    flat layout lets callers gather many postings' positions with one
    vectorized fancy-index instead of per-posting Python slicing.
    """
    flat = varbyte_decode(positions)
    counts = np.asarray(tfs, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    cs = np.cumsum(flat, dtype=np.uint64)
    base = np.zeros(len(counts), dtype=np.uint64)
    nz = counts > 0
    base[nz] = cs[starts[nz]] - flat[starts[nz]]
    out_flat = (cs - np.repeat(base, counts)).astype(np.int64)
    return out_flat, starts, counts


def decode_positions_blocks(
    positions: bytes,
    tfs: bytes,
    block_pos_off: np.ndarray,
    block_tf_off: np.ndarray,
    n: int,
    needed: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONLY ``needed`` blocks' positions (and their tfs).

    The positions delta stream restarts at every posting (first value
    absolute), so a block slice decodes independently; per-posting split
    points inside the block come from the block's tf slice. Returns
    ``(flat, starts, counts, posting_idx)``: posting ``posting_idx[i]``
    (GLOBAL index into the row's posting order — the scores-array index)
    has sorted absolute positions ``flat[starts[i] : starts[i]+counts[i]]``.
    This is the phrase path's skip-pointer read: a hot term's position blob
    is never fully decoded when the conjunctive candidate set is small.
    """
    pbuf = np.frombuffer(positions, dtype=np.uint8)
    tbuf = np.frombuffer(tfs, dtype=np.uint8)
    poffs = np.asarray(block_pos_off, dtype=np.int64)
    toffs = np.asarray(block_tf_off, dtype=np.int64)
    flat_parts, count_parts, idx_parts = [], [], []
    for b in needed.tolist():
        thi = toffs[b + 1] if b + 1 < len(toffs) else len(tbuf)
        cnt = varbyte_decode(tbuf[toffs[b] : thi]).astype(np.int64)
        phi = poffs[b + 1] if b + 1 < len(poffs) else len(pbuf)
        deltas = varbyte_decode(pbuf[poffs[b] : phi])
        sl = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        cs = np.cumsum(deltas, dtype=np.uint64)
        base = np.zeros(len(cnt), dtype=np.uint64)
        nz = cnt > 0
        base[nz] = cs[sl[nz]] - deltas[sl[nz]]
        flat_parts.append((cs - np.repeat(base, cnt)).astype(np.int64))
        count_parts.append(cnt)
        idx_parts.append(np.arange(b * BLOCK, b * BLOCK + len(cnt), dtype=np.int64))
    if not flat_parts:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy(), e.copy()
    counts = np.concatenate(count_parts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.concatenate(flat_parts), starts, counts, np.concatenate(idx_parts)


def decode_positions(positions: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Per-posting view of :func:`decode_positions_flat` (tests/debugging)."""
    flat, starts, counts = decode_positions_flat(positions, tfs)
    return [flat[s : s + c] for s, c in zip(starts, counts)]
