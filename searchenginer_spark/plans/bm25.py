"""BM25 top-k retrieval over the compressed block-max inverted index.

Query lifecycle (Spark shape of the reference's
srpc/PageSearch/server.pb_skeleton.cc:154-250 pipeline):

  1. tokenize query driver-side (tiny; cut_weight.cpp analog)
  2. term lookup against term_dict (broadcast-size probe)
  3. postings probe: ``postings.filter(term_id IN qids)`` — parquet
     min/max row-group pruning does the index seek (rows are written
     sorted by term_id within part files)
  4. per-part scoring in ONE Arrow call per part (groupBy('part')
     .applyInPandas): conjunctive galloping intersection with block
     skip-decode, or disjunctive MaxScore with block-max pruning
  5. per-part top-k -> global TakeOrderedAndProject(k)

Parts are doc-disjoint ranges, so per-part top-k then global merge is
exact — this is what lets the scoring stage scale out with zero shared
state (the Spark analog of the reference's single-address-space docids).

Pruning:
  - AND: rarest term drives; other terms decode ONLY blocks whose
    block_last range can contain surviving candidates (skip pointers).
  - OR: MaxScore (Turtle & Flood 1995, public algorithm): threshold tau
    seeded from the highest-upper-bound term's own top-k; terms whose
    summed upper bounds stay below tau become non-essential and are only
    probed at existing candidates via selective block decode — documents
    matching only non-essential terms are provably below tau and never
    decoded. ESSENTIAL terms additionally prune at block granularity
    (block-max pruning, Ding & Suel 2011): doc-id space is segmented at
    the union of their block boundaries, each segment bounded by the sum
    of covering qtf-weighted block maxes + the non-essential suffix
    upper, and segments provably below tau are never varbyte-decoded by
    any term.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import re

from ..functions.tokenize import IDENT_RE
from ..operators.postings import (
    BLOCK,
    decode_blocks,
    decode_doc_ids,
    decode_positions_blocks,
    decode_positions_flat,
    decode_scores,
    decode_tfs,
)
from .bm25_dataframe import tokenize_query


def _decode_candidate_blocks(g: dict, cand: np.ndarray):
    """THE shared skip-decode walk: decode only the blocks of posting row
    ``g`` whose block_last range can contain a SORTED candidate id — the
    single galloping-intersection read pattern behind every conjunctive
    probe (AND loop, boolean MUST loop, positional prologue, NOT exclusion,
    SHOULD probes). Returns (ids, pos): decoded doc ids (sorted) and their
    global posting indices within the row (the scores-array index)."""
    block_last = np.asarray(g["block_last"], dtype=np.int64)
    bidx = np.unique(np.searchsorted(block_last, cand))
    bidx = bidx[bidx < len(block_last)]
    return decode_blocks(
        g["docs"], np.asarray(g["block_doc_off"], dtype=np.int64), g["n"], bidx
    )


def _drop_excluded(cand: np.ndarray, scores: np.ndarray, neg: list):
    """Remove candidates appearing in any NEGATIVE term's postings.

    Runs BEFORE per-part top-k truncation (exactness: an excluded doc must
    never occupy a top-k slot another doc should get). Negative terms use
    the same block skip-decode as conjunctive probes — only blocks that can
    contain surviving candidates are touched."""
    for g in neg:
        if cand.size == 0:
            break
        ids, _ = _decode_candidate_blocks(g, cand)
        keep = ~_member_sorted(cand, ids)
        cand, scores = cand[keep], scores[keep]
    return cand, scores


def _score_part_and(
    groups: list, qtf: dict, n_terms: int, k: int, round_to=None, neg=(), allow=None
):
    """Conjunctive scoring for one part. groups: list of posting rows.

    When ``round_to`` is set, per-part top-k truncation happens on the
    ROUNDED score (doc_id tie-break) — the same key the global merge sorts
    by — so a rounded near-tie can never be pruned below a doc it ties with.

    ``neg``: posting rows of excluded (NOT) terms; matching docs are dropped
    before truncation. ``allow``: sorted array of permitted doc ids
    (metadata filter) — applied at the driver-term step so every downstream
    block probe shrinks.
    """
    if len(groups) < n_terms:
        return [], []
    groups = sorted(groups, key=lambda g: g["n"])  # rarest first
    drv = groups[0]
    cand = decode_doc_ids(drv["docs"], drv["n"])
    cand_score = decode_scores(drv["scores"]) * qtf[drv["term_id"]]
    if allow is not None:
        mask = _member_sorted(cand, allow)
        cand, cand_score = cand[mask], cand_score[mask]
    for g in groups[1:]:
        if cand.size == 0:
            return [], []
        ids, pos = _decode_candidate_blocks(g, cand)
        loc = np.searchsorted(ids, cand)
        loc_c = np.minimum(loc, max(len(ids) - 1, 0))
        hit = ids.size > 0
        member = (ids[loc_c] == cand) if hit else np.zeros(len(cand), dtype=bool)
        cand = cand[member]
        if cand.size == 0:
            return [], []
        sc = decode_scores(g["scores"])
        cand_score = cand_score[member] + sc[pos[loc_c[member]]] * qtf[g["term_id"]]
    if neg:
        cand, cand_score = _drop_excluded(cand, cand_score, neg)
        if cand.size == 0:
            return [], []
    if round_to is not None:
        cand_score = np.round(cand_score, round_to)
    return _topk(cand, cand_score, k)


def _score_part_or(groups: list, qtf: dict, k: int, round_to=None, neg=(), allow=None):
    """Disjunctive MaxScore scoring for one part.

    With ``round_to`` set, the MaxScore threshold tau gets a one-ulp-of-the-
    rounding slack (10^-round_to) so a doc whose unrounded score is below
    tau but whose ROUNDED score ties the kth result is never pruned, and the
    final per-part truncation uses the rounded key (global-merge key).

    ``neg``: posting rows of excluded (NOT) terms. ``allow``: sorted array
    of permitted doc ids (metadata filter). Either one disables the tau
    seed (a seed drawn from scores of docs that may later be dropped could
    over-prune legitimate results) — plain full-union scoring, then the
    dropped docs leave before truncation. Correctness over pruning.
    """
    uppers = np.array(
        [qtf[g["term_id"]] * max(g["block_max"]) for g in groups], dtype=np.float64
    )
    order = np.argsort(-uppers)
    groups = [groups[i] for i in order]
    uppers = uppers[order]

    # tau seed: top-k of the single highest-impact term
    g0 = groups[0]
    s0 = decode_scores(g0["scores"]) * qtf[g0["term_id"]]
    if s0.size >= k and not neg and allow is None:
        tau = np.partition(s0, s0.size - k)[s0.size - k]
        if round_to is not None:
            tau -= 10.0 ** (-round_to)
    else:
        tau = -np.inf
    # non-essential = maximal suffix with summed uppers strictly below tau
    suffix = np.cumsum(uppers[::-1])[::-1]
    ess_end = len(groups)
    for i in range(len(groups) - 1, 0, -1):
        if suffix[i] < tau:
            ess_end = i
        else:
            break
    non_ess_upper = suffix[ess_end] if ess_end < len(groups) else 0.0

    # union of essential terms (these dominate the scores). With a finite
    # tau, prune at BLOCK granularity first — block-max pruning (Ding &
    # Suel 2011, public algorithm), vectorized: doc-id space is segmented
    # at the union of the essential terms' block boundaries (block i of a
    # term covers (block_last[i-1], block_last[i]], so boundaries define
    # the segments exactly); a segment's upper bound is the sum of the
    # covering blocks' qtf-weighted block_max plus the non-essential
    # suffix upper, and a segment strictly below tau is skipped — no
    # essential term varbyte-decodes any block all of whose segments are
    # dead, and candidates landing in a dead segment (a decoded block can
    # straddle dead and live segments) are dropped BEFORE scoring so every
    # surviving candidate is fully scored. Same tau-slack contract as the
    # seed: with round_to, tau already carries the one-ulp slack.
    ess = groups[:ess_end]
    seg_ends = None
    if np.isfinite(tau):
        bl = [np.asarray(g["block_last"], dtype=np.int64) for g in ess]
        bm = [
            np.asarray(g["block_max"], dtype=np.float64) * qtf[g["term_id"]]
            for g in ess
        ]
        seg_ends = np.unique(np.concatenate(bl))
        seg_upper = np.full(seg_ends.size, non_ess_upper, dtype=np.float64)
        for bl_t, bm_t in zip(bl, bm):
            idx = np.searchsorted(bl_t, seg_ends)
            valid = idx < bl_t.size  # segments past a term's last doc: +0
            seg_upper[valid] += bm_t[idx[valid]]
        seg_alive = seg_upper >= tau
        live_ends = seg_ends[seg_alive]
        if live_ends.size == 0:
            return [], []
        ids_all, sc_all = [], []
        for g, bl_t in zip(ess, bl):
            bidx = np.unique(np.searchsorted(bl_t, live_ends))
            bidx = bidx[bidx < bl_t.size]
            ids, pos = decode_blocks(
                g["docs"],
                np.asarray(g["block_doc_off"], dtype=np.int64),
                g["n"],
                bidx,
            )
            ids_all.append(ids)
            sc_all.append(decode_scores(g["scores"])[pos] * qtf[g["term_id"]])
    else:
        ids_all, sc_all = [], []
        for g in ess:
            ids_all.append(decode_doc_ids(g["docs"], g["n"]))
            sc_all.append(decode_scores(g["scores"]) * qtf[g["term_id"]])
    cand, inv = np.unique(np.concatenate(ids_all), return_inverse=True)
    score = np.zeros(cand.size, dtype=np.float64)
    np.add.at(score, inv, np.concatenate(sc_all))
    if seg_ends is not None and cand.size:
        # every posting doc id <= its term's last block_last <= seg_ends[-1]
        keep = seg_alive[np.searchsorted(seg_ends, cand)]
        cand, score = cand[keep], score[keep]
        if cand.size == 0:
            return [], []
    if allow is not None:
        mask = _member_sorted(cand, allow)
        cand, score = cand[mask], score[mask]
        if cand.size == 0:
            return [], []

    # non-essential terms: probe only at existing candidates, block-sliced
    for g in groups[ess_end:]:
        score += qtf[g["term_id"]] * _probe_scores(g, cand)

    if neg:
        cand, score = _drop_excluded(cand, score, neg)
        if cand.size == 0:
            return [], []
    if round_to is not None:
        score = np.round(score, round_to)
    return _topk(cand, score, k)


def _topk(cand: np.ndarray, score: np.ndarray, k: int):
    """Deterministic per-part top-k: (score desc, doc_id asc) — the global
    merge's exact sort key. Unlike a bare argpartition cut, ties AT the kth
    score keep the lowest doc ids (argpartition picks an arbitrary tie
    subset, which can disagree with the SQL oracle's ORDER BY ... , doc_id
    whenever the boundary lands inside a tie group). Cost: one partition
    pass + a lexsort over only the >= kth-score survivors (k + ties)."""
    if cand.size > k:
        kth = np.partition(score, cand.size - k)[cand.size - k]
        mask = score >= kth
        cand, score = cand[mask], score[mask]
        order = np.lexsort((cand, -score))[:k]
    else:
        order = np.lexsort((cand, -score))
    return cand[order].tolist(), score[order].tolist()


def _member_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Boolean mask: which values of ``a`` occur in SORTED array ``b``."""
    if b.size == 0:
        return np.zeros(a.size, dtype=bool)
    loc = np.minimum(np.searchsorted(b, a), b.size - 1)
    return b[loc] == a


def _gather_runs(
    flat: np.ndarray, starts: np.ndarray, counts: np.ndarray, rows: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate flat[starts[r] : starts[r]+counts[r]] for r in rows.

    Returns (values, owner) where owner[i] is the index into ``rows`` the
    value came from. One fancy-index over the whole part — no per-row loop.
    """
    c = counts[rows]
    total = int(c.sum())
    if total == 0:
        return np.empty(0, dtype=flat.dtype), np.empty(0, dtype=np.int64)
    ends = np.cumsum(c)
    owner = np.repeat(np.arange(rows.size, dtype=np.int64), c)
    within = np.arange(total, dtype=np.int64) - np.repeat(ends - c, c)
    return flat[starts[rows][owner] + within], owner


def _probe_scores(g: dict, cand: np.ndarray) -> np.ndarray:
    """Impact scores of posting row ``g`` at SORTED candidate doc ids
    (0.0 where the doc is absent), decoding ONLY the blocks whose
    block_last range can contain a candidate — the shared skip-decode
    probe under OR non-essential terms and boolean SHOULD clauses."""
    out = np.zeros(cand.size, dtype=np.float64)
    ids, pos = _decode_candidate_blocks(g, cand)
    if ids.size == 0:
        return out
    loc = np.minimum(np.searchsorted(ids, cand), ids.size - 1)
    member = ids[loc] == cand
    sc = decode_scores(g["scores"])
    out[member] = sc[pos[loc[member]]]
    return out


def _phrase_match(by_tid: dict, slots: list[int]):
    """Exact-phrase matching for one part: conjunctive intersection, then
    positional adjacency verification (slot i's term must appear at
    position p+i for some p). Rows must carry the `positions` column.

    Fully vectorized across ALL candidate docs at once (no per-candidate
    Python loop — SURVEY §7.4.3): each slot's positions become composite
    keys (candidate_row << 32) | (pos - slot + offset); a phrase start
    survives iff its key appears in every slot's sorted key array, so the
    adjacency check is len(slots)-1 sorted-membership passes over flat
    arrays. A hot phrase with thousands of candidates costs the same numpy
    passes as a rare one. Reads are skip-pointer-bounded end to end: doc ids
    of non-driver terms AND every term's positions decode per-block
    (block_doc_off / block_pos_off), so a hot term's blobs are never fully
    decoded when the conjunctive candidate set is small.

    Returns (cand, idxs): sorted surviving doc ids, and for each distinct
    term the posting-row index of every survivor (for score gathering
    without a second decode). (empty, {}) when nothing matches."""
    empty = np.empty(0, dtype=np.int64)
    if any(t not in by_tid for t in slots):
        return empty, {}
    distinct = sorted(dict.fromkeys(slots), key=lambda t: by_tid[t]["n"])
    cand, idxs, pos_data = _candidate_positions(by_tid, distinct)
    if cand.size == 0:
        return empty, {}
    # keys are strictly increasing per slot: owner asc, positions asc within
    offset = len(slots)  # keeps pos - slot_i strictly positive
    keys = None
    for i, t in enumerate(slots):
        flat, starts, counts, rows_t = pos_data[t]
        vals, owner = _gather_runs(flat, starts, counts, rows_t)
        keys_i = (owner << 32) | (vals - i + offset)
        keys = keys_i if keys is None else keys[_member_sorted(keys, keys_i)]
        if keys.size == 0:
            return empty, {}
    surv = np.unique(keys >> 32)  # candidate rows with >=1 phrase start
    return cand[surv], {t: idxs[t][surv] for t in distinct}


def _candidate_positions(by_tid: dict, distinct: list[int]):
    """Shared prologue of the positional matchers (phrase, NEAR):
    conjunctive intersection over ``distinct`` term_ids (assumed
    rarest-first; block skip-decode, identical read pattern to
    _score_part_and), then each term's positions gathered for the
    surviving candidates only.

    Returns (cand, idxs, pos_data) where idxs[t] is each candidate's
    posting-row index within term t's row and pos_data[t] =
    (flat, starts, counts, rows_t) addresses t's decoded positions per
    candidate. cand is empty when the intersection is."""
    empty = np.empty(0, dtype=np.int64)
    drv = by_tid[distinct[0]]
    cand = decode_doc_ids(drv["docs"], drv["n"])
    decoded = {distinct[0]: (cand, np.arange(cand.size, dtype=np.int64))}
    for t in distinct[1:]:
        if cand.size == 0:
            return empty, {}, {}
        g = by_tid[t]
        ids, pos = _decode_candidate_blocks(g, cand)
        decoded[t] = (ids, pos)
        if ids.size == 0:
            return empty, {}, {}
        loc = np.minimum(np.searchsorted(ids, cand), ids.size - 1)
        cand = cand[ids[loc] == cand]
    if cand.size == 0:
        return empty, {}, {}
    # GLOBAL posting index of every candidate within each term's posting row
    # (the scores-array index); each term's decoded ids are a superset of the
    # final candidate set, so a sorted searchsorted lookup is exact
    idxs = {}
    for t in distinct:
        ids, pos = decoded[t]
        idxs[t] = pos[np.searchsorted(ids, cand)]
    # positions: decode ONLY the blocks containing candidate postings via
    # block_pos_off skip pointers (full decode for legacy rows without them)
    pos_data = {}
    for t in distinct:
        g = by_tid[t]
        bpo = g.get("block_pos_off")
        if bpo is not None:
            flat, starts, counts, posting_idx = decode_positions_blocks(
                g["positions"],
                g["tfs"],
                np.asarray(bpo, dtype=np.int64),
                np.asarray(g["block_tf_off"], dtype=np.int64),
                g["n"],
                np.unique(idxs[t] // BLOCK),
            )
            rows_t = np.searchsorted(posting_idx, idxs[t])
        else:
            flat, starts, counts = decode_positions_flat(
                g["positions"], decode_tfs(g["tfs"])
            )
            rows_t = idxs[t]
        pos_data[t] = (flat, starts, counts, rows_t)
    return cand, idxs, pos_data


def _near_match(by_tid: dict, terms: list[int], window: int, ordered: bool = False):
    """Proximity matching for one part (window in token positions).

    Unordered (default): a candidate survives iff one position per
    distinct term can be chosen with max - min <= window. Anchor
    formulation: the chosen minimum is some term's position p, so a
    candidate matches iff SOME position p (of any query term) has every
    term present in [p, p + window]. Each term contributes ONE sorted
    range-membership pass (two searchsorteds) over composite
    (owner << 32 | pos) keys.

    Ordered: positions p_1 < p_2 < ... < p_k following ``terms``' order
    with p_k - p_1 <= window. Greedy chain: anchor on term_1's positions,
    then for each next term take its SMALLEST position after the current
    one (one searchsorted per term) — greedy minimizes p_k for every
    anchor, so the span test is exact.

    Both are fully vectorized across all candidates (no per-candidate
    Python loop), with the same skip-decode read pattern as _phrase_match
    via _candidate_positions. Returns (cand, idxs) like _phrase_match."""
    empty = np.empty(0, dtype=np.int64)
    if any(t not in by_tid for t in terms):
        return empty, {}
    distinct = sorted(dict.fromkeys(terms), key=lambda t: by_tid[t]["n"])
    cand, idxs, pos_data = _candidate_positions(by_tid, distinct)
    if cand.size == 0:
        return empty, {}
    keys_t = {}
    for t in distinct:
        flat, starts, counts, rows_t = pos_data[t]
        vals, owner = _gather_runs(flat, starts, counts, rows_t)
        keys_t[t] = (owner << 32) | vals  # sorted: owner asc, pos asc within
    if ordered:
        anchors = keys_t[terms[0]]
        cur = anchors.copy()
        alive = np.ones(anchors.size, dtype=bool)
        for t in terms[1:]:
            kt = keys_t[t]
            nxt = np.searchsorted(kt, cur, side="right")
            ok = alive & (nxt < kt.size)
            nkey = kt[np.minimum(nxt, kt.size - 1)]
            ok &= (nkey >> 32) == (cur >> 32)  # same candidate doc
            cur = np.where(ok, nkey, cur)
            alive = ok
        alive &= (cur - anchors) <= window  # same owner -> key diff == span
        surv = np.unique(anchors[alive] >> 32)
    else:
        anchors = np.concatenate(list(keys_t.values()))
        ok = np.ones(anchors.size, dtype=bool)
        for t in distinct:
            lo = np.searchsorted(keys_t[t], anchors, side="left")
            hi = np.searchsorted(keys_t[t], anchors + window, side="right")
            ok &= lo < hi  # term t has a position in [p, p+window] here
        surv = np.unique(anchors[ok] >> 32)
    return cand[surv], {t: idxs[t][surv] for t in distinct}


def _score_part_phrase(groups: list, slots: list[int], qtf: dict, k: int, round_to=None):
    """Exact-phrase top-k for one part: _phrase_match survivors scored as the
    BM25 sum over the phrase's distinct terms (qtf weights included), using
    the posting indices the match already resolved — no second decode."""
    by_tid = {g["term_id"]: g for g in groups}
    out_ids, idxs = _phrase_match(by_tid, slots)
    if out_ids.size == 0:
        return [], []
    out_scores = np.zeros(out_ids.size, dtype=np.float64)
    for t, rows in idxs.items():
        out_scores += qtf[t] * decode_scores(by_tid[t]["scores"])[rows]
    if round_to is not None:
        out_scores = np.round(out_scores, round_to)
    return _topk(out_ids, out_scores, k)


def _score_part_bool(
    groups: list,
    must: list[int],
    should: list[int],
    qtf: dict,
    k: int,
    phrases: tuple = (),
    round_to=None,
    neg=(),
    allow=None,
    nears: tuple = (),
):
    """Composed boolean scoring for one part (the search_query engine):

      must     conjunctive term_ids — every one must match (rarest-first
               galloping intersection with block skip-decode)
      phrases  tuples of slot term_ids — each must match exactly (adjacent,
               in order); survivors tighten the allow set
      nears    (term_ids tuple, window) pairs — each must match within the
               unordered window; survivors tighten the allow set
      should   additive term_ids — probed at the surviving candidates only
               (block-sliced), contributing score where present
      neg      posting rows of excluded terms (dropped pre-truncation)
      allow    sorted permitted doc ids (metadata facet), or None

    Score = sum over every distinct positive atom present (must + phrase
    terms + should), each weighted by qtf — must/phrase terms are scored by
    the same skip-decode probe as should terms, so no contribution is ever
    double-counted when a term plays several roles.

    Candidate generation: must-intersection if any must terms; else the
    phrase-survivor set; else a pure disjunction (delegated to
    _score_part_or, MaxScore pruning intact)."""
    by_tid = {g["term_id"]: g for g in groups}
    if any(t not in by_tid for t in must):
        return [], []
    positional = [(slots, None) for slots in phrases] + [
        (terms, w) for terms, w in nears
    ]
    for slots, w in positional:
        if w is None:
            surv, _ = _phrase_match(by_tid, list(slots))
        else:
            surv, _ = _near_match(by_tid, list(slots), w)
        if surv.size == 0:
            return [], []
        allow = surv if allow is None else allow[_member_sorted(allow, surv)]
        if allow.size == 0:
            return [], []

    if must:
        order = sorted(must, key=lambda t: by_tid[t]["n"])
        drv = by_tid[order[0]]
        cand = decode_doc_ids(drv["docs"], drv["n"])
        if allow is not None:
            cand = cand[_member_sorted(cand, allow)]
        for t in order[1:]:
            if cand.size == 0:
                return [], []
            ids, _pos = _decode_candidate_blocks(by_tid[t], cand)
            cand = cand[_member_sorted(cand, ids)]
    elif positional:
        cand = allow  # ⊆ positional survivors: every candidate matched them
    else:
        sh = [by_tid[t] for t in should if t in by_tid]
        if not sh:
            return [], []
        return _score_part_or(sh, qtf, k, round_to, neg, allow)
    if cand.size == 0:
        return [], []

    phrase_terms = [t for slots, _w in positional for t in slots]
    score = np.zeros(cand.size, dtype=np.float64)
    for t in dict.fromkeys([*must, *phrase_terms, *should]):
        g = by_tid.get(t)
        if g is not None:
            score += qtf[t] * _probe_scores(g, cand)
    if neg:
        cand, score = _drop_excluded(cand, score, neg)
        if cand.size == 0:
            return [], []
    if round_to is not None:
        score = np.round(score, round_to)
    return _topk(cand, score, k)


def _score_part_near(
    groups: list, terms: list[int], window: int, qtf: dict, k: int,
    round_to=None, ordered: bool = False,
):
    """Proximity top-k for one part: _near_match survivors scored as the
    BM25 sum over the distinct terms (qtf weights included), using the
    posting indices the match already resolved — no second decode."""
    by_tid = {g["term_id"]: g for g in groups}
    out_ids, idxs = _near_match(by_tid, terms, window, ordered)
    if out_ids.size == 0:
        return [], []
    out_scores = np.zeros(out_ids.size, dtype=np.float64)
    for t, rows in idxs.items():
        out_scores += qtf[t] * decode_scores(by_tid[t]["scores"])[rows]
    if round_to is not None:
        out_scores = np.round(out_scores, round_to)
    return _topk(out_ids, out_scores, k)


def _lev_within(a: str, b: str, maxd: int) -> int:
    """Levenshtein distance of ``a``/``b`` when it is <= ``maxd``, else
    ``maxd + 1`` (any value past the cutoff is equivalent). Classic DP
    with a row-min early abandon — once every cell of a row exceeds
    ``maxd`` no later row can come back under it. Matches Spark's
    ``levenshtein`` on the same inputs (plain unit-cost edits)."""
    if abs(len(a) - len(b)) > maxd:
        return maxd + 1
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        row_min = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            if v < row_min:
                row_min = v
        if row_min > maxd:
            return maxd + 1
        prev = cur
    return prev[-1] if prev[-1] <= maxd else maxd + 1


_REGEX_META = set(".^$*+?{}[]|()\\")


def _regex_literal_prefix(pattern: str) -> str:
    """Longest literal prefix of a regex (chars before the first
    metacharacter). A quantifier (* ? {) modifies its PRECEDING char, so
    that char is dropped from the literal run — 'abc*' has prefix 'ab'.

    NOT alternation-safe on its own: 'cat|dog' would yield 'cat', which
    is a prefix of only the first branch — callers must split top-level
    alternations first (:func:`_split_top_level_alternation`) and take
    each branch's prefix separately."""
    out: list[str] = []
    for ch in pattern:
        if ch in _REGEX_META:
            if ch in "*?{" and out:
                out.pop()
            break
        out.append(ch)
    return "".join(out)


def _split_top_level_alternation(pattern: str) -> list[str]:
    """Branches of a top-level alternation — '|' at paren depth 0, outside
    any character class, not backslash-escaped. ``[pattern]`` itself when
    there is none. 'cat|dog' -> ['cat', 'dog']; 'ca(t|d)' -> ['ca(t|d)']
    (the group-internal '|' is the group's business, 'ca' is still a
    mandatory prefix of the whole pattern)."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    in_class = False
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            buf.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


def _is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _facet_num(b: str):
    """Parsed numeric bound as int when integral (so the literal's type
    matches integer columns and the comparison pushes down to parquet
    without a cast), else float."""
    f = float(b)
    return int(f) if f.is_integer() else f


def apply_facets(docs: DataFrame, facets: list[tuple[str, tuple]]) -> DataFrame:
    """Filter ``docs`` by parsed facet constraints (functions/queryparse):
    ("eq", v) equality, ("in", [vs]) any-of, ("range", lo, hi) inclusive
    bounds with "*" unbounded. Constraints are conjunctive — repeated
    fields must ALL hold.

    Comparison typing: a NUMERIC column with numeric values/bounds is
    compared natively (no cast — the predicate reaches the parquet scan's
    PushedFilters; a cast on the column side would block pushdown and
    force a full-column scan at 100 TB). Otherwise values compare on the
    string form (eq/in) or lexicographically (range); [* TO *] = field is
    non-null."""
    from pyspark.sql.types import NumericType

    for col, con in facets:
        c = F.col(col)
        numeric_col = col in docs.columns and isinstance(
            docs.schema[col].dataType, NumericType
        )
        kind = con[0]
        if kind == "eq":
            if numeric_col and _is_number(con[1]):
                docs = docs.filter(c == _facet_num(con[1]))
            else:
                docs = docs.filter(c.cast("string") == con[1])
        elif kind == "in":
            vals = list(con[1])
            if numeric_col and all(_is_number(v) for v in vals):
                docs = docs.filter(c.isin([_facet_num(v) for v in vals]))
            else:
                docs = docs.filter(c.cast("string").isin(vals))
        else:
            lo, hi = con[1], con[2]
            given = [b for b in (lo, hi) if b != "*"]
            if not given:
                docs = docs.filter(c.isNotNull())
                continue
            if all(_is_number(b) for b in given):
                # try_cast, not cast: under Spark 4 ANSI mode a plain cast
                # hard-fails the whole query on the first non-numeric row
                # of a string column — a range facet must FILTER such rows
                v = c if numeric_col else c.try_cast("double")
                if lo != "*":
                    docs = docs.filter(v >= _facet_num(lo))
                if hi != "*":
                    docs = docs.filter(v <= _facet_num(hi))
            else:
                v = c.cast("string")
                if lo != "*":
                    docs = docs.filter(v >= lo)
                if hi != "*":
                    docs = docs.filter(v <= hi)
    return docs


def _spec_tokens(spec, mode: str, pattern: str) -> dict:
    """Tokenize a parsed QuerySpec's clauses under the index's term pattern.
    Folds mode in: bare terms become MUST in mode='and'. ``all`` is the
    raw-token union the dictionary probe must cover."""
    def toks(words: list[str]) -> list[str]:
        out: list[str] = []
        for w in words:
            out.extend(re.findall(pattern, w.lower()))
        return out

    must_raw = toks(spec.must) + (toks(spec.should) if mode == "and" else [])
    should_raw = toks(spec.should) if mode != "and" else []
    phrase_toks = [p for p in (re.findall(pattern, s.lower()) for s in spec.phrases) if p]
    near_toks = [
        (p, w)
        for p, w in ((re.findall(pattern, s.lower()), w) for s, w in spec.nears)
        if p
    ]
    exc_raw = sorted(set(toks(spec.exclude)))
    positive = (
        must_raw
        + should_raw
        + [t for p in phrase_toks for t in p]
        + [t for p, _w in near_toks for t in p]
    )
    return {
        "must": must_raw,
        "should": should_raw,
        "phrases": phrase_toks,
        "nears": near_toks,
        "exc": exc_raw,
        "positive": positive,
        # term^B occurrences: tokenized word + its boost (qtf adjustment)
        "boosts": [(toks([w]), b) for w, b in spec.boosts],
        "all": set(positive) | set(exc_raw),
    }


def _compile_spec(
    tk: dict,
    prefixes: list[str],
    tid: dict,
    expand,
    fuzzies=(),
    expand_fuzzy=None,
    regexps=(),
    expand_regexp=None,
) -> dict | None:
    """Resolve a tokenized spec (_spec_tokens) to scorer inputs for
    _score_part_bool. ``tid`` must cover every token in tk['all'] that
    exists in the dictionary; ``expand(prefix)`` -> df-ranked term_ids;
    ``expand_fuzzy(word, dist)`` -> distance-then-df-ranked term_ids for
    ``term~D`` clauses; ``expand_regexp(pattern)`` -> df-ranked term_ids
    fully matching a ``/pattern/`` clause (each SHOULD qtf=1, same
    collision rule as prefixes).

    Returns None when a required atom (must / phrase / near term) is
    missing from the dictionary or nothing is scorable. Expansion
    collisions with explicit or excluded atoms are skipped — explicit
    wins; qtf is each atom's occurrence count across the whole query."""
    from collections import Counter

    if (
        any(t not in tid for t in tk["must"])
        or any(t not in tid for p in tk["phrases"] for t in p)
        or any(t not in tid for p, _w in tk["nears"] for t in p)
    ):
        return None
    qtf = {tid[t]: float(c) for t, c in Counter(tk["positive"]).items() if t in tid}
    # term^B: every boosted occurrence already counted 1 above; adjust by
    # B-1 so that occurrence contributes exactly B (per-occurrence weights
    # accumulate — `data data^2` totals qtf 3)
    for btoks, b in tk["boosts"]:
        for t in btoks:
            if t in tid:
                qtf[tid[t]] += b - 1.0
    must_ids = list(dict.fromkeys(tid[t] for t in tk["must"]))
    should_ids = [
        tid[t]
        for t in dict.fromkeys(tk["should"])
        if t in tid and tid[t] not in set(must_ids)
    ]
    slots = tuple(tuple(tid[t] for t in p) for p in tk["phrases"])
    near_ids = tuple((tuple(tid[t] for t in p), w) for p, w in tk["nears"])
    exc_ids = {tid[t] for t in tk["exc"] if t in tid} - set(qtf)
    for pre in prefixes:
        for t in expand(pre):
            if t not in qtf and t not in exc_ids:
                qtf[t] = 1.0
                should_ids.append(t)
    for word, dist in fuzzies:
        for t in expand_fuzzy(word, dist):
            if t not in qtf and t not in exc_ids:
                qtf[t] = 1.0
                should_ids.append(t)
    for pat in regexps:
        for t in expand_regexp(pat):
            if t not in qtf and t not in exc_ids:
                qtf[t] = 1.0
                should_ids.append(t)
    if not qtf:
        return None
    return {
        "qtf": qtf,
        "must": must_ids,
        "should": should_ids,
        "slots": slots,
        "nears": near_ids,
        "exc": exc_ids,
    }


def read_dict_version(spark: SparkSession, root: str):
    """Content of the index's ``dict_version`` marker file (the uuid the
    writer stamped), or None when it does not exist (pre-versioning
    roots). The CONTENT is the version: bump_dict_version always writes a
    constant-length uuid, so an (mtime, len) stamp would miss two bumps
    inside the filesystem's mtime granularity (1 s on some local/NFS
    mounts) and serve a stale dict cache. One small read — microseconds
    on a local/HDFS namenode, a GET on an object store (where a handle
    held across folds should batch queries anyway)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{root}/dict_version")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    reader = jvm.java.io.BufferedReader(
        jvm.java.io.InputStreamReader(fs.open(p), "UTF-8")
    )
    try:
        line = reader.readLine()
    finally:
        reader.close()
    return line or ""


def bump_dict_version(spark: SparkSession, root: str) -> None:
    """Overwrite the ``dict_version`` marker — called by every writer that
    changes term_dict/postings under an existing root (build_index resume,
    the incremental fold) so long-lived Bm25CompressedIndex handles drop
    their driver dict cache and re-snapshot the tables instead of serving
    stale lookups."""
    import uuid as _uuid

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{root}/dict_version")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    out.write(bytearray(_uuid.uuid4().hex, "ascii"))
    out.close()


def search_fields(
    field_indexes: dict[str, tuple["Bm25CompressedIndex", float]],
    query: str,
    k: int = 10,
    mode: str = "or",
    pattern: str = IDENT_RE,
    round_to: int | None = None,
) -> DataFrame:
    """Multi-field search (BM25F-lite): score(doc) = Σ_field weight_f ·
    bm25_f(query) over per-field indexes — the title-boost shape every
    search engine ships (title hits outrank body hits).

    ``field_indexes``: {field_name: (index, weight)}. Each field scores
    the query independently (``mode`` applies within a field — in 'and'
    a doc scores in a field only if that FIELD contains every term),
    un-truncated (:meth:`Bm25CompressedIndex.score_all` — per-field top-k
    before the sum would be lossy: a doc mid-ranked in two fields can
    out-sum a doc top-ranked in one), then one weighted groupBy-sum and a
    global TakeOrderedAndProject(k). Shuffle shape: one exchange per
    field + one tiny aggregation of (doc_id, score) pairs — the per-field
    plans are the §1-2 plans unchanged.

    Rounding happens AFTER the weighted sum (the oracle-comparable key).
    Doc ids must refer to the same corpus across fields.
    """
    if not field_indexes:
        raise ValueError("search_fields needs at least one (index, weight) field")
    scored = None
    for name in sorted(field_indexes):
        idx, w = field_indexes[name]
        df = idx.score_all(query, mode=mode, pattern=pattern).select(
            "doc_id", (F.col("score") * F.lit(float(w))).alias("score")
        )
        scored = df if scored is None else scored.unionByName(df)
    total = scored.groupBy("doc_id").agg(F.sum("score").alias("score"))
    return _rank_scored_df(total, k, round_to)


def _rank_scored_df(scored: DataFrame, k: int, round_to: int | None) -> DataFrame:
    """THE ranking epilogue every entry point shares — round (when
    requested) then ORDER BY score DESC, doc_id ASC, LIMIT k. The SQL
    oracles mirror exactly this contract; change it here or nowhere
    (it used to be copy-pasted per entry point)."""
    score = F.round("score", round_to) if round_to is not None else F.col("score")
    return (
        scored.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _rank_scored_batch_df(scored: DataFrame, k: int, round_to: int | None) -> DataFrame:
    """The batch twin of :func:`_rank_scored_df`: per-query_id top-k via
    a row_number window over the same (score DESC, doc_id ASC) contract."""
    from pyspark.sql import Window

    score = F.round("score", round_to) if round_to is not None else F.col("score")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.select("query_id", "doc_id", score.alias("score"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


class Bm25CompressedIndex:
    """Query engine over (postings, term_dict) tables."""

    #: term_dicts up to this many rows are collected to the driver once and
    #: probed in-process (kills one Spark job per query). Web-scale dicts
    #: exceed it and fall back to per-query filtered probes.
    #: Driver memory at the cap: 2M entries x (~100 B str key + 28 B int +
    #: dict slot) plus the sorted-term list (8 B pointer/entry, strings
    #: shared with the dict) and two int64 numpy arrays (16 B/entry)
    #: ~= 400-500 MB — sized for the 8 GB driver this engine configures
    #: (session.py); lower it for smaller drivers.
    DRIVER_DICT_CACHE_MAX = 2_000_000

    def __init__(
        self,
        spark: SparkSession,
        postings: DataFrame,
        term_dict: DataFrame,
        docs_per_part: int | None = None,
        root: str | None = None,
    ):
        from ..deploy import ship_package

        ship_package(spark)  # scoring closures import this package on workers
        self.spark = spark
        self.postings = postings
        self.term_dict = term_dict
        #: index geometry (doc-range part size) — needed by search_filtered
        #: to bucket an allowed-id set identically to the build; open_index
        #: loads it from the index's meta table
        self.docs_per_part = docs_per_part
        #: index root (open_index passes it): enables dict_version staleness
        #: checks so a handle held across incremental folds re-snapshots the
        #: appended term_dict/postings instead of serving stale lookups.
        #: Handles built from bare DataFrames (root=None) skip the check —
        #: they are documented handle-per-build.
        self._root = root
        self._seen_version = read_dict_version(spark, root) if root else None
        self._dict_cache: dict[str, int] | None = None
        self._dict_cache_checked = False
        self._sorted_terms: list[str] | None = None
        self._sorted_ids: np.ndarray | None = None
        self._sorted_dfs: np.ndarray | None = None
        self._sorted_lens: np.ndarray | None = None
        #: prepared-PLAN cache for repeated point queries (r7): building a
        #: query DataFrame costs a flat ~45-50 ms of driver py4j round
        #: trips (PLANS.md §6) that repeats identically for an identical
        #: query — the prepared-statement pattern removes it. Plans only:
        #: every collect() on the returned frame re-executes the job from
        #: the postings table, so no result is ever cached (and callers
        #: must not persist() a returned result frame for the same
        #: reason). Keyed on the full query signature + the postings
        #: snapshot identity, so serving_mode()/dict_version refreshes
        #: invalidate by construction.
        self._plan_cache: dict[tuple, DataFrame] = {}
        self._plan_cache_max = 512

    def _check_version(self) -> None:
        """Drop caches + re-snapshot the tables when a writer bumped the
        index's dict_version since this handle last looked."""
        if self._root is None:
            return
        v = read_dict_version(self.spark, self._root)
        if v == self._seen_version:
            return
        self._seen_version = v
        # parquet DataFrames pin their file listing at read time, so a
        # version bump means BOTH the cache and the snapshots are stale.
        # Release any persisted partitions (serving_mode's coalesced
        # cache) BEFORE dropping the handles, or a long-lived serving
        # session leaks a full cached copy per incremental fold.
        for df in (self.postings, self.term_dict):
            try:
                df.unpersist()
            except Exception:
                pass
        from .build_index import open_postings

        self.postings = open_postings(self.spark, self._root)
        self.term_dict = self.spark.read.parquet(f"{self._root}/term_dict")
        self._dict_cache = None
        self._dict_cache_checked = False
        self._sorted_terms = self._sorted_ids = self._sorted_dfs = None
        self._sorted_lens = None
        self._plan_cache.clear()  # stale-keyed plans reference dropped tables

    def _maybe_cache_dict(self) -> dict[str, int] | None:
        self._check_version()
        if not self._dict_cache_checked:
            self._dict_cache_checked = True
            n = self.term_dict.count()
            if n <= self.DRIVER_DICT_CACHE_MAX:
                rows = (
                    self.term_dict.select("term", "term_id", "df")
                    .orderBy("term")
                    .collect()
                )
                self._dict_cache = {r["term"]: r["term_id"] for r in rows}
                # term-sorted parallel arrays: prefix expansion bisects the
                # [prefix, succ(prefix)) range in O(log V) instead of
                # scanning the whole vocabulary per prefix query
                self._sorted_terms = [r["term"] for r in rows]
                self._sorted_ids = np.fromiter(
                    (r["term_id"] for r in rows), dtype=np.int64, count=len(rows)
                )
                self._sorted_dfs = np.fromiter(
                    (r["df"] for r in rows), dtype=np.int64, count=len(rows)
                )
                # per-term lengths: fuzzy expansion's length band
                # (|len(term) - len(word)| <= dist) is a vectorized mask
                self._sorted_lens = np.fromiter(
                    (len(t) for t in self._sorted_terms),
                    dtype=np.int64,
                    count=len(rows),
                )
        return self._dict_cache

    def serving_mode(self, n_partitions: int = 8) -> "Bm25CompressedIndex":
        """Tune THIS SESSION + handle for low-latency point queries
        (measured decomposition: PLANS.md §6; scripts/warm_query_probe.py).

        Three levers, all serving-session configuration, no plan change:
          1. AQE off — AQE materializes each exchange as its own job,
             which costs a whole extra job-submission round (~150-200 ms)
             per point query for zero benefit on a k-row result.
          2. shuffle partitions shrunk to ``n_partitions`` — the few
             remaining exchanges (cogroup facets, batch windows) carry a
             few thousand rows; 32 near-empty tasks are pure launch
             overhead.
          3. postings cached as ``repartition(n_partitions, 'part')`` —
             ~65 scan tasks collapse to 8 AND the partitioning satisfies
             the scorer's groupBy('part') distribution, so the per-query
             scoring Exchange is elided outright (guide §2.4; plain
             coalesce only fixed the task count, the r7 repartition also
             removes the shuffle: measured 328 -> 302 ms/query).

        SIDE EFFECT: flips session confs (adaptive.enabled,
        shuffle.partitions) — intended for a dedicated serving session;
        batch/analytic jobs on the same session should restore them.
        A dict_version refresh (_check_version) re-snapshots the tables
        and drops the coalesced cache — re-call after incremental folds.
        The canonical measured gain is bench.py's serving_loop_qps vs
        warm_loop_qps in the current BENCH json (r4: 2.73 vs 1.68 q/s
        at 20k docs / local[32]; see PLANS.md §6)."""
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
        # repeated serving_mode() calls must not stack persisted copies
        for df in (self.postings, self.term_dict):
            try:
                df.unpersist()
            except Exception:
                pass
        # hash-partition on part (adjacent repartitions collapse, so a
        # handle from open_index re-partitions once, to n_partitions):
        # the cached layout then satisfies every scorer's groupBy('part')
        # distribution and point queries run shuffle-free
        self.postings = self.postings.repartition(n_partitions, "part").persist()
        self.term_dict = self.term_dict.persist()
        self.postings.count()
        self._plan_cache.clear()  # plans built on the pre-snapshot tables
        self._maybe_cache_dict()
        return self

    def lookup_terms(self, terms: list[str]) -> dict[str, int]:
        cache = self._maybe_cache_dict()
        if cache is not None:
            return {t: cache[t] for t in terms if t in cache}
        rows = (
            self.term_dict.filter(F.col("term").isin(terms))
            .select("term", "term_id")
            .collect()
        )
        return {r["term"]: r["term_id"] for r in rows}

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "and",
        pattern: str = IDENT_RE,
        round_to: int | None = None,
        exclude: list[str] | None = None,
    ) -> DataFrame:
        """BM25 top-k; ``exclude`` = boolean-NOT terms — a doc containing any
        of them never appears in the result (dropped inside each part BEFORE
        top-k truncation, so the k results are exactly the best survivors).
        Excluded terms absent from the dictionary, or that also appear in the
        positive query, are no-ops."""
        self._check_version()
        key = (
            "search", query, k, mode, pattern, round_to,
            tuple(sorted(exclude)) if exclude else None,
            id(self.postings),
        )
        df = self._plan_cache.get(key)
        if df is None:
            scored = self._scored(query, k, mode, pattern, round_to, exclude)
            df = self._rank_scored(scored, k, round_to)
            if len(self._plan_cache) >= self._plan_cache_max:
                self._plan_cache.clear()
            self._plan_cache[key] = df
        return df

    def _rank_scored(self, scored: DataFrame, k: int, round_to: int | None) -> DataFrame:
        """See :func:`_rank_scored_df` — the shared ranking epilogue."""
        return _rank_scored_df(scored, k, round_to)

    def _score_and_rank(self, cand: DataFrame, score_part, k: int,
                        round_to: int | None) -> DataFrame:
        """Per-part Arrow scoring over doc-disjoint parts (per-part
        top-k merges exactly) followed by :meth:`_rank_scored`."""
        scored = cand.groupBy("part").applyInPandas(
            score_part, schema="doc_id long, score double"
        )
        return self._rank_scored(scored, k, round_to)

    def score_all(
        self,
        query: str,
        mode: str = "and",
        pattern: str = IDENT_RE,
        exclude: list[str] | None = None,
    ) -> DataFrame:
        """(doc_id, score) for EVERY matching doc — no top-k truncation.

        The building block for cross-index composition (multi-field
        weighted sums, :func:`search_fields`), where truncating per field
        BEFORE the sum would be lossy. Same one-exchange plan as search();
        per-part lists are simply not cut (MaxScore tau stays disabled —
        every match must be scored)."""
        return self._scored(query, 1 << 30, mode, pattern, None, exclude)

    def _scored(self, query, k, mode, pattern, round_to, exclude):
        """Shared scored-DataFrame construction of search()/score_all():
        un-ordered (doc_id, score) rows, per-part lists cut at ``k``."""
        q = tokenize_query(query, pattern)
        tid = self.lookup_terms([t for t, _ in q])
        if not q or (mode == "and" and len(tid) < len(q)) or not tid:
            return self.spark.createDataFrame([], "doc_id long, score double")
        qtf = {tid[t]: float(c) for t, c in q if t in tid}
        n_terms = len(qtf)
        ids = list(qtf.keys())
        exc_terms = sorted({t.lower() for t in (exclude or [])} - {t for t, _ in q})
        exc_ids = set(self.lookup_terms(exc_terms).values()) - set(ids)

        cand = self.postings.filter(F.col("term_id").isin(ids + list(exc_ids)))

        def score_part(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = pdf.to_dict("records")
            groups = [g for g in rows if g["term_id"] not in exc_ids]
            neg = [g for g in rows if g["term_id"] in exc_ids]
            if mode == "and":
                docs, scores = _score_part_and(groups, qtf, n_terms, k, round_to, neg)
            else:
                docs, scores = (
                    _score_part_or(groups, qtf, k, round_to, neg) if groups else ([], [])
                )
            return pd.DataFrame({"doc_id": docs, "score": scores})

        return cand.groupBy("part").applyInPandas(
            score_part, schema="doc_id long, score double"
        )

    def search_filtered(
        self,
        query: str,
        allowed: DataFrame,
        k: int = 10,
        mode: str = "and",
        pattern: str = IDENT_RE,
        round_to: int | None = None,
        docs_per_part: int | None = None,
    ) -> DataFrame:
        """Faceted/metadata-filtered BM25 top-k: only docs in ``allowed``
        (any DataFrame with a doc_id column — e.g. ``docs.filter(lang='en')
        .select('doc_id')``) may appear, and the k results are exactly the
        best ALLOWED docs (the filter applies inside each part BEFORE top-k
        truncation, never as a lossy post-filter on an unfiltered top-k).

        Shuffle shape: the allowed set is bucketed by the SAME doc-range
        ``part`` key as the postings and cogrouped
        (``groupby(part).cogroup``), so each Arrow call receives exactly its
        part's postings AND its part's allowed ids — the filter never
        broadcasts globally and scales with the corpus. ``docs_per_part``
        must exactly match the index geometry; it is NEVER inferred here —
        it comes from the index's meta table (open an index via
        ``open_index``) or from this explicit argument, and a ValueError is
        raised when neither supplies it. Passing a WRONG value is silently
        incorrect, not an error: allowed ids bucket to the wrong parts and
        legitimate docs are dropped from the result.

        MaxScore's tau seed is disabled in OR mode (a seed drawn from
        potentially-filtered docs could over-prune); AND intersects the
        allowed set at the driver-term step, which SHRINKS downstream block
        probes rather than adding work.
        """
        q = tokenize_query(query, pattern)
        tid = self.lookup_terms([t for t, _ in q])
        if not q or (mode == "and" and len(tid) < len(q)) or not tid:
            return self.spark.createDataFrame([], "doc_id long, score double")
        qtf = {tid[t]: float(c) for t, c in q if t in tid}
        n_terms = len(qtf)
        ids = list(qtf.keys())
        dpp = docs_per_part or self.docs_per_part
        if dpp is None:
            raise ValueError(
                "search_filtered needs the index geometry: open the index "
                "via open_index (reads the meta table) or pass docs_per_part="
            )

        cand = self.postings.filter(F.col("term_id").isin(ids))
        allow = allowed.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            (F.col("doc_id") / F.lit(dpp)).cast("int").alias("part"),
        )

        def score_cogroup(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0 or len(right) == 0:
                return pd.DataFrame({"doc_id": [], "score": []})
            allow_ids = np.sort(right["doc_id"].to_numpy().astype(np.int64))
            groups = left.to_dict("records")
            if mode == "and":
                docs, scores = _score_part_and(
                    groups, qtf, n_terms, k, round_to, allow=allow_ids
                )
            else:
                docs, scores = _score_part_or(
                    groups, qtf, k, round_to, allow=allow_ids
                )
            return pd.DataFrame({"doc_id": docs, "score": scores})

        scored = (
            cand.groupby("part")
            .cogroup(allow.groupby("part"))
            .applyInPandas(score_cogroup, schema="doc_id long, score double")
        )
        return self._rank_scored(scored, k, round_to)

    def _expand_fuzzy(self, word: str, dist: int, max_expansions: int) -> list[int]:
        """term_ids of dictionary terms within edit distance ``dist`` of
        ``word``, ranked distance-then-df-desc-then-term (deterministic),
        capped at max_expansions — the Lucene FuzzyQuery expansion analog
        over the external term dictionary (suggest's ranking, applied as
        query expansion). Length pre-filter bounds the levenshtein scan.

        Cached path (mirrors _expand_prefix/_expand_regexp): a vectorized
        length-band mask over the cached arrays picks candidates, a
        row-min-cutoff DP scores them in-process — zero Spark jobs, which
        matters because a point query otherwise pays the ~0.3 s job floor
        PER fuzzy term. Uncached dicts keep the parallel Spark
        levenshtein probe (O(V/cores), the web-scale shape)."""
        if not word:
            return []
        if self._maybe_cache_dict() is not None:
            band = np.nonzero(
                np.abs(self._sorted_lens - len(word)) <= dist
            )[0]
            terms = self._sorted_terms
            dfs = self._sorted_dfs
            # candidates iterate in term order, sorted() is stable, so the
            # (distance asc, df desc) key leaves term-asc ties in place —
            # identical ranking to the Spark path's orderBy
            cands = []
            for i in band:
                d = _lev_within(word, terms[i], dist)
                if d <= dist:
                    cands.append((d, -dfs[i], i))
            cands.sort()
            return self._sorted_ids[
                [i for _, _, i in cands[:max_expansions]]
            ].tolist()
        rows = (
            self.term_dict.filter(
                F.length("term").between(len(word) - dist, len(word) + dist)
            )
            .withColumn("_d", F.levenshtein(F.col("term"), F.lit(word)))
            .filter(F.col("_d") <= dist)
            .orderBy(F.asc("_d"), F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term_id")
            .collect()
        )
        return [r["term_id"] for r in rows]

    def _require_positions(self, op: str) -> None:
        """Fail fast (driver-side, clear message) when a positional operator
        runs against an index built without positions — instead of a
        KeyError inside the worker-side scorer."""
        if "positions" not in self.postings.columns:
            raise ValueError(
                f"{op} needs a positions-enabled index: build with "
                "term_frequencies(with_positions=True) / "
                "build_index(with_positions=True)"
            )

    def _sorted_range(self, prefix: str) -> tuple[int, int]:
        """[lo, hi) index range of ``prefix``-prefixed terms in the sorted
        cache arrays — every string with this prefix sorts in [prefix,
        prefix[:-1] + succ(last char)); exact range, two bisects."""
        import bisect

        terms = self._sorted_terms
        lo = bisect.bisect_left(terms, prefix)
        last = prefix[-1]
        if ord(last) < 0x10FFFF:
            hi = bisect.bisect_left(terms, prefix[:-1] + chr(ord(last) + 1), lo)
        else:
            hi = len(terms)
        return lo, hi

    def _take_ranked(self, idxs: np.ndarray, max_expansions: int) -> list[int]:
        """Cap an ASCENDING index array by df rank (df desc, term asc tie —
        stable argsort over the term-ordered indices)."""
        if idxs.size > max_expansions:
            dfs = self._sorted_dfs[idxs]
            idxs = idxs[np.argsort(-dfs, kind="stable")[:max_expansions]]
        return self._sorted_ids[idxs].tolist()

    def _expand_prefix(self, prefix: str, max_expansions: int) -> list[int]:
        """term_ids of dictionary terms starting with ``prefix``, capped by
        df rank (highest-df kept; deterministic df-desc/term tie).

        Cached path: bisect the [prefix, succ(prefix)) range of the
        term-sorted arrays — O(log V + matches), no Spark job, no vocab
        scan, even at the 2M-entry cache cap. Uncached path: a
        first-char-pruned dict probe (the Spark analog of the reference's
        first-character index, Make_dir/MakeDictAndIndex.cpp:203-209)."""
        if not prefix:
            return []
        cache = self._maybe_cache_dict()
        if cache is not None:
            lo, hi = self._sorted_range(prefix)
            return self._take_ranked(np.arange(lo, hi, dtype=np.int64), max_expansions)
        rows = (
            self.term_dict.filter(
                (F.col("prefix") == prefix[0]) & F.col("term").startswith(prefix)
            )
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term_id")
            .collect()
        )
        return [r["term_id"] for r in rows]

    def _expand_regexp(self, pattern: str, max_expansions: int) -> list[int]:
        """term_ids of dictionary terms FULLY matching ``pattern``
        (Lucene-RegexpQuery whole-term semantics), df-ranked and capped.

        Cached path: the pattern is split on top-level alternation
        (``cat|dog`` has no single mandatory prefix — each branch does),
        each branch's literal prefix (chars before its first
        metacharacter, quantifier-adjusted) bisects the sorted term arrays
        — the spirit of Lucene's automaton/term-index intersection — and
        Python re fullmatch of the WHOLE pattern scans only the union of
        those ranges (any full match satisfies some branch, so it starts
        with that branch's prefix). A pattern with any prefix-less branch,
        or no cache, falls back to a Catalyst ``rlike`` probe over the
        dict table (parallel O(V/cores), the right shape at web-scale
        vocabularies). Patterns should stick to the regex subset valid in
        both Python and Java (the two evaluation engines)."""
        if not pattern:
            return []
        rx = re.compile(pattern)
        cache = self._maybe_cache_dict()
        lits = [
            _regex_literal_prefix(b)
            for b in _split_top_level_alternation(pattern)
        ]
        if cache is not None and all(lits):
            terms = self._sorted_terms
            hit: set[int] = set()
            for lit in lits:
                lo, hi = self._sorted_range(lit)
                hit.update(i for i in range(lo, hi) if rx.fullmatch(terms[i]))
            idxs = np.fromiter(sorted(hit), dtype=np.int64)
            return self._take_ranked(idxs, max_expansions)
        rows = (
            self.term_dict.filter(F.col("term").rlike(f"^(?:{pattern})$"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term_id")
            .collect()
        )
        return [r["term_id"] for r in rows]

    def search_regexp(
        self,
        pattern: str,
        k: int = 10,
        round_to: int | None = None,
        max_expansions: int = 1 << 20,
    ) -> DataFrame:
        """Regexp term query ``/pattern/`` (whole-term match) — the
        code-search staple Lucene calls RegexpQuery. Expands against
        term_dict (see _expand_regexp for the literal-prefix bisection)
        and scores the expansion set disjunctively with qtf=1 per matched
        term, exactly like search_prefix. The pattern is lowercased
        first — the dictionary stores lowercased terms only, and both
        search_prefix and the grammar's /re/ clause already lowercase,
        so a direct-API uppercase literal must not silently match
        nothing."""
        ids = self._expand_regexp(pattern.lower(), max_expansions)
        if not ids:
            return self.spark.createDataFrame([], "doc_id long, score double")
        qtf = {t: 1.0 for t in ids}

        cand = self.postings.filter(F.col("term_id").isin(ids))

        def score_part(pdf: pd.DataFrame) -> pd.DataFrame:
            docs, scores = _score_part_or(pdf.to_dict("records"), qtf, k, round_to)
            return pd.DataFrame({"doc_id": docs, "score": scores})

        return self._score_and_rank(cand, score_part, k, round_to)

    def search_prefix(
        self,
        prefix: str,
        k: int = 10,
        round_to: int | None = None,
        max_expansions: int = 1 << 20,
    ) -> DataFrame:
        """Prefix query ``prefix*`` — the code-search staple.

        Expands against term_dict (the ``prefix`` first-char column gives
        parquet row-group pruning, the Spark analog of the reference's
        first-character dict index, Make_dir/MakeDictAndIndex.cpp:203-209)
        and scores the expansion set disjunctively with qtf=1 per matched
        term. ``max_expansions`` caps runaway one-letter prefixes by df
        rank (highest-df expansions kept; deterministic df-desc/term tie).
        """
        ids = self._expand_prefix(prefix.lower(), max_expansions)
        if not ids:
            return self.spark.createDataFrame([], "doc_id long, score double")
        qtf = {t: 1.0 for t in ids}

        cand = self.postings.filter(F.col("term_id").isin(ids))

        def score_part(pdf: pd.DataFrame) -> pd.DataFrame:
            docs, scores = _score_part_or(pdf.to_dict("records"), qtf, k, round_to)
            return pd.DataFrame({"doc_id": docs, "score": scores})

        return self._score_and_rank(cand, score_part, k, round_to)

    def search_near(
        self,
        query: str,
        window: int,
        k: int = 10,
        pattern: str = IDENT_RE,
        round_to: int | None = None,
        ordered: bool = False,
    ) -> DataFrame:
        """Proximity top-k: all query terms within a token window.

        Unordered (default): some choice of one position per distinct term
        spans <= ``window`` positions — the Lucene `"a b"~N` slop analog
        restricted to unordered-span semantics; window=1 with two terms
        means adjacent in either order. ``ordered=True`` additionally
        requires the positions to follow the query's term order
        (window=len(terms)-1 then degenerates to the exact phrase).
        Requires a positions-enabled index; score is the BM25 sum over the
        distinct terms at their whole-query qtf (same scoring contract as
        search_phrase)."""
        self._require_positions("search_near")
        toks = re.findall(pattern, query.lower())
        if not toks:
            return self.spark.createDataFrame([], "doc_id long, score double")
        tid = self.lookup_terms(sorted(set(toks)))
        if len(tid) < len(set(toks)):
            return self.spark.createDataFrame([], "doc_id long, score double")
        terms = [tid[t] for t in toks]
        qtf = {tid[t]: float(c) for t, c in tokenize_query(query, pattern)}

        cand = self.postings.filter(F.col("term_id").isin(list(set(terms))))

        def score_part(pdf: pd.DataFrame) -> pd.DataFrame:
            docs, scores = _score_part_near(
                pdf.to_dict("records"), terms, window, qtf, k, round_to, ordered
            )
            return pd.DataFrame({"doc_id": docs, "score": scores})

        return self._score_and_rank(cand, score_part, k, round_to)

    def search_query(
        self,
        query: str,
        k: int = 10,
        mode: str = "or",
        docs: DataFrame | None = None,
        pattern: str = IDENT_RE,
        round_to: int | None = None,
        max_expansions: int = 1024,
        docs_per_part: int | None = None,
    ) -> DataFrame:
        """Composed query-string search — the user-facing grammar compiled
        into ONE exact per-part pass (functions/queryparse.py; the Spark
        surface of the reference's raw-query RPC entry point,
        srpc/PageSearch/server.pb_skeleton.cc:154-170):

            data +value -merge quer* "exact phrase" "near terms"~4 lang:de

        Semantics: ``+term``, every ``"phrase"``, and every ``"..."~W``
        proximity clause (all terms within a W-position window, any order —
        see search_near) are required; bare terms
        are required in mode='and', scored-if-present in mode='or';
        ``-term`` docs never appear (dropped pre-truncation); ``pre*``
        expansions add score but are never required (SHOULD, qtf=1, capped
        by df rank; an expansion colliding with an explicit or excluded
        atom is skipped — explicit wins); ``term~D`` fuzzy clauses expand
        to dictionary terms within edit distance D (<=2) under the same
        SHOULD/collision rules; ``/pattern/`` regexp clauses expand to
        whole-term regex matches (Lucene RegexpQuery analog, literal-
        prefix-bisected — see _expand_regexp) under the same rules;
        ``term^B`` boosts that occurrence
        to qtf B (cut_weight.cpp query-side weighting analog, sugar for
        term repetition); facets — ``field:value`` equality,
        ``field:a,b`` any-of, ``field:[lo TO hi]`` inclusive range
        (``*`` unbounded; numeric when the bounds are numbers), repeated
        fields conjunctive — filter against ``docs`` via the same
        part-bucketed cogroup as search_filtered (exact: never a lossy
        post-filter; see :func:`apply_facets`). Phrase clauses
        need a positions-enabled index. Score = BM25 sum over the distinct
        positive atoms present, qtf = each atom's occurrence count across
        the whole query string.
        """
        from ..functions.queryparse import parse_query

        spec = parse_query(query)
        if spec.phrases or spec.nears:
            self._require_positions("search_query with phrase/proximity clauses")
        empty = lambda: self.spark.createDataFrame([], "doc_id long, score double")  # noqa: E731
        if not spec.has_positive:
            return empty()

        tk = _spec_tokens(spec, mode, pattern)
        tid = self.lookup_terms(sorted(tk["all"]))
        comp = _compile_spec(
            tk,
            spec.prefixes,
            tid,
            lambda p: self._expand_prefix(p, max_expansions),
            spec.fuzzies,
            lambda w, d: self._expand_fuzzy(w, d, max_expansions),
            spec.regexps,
            lambda p: self._expand_regexp(p, max_expansions),
        )
        if comp is None:  # missing required atom or nothing scorable
            return empty()
        qtf, exc_ids = comp["qtf"], comp["exc"]

        cand = self.postings.filter(F.col("term_id").isin(list(qtf) + list(exc_ids)))

        def score_rows(rows: list[dict], allow_ids=None) -> pd.DataFrame:
            pos_rows = [g for g in rows if g["term_id"] not in exc_ids]
            neg = [g for g in rows if g["term_id"] in exc_ids]
            d, s = _score_part_bool(
                pos_rows, comp["must"], comp["should"], qtf, k, comp["slots"],
                round_to, neg, allow_ids, comp["nears"],
            )
            return pd.DataFrame({"doc_id": d, "score": s})

        if spec.facets:
            if docs is None:
                raise ValueError(
                    "facet clauses need the docs table: search_query(..., docs=...)"
                )
            dpp = docs_per_part or self.docs_per_part
            if dpp is None:
                raise ValueError(
                    "facet clauses need the index geometry: open the index via "
                    "open_index (reads the meta table) or pass docs_per_part="
                )
            allowed = apply_facets(docs, spec.facets)
            allow_df = allowed.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                (F.col("doc_id") / F.lit(dpp)).cast("int").alias("part"),
            )

            def score_cogroup(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
                if len(left) == 0 or len(right) == 0:
                    return pd.DataFrame({"doc_id": [], "score": []})
                allow_ids = np.sort(right["doc_id"].to_numpy().astype(np.int64))
                return score_rows(left.to_dict("records"), allow_ids)

            scored = (
                cand.groupby("part")
                .cogroup(allow_df.groupby("part"))
                .applyInPandas(score_cogroup, schema="doc_id long, score double")
            )
        else:

            def score_part(pdf: pd.DataFrame) -> pd.DataFrame:
                return score_rows(pdf.to_dict("records"))

            scored = cand.groupBy("part").applyInPandas(
                score_part, schema="doc_id long, score double"
            )
        return self._rank_scored(scored, k, round_to)

    def search_query_batch(
        self,
        queries: dict[str, str] | list[str],
        k: int = 10,
        mode: str = "or",
        pattern: str = IDENT_RE,
        round_to: int | None = None,
        max_expansions: int = 1024,
        docs: DataFrame | None = None,
        docs_per_part: int | None = None,
    ) -> DataFrame:
        """Composed-grammar batch: MANY query strings in ONE Spark job ->
        (query_id, doc_id, score) — the serving shape for search_query,
        same grammar and semantics per query (see search_batch for why
        batching is the Spark-idiomatic high-throughput form).

        Facet clauses work per query (r4): pass ``docs`` (+
        ``docs_per_part`` unless the handle carries geometry); each
        faceted query's allowed-id set is computed by the same
        :func:`apply_facets` Catalyst filters, tagged with its query_id,
        unioned, bucketed by the index's part key, and cogrouped — one
        exchange for the whole batch, exact per query (never a lossy
        post-filter), queries without facets stay unfiltered. Phrase /
        proximity clauses need a positions-enabled index. Unmatchable
        queries (missing required atom) contribute no rows.

        GEOMETRY CONTRACT: ``docs_per_part`` must equal the value the
        index was BUILT with (``open_index`` handles carry it; bare
        DataFrame handles must be told) — the allowed-id set is bucketed
        by ``doc_id // docs_per_part`` so it cogroups against the same
        part a doc's postings live in. A mismatched value silently
        lands allowed ids in the wrong cogroup bucket and faceted
        queries return rows as if their allow-set were empty in the
        affected parts.
        """
        from ..functions.queryparse import parse_query

        if isinstance(queries, list):
            queries = {str(i): q for i, q in enumerate(queries)}
        specs = {qid: parse_query(q) for qid, q in queries.items()}
        faceted = {qid for qid, s in specs.items() if s.facets}
        if faceted:
            if docs is None:
                raise ValueError(
                    "facet clauses need the docs table: "
                    "search_query_batch(..., docs=...)"
                )
            dpp = docs_per_part or self.docs_per_part
            if dpp is None:
                raise ValueError(
                    "facet clauses need the index geometry: open the index "
                    "via open_index (reads the meta table) or pass "
                    "docs_per_part="
                )
        if any(s.phrases or s.nears for s in specs.values()):
            self._require_positions("search_query_batch with phrase/proximity clauses")

        tks = {
            qid: _spec_tokens(s, mode, pattern)
            for qid, s in specs.items()
            if s.has_positive
        }
        # ONE dictionary probe for the union of all queries' terms
        tid = self.lookup_terms(sorted({t for tk in tks.values() for t in tk["all"]}))
        expand = lambda p: self._expand_prefix(p, max_expansions)  # noqa: E731
        expand_fz = lambda w, d: self._expand_fuzzy(w, d, max_expansions)  # noqa: E731
        expand_re = lambda p: self._expand_regexp(p, max_expansions)  # noqa: E731
        comp: dict[str, dict] = {}
        rows = []
        for qid, tk in tks.items():
            c = _compile_spec(
                tk, specs[qid].prefixes, tid, expand, specs[qid].fuzzies, expand_fz,
                specs[qid].regexps, expand_re,
            )
            if c is None:
                continue
            comp[qid] = c
            for t in set(c["qtf"]) | c["exc"]:
                rows.append((qid, t))
        if not rows:
            return self.spark.createDataFrame(
                [], "query_id string, doc_id long, score double"
            )
        qdf = self.spark.createDataFrame(rows, "query_id string, term_id long")
        bmeta = self.spark.sparkContext.broadcast(comp)
        all_tids = sorted({t for _, t in rows})

        cand = self.postings.filter(F.col("term_id").isin(all_tids)).join(
            F.broadcast(qdf), "term_id"
        )

        faceted_compiled = frozenset(faceted & comp.keys())

        def score_rows_batch(pdf: pd.DataFrame, allow_by_q: dict) -> pd.DataFrame:
            out_q, out_d, out_s = [], [], []
            for qid, sub in pdf.groupby("query_id", sort=False):
                c = bmeta.value[qid]
                if qid in faceted_compiled:
                    # a faceted query with no allowed ids in this part gets
                    # an EMPTY array (no hits here), never None (unfiltered)
                    allow = allow_by_q.get(qid, np.empty(0, dtype=np.int64))
                else:
                    allow = None
                groups = sub.to_dict("records")
                pos_rows = [g for g in groups if g["term_id"] not in c["exc"]]
                neg = [g for g in groups if g["term_id"] in c["exc"]]
                d, s = _score_part_bool(
                    pos_rows, c["must"], c["should"], c["qtf"], k, c["slots"],
                    round_to, neg, allow, c["nears"],
                )
                out_q += [qid] * len(d)
                out_d += d
                out_s += s
            return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

        if faceted_compiled:
            # per-query allowed-id sets, tagged by query_id, one union —
            # bucketed by the SAME part key and cogrouped with the postings
            # (the search_filtered shape, batched): one exchange total
            allow_parts = []
            for qid in sorted(faceted_compiled):
                al = apply_facets(docs, specs[qid].facets)
                allow_parts.append(
                    al.select(
                        F.lit(qid).alias("query_id"),
                        F.col("doc_id").cast("long").alias("doc_id"),
                        (F.col("doc_id") / F.lit(dpp)).cast("int").alias("part"),
                    )
                )
            allow_df = allow_parts[0]
            for a in allow_parts[1:]:
                allow_df = allow_df.unionByName(a)

            def score_cogroup(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
                if len(left) == 0:
                    return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
                allow_by_q = {
                    qid: np.sort(sub["doc_id"].to_numpy().astype(np.int64))
                    for qid, sub in right.groupby("query_id", sort=False)
                }
                return score_rows_batch(left, allow_by_q)

            scored = (
                cand.groupby("part")
                .cogroup(allow_df.groupby("part"))
                .applyInPandas(
                    score_cogroup,
                    schema="query_id string, doc_id long, score double",
                )
            )
        else:

            def score_part(pdf: pd.DataFrame) -> pd.DataFrame:
                return score_rows_batch(pdf, {})

            scored = cand.groupBy("part").applyInPandas(
                score_part, schema="query_id string, doc_id long, score double"
            )
        return _rank_scored_batch_df(scored, k, round_to)

    def search_batch(
        self,
        queries: dict[str, str] | list[str],
        k: int = 10,
        mode: str = "and",
        pattern: str = IDENT_RE,
        round_to: int | None = None,
    ) -> DataFrame:
        """Score MANY queries in ONE Spark job -> (query_id, doc_id, score).

        The reference serves queries one RPC at a time
        (srpc/PageSearch/server.pb_skeleton.cc); on Spark the idiomatic
        high-throughput shape is a batch: the query set joins the postings
        once, every (part x query) group scores inside the same stage, and
        a window takes per-query top-k. Fixed job overhead is paid once for
        the whole batch instead of once per query.
        """
        if isinstance(queries, list):
            queries = {str(i): q for i, q in enumerate(queries)}
        tokenized = {qid: tokenize_query(text, pattern) for qid, text in queries.items()}
        # ONE dictionary probe for the union of all query terms
        tid = self.lookup_terms(
            sorted({t for terms in tokenized.values() for t, _ in terms})
        )
        rows = []
        qmeta: dict[str, dict] = {}
        for qid, terms in tokenized.items():
            matched = [t for t, _ in terms if t in tid]
            if not terms or (mode == "and" and len(matched) < len(terms)) or not matched:
                continue  # unmatchable query -> no rows
            qtf = {tid[t]: float(c) for t, c in terms if t in tid}
            qmeta[qid] = qtf
            for t, c in qtf.items():
                rows.append((qid, t))
        if not rows:
            return self.spark.createDataFrame(
                [], "query_id string, doc_id long, score double"
            )
        qdf = self.spark.createDataFrame(rows, "query_id string, term_id long")
        bmeta = self.spark.sparkContext.broadcast(qmeta)
        n_by_q = {qid: len(qtf) for qid, qtf in qmeta.items()}
        all_tids = list({t for qtf in qmeta.values() for t in qtf})

        cand = self.postings.filter(F.col("term_id").isin(all_tids)).join(
            F.broadcast(qdf), "term_id"
        )

        def score_part(pdf: pd.DataFrame) -> pd.DataFrame:
            out_q, out_d, out_s = [], [], []
            for qid, sub in pdf.groupby("query_id", sort=False):
                qtf = bmeta.value[qid]
                groups = sub.to_dict("records")
                if mode == "and":
                    docs, scores = _score_part_and(groups, qtf, n_by_q[qid], k, round_to)
                else:
                    docs, scores = _score_part_or(groups, qtf, k, round_to)
                out_q += [qid] * len(docs)
                out_d += docs
                out_s += scores
            return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

        scored = cand.groupBy("part").applyInPandas(
            score_part, schema="query_id string, doc_id long, score double"
        )
        return _rank_scored_batch_df(scored, k, round_to)

    def fetch_docs(self, topk: DataFrame, docs: DataFrame, cols: list[str] | None = None) -> DataFrame:
        """Join top-k results back to document metadata/content — the Spark
        form of the reference's content fetch by offset
        (srpc/PageSearch/server.pb_skeleton.cc:214-241): the k-row result
        side is broadcast, so the docs table is probed, never shuffled."""
        sel = docs if cols is None else docs.select("doc_id", *cols)
        return F.broadcast(topk).join(sel, "doc_id").orderBy(F.desc("score"), F.asc("doc_id"))

    def search_phrase(
        self,
        phrase: str,
        k: int = 10,
        pattern: str = IDENT_RE,
        round_to: int | None = None,
    ) -> DataFrame:
        """Exact-phrase top-k: all terms adjacent and in order.

        Requires a positions-enabled index (build_postings over a
        positions-carrying tf table); the ``positions`` column is read only
        by this path — non-phrase queries never scan it (column pruning).
        """
        self._check_version()
        key = ("phrase", phrase, k, pattern, round_to, id(self.postings))
        df = self._plan_cache.get(key)
        if df is not None:
            return df
        self._require_positions("search_phrase")
        toks = re.findall(pattern, phrase.lower())
        if not toks:
            return self.spark.createDataFrame([], "doc_id long, score double")
        tid = self.lookup_terms(sorted(set(toks)))
        if len(tid) < len(set(toks)):
            return self.spark.createDataFrame([], "doc_id long, score double")
        slots = [tid[t] for t in toks]
        qtf = {tid[t]: float(c) for t, c in tokenize_query(phrase, pattern)}

        cand = self.postings.filter(F.col("term_id").isin(list(set(slots))))

        def score_part(pdf: pd.DataFrame) -> pd.DataFrame:
            docs, scores = _score_part_phrase(pdf.to_dict("records"), slots, qtf, k, round_to)
            return pd.DataFrame({"doc_id": docs, "score": scores})

        df = self._score_and_rank(cand, score_part, k, round_to)
        if len(self._plan_cache) >= self._plan_cache_max:
            self._plan_cache.clear()
        self._plan_cache[key] = df
        return df
