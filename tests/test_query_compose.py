"""Composed query-string surface (functions/queryparse + search_query).

Every grammar clause is checked two ways: (1) parser unit tests (pure
Python), (2) engine parity — each single-clause query must reproduce the
dedicated primitive (search / search_phrase / search_prefix /
search_filtered) exactly, and composed queries must match a brute-force
Python oracle over the corpus.
"""

from __future__ import annotations

import re

import pytest

from searchenginer_spark.functions.queryparse import QuerySpec, parse_query
from searchenginer_spark.operators import stats as S
from searchenginer_spark.operators.dict import build_term_dict
from searchenginer_spark.operators.postings import build_postings
from searchenginer_spark.plans.bm25 import Bm25CompressedIndex
from searchenginer_spark.plans.bm25_dataframe import IDENT_RE


# ------------------------------------------------------------------ parser


def test_parse_all_clause_kinds():
    spec = parse_query('data +value -merge quer* "exact phrase" lang:de')
    assert spec.should == ["data"]
    assert spec.must == ["value"]
    assert spec.exclude == ["merge"]
    assert spec.prefixes == ["quer"]
    assert spec.phrases == ["exact phrase"]
    assert spec.facets == [("lang", ("eq", "de"))]
    assert spec.has_positive


def test_parse_facet_forms():
    # multi-value, range, unbounded range, conjunctive repeats
    spec = parse_query("data lang:py,go stars:[100 TO *] lang:de")
    assert spec.facets == [
        ("lang", ("in", ["py", "go"])),
        ("stars", ("range", "100", "*")),
        ("lang", ("eq", "de")),  # repeated field kept — conjunctive
    ]
    assert parse_query("x f:[a TO b]").facets == [("f", ("range", "a", "b"))]
    assert parse_query("x f:[* TO *]").facets == [("f", ("range", "*", "*"))]
    for bad in ("x f:[100]", "x f:[1 TO 2 TO 3]", "x -f:[1 TO 2]", "x f:,"):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_parse_edge_cases():
    assert parse_query("") == QuerySpec()
    assert not parse_query("-only -negative").has_positive
    # bare '*' is a term, not a prefix; ':' at an edge is not a facet
    assert parse_query("*").should == ["*"]
    assert parse_query(":x x:").should == [":x", "x:"]
    # empty phrase is dropped; repeated terms all kept (qtf accumulates)
    spec = parse_query('"" data data +data')
    assert spec.phrases == []
    assert spec.should == ["data", "data"] and spec.must == ["data"]


@pytest.mark.parametrize("bad", ['-"a b"', "-pre*", "-lang:de"])
def test_parse_rejects_unexecutable_negations(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


# ------------------------------------------------------------------ engine


@pytest.fixture(scope="module")
def qindex(spark, docs_sf0001):
    """Positions-enabled compressed index with known geometry, so ALL
    clause kinds (phrase, facet) are executable."""
    tf = S.term_frequencies(docs_sf0001, text_col="text", with_positions=True).persist()
    dl = S.doc_lengths(tf)
    dft = S.document_frequencies(tf)
    stats = S.corpus_stats(dl)
    term_dict = build_term_dict(dft).persist()
    postings = build_postings(tf, dl, term_dict, stats, docs_per_part=128).persist()
    return Bm25CompressedIndex(spark, postings, term_dict, docs_per_part=128)


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _assert_same(got, want, label=""):
    assert [d for d, _ in got] == [d for d, _ in want], label
    for (_, g), (_, w) in zip(got, want):
        assert abs(g - w) < 1e-9, label


@pytest.mark.parametrize(
    "query,mode,primitive",
    [
        ("spark query", "and", lambda ix, k: ix.search("spark query", k=k, mode="and")),
        (
            "spark merge window",
            "or",
            lambda ix, k: ix.search("spark merge window", k=k, mode="or"),
        ),
        # +terms are MUST in either mode == the and-mode primitive
        ("+spark +query", "or", lambda ix, k: ix.search("spark query", k=k, mode="and")),
        (
            "spark query -merge",
            "and",
            lambda ix, k: ix.search("spark query", k=k, mode="and", exclude=["merge"]),
        ),
        ('"merge part"', "or", lambda ix, k: ix.search_phrase("merge part", k=k)),
        ("quer*", "or", lambda ix, k: ix.search_prefix("quer", k=k)),
    ],
)
def test_single_clause_parity_with_primitives(qindex, query, mode, primitive):
    got = _rows(qindex.search_query(query, k=10, mode=mode))
    want = _rows(primitive(qindex, 10))
    _assert_same(got, want, query)


def test_facet_parity_with_search_filtered(qindex, docs_sf0001):
    from pyspark.sql import functions as F

    allowed = docs_sf0001.filter(F.col("lang") == "de").select("doc_id")
    want = _rows(qindex.search_filtered("data value", allowed, k=10, mode="or"))
    got = _rows(qindex.search_query("data value lang:de", k=10, mode="or", docs=docs_sf0001))
    _assert_same(got, want)


def test_facet_range_and_multivalue_parity(qindex, docs_sf0001):
    """lang:de,en (any-of) + n_chars:[120 TO 200] (numeric inclusive range)
    + a repeated conjunctive field must equal the hand-built filter."""
    from pyspark.sql import functions as F

    allowed = docs_sf0001.filter(
        F.col("lang").isin("de", "en")
        & (F.col("n_chars") >= 120)
        & (F.col("n_chars") <= 200)
    ).select("doc_id")
    want = _rows(qindex.search_filtered("data value", allowed, k=10, mode="or"))
    got = _rows(
        qindex.search_query(
            "data value lang:de,en n_chars:[120 TO 200]",
            k=10, mode="or", docs=docs_sf0001,
        )
    )
    _assert_same(got, want)
    # conjunctive repeated field: de AND en on a single-valued column = empty
    assert (
        qindex.search_query(
            "data value lang:de lang:en", k=10, mode="or", docs=docs_sf0001
        ).count()
        == 0
    )
    # one-sided range + non-numeric bound (lexicographic on source string)
    allowed2 = docs_sf0001.filter(F.col("source") >= "src5").select("doc_id")
    want2 = _rows(qindex.search_filtered("data value", allowed2, k=10, mode="or"))
    got2 = _rows(
        qindex.search_query(
            "data value source:[src5 TO *]", k=10, mode="or", docs=docs_sf0001
        )
    )
    _assert_same(got2, want2)


def test_phrase_plus_term_is_filtered_disjunction(qindex, docs_sf0001):
    """'"merge part" data' == OR-score {merge, part, data} restricted to the
    phrase survivors (phrase docs contain merge and part by definition)."""
    surv = qindex.search_phrase("merge part", k=1 << 30).select("doc_id")
    want = _rows(qindex.search_filtered("merge part data", surv, k=10, mode="or"))
    got = _rows(qindex.search_query('"merge part" data', k=10))
    _assert_same(got, want)


def _bm25_oracle(pydocs):
    """Per-(doc, term) BM25 weights, brute-force in Python."""
    import math
    from collections import Counter

    rx = re.compile(IDENT_RE)
    toks = {d: rx.findall((t or "").lower()) for d, t in pydocs}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    df = Counter(t for c in tf.values() for t in c)
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    def w(d, t):
        f = tf[d].get(t, 0)
        if not f:
            return 0.0
        idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        return idf * f * 2.2 / (f + 1.2 * (1 - 0.75 + 0.75 * len(toks[d]) / avgdl))
    return toks, tf, df, w


@pytest.fixture(scope="module")
def pydocs(docs_sf0001):
    return [(r["doc_id"], r["text"]) for r in docs_sf0001.select("doc_id", "text").collect()]


def test_composed_query_matches_python_oracle(qindex, pydocs):
    """'+data value* -merge spark': must + prefix-expansion + NOT + bare,
    brute-forced in Python (expansions score qtf=1, never required;
    explicit atoms win collisions)."""
    toks, tf, df, w = _bm25_oracle(pydocs)
    expansions = sorted(t for t in df if t.startswith("value"))
    want = []
    for d in toks:
        if not tf[d].get("data") or tf[d].get("merge"):
            continue
        score = w(d, "data") + w(d, "spark") + sum(w(d, t) for t in expansions)
        want.append((d, round(score, 6)))
    want.sort(key=lambda r: (-r[1], r[0]))
    got = _rows(qindex.search_query("+data value* -merge spark", k=10, round_to=6))
    _assert_same(got, want[:10])


def test_must_term_in_phrase_not_double_counted(qindex, pydocs):
    """'+merge "merge part"' — merge plays two roles but is one scoring atom
    with qtf=2 (its occurrence count across the query string)."""
    toks, tf, df, w = _bm25_oracle(pydocs)
    rx = re.compile(IDENT_RE)
    phrase = ["merge", "part"]
    want = []
    for d, ts in toks.items():
        hit = any(ts[i : i + 2] == phrase for i in range(len(ts) - 1))
        if hit and tf[d].get("merge"):
            want.append((d, round(2.0 * w(d, "merge") + w(d, "part"), 6)))
    want.sort(key=lambda r: (-r[1], r[0]))
    got = _rows(qindex.search_query('+merge "merge part"', k=10, round_to=6))
    _assert_same(got, want[:10])


def test_missing_required_atom_returns_empty(qindex):
    assert qindex.search_query("+zzz_not_here data").count() == 0
    assert qindex.search_query('"zzz_not_here data"').count() == 0
    assert qindex.search_query("-data").count() == 0  # no positive atom


def test_facet_requires_docs_table(qindex):
    with pytest.raises(ValueError):
        qindex.search_query("data lang:de")


# ------------------------------------------------------------------ NEAR


def _near_oracle(pydocs, terms, window):
    rx = re.compile(IDENT_RE)
    out = set()
    for d, t in pydocs:
        ts = rx.findall((t or "").lower())
        pos = {w: [i for i, x in enumerate(ts) if x == w] for w in terms}
        if any(not v for v in pos.values()):
            continue
        anchors = sorted(q for v in pos.values() for q in v)
        if any(
            all(any(a <= q <= a + window for q in pos[w]) for w in terms)
            for a in anchors
        ):
            out.add(d)
    return out


@pytest.mark.parametrize(
    "query,window",
    [("merge part", 1), ("merge part", 5), ("data query", 3), ("spark window fast", 8)],
)
def test_near_matches_python_oracle(qindex, pydocs, query, window):
    got = {r["doc_id"] for r in qindex.search_near(query, window, k=1 << 30).collect()}
    assert got == _near_oracle(pydocs, query.split(), window), (query, window)


def test_near_wide_window_equals_and_search(qindex):
    """A window larger than any doc degenerates NEAR to conjunctive AND —
    same docs, same scores."""
    want = _rows(qindex.search("data query", k=10, mode="and"))
    got = _rows(qindex.search_near("data query", 10**6, k=10))
    _assert_same(got, want)


def test_near_window1_superset_of_phrase(qindex):
    """Unordered adjacency (window=1) must contain every exact-phrase doc
    (and may add reversed-order ones)."""
    ph = {r["doc_id"] for r in qindex.search_phrase("merge part", k=1 << 30).collect()}
    nr = {r["doc_id"] for r in qindex.search_near("merge part", 1, k=1 << 30).collect()}
    assert ph <= nr


def test_parse_near_clause():
    spec = parse_query('data "merge part"~3 +x')
    assert spec.nears == [("merge part", 3)]
    assert spec.phrases == [] and spec.should == ["data"] and spec.must == ["x"]
    # plain phrase unaffected; ~ without quotes is just a term character
    assert parse_query('"a b"').phrases == ["a b"]


def test_search_query_near_parity(qindex):
    got = _rows(qindex.search_query('"merge part"~5'))
    want = _rows(qindex.search_near("merge part", 5, k=10))
    _assert_same(got, want)


def test_search_query_near_composed(qindex, pydocs):
    """'+data "merge part"~5' — near survivors intersected with the must
    term, scored over all three atoms."""
    toks, tf, df, w = _bm25_oracle(pydocs)
    near_docs = _near_oracle(pydocs, ["merge", "part"], 5)
    want = []
    for d in toks:
        if d in near_docs and tf[d].get("data"):
            want.append((d, round(w(d, "data") + w(d, "merge") + w(d, "part"), 6)))
    want.sort(key=lambda r: (-r[1], r[0]))
    got = _rows(qindex.search_query('+data "merge part"~5', k=10, round_to=6))
    _assert_same(got, want[:10])


def test_positional_ops_need_positions_index(engines_nopos):
    """Clear driver-side error on a positions-less index for every
    positional surface (instead of a worker-side KeyError)."""
    idx = engines_nopos
    with pytest.raises(ValueError, match="positions-enabled"):
        idx.search_phrase("merge part")
    with pytest.raises(ValueError, match="positions-enabled"):
        idx.search_near("merge part", 3)
    with pytest.raises(ValueError, match="positions-enabled"):
        idx.search_query('"merge part"')
    # non-positional grammar still works on the same index
    assert idx.search_query("data").count() > 0


@pytest.fixture(scope="module")
def engines_nopos(spark, docs_sf0001):
    tf = S.term_frequencies(docs_sf0001, text_col="text")
    dl = S.doc_lengths(tf)
    td = build_term_dict(S.document_frequencies(tf))
    p = build_postings(tf, dl, td, S.corpus_stats(dl), docs_per_part=128)
    return Bm25CompressedIndex(spark, p.persist(), td.persist())


# ------------------------------------------------------------ batched grammar


def test_search_query_batch_per_query_parity(qindex):
    """Every batch row set must equal its single search_query result —
    across all clause kinds (must/NOT/prefix/phrase/NEAR, both modes)."""
    queries = {
        "plain": "spark query",
        "boolean": "+data s* -merge window",
        "phrase": '"merge part" data',
        "near": '+data "merge part"~5',
        "unmatchable": "+zzz_not_here data",
    }
    batch = qindex.search_query_batch(queries, k=10, round_to=6).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    assert "unmatchable" not in by_q
    for qid, q in queries.items():
        if qid == "unmatchable":
            continue
        want = _rows(qindex.search_query(q, k=10, round_to=6))
        _assert_same(sorted(by_q.get(qid, []), key=lambda t: (-t[1], t[0])), want, qid)


def test_search_query_batch_facets_need_docs(qindex):
    # facets are supported in batch (r4) but require the docs table
    with pytest.raises(ValueError, match="docs"):
        qindex.search_query_batch(["data lang:de"])


def test_search_query_batch_facet_parity(qindex, docs_sf0001):
    """Each faceted batch entry must equal its search_query result; mixed
    faceted/unfaceted batches keep unfaceted queries unfiltered."""
    queries = {
        "de": "data value lang:de",
        "range": "data value n_chars:[120 TO 200]",
        "plain": "data value",
        "empty": "data value lang:zz_nonexistent",
    }
    batch = qindex.search_query_batch(
        queries, k=10, round_to=6, docs=docs_sf0001
    ).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    assert "empty" not in by_q  # facet allows nothing -> no rows
    for qid, q in queries.items():
        if qid == "empty":
            continue
        want = _rows(qindex.search_query(q, k=10, round_to=6, docs=docs_sf0001))
        got = sorted(by_q.get(qid, []), key=lambda t: (-t[1], t[0]))
        _assert_same(got, want, qid)


# ------------------------------------------------------------------ boosts


def test_parse_boosts():
    spec = parse_query("data^2 +key^1.5 -x^3 plain")
    assert spec.should == ["data", "plain"] and spec.must == ["key"]
    assert spec.boosts == [("data", 2.0), ("key", 1.5)]  # NOT boost dropped
    assert spec.exclude == ["x"]
    for bad in ("quer*^2", "lang:de^2"):
        with pytest.raises(ValueError, match="boost"):
            parse_query(bad)


def test_boost_is_term_repetition_sugar(qindex):
    """'data^2 spark' == 'data data spark' == the OR primitive on the
    repeated string; '+data^3' == AND with qtf 3."""
    want = _rows(qindex.search("data data spark", k=10, mode="or"))
    _assert_same(_rows(qindex.search_query("data^2 spark")), want)
    _assert_same(_rows(qindex.search_query("data data spark")), want)
    want_and = _rows(qindex.search("data data data", k=10, mode="and"))
    _assert_same(_rows(qindex.search_query("+data^3")), want_and)


def test_boost_accumulates_per_occurrence(qindex):
    """'data data^2' totals qtf 3 — same as 'data^3'."""
    a = _rows(qindex.search_query("data data^2 spark", round_to=6))
    b = _rows(qindex.search_query("data^3 spark", round_to=6))
    _assert_same(a, b)


# ------------------------------------------------------------- ordered NEAR


def _near_ordered_oracle(pydocs, terms, window):
    rx = re.compile(IDENT_RE)
    out = set()
    for d, t in pydocs:
        ts = rx.findall((t or "").lower())
        pos = {w: [i for i, x in enumerate(ts) if x == w] for w in set(terms)}
        if any(not pos[w] for w in terms):
            continue
        for p1 in pos[terms[0]]:
            cur, ok = p1, True
            for w in terms[1:]:
                nxt = [q for q in pos[w] if q > cur]
                if not nxt:
                    ok = False
                    break
                cur = min(nxt)
            if ok and cur - p1 <= window:
                out.add(d)
                break
    return out


@pytest.mark.parametrize(
    "query,window",
    [("merge part", 3), ("part merge", 3), ("data query", 5), ("spark window fast", 10)],
)
def test_near_ordered_matches_python_oracle(qindex, pydocs, query, window):
    got = {
        r["doc_id"]
        for r in qindex.search_near(query, window, k=1 << 30, ordered=True).collect()
    }
    assert got == _near_ordered_oracle(pydocs, query.split(), window), (query, window)


def test_near_ordered_tight_window_equals_phrase(qindex):
    """ordered NEAR with window = len(terms)-1 forces exact adjacency in
    order == search_phrase (docs AND scores)."""
    want = _rows(qindex.search_phrase("merge part", k=10))
    got = _rows(qindex.search_near("merge part", 1, k=10, ordered=True))
    _assert_same(got, want)


def test_near_ordered_subset_of_unordered(qindex):
    un = {r["doc_id"] for r in qindex.search_near("data query", 5, k=1 << 30).collect()}
    od = {
        r["doc_id"]
        for r in qindex.search_near("data query", 5, k=1 << 30, ordered=True).collect()
    }
    assert od <= un


# ------------------------------------------------------------------ fuzzing


def test_parse_query_total_on_arbitrary_input():
    """parse_query is total: any string either parses or raises the
    documented ValueError — never any other exception."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def run(q):
        try:
            spec = parse_query(q)
        except ValueError:
            return
        # invariants: parsed clauses are non-None strings / well-formed
        assert all(isinstance(w, str) for w in spec.should + spec.must + spec.exclude)
        assert all(isinstance(p, str) and p.strip() for p in spec.phrases)
        assert all(w >= 0 for _s, w in spec.nears)
        assert all(b >= 0 for _t, b in spec.boosts)

    run()


# ------------------------------------------------------------------ fuzzy


def test_parse_fuzzy():
    spec = parse_query("quer~1 data near~2")
    assert spec.fuzzies == [("quer", 1), ("near", 2)]
    assert spec.should == ["data"]
    with pytest.raises(ValueError, match="negated fuzzy"):
        parse_query("-quer~1")
    with pytest.raises(ValueError, match="boost on a fuzzy"):
        parse_query("quer~1^2")
    with pytest.raises(ValueError, match="distance"):
        parse_query("quer~3")


def test_fuzzy_expansion_matches_manual(qindex, pydocs):
    """'quer~1 data' == OR-scoring {data} + every dict term within edit
    distance 1 of 'quer', each qtf=1 (brute-forced in Python)."""
    import math

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    toks, tf, df, w = _bm25_oracle(pydocs)
    exp = sorted(t for t in df if lev(t, "quer") <= 1)
    assert exp, "fixture must have at least one expansion"
    terms = set(exp) | {"data"}
    want = []
    for d in toks:
        s = sum(w(d, t) for t in terms)
        if s > 0:
            want.append((d, round(s, 6)))
    want.sort(key=lambda r: (-r[1], r[0]))
    got = _rows(qindex.search_query("quer~1 data", k=10, round_to=6))
    _assert_same(got, want[:10])


def test_fuzzy_collision_with_explicit_atom(qindex):
    """'query query~0' — the distance-0 expansion collides with the
    explicit term and is skipped (qtf stays 1, not 2)."""
    want = _rows(qindex.search("query", k=10, mode="or"))
    got = _rows(qindex.search_query("query query~0"))
    _assert_same(got, want)


def test_signed_prefix_stays_should():
    """'+pre*' is accepted; the prefix stays SHOULD (expansions are never
    required) — pinned so the behavior is deliberate, not accidental."""
    assert parse_query("+quer* data").prefixes == ["quer"]
    assert parse_query("+quer* data").must == []


def test_parse_regexp_clause():
    spec = parse_query("data /Quer[a-z]*/ other")
    assert spec.regexps == ["quer[a-z]*"]
    assert spec.should == ["data", "other"]
    with pytest.raises(ValueError, match="regexp"):
        parse_query("-/abc/")
    # slashes with a space inside are NOT a regexp clause
    assert parse_query("/a b/").regexps == []


def test_grammar_regexp_parity_with_search_regexp(qindex):
    want = _rows(qindex.search_regexp("quer[a-z]*", k=10, round_to=6))
    got = _rows(qindex.search_query("/quer[a-z]*/", k=10, round_to=6))
    _assert_same(got, want)


def test_parse_wildcard_clause():
    spec = parse_query("data quer?y a*b")
    # ? and mid-star compile to whole-term regexps (escaped literals)
    assert spec.regexps == ["quer.y", "a.*b"]
    assert spec.prefixes == [] and spec.should == ["data"]
    # trailing-star-only stays a prefix; bare * stays a term
    s2 = parse_query("plain* *")
    assert s2.prefixes == ["plain"] and s2.should == ["*"] and s2.regexps == []
    with pytest.raises(ValueError, match="wildcard"):
        parse_query("-qu?ry")


def test_grammar_wildcard_parity_with_regexp(qindex):
    # quer? == regex quer. — single-char wildcard over the fixture vocab
    want = _rows(qindex.search_regexp("quer.", k=10, round_to=6))
    got = _rows(qindex.search_query("quer?", k=10, round_to=6))
    _assert_same(got, want)


def test_numeric_range_facet_on_nonnumeric_strings_filters(qindex, docs_sf0001):
    """r6 fix (ANSI): a numeric range facet over a string column holding
    non-numeric values must FILTER those rows (try_cast), not hard-fail
    the query the way a plain cast does under Spark 4 ANSI mode."""
    got = qindex.search_query(
        "data value source:[1 TO 5]", k=10, mode="or", docs=docs_sf0001
    )
    assert got.count() == 0  # 'srcN' never parses as a number


def test_search_regexp_uppercase_pattern_lowercases(qindex):
    """r6 fix: the dictionary stores lowercased terms; the direct API
    must lowercase the pattern like search_prefix and the /re/ grammar
    clause already do, instead of silently matching nothing."""
    lo = _rows(qindex.search_regexp("dat.*", k=10))
    hi = _rows(qindex.search_regexp("Dat.*", k=10))
    assert lo, "fixture corpus must match dat.*"
    assert hi == lo
