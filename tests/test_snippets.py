from __future__ import annotations

from searchenginer_spark.operators.snippets import snippets


def test_snippets_first_match_and_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "Beta comes first here, then alpha later on"),
            (3, "no query words at all in this one"),
            (4, "x" * 50 + " alpha " + "y" * 200),
        ],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame(
        [(1, 3.0), (2, 2.5), (3, 2.0), (4, 1.5)], "doc_id long, score double"
    )
    rows = {
        r["doc_id"]: r
        for r in snippets(hits, docs, ["alpha", "beta"], width=20, lead=5).collect()
    }
    # doc 1: 'alpha' at offset 1 wins; clamp start to 1
    assert rows[1]["pos"] == 1 and rows[1]["match_term"] == "alpha"
    assert rows[1]["snippet"] == "alpha beta gamma del"
    # doc 2: case-insensitive 'beta' at 1 beats 'alpha' at 29
    assert rows[2]["pos"] == 1 and rows[2]["match_term"] == "beta"
    # doc 3: no match -> pos 0, empty term, doc prefix
    assert rows[3]["pos"] == 0 and rows[3]["match_term"] == ""
    assert rows[3]["snippet"] == "no query words at al"
    # doc 4: window starts lead chars before the match
    assert rows[4]["pos"] == 52
    assert rows[4]["snippet"].startswith("xxxx alpha")  # start = 52 - 5 = 47
    # ordering: score desc
    got = [r["doc_id"] for r in snippets(hits, docs, ["alpha"], width=20).collect()]
    assert got == [1, 2, 3, 4]


def test_snippets_tie_prefers_lexicographic_term(spark):
    docs = spark.createDataFrame([(1, "betaalpha")], "doc_id long, text string")
    hits = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    # 'beta' matches at 1; 'alpha' at 5 — position decides, not term order
    r = snippets(hits, docs, ["alpha", "beta"], width=10).first()
    assert r["match_term"] == "beta" and r["pos"] == 1


def test_snippets_empty_terms_no_match_shape(spark):
    # a query that tokenized to nothing must not crash (ADVICE r3):
    # no-match shape — pos 0, empty match_term, leading-width snippet
    docs = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    hits = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    r = snippets(hits, docs, [], width=10).first()
    assert r["pos"] == 0 and r["match_term"] == ""
    assert r["snippet"] == "alpha beta"


def test_snippets_all_match_spans(spark):
    """with_matches: EVERY term's first offset rides along, sorted by
    (pos, term), serialized 'pos:term|...' — per-term highlights."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "no hits here"),
            (3, "gammagamma beta"),
        ],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, score double"
    )
    rows = {
        r["doc_id"]: r["matches"]
        for r in snippets(
            hits, docs, ["alpha", "beta", "gamma"], width=20, with_matches=True
        ).collect()
    }
    assert rows[1] == "1:alpha|7:beta|12:gamma"  # first offsets only
    assert rows[2] == ""  # none present
    assert rows[3] == "1:gamma|12:beta"  # sorted by pos, not term
