"""HTTP gateway parity: the /api/search and /api/suggest routes must
return exactly what the underlying index calls return, with form input
percent-decoded the way the reference gateway does
(src/Search_Engine_Server.cpp:44-77, src/Utils.cpp:5-28)."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest

from searchenginer_spark.operators.suggest import suggest
from searchenginer_spark.plans.build_index import build_index, open_index
from searchenginer_spark.serving import SearchServer, decode_form, url_decode
from searchenginer_spark.sources.corpus import build_docs


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("srv") / "idx")
    build_index(
        build_docs(spark, 150, seed=7), root, docs_per_part=64,
        with_positions=True,  # the grammar test sends a phrase clause
    )
    srv = SearchServer(spark, root, port=0).start()
    yield srv
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}{path}", timeout=120
    ) as r:
        return r.status, json.loads(r.read())


def _post(srv, path, body, ctype):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=body.encode(),
        headers={"Content-Type": ctype},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_search_route_matches_direct_call(server):
    want = [
        {"doc_id": r["doc_id"], "score": r["score"]}
        for r in server.idx.search_query("int return", k=5).collect()
    ]
    assert want, "fixture corpus must hit"
    q = urllib.parse.quote_plus("int return")
    status, got = _get(server, f"/api/search?query={q}&k=5")
    assert status == 200
    assert got["query"] == "int return" and got["k"] == 5
    assert got["results"] == want

    # POST form body — the reference's input shape (percent + '+')
    status, got2 = _post(
        server, "/api/search", f"query=int+return&k=5",
        "application/x-www-form-urlencoded",
    )
    assert status == 200 and got2["results"] == want

    # POST JSON
    status, got3 = _post(
        server, "/api/search", json.dumps({"query": "int return", "k": 5}),
        "application/json",
    )
    assert status == 200 and got3["results"] == want


def test_search_route_grammar_through_percent_encoding(server):
    query = '"int return" -float'
    want = [
        {"doc_id": r["doc_id"], "score": r["score"]}
        for r in server.idx.search_query(query, k=5).collect()
    ]
    status, got = _get(
        server, "/api/search?query=" + urllib.parse.quote_plus(query) + "&k=5"
    )
    assert status == 200
    assert got["query"] == query  # %22/%20/+ all decoded
    assert got["results"] == want


def test_suggest_route_matches_direct_call(server):
    want = [
        {"term": r["term"], "sim": r["sim"]}
        for r in suggest(server.idx.term_dict, "retrun", k=5).collect()
    ]
    status, got = _get(server, "/api/suggest?word=retrun&k=5")
    assert status == 200
    assert got["word"] == "retrun" and got["suggestions"] == want


def test_gateway_k_validation(server):
    """r6 fix: malformed k is a 400, not a 500; k=0 rejected explicitly."""
    for bad in ("abc", "0", "-3"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server, f"/api/search?query=int&k={bad}")
        assert e.value.code == 400, bad
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/api/search", "not json", "application/json")
    assert e.value.code == 400


def test_gateway_errors(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/search?k=5")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/nope")
    assert e.value.code == 404


def test_url_decode_parity(spark):
    """Columnar url_decode == the driver-side form decode == stdlib
    unquote_plus on the shapes the reference's Utils.cpp handles:
    '+' -> space, %XX bytes, multi-byte UTF-8, literal %2B."""
    cases = ["a+b", "a%2Bb", "int%20return", "%E4%B8%AD%E6%96%87",
             "plain", "q%3D1%26r%3D2"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {
        r["s"]: r["d"]
        for r in df.select("s", url_decode("s").alias("d")).collect()
    }
    for c in cases:
        want = urllib.parse.unquote_plus(c)
        assert got[c] == want, c
        assert decode_form(f"x={c}")["x"] == want, c


def test_search_batch_route(server):
    qs = {"a": "int return", "b": "float", "c": "zzzznohit"}
    want_rows = server.idx.search_query_batch(qs, k=4).collect()
    want: dict[str, list] = {i: [] for i in qs}
    for r in want_rows:
        want[r["query_id"]].append({"doc_id": r["doc_id"], "score": r["score"]})
    status, got = _post(
        server, "/api/search_batch",
        json.dumps({"queries": qs, "k": 4}), "application/json",
    )
    assert status == 200 and got["k"] == 4
    assert got["results"] == want
    assert got["results"]["c"] == []  # hitless id still present
    # form-encoded variant carries the queries object as a JSON field
    body = "queries=" + urllib.parse.quote_plus(json.dumps(qs)) + "&k=4"
    status, got2 = _post(
        server, "/api/search_batch", body, "application/x-www-form-urlencoded"
    )
    assert status == 200 and got2["results"] == want
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/api/search_batch", "{}", "application/json")
    assert e.value.code == 400
