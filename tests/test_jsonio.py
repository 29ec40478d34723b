"""JSON build/extract surface (json_utils.cpp + Pageserver.cpp analogs)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from searchenginer_spark.functions.jsonio import (
    _extract_first_json,
    extract_first_json_udf,
    from_json_results,
    json_field,
    to_json_results,
)


def test_to_json_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, 0.5, "a b"), (2, 1.25, 'say "hi"')], "doc_id long, score double, title string"
    )
    js = to_json_results(df, ["doc_id", "score", "title"])
    rows = {r["doc_id"]: r["js"] for r in js.collect()}
    assert json.loads(rows[2]) == {"doc_id": 2, "score": 1.25, "title": 'say "hi"'}
    back = from_json_results(js, "js", "doc_id long, score double, title string")
    assert all(
        r["parsed"]["doc_id"] == r["doc_id"] and r["parsed"]["title"] == r["title"]
        for r in back.collect()
    )
    assert {r[0] for r in js.select(json_field("js", "$.title")).collect()} == {
        "a b",
        'say "hi"',
    }


def test_extract_first_json_matches_reference_semantics(spark):
    # golden cases mirroring json_utils.cpp:5-45 behavior
    cases = {
        'noise {"a": {"b": [1, 2]}} trailing {"x": 1}': '{"a": {"b": [1, 2]}}',
        "text [1, [2, 3]] more": "[1, [2, 3]]",
        'esc {"s": "a \\" } b"} end': '{"s": "a \\" } b"}',
        "no json here": None,
        'unterminated {"a": [1, 2': '{"a": [1, 2',  # best-effort suffix
    }
    for s, want in cases.items():
        assert _extract_first_json(s) == want, s
    df = spark.createDataFrame([(s,) for s in cases], "text string")
    got = {
        r["text"]: r["j"]
        for r in df.select("text", extract_first_json_udf()("text").alias("j")).collect()
    }
    assert got == cases
