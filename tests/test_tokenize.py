from __future__ import annotations

from pyspark.sql import functions as F

from searchenginer_spark.functions.tokenize import (
    explode_tokens,
    tokens,
    tokens_pandas_udf,
)


def test_identifier_tokens(spark):
    df = spark.createDataFrame(
        [(1, "int Foo_1 = bar(baz2); // return  x"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = df.select("doc_id", tokens("text").alias("t")).orderBy("doc_id").collect()
    assert rows[0]["t"] == ["int", "foo_1", "bar", "baz2", "return", "x"]
    assert rows[1]["t"] == []
    assert rows[2]["t"] is None or rows[2]["t"] == []


def test_jvm_and_pandas_tokenizers_agree(spark, docs_sf0001):
    df = docs_sf0001.limit(100)
    mismatch = (
        df.select(
            "doc_id",
            tokens("text").alias("a"),
            tokens_pandas_udf()(F.col("text")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert mismatch == 0


def test_positions(spark):
    df = spark.createDataFrame([(7, "a b a")], "doc_id long, text string")
    rows = (
        explode_tokens(df, with_positions=True)
        .orderBy("pos")
        .collect()
    )
    assert [(r["pos"], r["term"]) for r in rows] == [(0, "a"), (1, "b"), (2, "a")]
