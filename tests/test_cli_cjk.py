from __future__ import annotations

from pyspark.sql import functions as F

from searchenginer_spark.functions.tokenize import cjk_tokens


def test_cjk_bigrams(spark):
    df = spark.createDataFrame(
        [
            (1, "hello 世界和平 world"),
            (2, "纯中文"),
            (3, "单"),
            (4, "code_id42 mixed中文text"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["t"] for r in df.select("doc_id", cjk_tokens("text").alias("t")).collect()}
    assert rows[1] == ["hello", "世界", "界和", "和平", "world"]
    assert rows[2] == ["纯中", "中文"]
    assert rows[3] == ["单"]
    assert rows[4] == ["code_id42", "mixed", "中文", "text"]


def test_cli_roundtrip(spark, tmp_path):
    # drive cli functions in-process (spark-submit surface is the same code)
    from searchenginer_spark import cli

    out = str(tmp_path / "corpus")
    root = str(tmp_path / "idx")
    cli_spark = spark  # cli.get_spark returns the active session

    cli.main(["gen-corpus", "--n", "200", "--out", out])
    assert cli_spark.read.parquet(out).count() == 200
    cli.main(["build-index", "--corpus", out, "--root", root, "--docs-per-part", "64"])
    assert cli_spark.read.parquet(f"{root}/postings").count() > 0
    cli.main(["query", "--root", root, "--q", "int return", "--k", "5"])
    cli.main(["suggest", "--root", root, "--q", "retrun"])
