from __future__ import annotations

import importlib.util

import pytest
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
    cli.main(["search", "--root", root, "--q", "int +return -xyzzy ret*", "--k", "5"])
    bf = str(tmp_path / "queries.txt")
    with open(bf, "w") as f:
        f.write("int +return\nvalue^2 data\n\n-only_negative_skipped int\n")
    cli.main(["search", "--root", root, "--batch-file", bf, "--k", "3"])
    cli.main(["suggest", "--root", root, "--q", "retrun"])


_HAS_JIEBA = importlib.util.find_spec("jieba") is not None


@pytest.mark.skipif(_HAS_JIEBA, reason="jieba installed — error path n/a")
def test_jieba_tokenizer_clear_error_without_jieba(spark):
    """tokenizer='jieba' must fail LOUDLY and actionably where jieba is
    absent (this sandbox), never silently fall back to another tokenizer."""
    from searchenginer_spark.operators.stats import term_frequencies

    docs = spark.createDataFrame([(1, "我们喜欢机器学习")], "doc_id long, text string")
    with pytest.raises(ImportError, match="jieba"):
        term_frequencies(docs, tokenizer="jieba").collect()


@pytest.mark.skipif(not _HAS_JIEBA, reason="jieba not installed in this env")
def test_jieba_tokenizer_segments_words(spark):
    """On a cluster WITH jieba: real dictionary segmentation drives
    term_frequencies with no other code change (cppjieba MixSegment parity,
    include/cppjieba/MixSegment.hpp:46-86)."""
    from searchenginer_spark.operators.stats import term_frequencies

    docs = spark.createDataFrame(
        [(1, "我们喜欢机器学习"), (2, "机器人在工厂工作")], "doc_id long, text string"
    )
    tf = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_frequencies(docs, tokenizer="jieba").collect()
    }
    # dictionary segmentation yields whole words, not bigrams
    assert (1, "机器学习") in tf or ((1, "机器") in tf and (1, "学习") in tf)
    assert (2, "机器人") in tf
    assert all(len(t) <= 4 for (_, t) in tf)


def test_cjk_bigram_retrieval_golden(spark):
    """Golden hand-segmented fixture (what the reference's jieba MixSegment,
    include/cppjieba/MixSegment.hpp:46-86, would produce) vs the bigram
    fallback. The recall guarantee under test: every golden word of length
    >= 2 appearing contiguously in a doc is covered by that doc's bigram set
    (all of the word's bigrams present), so conjunctive bigram retrieval
    finds every doc a word-segmented index would. Precision can be lower
    (cross-word bigrams may false-match) — documented in COVERAGE.md.
    """
    docs = {
        1: "我们喜欢机器学习",          # golden: 我们 / 喜欢 / 机器 / 学习
        2: "机器人在工厂工作",          # golden: 机器人 / 在 / 工厂 / 工作
        3: "学习数据结构与算法",        # golden: 学习 / 数据 / 结构 / 与 / 算法
    }
    golden = {
        1: ["我们", "喜欢", "机器", "学习"],
        2: ["机器人", "在", "工厂", "工作"],
        3: ["学习", "数据", "结构", "与", "算法"],
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    toks = {
        r["doc_id"]: set(r["t"])
        for r in df.select("doc_id", cjk_tokens("text").alias("t")).collect()
    }

    def bigrams(w):
        return [w[i : i + 2] for i in range(len(w) - 1)] if len(w) >= 2 else [w]

    # recall: for every (doc, golden word), the doc's bigram tokens cover it
    for d, words in golden.items():
        for w in words:
            if len(w) == 1:
                continue  # single-char words are only found inside bigrams —
                # the known recall gap of the dictionary-free fallback
            assert set(bigrams(w)) <= toks[d], (d, w)

    # retrieval: conjunctive match on a golden word's bigrams finds exactly
    # the docs containing the word contiguously
    for w, want in [("机器", {1, 2}), ("学习", {1, 3}), ("机器人", {2}), ("工厂", {2})]:
        got = {d for d, ts in toks.items() if set(bigrams(w)) <= ts}
        assert got == want, (w, got, want)


def test_cli_corpus_clean(spark, tmp_path, capsys):
    """r6 corpus-clean: Gopher gate drops the degenerate doc, ExactSubstr
    strips the cross-doc repeated passage, stats summarize the WRITTEN
    table."""
    import json

    from searchenginer_spark import cli

    shared = " ".join(f"tok{i}" for i in range(12))
    rows = [
        (0, "lead " + shared + " tail0 " + " ".join(f"a{i}" for i in range(20))),
        (1, "start " + shared + " end1 " + " ".join(f"b{i}" for i in range(20))),
        (2, "spam " * 400),  # fails the Gopher gate (top-2gram frac = 1)
        (3, " ".join(f"c{i}" for i in range(40))),  # clean and unique
    ]
    src = str(tmp_path / "dirty")
    out = str(tmp_path / "clean")
    spark.createDataFrame(rows, "doc_id long, content string").write.parquet(src)

    cli.main([
        "corpus-clean", "--corpus", src, "--out", out,
        "--min-len", "8", "--gate",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs_in"] == 4 and summary["docs_out"] == 3
    assert summary["tokens_removed"] >= 12  # the shared passage is cut

    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {0, 1, 3}  # doc 2 gated out
    for d in (0, 1):  # shared passage stripped from both (keep_first off)
        assert "tok0" not in got[d]["content"]
        assert got[d]["n_removed"] >= 12
    assert got[3]["n_removed"] == 0 and got[3]["n_tokens"] == 40
