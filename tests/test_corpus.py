from __future__ import annotations

from pyspark.sql import functions as F

from searchenginer_spark.sources.corpus import (
    DUP_EVERY,
    NEARDUP_EVERY,
    generate_corpus,
    mint_doc_ids,
)


def test_corpus_schema_and_determinism(spark):
    a = generate_corpus(spark, 300, seed=42)
    assert a.columns == ["repo", "path", "commit", "lang", "content"]
    # same seed twice, different partitioning -> identical bytes
    h1 = a.select(F.sha2(F.concat_ws("|", "repo", "path", "commit", "lang", "content"), 256).alias("h"))
    b = generate_corpus(spark, 300, seed=42).repartition(13)
    h2 = b.select(F.sha2(F.concat_ws("|", "repo", "path", "commit", "lang", "content"), 256).alias("h"))
    assert h1.exceptAll(h2).count() == 0 and h2.exceptAll(h1).count() == 0
    # different seed -> different content
    c = generate_corpus(spark, 300, seed=7)
    assert a.select("content").exceptAll(c.select("content")).count() > 0


def test_corpus_has_dups_and_hot_terms(spark):
    df = generate_corpus(spark, 300, seed=42)
    n = df.count()
    n_distinct = df.select("content").distinct().count()
    assert n_distinct < n  # exact dups present (id % DUP_EVERY == 1)
    assert DUP_EVERY < 300 and NEARDUP_EVERY < 300
    hot = df.filter(F.col("content").contains("return")).count()
    assert hot > n // 2
    near = df.filter(F.col("content").contains("renamed_ident")).count()
    assert near >= 1


def test_mint_doc_ids_dense_rank(spark):
    docs = mint_doc_ids(generate_corpus(spark, 250, seed=42), num_partitions=7)
    rows = docs.select("repo", "path", "doc_id").collect()
    by_key = sorted(rows, key=lambda r: (r["repo"], r["path"]))
    assert [r["doc_id"] for r in by_key] == list(range(250))
    # sha invariant column present and correct
    bad = docs.filter(F.sha2("content", 256) != F.col("content_sha256")).count()
    assert bad == 0


def test_exact_dup_invariant_holds_across_neardup_chain():
    """Every id%DUP_EVERY==1 is byte-identical to id-1, including ids whose
    dup target is itself near-dup-renamed (first chain hits ~id 2426)."""
    import numpy as np

    from searchenginer_spark.sources.corpus import _content_for

    n = 6000
    content = _content_for(np.arange(n, dtype=np.uint64), seed=42)
    chained = 0
    for i in range(1, n):
        if i % DUP_EVERY == 1:
            assert content[i] == content[i - 1], f"dup invariant broken at id {i}"
            if (i - 1) % NEARDUP_EVERY == 2:
                chained += 1
    assert chained >= 1  # the chain case is actually exercised
    # near-dups still exist and differ from their base by the rename
    renamed = [i for i in range(1, n) if "renamed_ident" in content[i]]
    assert renamed, "no near-dup renames generated"


def test_read_text_corpus_roundtrip(spark, tmp_path):
    """Plain-text scan: files written per-doc come back as (path, content)
    rows and index identically to the in-memory docs."""
    from searchenginer_spark.sources.catalog import read_text_corpus, read_text_lines

    d = tmp_path / "txt"
    d.mkdir()
    docs = {"a.txt": "int return value", "b.txt": "def foo\nreturn foo"}
    for name, content in docs.items():
        (d / name).write_text(content)
    got = {
        r["path"].rsplit("/", 1)[-1]: r["content"]
        for r in read_text_corpus(spark, str(d)).collect()
    }
    assert got == docs
    lines = {r["line"] for r in read_text_lines(spark, str(d / "b.txt")).collect()}
    assert lines == {"def foo", "return foo"}


def test_neardup_partner_always_displayed(spark):
    """r6 fix: every near-dup doc's un-renamed partner stream must be
    DISPLAYED by some doc. The hole was base1 % (97*101) == 2 — the
    source was itself an exact-dup redirect, so no doc carried the
    un-renamed stream. Doc index 2 is exactly that case."""
    import numpy as np

    from searchenginer_spark.sources.corpus import _content_for

    texts = _content_for(np.arange(0, 6, dtype=np.uint64), seed=42)
    # doc 2 renames identifiers of the stream doc 0 displays (doc 1 is a
    # byte-copy of doc 0, so the resolved source is 0): identical token
    # STRUCTURE (hot tokens + line shape), differing only in renamed ids
    t0, t2 = texts[0].split(), texts[2].split()
    assert len(t0) == len(t2)
    assert texts[1] == texts[0]  # exact-dup redirect unchanged
    diffs = sum(a != b for a, b in zip(t0, t2))
    assert 0 < diffs < len(t0)  # renamed, not unrelated


def test_lang_id_cjk_and_romance(spark):
    """r6 fix: zh scores by Han codepoints (pinyin markers collided with
    Romance function words): French stays fr, Chinese text is zh."""
    from pyspark.sql import functions as F

    from searchenginer_spark.functions.textstats import lang_id

    rows = [
        (0, "de la part de madame de Pompadour et le reste"),
        (1, "我们在这里学习中文的语言处理"),
        (2, "the cat and the dog went to the market"),
        (3, "qwerty uiop zxcv"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {r["i"]: r["lang"] for r in df.select("i", lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {0: "fr", 1: "zh", 2: "en", 3: "und"}
