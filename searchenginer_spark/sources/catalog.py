"""Thin table-catalog shim: parquet in this sandbox, Iceberg on a real cluster.

The engine's contract (BASELINE.json input_hint) is an Iceberg table; the
sandbox has no Iceberg catalog, so every table write/read funnels through
these two functions. On a cluster, `write_table` becomes
``df.writeTo(name).partitionedBy(...).createOrReplace()`` and partition
overwrite becomes ``overwritePartitions()`` — the call sites do not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TESTDATA_TABLES:
        load_testdata(spark, sf_dir, t).createOrReplaceTempView(t)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Plain-text corpus scan: one doc per FILE, with its path.

    Reference counterpart: the getline loop over corpus files
    (/root/reference/Make_dir/MakeDictAndIndex.cpp:96-110). Spark-native
    form is the built-in text source; ``wholetext`` keeps one row per file
    (a doc), and the input_file_name column replaces the reference's
    directory-iteration bookkeeping.
    """
    from pyspark.sql import functions as F

    return spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value").alias("content")
    )


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text scan (dictionary files, one term per line)."""
    return spark.read.text(path).withColumnRenamed("value", "line")
