"""Document chunking for training-data pipelines: fixed-size token
windows with overlap — the standard pre-training/RAG preparation step
(split long documents into model-context-sized pieces).

Pure JVM column math (tokenize -> sequence of window ids -> slice per
window), so the operator stays inside whole-stage codegen, scales as a
narrow map (no shuffle, no UDF), and has an exact ANSI-SQL oracle.

Window layout: ``stride = max_tokens - overlap``; chunk ``i`` covers
tokens ``[i*stride, i*stride + max_tokens)``. A doc with ``n`` tokens
yields ``1`` chunk when ``n <= max_tokens``, else
``ceil((n - max_tokens)/stride) + 1`` — every token is covered, adjacent
chunks share ``overlap`` tokens, the last chunk may be short. Docs with
zero tokens are dropped. Chunk text is the tokens joined with single
spaces (canonical whitespace; downstream tokenizers retokenize anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .tokenize import IDENT_RE, tokens


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = IDENT_RE,
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text) — sliding token windows.

    ``overlap`` must be < ``max_tokens``. One narrow map stage: the token
    array is built once per doc and sliced per window; no shuffle, no
    Python. At 100 TB this is the same shape as the tokenize stage of the
    index build (the widest-but-embarrassingly-parallel point of a corpus
    pipeline).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}")
    stride = max_tokens - overlap
    t = F.col("_toks")
    n = F.size(t)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(max_tokens)) / F.lit(float(stride))).cast("int") + 1
    )
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(t, i * stride + 1, F.lit(max_tokens)),
    )
    return (
        docs.select(id_col, tokens(text_col, pattern).alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(id_col, F.posexplode(windows).alias("chunk_id", "_chunk"))
        .select(
            id_col,
            "chunk_id",
            F.size("_chunk").alias("n_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int = 512,
    group_docs: int = 1 << 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign chunks to fixed-token-budget training examples by
    TOKEN-OFFSET BUCKETING: chunks in deterministic (doc_id, chunk_id)
    order get example_id = floor(tokens_before / budget), where
    tokens_before is the group-wide running token total — one window
    cumsum, exactly reproducible in ANSI SQL, and no chunk is ever
    split. An example's chunks are contiguous and hold >= budget tokens
    (except the group's last example), overflowing past each budget
    boundary by at most one chunk.

    This is deliberately NOT reset-per-example greedy packing: example
    boundaries fall at budget multiples of the CONTINUOUS cumsum, so
    after an example overflows, the next one starts "in debt" and packs
    fewer tokens — greedy with a per-example reset would instead restart
    its count at zero and can produce different (usually slightly later)
    boundaries. The bucketing form is chosen because it is a pure
    stateless map over the cumsum (no sequential recurrence), making it
    shard-parallel AND bit-identical between the engine and the SQL
    oracle; both packings waste at most one chunk of slack per example.

    Scale shape: the window is PARTITIONED by a doc-range group
    (``doc_id // group_docs``), never global — a global cumsum would
    serialize the corpus through one partition at 100 TB. Packing is
    independent per group (examples never span groups), which is also the
    semantics a sharded training-data writer wants: one output shard per
    group.

    Returns chunks + (group, example_id).
    """
    g = (F.col(id_col) / F.lit(group_docs)).cast("int")
    w = Window.partitionBy("group").orderBy(id_col, "chunk_id")
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        chunks.withColumn("group", g)
        .withColumn("example_id", F.floor(before / F.lit(budget)).cast("int"))
    )
