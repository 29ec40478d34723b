"""Custom stateful streaming operators (applyInPandasWithState).

streaming_dedup: exactly-once-per-content emission over an unbounded doc
stream — the streaming form of operators/dedup.dedup_exact. State is one
flag per content hash, kept in the state store (checkpointed, survives
restarts); a duplicate arriving in ANY later micro-batch is suppressed.
This is the reference's `seenHashes` set (/root/reference/Make_Page/
rcc.cpp:165-183) turned into distributed, fault-tolerant stream state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Emit only the first-ever occurrence of each content hash.

    Within a micro-batch the lowest id wins (deterministic); across
    batches, arrival order wins (stream semantics). Output schema =
    (id_col, text_col, content_hash) with the id TYPE taken from the
    input stream (string/int keys work, not just bigint).
    """
    id_type = stream.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {text_col} string, content_hash string"
    keyed = stream.select(
        F.col(id_col), F.col(text_col), F.sha2(F.col(text_col), 256).alias("content_hash")
    ).groupBy("content_hash")

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # content already emitted in a previous batch
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[pdf[id_col].idxmin()]
            if first is None or cand[id_col] < first[id_col]:
                first = cand
        if first is not None:
            state.update((1,))
            yield pd.DataFrame(
                {
                    id_col: [first[id_col]],
                    text_col: [first[text_col]],
                    "content_hash": [key[0]],
                }
            )

    return keyed.applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
