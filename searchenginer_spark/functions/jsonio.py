"""JSON build / extract scalar surface.

Reference counterparts:
  - response building: /root/reference/src/Pageserver.cpp:12-33 packs the
    top-k results into a JSON array of {docid, title, url, score} items.
    Spark-native form: ``F.to_json(F.struct(...))`` — JVM-side, codegen.
  - extraction: /root/reference/src/json_utils.cpp:5-45
    (extract_first_json) pulls the FIRST balanced JSON object/array out of
    arbitrary text (string- and escape-aware brace matching). Regexes can't
    match nesting, so this is a vectorized Arrow pandas UDF implementing
    the same scan — also a generally useful training-data op (harvesting
    JSON blobs embedded in scraped text).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def to_json_results(df: DataFrame, cols: list[str], out_col: str = "js") -> DataFrame:
    """One JSON object string per row from the named columns (JVM to_json)."""
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in cols])))


def from_json_results(df: DataFrame, col: str, schema: str, out_col: str = "parsed") -> DataFrame:
    """Parse a JSON string column back into a struct (JVM from_json)."""
    return df.withColumn(out_col, F.from_json(F.col(col), schema))


def json_field(col: Column | str, path: str) -> Column:
    """Scalar JSON path extraction (JVM get_json_object)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def _extract_first_json(s: str) -> str | None:
    """Pure-Python twin of json_utils.cpp:5-45 (same semantics, incl. the
    unterminated-suffix fallback and escaped-quote handling)."""
    if s is None:
        return None
    starts = [i for i in (s.find("{"), s.find("[")) if i != -1]
    if not starts:
        return None
    p = min(starts)
    open_c = s[p]
    close_c = "}" if open_c == "{" else "]"
    depth = 0
    in_str = False
    i = p
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            i += 2
            continue
        if c == '"':
            in_str = not in_str
        elif not in_str:
            if c == open_c:
                depth += 1
            elif c == close_c:
                depth -= 1
                if depth == 0:
                    return s[p : i + 1]
        i += 1
    return s[p:]  # unterminated: best-effort suffix, like the reference


def extract_first_json_udf():
    """Arrow-vectorized extract_first_json (built lazily: pandas_udf needs
    an active session)."""

    @pandas_udf("string")
    def _ext(text: pd.Series) -> pd.Series:
        return text.map(_extract_first_json)

    return _ext
