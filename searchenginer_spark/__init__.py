"""searchenginer_spark — a brand-new PySpark-native full-text analytics engine.

Re-expresses the capabilities of the reference engine (lhq12344/Searchenginer,
a single-node C++ search engine: offline dict/index builders + BM25-style
retrieval services) as idiomatic Spark DataFrame dataflows:

- inverted-index build: tokenize -> per-doc tf -> corpus df/N -> posting lists
  (delta + varbyte compressed blocks with block maxima) — reference pipeline
  Make_Page/MakePage.cpp:94-216 rebuilt as declarative Spark jobs.
- BM25 (k1=1.2, b=0.75) conjunctive/disjunctive top-k query — generalizes the
  reference's TF-IDF intersection path srpc/PageSearch/server.pb_skeleton.cc:95-149.
- dedup (exact / SimHash banded / MinHash-LSH / n-gram Jaccard) — reference
  SimHash dedup Make_Page/rcc.cpp:146-202 plus training-pipeline extensions.
- keyword suggestion via edit distance — srpc/WordSearch/server.pb_skeleton.cc:62-188.
- resumable, per-partition checkpointed index builds with lineage metrics.

Everything is DataFrame/Catalyst-first; Python appears only as vectorized
Arrow pandas UDFs (codec, simhash bit-vote) — never per-row Python.
"""

__version__ = "0.1.0"
