"""End-to-end plans: index build orchestration + BM25 query pipelines."""
