#!/usr/bin/env python
"""Measured IVF-PQ recall@10 vs exact cosine — the accuracy side of the
compression trade (PLANS.md §9 cites this script's output).

Protocol: 100k synthetic dim-64 vectors = 256-cluster Gaussian
background + a PLANTED 15-vector neighbor pod per query (cos ~0.97 to
the query vs <=~0.5 background; the rank-10/rank-30 cosine gap is
0.97/0.40). The pods make recall@10 a DEFINED quantity: a pure
Gaussian-mixture corpus puts hundreds of near-ties (delta-cos ~1e-3)
at the top-10 boundary, where recall measures tie-breaking luck rather
than index quality — real ANN workloads (near-dup docs, related
passages) have planted-pod structure, not tie soup. Codebooks/codes
come from the REAL Spark operators (seeded-hash sample train + Arrow
encode, residual IVF-PQ build); the grid's recall is then evaluated in
numpy from those artifacts — mathematically identical to the Spark ADC
probe (test_pq pins Spark ADC == numpy reconstruction score exactly),
and it keeps the 12-config x 50-query grid tractable.

recall@10(nprobe, refine): candidates = top (10*refine) by
base+ADC score within the nprobe nearest lists, re-ranked exactly
(refine=1 = no re-rank, pure compressed ordering); numerator = overlap
with the true exact-cosine top-10.

Usage: python scripts/pq_recall_grid.py  -> one JSON line + markdown rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM, N_CLUSTERS, N_Q, PLANT = 100_000, 64, 256, 50, 15
N_LISTS, M, N_CODES = 64, 8, 16


def main() -> None:
    from searchenginer_spark.operators.ann import ivf_pq_build
    from searchenginer_spark.session import get_spark

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    assign = rng.integers(0, N_CLUSTERS, size=N)
    x = centers[assign] + 0.35 * rng.standard_normal((N, DIM))
    queries = rng.standard_normal((N_Q, DIM))
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    # planted neighbor pods: 15 tight true neighbors per query
    x[: N_Q * PLANT] = np.concatenate(
        [q[None] + 0.03 * rng.standard_normal((PLANT, DIM)) for q in queries]
    )
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    spark = get_spark("pq_recall", master="local[32]", shuffle_partitions=32)
    import pandas as pd

    pdf = pd.DataFrame({"vec_id": np.arange(N), "embedding": list(x)})
    emb = spark.createDataFrame(pdf)

    t0 = time.monotonic()
    centroids, codebooks, coded = ivf_pq_build(
        emb, n_lists=N_LISTS, m=M, n_codes=N_CODES, seed=42
    )
    cdf = coded.select("vec_id", "list_id", "codes").toPandas()
    build_s = time.monotonic() - t0
    order = np.argsort(cdf["vec_id"].to_numpy())
    lists = cdf["list_id"].to_numpy()[order]
    codes = np.stack(cdf["codes"].to_numpy()[order]).astype(np.int64)

    ds = DIM // M
    exact_top = np.argsort(-(x @ queries.T), axis=0)[:10].T  # [Q, 10]

    results = {}
    for nprobe in (1, 2, 4, 8):
        for refine in (1, 2, 4):
            hits = 0
            for qi in range(N_Q):
                q = queries[qi]
                probes = np.argsort(((centroids - q) ** 2).sum(1))[:nprobe]
                mask = np.isin(lists, probes)
                idx = np.nonzero(mask)[0]
                # ADC: per-subspace LUTs + residual base term
                luts = np.stack([codebooks[j] @ q[j * ds : (j + 1) * ds] for j in range(M)])
                adc = centroids[lists[idx]] @ q
                for j in range(M):
                    adc = adc + luts[j][codes[idx, j]]
                k_cand = 10 * refine
                cand = idx[np.argsort(-adc)[:k_cand]]
                if refine > 1:
                    cand = cand[np.argsort(-(x[cand] @ q))[:10]]
                else:
                    cand = cand[:10]
                hits += len(set(cand.tolist()) & set(exact_top[qi].tolist()))
            results[f"nprobe={nprobe},refine={refine}"] = round(hits / (10 * N_Q), 4)

    out = {
        "n": N, "dim": DIM, "n_lists": N_LISTS, "m": M, "n_codes": N_CODES,
        "n_queries": N_Q, "build_encode_s": round(build_s, 1),
        "recall_at_10": results,
    }
    print(json.dumps(out))
    print("\n| nprobe | refine=1 | refine=2 | refine=4 |")
    print("|---|---|---|---|")
    for nprobe in (1, 2, 4, 8):
        row = [f"{results[f'nprobe={nprobe},refine={r}']:.3f}" for r in (1, 2, 4)]
        print(f"| {nprobe} | " + " | ".join(row) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
