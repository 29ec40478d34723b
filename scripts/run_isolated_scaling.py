#!/usr/bin/env python
"""Isolated multi-process executor-scaling measurement (north rule, r4).

The r3 wall-clock comparison ran ONE JVM at local[2] vs local[8] and
decomposed its shortfall into hardware sharing x scheduler occupancy —
an inference. This harness measures the executor-scaling quantity
DIRECTLY: W independent worker processes, each pinned to its own
disjoint 2-core set, each with its own JVM/driver/python workers, each
building a disjoint doc-range slice of the SAME corpus — the way a real
cluster multiplies executors while holding per-executor resources
constant (the r3 single-JVM protocol instead held TOTAL hardware
constant and divided it, so cache/controller/steal sharing landed inside
the measured ratio).

Work is identical at every level by construction: the corpus is
pre-split into 16 doc-range chunks; a level with W workers assigns 16/W
chunks per worker, built SEQUENTIALLY within the worker (same number of
build_index calls, same chunk sizes, same docs_per_part at every level).
The index build is doc-range-parallel by construction (parts are
doc-range-disjoint; PLANS.md §3b), so chunk builds on separate executors
are the real distributed execution shape, not a simulation of one.

Levels: 1 worker (N executors, N=1), 4 workers (4N), 16 workers (16N).
eff(a->b workers) = wall_a / ((b/a) * wall_b), walls measured from a
file-barrier-aligned start (JVM startup, corpus read, warm-up excluded).
A register-resident CPU probe brackets each level in the same minute so
hypervisor steal is visible next to the number it pollutes.

Usage: python scripts/run_isolated_scaling.py [--docs 100000] [--runs 2]
           [--levels 1,4,16] [--chunks 16]
Writes BENCH/isolated_scaling.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETUP = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from searchenginer_spark.session import get_spark
from searchenginer_spark.sources.corpus import build_docs

spark = get_spark("scale-setup", master="local[32]")
docs = build_docs(spark, {n_docs}, seed=42, num_partitions=32)
docs = docs.withColumn("chunk", (F.col("doc_id") / {chunk_docs}).cast("int"))
docs.write.mode("overwrite").partitionBy("chunk").parquet({corpus!r})
print("SETUP_DONE", docs.count())
"""

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from searchenginer_spark.session import get_spark
from searchenginer_spark.plans.build_index import build_index

wid = {wid}
chunks = {chunks}
runs = {runs}
# small-input splits (bench-scale only; cluster defaults are correct at
# full scale) + a worker-sized driver heap so 16 concurrent JVMs fit
conf = {{"spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(256 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(4 * 1024 * 1024),
        "spark.driver.memory": "3g"}}
spark = get_spark(f"scale-w{{wid}}", master="local[2]",
                  shuffle_partitions=8, extra_conf=conf)
per_chunk = []
for c in chunks:
    d = spark.read.parquet({corpus!r}).filter(F.col("chunk") == c).drop("chunk")
    d = d.persist()
    d.count()
    per_chunk.append(d)

# warm-up: exercises worker spawn, JIT, codecs end to end
warm = per_chunk[0].limit(2000).persist(); warm.count()
wroot = tempfile.mkdtemp()
build_index(warm, wroot, docs_per_part=500)
shutil.rmtree(wroot, ignore_errors=True)
warm.unpersist()

# file barrier: align measurement starts across workers
open(os.path.join({work!r}, f"ready_{{wid}}"), "w").close()
go = os.path.join({work!r}, "go")
while not os.path.exists(go):
    time.sleep(0.05)

walls = []
for _ in range(runs):
    t = time.monotonic()
    for d in per_chunk:
        # build + immediate cleanup: ~1.2 GB/run of index roots otherwise
        # accumulate and fill the disk; rmtree cost is identical per level
        r = tempfile.mkdtemp()
        build_index(d, r, docs_per_part={dpp})
        shutil.rmtree(r, ignore_errors=True)
    walls.append(round(time.monotonic() - t, 2))
print(json.dumps({{"wid": wid, "walls": walls}}))
"""

CPUPROBE = r"""
import time, multiprocessing as mp, json
def cpu(_):
    t = time.monotonic(); n = 0; x = 12345
    while time.monotonic() - t < 2.0:
        for _ in range(100000):
            x = (x * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        n += 1
    return n
out = {}
for nproc in (1, {nproc}):
    with mp.Pool(nproc) as p:
        out[str(nproc)] = sum(p.map(cpu, range(nproc)))
print(json.dumps(out))
"""


def cpu_probe(nproc: int) -> float:
    """Scaling efficiency of a register-resident loop at nproc processes
    vs 1 — the in-window hypervisor-steal indicator."""
    out = subprocess.run(
        [sys.executable, "-c", CPUPROBE.replace("{nproc}", str(max(nproc, 2)))],
        capture_output=True, text=True, check=True,
    )
    d = json.loads(out.stdout.strip().splitlines()[-1])
    n = str(max(nproc, 2))
    return round(d[n] / (int(n) * d["1"]), 3)


def run_level(workers: int, chunks: int, corpus: str, runs: int, dpp: int) -> dict:
    work = tempfile.mkdtemp(prefix=f"sg_iso_{workers}_")
    per = chunks // workers
    procs = []
    pre = cpu_probe(2 * workers)
    for wid in range(workers):
        code = WORKER.format(
            repo=REPO, wid=wid, chunks=list(range(wid * per, (wid + 1) * per)),
            runs=runs, corpus=corpus, work=work, dpp=dpp,
        )
        cores = f"{2 * wid}-{2 * wid + 1}"
        pin = ["taskset", "-c", cores] if os.path.exists("/usr/bin/taskset") else []
        procs.append(subprocess.Popen(
            pin + [sys.executable, "-c", code],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    # release the barrier once every worker is warmed up and waiting
    deadline = time.monotonic() + 900
    while time.monotonic() < deadline:
        if all(os.path.exists(os.path.join(work, f"ready_{w}")) for w in range(workers)):
            break
        if any(p.poll() is not None for p in procs):
            break  # a worker died before the barrier; surfaced below
        time.sleep(0.2)
    open(os.path.join(work, "go"), "w").close()
    results = []
    for p in procs:
        out, err = p.communicate()
        if p.returncode != 0:
            raise RuntimeError(f"worker failed: {err[-2000:]}")
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    post = cpu_probe(2 * workers)
    runs_n = len(results[0]["walls"])
    # per-run level wall = the slowest worker in that aligned run
    level_walls = [max(r["walls"][i] for r in results) for i in range(runs_n)]
    return {
        "workers": workers,
        "level_walls": level_walls,
        "best_wall": min(level_walls),
        "worker_walls": {r["wid"]: r["walls"] for r in results},
        "cpu_probe_pre": pre,
        "cpu_probe_post": post,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--levels", default="1,4,16")
    ap.add_argument("--chunks", type=int, default=16)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    chunk_docs = args.docs // args.chunks
    dpp = max(256, args.docs // 64)

    corpus = tempfile.mkdtemp(prefix="sg_iso_corpus_")
    setup = SETUP.format(repo=REPO, n_docs=args.docs,
                         chunk_docs=chunk_docs, corpus=corpus)
    subprocess.run([sys.executable, "-c", setup], check=True,
                   capture_output=True, text=True)

    results = {w: run_level(w, args.chunks, corpus, args.runs, dpp)
               for w in levels}

    def eff(a: int, b: int) -> float:
        return round(results[a]["best_wall"] / ((b / a) * results[b]["best_wall"]), 3)

    pairs = [(levels[i], levels[i + 1]) for i in range(len(levels) - 1)]
    summary = {
        "protocol": "isolated pinned 2-core executor processes, "
                    f"{args.docs} docs in {args.chunks} doc-range chunks, "
                    f"docs_per_part={dpp}, barrier-aligned, best of {args.runs}",
        "levels": {str(w): results[w] for w in levels},
        "efficiency": {f"{a}->{b}_workers": eff(a, b) for a, b in pairs},
        "docs_per_sec": {
            str(w): round(args.docs / results[w]["best_wall"], 1) for w in levels
        },
    }
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/isolated_scaling.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    import shutil

    shutil.rmtree(corpus, ignore_errors=True)


if __name__ == "__main__":
    main()
