"""LPA + BFS scale evidence over the 2M-page host graph (40k hosts, ~6M
distinct edges) at two parallelism levels — fresh JVM each, a warmup
round, then timed runs; same two-level methodology as scripts/scaling.py.

Certificates at scale: both operators' full results are exactly
reproducible, so the order-insensitive xxhash64-xor digest must be
IDENTICAL across parallelism levels (labels from counts + min; distances
from min-propagation — no float, no order dependence anywhere).

Writes BENCH/graph_scaling.json; the BENCH/BASELINE.md §5 bullet mirrors it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("GRAPH_SCALE_DOCS", "2000000"))
CORPUS = os.path.join(REPO, ".bench_data", f"webpages_{N_DOCS}.parquet")
LEVELS = tuple(int(c) for c in os.environ.get(
    "GRAPH_SCALE_LEVELS", "8,32").split(","))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from sparksketch.graph import bfs_distances, derive_host_edges, label_propagation
from sparksketch.session import get_spark

cores, corpus = int(sys.argv[1]), sys.argv[2]
spark = get_spark("graph-scale", cores=cores, shuffle_partitions=cores,
                  extra={"spark.ui.showConsoleProgress": "false"})
wp = spark.read.parquet(corpus)
ids = wp.select(F.regexp_extract("url", r"/p(\d+)", 1)
                .cast("long").alias("doc_id"))
edges = derive_host_edges(ids).localCheckpoint(eager=True)
n_edges = edges.count()

label_propagation(edges, iters=1).count()  # warmup: JIT + shuffle paths

t0 = time.perf_counter()
lpa = label_propagation(edges, iters=4)
lrow = lpa.agg(F.expr("bit_xor(xxhash64(node, label))").alias("dig"),
               F.count_distinct("label").alias("ncomm")).first()
lpa_sec = time.perf_counter() - t0

t0 = time.perf_counter()
bfs = bfs_distances(edges, [0, 1], max_hops=4)
brow = bfs.agg(F.expr("bit_xor(xxhash64(node, dist))").alias("dig"),
               F.count(F.lit(1)).alias("n"),
               F.max("dist").alias("maxd")).first()
bfs_sec = time.perf_counter() - t0

print(json.dumps({
    "cores": cores, "edges": n_edges,
    "lpa_sec": round(lpa_sec, 3), "lpa_digest": int(lrow.dig),
    "lpa_communities": int(lrow.ncomm),
    "bfs_sec": round(bfs_sec, 3), "bfs_digest": int(brow.dig),
    "bfs_reached": int(brow.n), "bfs_max_dist": int(brow.maxd),
}))
spark.stop()
"""


def main() -> int:
    assert os.path.exists(os.path.join(CORPUS, "_SUCCESS")), \
        "run scripts/triangle_scale.py first (shared cached corpus)"
    results = {}
    for cores in LEVELS:
        env = {**os.environ, "PYTHONPATH": REPO}
        out = subprocess.run(
            [sys.executable, "-c", _WORKER, str(cores), CORPUS],
            capture_output=True, text=True, cwd=REPO, env=env, check=True)
        line = [l for l in out.stdout.splitlines()
                if l.strip().startswith("{")][-1]
        r = json.loads(line)
        results[cores] = r
        print(f"local[{cores}]: lpa4 {r['lpa_sec']}s "
              f"({r['lpa_communities']} communities), "
              f"bfs4 {r['bfs_sec']}s ({r['bfs_reached']} reached)",
              flush=True)
    lo, hi = LEVELS[0], LEVELS[-1]
    for k in ("lpa_digest", "bfs_digest"):
        for c in LEVELS[1:]:
            assert results[lo][k] == results[c][k], \
                f"{k} differs at local[{c}]"
    summary = {
        "docs": N_DOCS, "edges": results[hi]["edges"],
        "lpa_iters": 4, "bfs_max_hops": 4,
        "lpa_sec": {str(c): results[c]["lpa_sec"] for c in LEVELS},
        "bfs_sec": {str(c): results[c]["bfs_sec"] for c in LEVELS},
        "lpa_communities": results[hi]["lpa_communities"],
        "bfs_reached": results[hi]["bfs_reached"],
        "bfs_max_dist": results[hi]["bfs_max_dist"],
        "lpa_scaling_efficiency": {
            f"{a}_to_{b}": round(results[a]["lpa_sec"]
                                 / results[b]["lpa_sec"] / (b / a), 3)
            for a, b in zip(LEVELS, LEVELS[1:])},
        "bfs_scaling_efficiency": {
            f"{a}_to_{b}": round(results[a]["bfs_sec"]
                                 / results[b]["bfs_sec"] / (b / a), 3)
            for a, b in zip(LEVELS, LEVELS[1:])},
        "digests_identical_across_levels": True,
        "methodology": ("same derived edge set, fresh JVM per level, one "
                        "warmup LPA round, timed 4-round LPA and 4-hop BFS; "
                        "certificate = order-insensitive result digests "
                        "identical across parallelism levels"),
    }
    with open(os.path.join(REPO, "BENCH", "graph_scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
