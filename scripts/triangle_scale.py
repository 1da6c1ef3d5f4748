"""Triangle-counting scale evidence: graph.triangle_counts over the host
graph derived from a 2M-page synthetic corpus (40k hosts, ~6M distinct
edges, 14.4M triangles, 512M oriented wedge candidates) at two
parallelism levels — fresh JVM each, warmup run on a 1/8 id-slice, then
the timed full run; the same two-level methodology as scripts/scaling.py.

Certificates at scale: the full (node, deg, tri) result is BYTE-IDENTICAL
across parallelism levels (order-insensitive xxhash64-xor digest — exact
counting must not depend on partitioning), Σ tri ≡ 0 (mod 3), and the
total equals the value pytest proves exact against brute force / DuckDB
at small scale on the same derivation.

Plan note recorded in BENCH/BASELINE.md: the adjacency-intersection
formulation (array_intersect per oriented edge, wedges-as-probes) took
this run from 398 s to 92 s at local[32] vs the wedge self-join +
semi-join (512M wedge rows shuffled twice).

Writes BENCH/triangle_scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("TRIANGLE_SCALE_DOCS", "2000000"))
CORPUS = os.path.join(REPO, ".bench_data", f"webpages_{N_DOCS}.parquet")
LEVELS = tuple(int(c) for c in os.environ.get(
    "TRIANGLE_SCALE_LEVELS", "8,32").split(","))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from sparksketch.graph import derive_host_edges, triangle_counts
from sparksketch.session import get_spark

cores, corpus = int(sys.argv[1]), sys.argv[2]
spark = get_spark("triangle-scale", cores=cores, shuffle_partitions=cores,
                  extra={"spark.ui.showConsoleProgress": "false"})
wp = spark.read.parquet(corpus)
ids = wp.select(F.regexp_extract("url", r"/p(\d+)", 1)
                .cast("long").alias("doc_id"))

# the edge set is a pure function of the ids — same at both levels
edges = derive_host_edges(ids).localCheckpoint(eager=True)
n_edges = edges.count()
# warmup: JIT + shuffle paths on a 1/8 slice
triangle_counts(edges.filter(F.col("src") % 8 == 0)).count()

t0 = time.perf_counter()
out = triangle_counts(edges)
row = out.agg(
    F.sum("tri").alias("s"),
    F.count(F.lit(1)).alias("n"),
    F.expr("bit_xor(xxhash64(node, deg, tri))").alias("digest")).first()
dt = time.perf_counter() - t0
print(json.dumps({
    "cores": cores, "edges": n_edges, "hosts": row.n,
    "triangles": int(row.s) // 3, "tri_mod3_ok": int(row.s) % 3 == 0,
    "digest": int(row.digest), "sec": round(dt, 3),
    "edges_per_sec": round(n_edges / dt, 1),
}))
spark.stop()
"""


def main() -> int:
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        from sparksketch.session import get_spark
        from sparksketch.webtext import webpages
        spark = get_spark("triangle-scale-gen", cores=32, shuffle_partitions=32)
        webpages(spark, N_DOCS, seed=42, partitions=64).write.mode(
            "overwrite").parquet(CORPUS)
        spark.stop()
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
        print(f"local[{cores}]: {r['edges_per_sec']:.0f} edges/s "
              f"({r['sec']}s, {r['triangles']} triangles)", flush=True)
    lo, hi = LEVELS[0], LEVELS[-1]
    for c in LEVELS[1:]:
        assert results[LEVELS[0]]["digest"] == results[c]["digest"], \
            f"parallelism changed the exact triangle counts at local[{c}]"
    assert all(r["tri_mod3_ok"] for r in results.values())
    effs = {}
    for a, b in zip(LEVELS, LEVELS[1:]):
        effs[f"{a}_to_{b}"] = round(
            results[b]["edges_per_sec"] / results[a]["edges_per_sec"]
            / (b / a), 3)
    summary = {
        "docs": N_DOCS, "edges": results[hi]["edges"],
        "hosts": results[hi]["hosts"], "triangles": results[hi]["triangles"],
        "throughput_edges_per_sec": {
            str(c): results[c]["edges_per_sec"] for c in LEVELS},
        "sec": {str(c): results[c]["sec"] for c in LEVELS},
        "scaling_efficiency": effs,
        "result_identical_across_levels": True,
        "methodology": ("same derived edge set (pure function of ids), "
                        "fresh JVM per level, warmup on a 1/8 id-slice, "
                        "timed full run; certificates = order-insensitive "
                        "result digest identical across levels + "
                        "sum(tri) % 3 == 0"),
    }
    with open(os.path.join(REPO, "BENCH", "triangle_scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
