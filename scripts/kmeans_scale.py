"""Distributed k-means scale evidence: kmeans_fit over the 4M x 64
synthetic embedding corpus (shared with scripts/fd_scale.py) at two
parallelism levels — fresh JVM each, warmup iteration + timed 3-iteration
fit — same two-level methodology as scripts/scaling.py.  Also checks the
Lloyd descent certificate (monotone cost) at that scale.

Writes BENCH/kmeans_scaling.json; the row in BENCH/BASELINE.md mirrors it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_VECS = int(os.environ.get("KMEANS_SCALE_VECS", "4000000"))
DIM = 64
K = 64
ITERS = 3
CORPUS = os.path.join(REPO, ".bench_data", f"embeddings_{N_VECS}.parquet")
LEVELS = (8, 32)

_WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from sparksketch.clustering import kmeans_fit
from sparksketch.session import get_spark

cores, corpus, k, iters = int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
spark = get_spark("kmeans-scale", cores=cores, shuffle_partitions=cores,
                  extra={"spark.ui.showConsoleProgress": "false"})
emb = spark.read.parquet(corpus)
n = emb.count()

res = kmeans_fit(emb, "embedding", k=k, iters=1, seed=5, dim=64)  # warmup
t0 = time.perf_counter()
res = kmeans_fit(emb, "embedding", k=k, iters=iters, seed=5, dim=64,
                 init=res.centroids)
dt = time.perf_counter() - t0
print(json.dumps({
    "cores": cores, "vecs": n, "k": k, "iters": iters,
    "sec": round(dt, 3), "sec_per_iter": round(dt / iters, 3),
    "vecs_per_sec_per_iter": round(n * iters / dt, 1),
    "costs": res.costs, "descent_ok": res.monotone(),
}))
spark.stop()
"""


def main() -> int:
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        # shared generator + cache with scripts/fd_scale.py (seed 42);
        # pass THIS script's size so KMEANS_SCALE_VECS overrides work
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import fd_scale
        fd_scale.ensure_corpus(N_VECS)
    results = {}
    for cores in LEVELS:
        env = {**os.environ, "PYTHONPATH": REPO}
        out = subprocess.run(
            [sys.executable, "-c", _WORKER, str(cores), CORPUS, str(K), str(ITERS)],
            capture_output=True, text=True, cwd=REPO, env=env, check=True)
        line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
        r = json.loads(line)
        results[cores] = r
        print(f"local[{cores}]: {r['vecs_per_sec_per_iter']:.0f} vecs/s/iter "
              f"({r['sec_per_iter']}s/iter, descent_ok={r['descent_ok']})",
              flush=True)
    eff = (results[32]["vecs_per_sec_per_iter"]
           / results[8]["vecs_per_sec_per_iter"] / 4.0)
    summary = {
        "vecs": N_VECS, "dim": DIM, "k": K, "iters": ITERS,
        "throughput_vecs_per_sec_per_iter": {
            str(c): results[c]["vecs_per_sec_per_iter"] for c in LEVELS},
        "sec_per_iter": {str(c): results[c]["sec_per_iter"] for c in LEVELS},
        "scaling_efficiency_8_to_32_host_saturated": round(eff, 3),
        "descent_ok_at_scale": all(results[c]["descent_ok"] for c in LEVELS),
        "methodology": ("same input, same job, fresh JVM per level; one warmup "
                        "iteration then a timed 3-iteration fit; certificate = "
                        "monotone Lloyd cost at full 4M-vector scale"),
    }
    with open(os.path.join(REPO, "BENCH", "kmeans_scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
