"""Frequent-Directions scale evidence: fd_build over a 4M x 64 synthetic
embedding corpus at two parallelism levels (fresh JVM each, warmup + median
of 3), same two-level methodology as scripts/scaling.py.  Also checks the
spectral certificate at that scale (exact Gram via one extra pass).

Writes BENCH/fd_scaling.json; the row in BENCH/BASELINE.md mirrors it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_VECS = int(os.environ.get("FD_SCALE_VECS", "4000000"))
DIM = 64
CORPUS = os.path.join(REPO, ".bench_data", f"embeddings_{N_VECS}.parquet")
LEVELS = (8, 32)

_WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from sparksketch.fd import exact_gram, fd_build
from sparksketch.session import get_spark

cores, corpus = int(sys.argv[1]), sys.argv[2]
spark = get_spark("fd-scale", cores=cores, shuffle_partitions=cores,
                  extra={"spark.ui.showConsoleProgress": "false"})
emb = spark.read.parquet(corpus)
n = emb.count()

fd = fd_build(emb, "embedding", ell=32, dim=64)   # warmup
times = []
for _ in range(3):
    t0 = time.perf_counter()
    fd = fd_build(emb, "embedding", ell=32, dim=64)
    times.append(time.perf_counter() - t0)
times.sort()
G = exact_gram(emb, "embedding", dim=64)
ev = np.linalg.eigvalsh(G - fd.cov())
tol = 1e-6 * fd.fro2
print(json.dumps({
    "cores": cores, "vecs": n, "median_sec": round(times[1], 3),
    "all_sec": [round(t, 3) for t in times],
    "vecs_per_sec": round(n / times[1], 1),
    "delta": fd.delta, "worst_case": fd.worst_case_bound(),
    "cert_ok": bool(ev[0] >= -tol and ev[-1] <= fd.delta + tol
                    and fd.delta <= fd.worst_case_bound() + tol),
}))
spark.stop()
"""


def ensure_corpus(n_vecs: int = N_VECS):
    """Generate .bench_data/embeddings_{n}.parquet once (seed-42 Philox,
    decaying spectrum) via the ONE shared generator
    sparksketch.webtext.synthetic_embeddings; always read back thereafter."""
    corpus = os.path.join(REPO, ".bench_data", f"embeddings_{n_vecs}.parquet")
    if os.path.exists(os.path.join(corpus, "_SUCCESS")):
        return corpus
    sys.path.insert(0, REPO)
    from sparksketch.session import get_spark
    from sparksketch.webtext import synthetic_embeddings
    spark = get_spark("gen-emb", cores=32,
                      extra={"spark.ui.showConsoleProgress": "false"})
    (synthetic_embeddings(spark, n_vecs, dim=DIM)
     .write.mode("overwrite").parquet(corpus))
    spark.stop()
    return corpus


def run(cores: int) -> dict:
    env = {**os.environ, "PYTHONPATH": REPO}
    out = subprocess.run([sys.executable, "-c", _WORKER, str(cores), CORPUS],
                         capture_output=True, text=True, cwd=REPO, env=env, check=True)
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ensure_corpus()
    results = {}
    for cores in LEVELS:
        r = run(cores)
        results[cores] = r
        print(f"local[{cores}]: {r['vecs_per_sec']:.0f} vecs/s "
              f"(median {r['median_sec']}s, runs {r['all_sec']}, cert_ok={r['cert_ok']})",
              flush=True)
    eff = results[32]["vecs_per_sec"] / results[8]["vecs_per_sec"] / 4.0
    summary = {
        "vecs": N_VECS, "dim": DIM, "ell": 32,
        "throughput_vecs_per_sec": {str(c): results[c]["vecs_per_sec"] for c in LEVELS},
        "median_sec": {str(c): results[c]["median_sec"] for c in LEVELS},
        "scaling_efficiency_8_to_32_host_saturated": round(eff, 3),
        "cert_ok_at_scale": all(results[c]["cert_ok"] for c in LEVELS),
        "delta_over_worst_case": round(results[32]["delta"] / results[32]["worst_case"], 4),
        "methodology": ("same input, same job, fresh JVM per level, warmup then "
                        "median of 3; certificate = eigvalsh(AtA - BtB) within "
                        "[0, delta] at full 4M-vector scale"),
    }
    with open(os.path.join(REPO, "BENCH", "fd_scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
