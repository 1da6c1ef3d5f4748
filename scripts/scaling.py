"""Two-cluster-size scaling evidence for the north rule.

No real cluster exists in this sandbox; the N→4N executor criterion is
evidenced by running the SAME routed Bloom build on the SAME 16M-page input
at three parallelism levels (fresh JVM each, warmup + median of 3):

- local[2] → local[8]  = N→4N with full hardware headroom (2+2 and 8+8
  JVM-task + Python-worker processes both fit the 32-core host) — the
  faithful stand-in for adding executor machines.
- local[8] → local[32] = 4N→16N but host-saturated: at local[32] the 32 JVM
  task threads plus 32 Python workers double-subscribe the 32 physical
  cores, so this pair conflates scale-out with oversubscription; reported
  for transparency.

Writes BENCH/scaling.json; the table in BENCH/BASELINE.md mirrors it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("SCALING_DOCS", "16000000"))
CORPUS = os.path.join(REPO, ".bench_data", f"webpages_{N_DOCS}.parquet")
LEVELS = (2, 8, 32)


def ensure_corpus():
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    sys.path.insert(0, REPO)
    from sparksketch.session import get_spark
    from sparksketch.webtext import webpages
    spark = get_spark("gen", cores=32, extra={"spark.ui.showConsoleProgress": "false"})
    webpages(spark, N_DOCS, seed=42, partitions=64).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def run(cores: int) -> dict:
    env = {**os.environ, "PYTHONPATH": REPO}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_scaling_worker.py"), str(cores), CORPUS],
        capture_output=True, text=True, cwd=REPO, env=env, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ensure_corpus()
    results = {}
    for cores in LEVELS:
        r = run(cores)
        results[cores] = r
        print(f"local[{cores}]: {r['docs_per_sec']:.0f} docs/s (median {r['median_sec']}s, "
              f"runs {r['all_sec']})", flush=True)
    eff_2_8 = results[8]["docs_per_sec"] / results[2]["docs_per_sec"] / 4.0
    eff_8_32 = results[32]["docs_per_sec"] / results[8]["docs_per_sec"] / 4.0
    summary = {
        "docs": N_DOCS,
        "throughput_docs_per_sec": {str(c): results[c]["docs_per_sec"] for c in LEVELS},
        "median_sec": {str(c): results[c]["median_sec"] for c in LEVELS},
        "scaling_efficiency_N_to_4N_uncontended_2_to_8": round(eff_2_8, 3),
        "scaling_efficiency_8_to_32_host_saturated": round(eff_8_32, 3),
        "fpr_bound": results[32]["fpr_bound"],
        "methodology": ("same input, same job, fresh JVM per level, warmup run then "
                        "median of 3; 2→8 is the N→4N criterion (both levels fit the "
                        "32-core host without JVM+Python-worker oversubscription)"),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
