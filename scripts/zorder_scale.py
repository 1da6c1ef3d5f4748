"""Z-order layout scale evidence: 2M web pages (465 MB parquet, the shared
cached corpus) written three ways — natural order, single-key host sort,
and 2-d z-order on (host id, equi-depth length bucket) — then THREE query
shapes measured on each layout: a host band alone, a length band alone,
and both combined.  Per (layout, query):

- `pruned_fraction`: what fraction of row groups / rows a min/max reader
  provably skips (footer statistics, reader-independent), and
- the actual Spark scan time for the same predicate (median of 3).

The claim being evidenced is z-order's real one — ROBUSTNESS across query
dimensions at a fixed file budget, not dominance on any single shape: a
single-key sort concentrates all its granularity on one column (it wins
narrow predicates on that column and skips NOTHING for the other
dimension), while the z-layout prunes usefully on either dimension alone
and on the conjunction.  The skewed length dimension goes through
`kll.bucketize` (equi-depth) so every interleave bit carries comparable
row mass — the recommended path from sparksketch/layout.py.  Writes
BENCH/zorder_scaling.json; the bullet in BENCH/BASELINE.md §5 mirrors it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(os.environ.get("ZORDER_SCALE_PAGES", "2000000"))
CORPUS = os.path.join(REPO, ".bench_data", f"webpages_{N_PAGES}.parquet")
OUT_DIR = os.path.join(REPO, ".bench_data", "zorder_scale")

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from sparksketch.kll import bucketize
from sparksketch.layout import det_bucket, pruned_fraction, zorder_by
from sparksketch.session import get_spark

corpus, out_dir = sys.argv[1], sys.argv[2]
spark = get_spark("zorder-scale", cores=32, shuffle_partitions=64,
                  extra={"spark.ui.showConsoleProgress": "false"})

base = (spark.read.parquet(corpus)
        .select("url", "text", "lang")
        .withColumn("hid", F.regexp_extract("url", r"h(\d+)\.example", 1)
                    .cast("long"))
        .withColumn("tl", F.length("text").cast("long")))
base = base.persist()
n = base.count()

# equi-depth bucket of the skewed length dim (one KLL sketch pass) —
# clustering uses the bucket, the box predicate stays on the raw column
bucketed, _bounds = bucketize(base, "tl", n_buckets=1024, out="tlb")

N_FILES = 256
boxes = {
    "host_band": {"hid": (500, 531)},              # 32 cold hosts, ~2.2%
    "length_band": {"tl": (400, 2000)},            # upper length tail
    "both": {"hid": (500, 531), "tl": (100, 160)}, # conjunction, ~0.5%
}
layouts = {
    "natural": base.repartition(N_FILES),
    "host_sorted": base.repartitionByRange(N_FILES, "hid")
                       .sortWithinPartitions("hid"),
    "zorder": zorder_by(bucketed,
                        [det_bucket("hid", 0, 999, 10),
                         det_bucket("tlb", 0, 1023, 10)],
                        bits=10, n_parts=N_FILES).drop("tlb"),
}

out = {"pages": n, "n_files": N_FILES,
       "boxes": {q: {k: list(v) for k, v in b.items()}
                 for q, b in boxes.items()},
       "layouts": {}}
expect = {}
for name, df in layouts.items():
    path = os.path.join(out_dir, name)
    t0 = time.perf_counter()
    df.write.mode("overwrite").parquet(path)
    t_write = time.perf_counter() - t0
    entry = {"write_sec": round(t_write, 2), "queries": {}}
    for q, box in boxes.items():
        pred = None
        for c, (lo, hi) in box.items():
            p = F.col(c).between(lo, hi)
            pred = p if pred is None else (pred & p)
        frac = pruned_fraction(path, box)
        runs = []
        got = None
        for _ in range(3):
            t0 = time.perf_counter()
            got = (spark.read.parquet(path).filter(pred)
                   .agg(F.count("*").alias("n"),
                        F.sum("tl").alias("s")).first())
            runs.append(round(time.perf_counter() - t0, 3))
        if q not in expect:
            expect[q] = (got.n, got.s)
        assert (got.n, got.s) == expect[q], \
            f"{name}/{q}: result drift {got} != {expect[q]}"
        entry["queries"][q] = {
            "scan_sec_median": sorted(runs)[1], "scan_runs": runs,
            "pruned_rows_frac": round(
                frac["rows_skipped"] / frac["rows_total"], 4),
            **frac,
        }
    out["layouts"][name] = entry
out["box_rows"] = {q: v[0] for q, v in expect.items()}
print("RESULT " + json.dumps(out))
"""


def main() -> int:
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        print(f"missing corpus {CORPUS} — run bench.py once first", file=sys.stderr)
        return 2
    os.makedirs(OUT_DIR, exist_ok=True)
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER, CORPUS, OUT_DIR],
        capture_output=True, text=True, timeout=1800)
    line = next((l for l in proc.stdout.splitlines()
                 if l.startswith("RESULT ")), None)
    if line is None:
        print(proc.stdout[-3000:], file=sys.stderr)
        print(proc.stderr[-3000:], file=sys.stderr)
        return 1
    result = json.loads(line[len("RESULT "):])
    dest = os.path.join(REPO, "BENCH", "zorder_scaling.json")
    with open(dest, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
