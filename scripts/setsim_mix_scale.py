"""Scale evidence for the two round-5 operators VERDICT r5 flagged as
gate-green-only (item 6): the exact set-similarity self-join and the
mixture composer, each run at 500k web pages (the shared cached corpus —
a hot-token corpus: every page draws from one Zipf vocabulary, so prefix
buckets are the operator's stress case, not a best case).

- ``set_sim_doc_stats`` (τ = 0.9): wall time, CANDIDATE volume after the
  prefix filter + length filter (the quantity the AllPairs bound controls)
  vs the brute-force bound C(n,2), and the surviving pair count.
- ``mix_to_budget`` (3 synthetic sources from the host id, 60/25/15 over a
  token budget): wall time and the exact composed row/epoch counts —
  the claim is plan-shape (one tiny per-source aggregate + one scan with
  explode(sequence); no data-row shuffle), so the evidence is wall time
  scaling with corpus size plus the exact output accounting.

Writes BENCH/setsim_mix_scale.json; BENCH/BASELINE.md §5 mirrors the
numbers.  Run: ``python scripts/setsim_mix_scale.py`` (optionally
``SETSIM_SCALE_PAGES=100000`` for a quick pass).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_PAGES = int(os.environ.get("SETSIM_SCALE_PAGES", "500000"))
TAU = float(os.environ.get("SETSIM_SCALE_TAU", "0.9"))


def main() -> int:
    from pyspark.sql import functions as F

    from sparksketch.dedup import set_sim_doc_stats, token_sets
    from sparksketch.decontam import mix_to_budget
    from sparksketch.session import get_spark

    # this job's candidate join shuffles GBs: spill to DISK, compressed —
    # the library's tmpfs-local-dir default is tuned for the bench's small
    # shuffles, and tmpfs pages count against the same memory cgroup as the
    # JVM heap (two OOM-killed attempts at 500k pages with the defaults:
    # 48g heap + tens of GB of uncompressed tmpfs shuffle > the 128 GB box,
    # and tmpfs shuffle files additionally survive a SIGKILLed driver)
    local_dir = os.environ.get("SETSIM_SCALE_LOCAL_DIR", "/tmp/sk-scale-local")
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark("setsim-mix-scale", cores=32, shuffle_partitions=64,
                      extra={"spark.ui.showConsoleProgress": "false",
                             "spark.local.dir": local_dir,
                             "spark.shuffle.compress": "true",
                             "spark.shuffle.spill.compress": "true"})
    corpus = os.path.join(REPO, ".bench_data", f"webpages_{N_PAGES}.parquet")
    if not os.path.isdir(corpus):
        from sparksketch.webtext import webpages
        webpages(spark, N_PAGES, seed=42, partitions=32) \
            .write.mode("overwrite").parquet(corpus)
    wp = (spark.read.parquet(corpus)
          .select(F.xxhash64("url").alias("doc_id"), "url", "text"))
    n = wp.count()
    out: dict = {"n_pages": n, "tau": TAU}

    # --- candidate volume: replicate set_sim_pairs' steps 1-4 so the
    # pre-verification candidate count is observable (the operator itself
    # never materializes it) ---
    tau = int(round(TAU * 1000))
    from pyspark.sql.window import Window
    t0 = time.perf_counter()
    d = token_sets(wp, "text", "doc_id")
    t = d.select("_id", "_n", F.explode("_ts").alias("_tok"))
    freq = t.groupBy("_tok").agg(F.count("*").alias("_df"))
    tf = t.join(freq, "_tok")
    w = Window.partitionBy("_id").orderBy("_df", "_tok")
    p = F.col("_n") - F.expr(f"(({tau} * _n + 999) div 1000)") + F.lit(1)
    prefix = (tf.withColumn("_pos", F.row_number().over(w))
              .filter(F.col("_pos") <= p).select("_tok", "_id", "_n"))
    a = prefix.select("_tok", F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    b = prefix.select("_tok", F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    cand_n = (a.join(b, "_tok")
              .filter((F.col("id_a") < F.col("id_b"))
                      & (F.col("_nb") * 1000 >= F.col("_na") * tau)
                      & (F.col("_na") * 1000 >= F.col("_nb") * tau))
              .select("id_a", "id_b").distinct().count())
    out["candidates_after_prefix"] = cand_n
    out["candidate_pass_s"] = round(time.perf_counter() - t0, 1)
    out["brute_bound_pairs"] = n * (n - 1) // 2
    out["candidate_fraction_of_brute"] = round(
        cand_n / out["brute_bound_pairs"], 9)

    # --- the full operator (linear per-doc output) ---
    t0 = time.perf_counter()
    stats = set_sim_doc_stats(wp, "text", "doc_id", threshold=TAU)
    row = stats.agg(F.count("*").alias("docs_with_neighbors"),
                    F.coalesce(F.sum("n_neighbors"), F.lit(0)).alias("sum_deg")
                    ).first()
    out["set_sim_wall_s"] = round(time.perf_counter() - t0, 1)
    out["docs_with_neighbors"] = int(row.docs_with_neighbors)
    out["similar_pairs"] = int(row.sum_deg) // 2

    # --- mixture composition over the same corpus ---
    t0 = time.perf_counter()
    src = wp.withColumn(
        "source",
        F.concat(F.lit("src"), F.pmod(F.xxhash64("url"), F.lit(3))))
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    src = src.withColumn("n_tokens", toks)
    budget = int(src.agg(F.sum("n_tokens")).first()[0] * 1.5)
    mixed = mix_to_budget(src, {"src0": 0.6, "src1": 0.25, "src2": 0.15},
                          budget, source_col="source", key_col="doc_id",
                          weight_col="n_tokens")
    comp = (mixed.groupBy("source")
            .agg(F.count("*").alias("rows"),
                 F.max("epoch").alias("max_epoch"),
                 F.sum("n_tokens").alias("tokens")).orderBy("source").collect())
    out["mix_budget_tokens"] = budget
    out["mix_wall_s"] = round(time.perf_counter() - t0, 1)
    out["mix_composition"] = [
        {"source": r.source, "rows": int(r.rows),
         "max_epoch": int(r.max_epoch), "tokens": int(r.tokens)}
        for r in comp]

    # keep one entry per (n_pages, tau): multiple scales accumulate into
    # the same evidence file instead of overwriting each other
    path = os.path.join(REPO, "BENCH", "setsim_mix_scale.json")
    runs = []
    if os.path.exists(path):
        try:
            prior = json.load(open(path))
            runs = prior.get("runs", [prior] if "n_pages" in prior else [])
        except Exception:
            runs = []
    runs = [r for r in runs
            if (r.get("n_pages"), r.get("tau")) != (out["n_pages"], out["tau"])]
    runs.append(out)
    runs.sort(key=lambda r: (r["n_pages"], r["tau"]))
    with open(path, "w") as fh:
        json.dump({"runs": runs}, fh, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
