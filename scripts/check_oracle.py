"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark AND its oracle SQL on DuckDB at sf0.01,
compare row count, sorted column names, and an order-insensitive value hash
(rows stringified with float rounding, sorted, md5)."""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import decimal
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, float):
        return f"f:{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return f"f:{float(v):.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return "t:" + str(v)
    if v is None:
        return "null"
    return "s:" + str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    import __spark_entry__ as entrymod
    from sparksketch.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8,
                      extra={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            continue
        el = time.perf_counter() - t0
        from sparksketch.certify import degeneracy_problems
        probs = degeneracy_problems(name, [r.asDict() for r in srows])
        if probs:
            failures.append(name)
            for p in probs:
                print(f"FAIL  {p}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check) [{el:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = value_hash(scols, [[r[c] for c in scols] for r in srows])
        dh = value_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK   " if (ok_cols and ok_count and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(f"{status} {name}: rows {len(srows)}/{len(drows)} cols={ok_cols} hash={ok_hash} [{el:.1f}s]")
        if not ok_cols:
            print(f"      spark cols: {sorted(scols)}  duckdb cols: {sorted(dcols)}")
        if ok_cols and ok_count and not ok_hash and len(srows) <= 40:
            print("      spark:", sorted(map(str, srows))[:6])
            print("      duck :", sorted(map(str, drows))[:6])
    spark.stop()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
