#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir> [--skip-spark]

1. sbt runMain graft.Verify <sfDir> <outDir>   (unless --skip-spark)
2. For each query parquet in <outDir>, run the matching oracle SQL from
   oracle_sql.json in DuckDB over the same sf tables and compare:
   columns sorted by name, rows sorted by all columns, exact values
   (doubles compared bitwise-exact first, then with 1e-12 rel tolerance
   reported separately so near-misses are visible).
"""
import json
import math
import os
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def compare(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"COLS spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    issues = []
    for c in a.columns:
        av, bv = a[c], b[c]
        # Driver parity: the driver hashes RENDERED values, so a DECIMAL
        # column on one side vs DOUBLE on the other hash-differs even when
        # numerically equal (v9 round-5 failure). Flag the type skew before
        # any float coercion can mask it.
        def _is_dec(s):
            import decimal
            return s.dtype.kind == "O" and any(
                isinstance(x, decimal.Decimal) for x in s.dropna().head(5))
        if _is_dec(av) != _is_dec(bv) and (av.dtype.kind == "f"
                                           or bv.dtype.kind == "f"):
            issues.append(
                f"{c}: TYPE-MISMATCH decimal-vs-float "
                f"(spark {a[c].dtype}/{'dec' if _is_dec(av) else 'num'}, "
                f"duck {b[c].dtype}/{'dec' if _is_dec(bv) else 'num'}) — "
                f"driver hash would fail; CAST both sides to DOUBLE")
            continue
        if _is_dec(av) and _is_dec(bv):
            # Both DECIMAL: the driver renders with scale, so
            # Decimal('54.110') != Decimal('54.11') under a string hash
            # even though == numerically. Compare renderings.
            ast = av.map(lambda x: None if pd.isna(x) else str(x))
            bst = bv.map(lambda x: None if pd.isna(x) else str(x))
            if not ast.eq(bst).all():
                bad = [(x, y) for x, y in zip(ast, bst) if x != y][:3]
                issues.append(f"{c}: DECIMAL-SCALE-RENDER e.g. {bad}")
            continue
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            exact = ((av == bv) | (av.isna() & bv.isna())).all()
            if not exact:
                close = all(
                    (math.isnan(x) and math.isnan(y)) or
                    (x == y) or
                    (abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)))
                    for x, y in zip(av, bv))
                if close:
                    issues.append(f"{c}: FLOAT-NEAR (not bit-exact)")
                else:
                    bad = [(x, y) for x, y in zip(av, bv) if x != y and not (
                        math.isnan(x) and math.isnan(y))][:3]
                    issues.append(f"{c}: FLOAT-DIFF e.g. {bad}")
        else:
            if not (av.astype(object).where(pd.notna(av), None)
                    .eq(bv.astype(object).where(pd.notna(bv), None)).all()):
                bad = [(x, y) for x, y in zip(av, bv) if x != y][:3]
                issues.append(f"{c}: DIFF e.g. {bad} "
                              f"(dtypes {a[c].dtype}/{b[c].dtype})")
    return "; ".join(issues) if issues else None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    if "--skip-spark" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
            capture_output=True, text=True, cwd="/root/repo")
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print("SPARK-FAIL:", line)
        if r.returncode != 0:
            print("sbt failed:", r.stdout[-3000:])
            sys.exit(1)

    # One FRESH, memory-capped connection per oracle: at sf0.1 a single
    # shared connection accumulates allocator state until one big oracle
    # OOMs, after which EVERY later query fails with tiny bad-alloc
    # errors (the round-7 sweep failure mode). Connection setup is
    # microseconds next to any oracle; the cap keeps DuckDB from
    # fighting a concurrently-running Spark JVM for the whole box.
    # Memory cap derived from the box, not hard-coded: 56GB is the
    # sweet spot on the 128GB dev machine (a 24GB cap pushed c12's
    # recursive intermediate into a cwd spill that transiently filled
    # the disk), but raising the cap ABOVE what the host actually has
    # lets DuckDB overcommit and get OOM-killed instead of spilling —
    # so clamp to 70% of MemAvailable, with env overrides for both
    # knobs (GRAFT_DUCK_MEM like '24GB', GRAFT_DUCK_THREADS).
    def _avail_gb():
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemAvailable:"):
                        return int(line.split()[1]) // (1024 * 1024)
        except OSError:
            pass
        return 56  # no /proc (non-Linux): keep the recorded default
    duck_mem = os.environ.get(
        "GRAFT_DUCK_MEM", f"{max(4, min(56, int(_avail_gb() * 0.7)))}GB")
    duck_threads = int(os.environ.get("GRAFT_DUCK_THREADS", "16"))

    def fresh_con():
        c = duckdb.connect()
        c.sql(f"SET memory_limit='{duck_mem}'")
        c.sql("SET temp_directory='/tmp/graft_duck_spill'")
        c.sql(f"SET threads TO {duck_threads}")
        for t in TABLES:
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"'{sf_dir}/{t}.parquet'")
        return c

    def run_oracle(sql):
        c = fresh_con()
        try:
            return c.sql(sql).df()
        finally:
            c.close()

    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())

    results = {}
    all_queries = sorted(p.name for p in Path(out_dir).iterdir()
                         if p.is_dir())
    for name in all_queries:
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception:
            try:  # transient malloc pressure: one retry
                spark_df = pd.read_parquet(f"{out_dir}/{name}")
            except Exception as e:
                results[name] = f"SPARK-READ-FAIL {e}"
                continue
        if name not in oracle:
            results[name] = f"(rows-only) {len(spark_df)} rows"
            continue
        try:
            duck_df = run_oracle(oracle[name])
        except Exception:
            try:  # once more on a brand-new connection
                duck_df = run_oracle(oracle[name])
            except Exception as e:
                results[name] = f"ORACLE-FAIL {str(e).splitlines()[0][:200]}"
                continue
        diff = compare(name, spark_df, duck_df)
        results[name] = diff or f"OK ({len(spark_df)} rows)"

    missing = set(oracle) - set(all_queries)
    for m in missing:
        results[m] = "MISSING spark output"
    n_ok = sum(1 for v in results.values()
               if v.startswith("OK") or v.startswith("(rows-only)"))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith(('OK', '(rows-only)')) else 'FAIL':4} {k}: {results[k]}")
    print(f"== {n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 2)


if __name__ == "__main__":
    main()
