#!/usr/bin/env python3
"""Dev-only local oracle checker (mimics the driver's DuckDB compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <outDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, sorts columns by name and rows by all columns, and
compares values exactly. Not part of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted(rows, key=key)


def cmp_val(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact: driver hash-compares
    if isinstance(a, (int,)) and isinstance(b, (int,)):
        return a == b
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only queries (no oracle): mirror the driver's weaker check
    import os
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".json") or name in oracle or (only and name not in only):
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            # the driver pandas-sorts rows-only outputs too — an
            # array-typed column crashes it even without an oracle
            rdf = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            rdf.sort_values(by=list(rdf.columns))
            print(f"{'PASS' if n > 0 else 'WARN'} {name} (rows-only, {n} rows)")
        except Exception as e:
            print(f"FAIL {name}: rows-only read error: {str(e).splitlines()[0][:120]}")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [c[0] for c in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            duck_cols = [c[0] for c in duck_rel.description]
            duck_rows = duck_rel.fetchall()
            # mirror the driver's pandas path: sort_values over all
            # columns (dies on unhashable array cells) and dtype kinds
            # (a DuckDB HUGEINT → float64 hashes differently from
            # Spark's int64 even when values compare equal)
            sdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            ddf = con.execute(sql).df()
            sdf.sort_values(by=list(sdf.columns))
            ddf.sort_values(by=list(ddf.columns))
            kinds = {
                c: (sdf[c].dtype.kind, ddf[c].dtype.kind)
                for c in sdf.columns if c in ddf.columns}
            badk = {c: k for c, k in kinds.items()
                    if k[0] != k[1] and {'i', 'f'} <= set(k)}
            if badk:
                print(f"FAIL {name}: pandas dtype kind mismatch {badk}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # reorder both to sorted column order
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s = canon([[r[i] for i in s_idx] for r in spark_rows])
        d = canon([[r[i] for i in d_idx] for r in duck_rows])
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s, d)):
            if not all(cmp_val(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
