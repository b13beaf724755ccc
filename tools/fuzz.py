#!/usr/bin/env python3
"""Differential query fuzzer: random plans, Spark vs DuckDB.

Usage: python3 tools/fuzz.py [--sf DIR] [--seeds N] [--start S]

Generates random small queries (project / filter / join / aggregate /
order-limit compositions) in a grammar both engines parse identically,
runs each in PySpark and DuckDB over the same parquet tables, and
diffs canonicalized results. This is the cheap way to catch semantic
gaps the hand-written oracles never exercise. Dev tool only (PySpark /
DuckDB are driver-side deps, like tools/check.py).

Grammar (each seed draws one shape):
 - set ops (UNION [ALL] / INTERSECT / EXCEPT) over filtered projections;
 - window functions over a total (unique-key) order: row_number /
   rank / dense_rank / framed running sum / lag;
 - IN / NOT IN subqueries on join keys;
 - correlated EXISTS / NOT EXISTS (the semi/anti-join plans);
 - INNER / LEFT / FULL OUTER joins (LEFT keeps its filter on the
   preserved side; FULL runs unfiltered so null-extended rows from
   both sides survive to the diff);
 - GROUP BY aggregates (count(*) / count(expr) / sum / min / max)
   with optional HAVING;
 - order-limited projections.
 - NULL literals enter via nullif(...) and ELSE-less CASE arms inside
   expressions, and IS [NOT] NULL / null-crossing comparisons in
   predicates — exercising three-valued logic in filters, join
   conditions, and aggregation skips.

Dialect-intersection rules kept on purpose:
 - ORDER BY always lists every output column with explicit NULLS
   FIRST (the engines' default null order differs, and only a total
   order makes LIMIT deterministic);
 - integer sums wrap in CAST(... AS BIGINT) (DuckDB sums to HUGEINT);
 - % operands are abs()'d (same C-style sign rule either way, but the
   fuzzer shouldn't depend on it);
 - no division, no floats in predicates: every generated expression is
   exact integer or string, so a mismatch is a real semantic bug, not
   arithmetic noise.
"""
import argparse
import math
import random
import sys

TABLES = {
    "region": {"int": ["r_regionkey"], "str": ["r_name"], "key": "r_regionkey"},
    "nation": {"int": ["n_nationkey", "n_regionkey"], "str": ["n_name"],
               "key": "n_nationkey"},
    "customer": {"int": ["c_custkey", "c_nationkey"],
                 "str": ["c_name", "c_mktsegment"], "key": "c_custkey"},
    "orders": {"int": ["o_orderkey", "o_custkey"],
               "str": ["o_orderstatus", "o_orderpriority"], "key": "o_orderkey"},
    "supplier": {"int": ["s_suppkey", "s_nationkey"], "str": ["s_name"],
                 "key": "s_suppkey"},
    "part": {"int": ["p_partkey", "p_size"], "str": ["p_brand", "p_type"],
             "key": "p_partkey"},
}
JOINS = [
    ("nation", "region", "n_regionkey", "r_regionkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
]


def int_expr(rng, cols, depth=0):
    c = rng.choice(cols)
    if depth >= 2 or rng.random() < 0.45:
        return c
    form = rng.randrange(6)
    if form == 0:
        return f"({int_expr(rng, cols, depth+1)} + {int_expr(rng, cols, depth+1)})"
    if form == 1:
        return f"abs({int_expr(rng, cols, depth+1)} - {int_expr(rng, cols, depth+1)})"
    if form == 2:
        return f"(abs({int_expr(rng, cols, depth+1)}) % {rng.randrange(2, 20)})"
    if form == 3:
        # NULL injection: nullif turns a value band into NULLs that
        # must then flow identically through arithmetic, predicates,
        # aggregation skips, and NULLS FIRST ordering
        return (f"nullif((abs({int_expr(rng, cols, depth+1)}) % "
                f"{rng.randrange(2, 20)}), {rng.randrange(0, 6)})")
    if form == 4:
        # ELSE-less CASE: the implicit ELSE NULL arm
        return (f"(CASE WHEN {pred(rng, cols, [], depth+1)} "
                f"THEN {int_expr(rng, cols, depth+1)} END)")
    return (f"(CASE WHEN {pred(rng, cols, [], depth+1)} "
            f"THEN {int_expr(rng, cols, depth+1)} "
            f"ELSE {int_expr(rng, cols, depth+1)} END)")


def pred(rng, int_cols, str_cols, depth=0):
    if depth < 2 and rng.random() < 0.3:
        op = rng.choice(["AND", "OR"])
        return (f"({pred(rng, int_cols, str_cols, depth+1)} {op} "
                f"{pred(rng, int_cols, str_cols, depth+1)})")
    if str_cols and rng.random() < 0.3:
        c = rng.choice(str_cols)
        if rng.random() < 0.5:
            return f"length({c}) > {rng.randrange(5, 20)}"
        return f"{c} IS NOT NULL"
    if rng.random() < 0.2:
        # explicit NULL tests over expressions that CAN be null (the
        # nullif / ELSE-less CASE forms above) — and, via the
        # comparison branch below, NULL-crossing comparisons whose
        # UNKNOWN result a WHERE must drop in both engines
        e = int_expr(rng, int_cols, depth + 1)
        neg = "NOT " if rng.random() < 0.5 else ""
        return f"{e} IS {neg}NULL"
    cmp = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
    lhs = int_expr(rng, int_cols, depth + 1)
    if rng.random() < 0.5:
        return f"{lhs} {cmp} {rng.randrange(0, 2000)}"
    return f"{lhs} {cmp} {int_expr(rng, int_cols, depth+1)}"


def str_expr(rng, strs):
    c = rng.choice(strs)
    return rng.choice([
        c, f"upper({c})", f"lower({c})", f"trim({c})",
        f"substr({c}, 1, {rng.randrange(1, 8)})",
        f"({c} || '_x')", f"coalesce({c}, 'z')"])


def gen_query(rng):
    shape = rng.random()
    if shape < 0.12:
        # set operation between two filtered projections of one table
        t = rng.choice(list(TABLES))
        ints, strs = TABLES[t]["int"], TABLES[t]["str"]
        op = rng.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
        cols = f"{rng.choice(ints)} AS a, {rng.choice(strs)} AS b"
        q1 = f"SELECT {cols} FROM {t} WHERE {pred(rng, ints, strs)}"
        q2 = f"SELECT {cols} FROM {t} WHERE {pred(rng, ints, strs)}"
        return f"SELECT a, b FROM ({q1} {op} {q2}) u"
    if shape < 0.24:
        # window functions over a deterministic (unique-key) order:
        # ranking family + a framed running sum + lag (frame and
        # offset semantics are where engines actually diverge)
        t = rng.choice(list(TABLES))
        ints, strs = TABLES[t]["int"], TABLES[t]["str"]
        key = TABLES[t]["key"]
        part = rng.choice(strs + [f"(abs({rng.choice(ints)}) % 5)"])
        over = f"(PARTITION BY {part} ORDER BY {key} NULLS FIRST)"
        w = rng.choice([
            f"row_number() OVER {over}",
            f"rank() OVER {over}",
            f"dense_rank() OVER {over}",
            f"CAST(sum({int_expr(rng, ints)}) OVER "
            f"(PARTITION BY {part} ORDER BY {key} NULLS FIRST "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
            f"lag({rng.choice(ints)}, {rng.randrange(1, 3)}) OVER {over}",
        ])
        return (f"SELECT {key} AS k, {w} AS w "
                f"FROM {t} WHERE {pred(rng, ints, strs)}")
    if shape < 0.34:
        # IN / NOT IN subquery on a join key (keys are non-null)
        t1, t2, k1, k2 = rng.choice(JOINS)
        neg = "NOT " if rng.random() < 0.4 else ""
        ints, strs = TABLES[t1]["int"], TABLES[t1]["str"]
        return (f"SELECT {TABLES[t1]['key']} AS k FROM {t1} "
                f"WHERE {k1} {neg}IN (SELECT {k2} FROM {t2} "
                f"WHERE {pred(rng, TABLES[t2]['int'], TABLES[t2]['str'])}) "
                f"AND {pred(rng, ints, strs)}")
    if shape < 0.44:
        # correlated EXISTS / NOT EXISTS — the semi/anti-join plans,
        # written in the dialect-shared form (Spark's LEFT SEMI JOIN
        # and DuckDB's SEMI JOIN spellings differ)
        t1, t2, k1, k2 = rng.choice(JOINS)
        neg = "NOT " if rng.random() < 0.5 else ""
        in2 = [f"{t2}.{c}" for c in TABLES[t2]["int"]]
        st2 = [f"{t2}.{c}" for c in TABLES[t2]["str"]]
        return (f"SELECT {TABLES[t1]['key']} AS k FROM {t1} "
                f"WHERE {neg}EXISTS (SELECT 1 FROM {t2} "
                f"WHERE {t2}.{k2} = {t1}.{k1} AND {pred(rng, in2, st2)}) "
                f"AND {pred(rng, TABLES[t1]['int'], TABLES[t1]['str'])}")
    full_join = False
    if shape < 0.62:
        t1, t2, k1, k2 = rng.choice(JOINS)
        r = rng.random()
        jt = "FULL JOIN" if r < 0.2 else ("LEFT JOIN" if r < 0.5 else "JOIN")
        frm = f"{t1} {jt} {t2} ON {t1}.{k1} = {t2}.{k2}"
        ints = [f"{t1}.{c}" for c in TABLES[t1]["int"]] + \
               [f"{t2}.{c}" for c in TABLES[t2]["int"]]
        strs = [f"{t1}.{c}" for c in TABLES[t1]["str"]] + \
               [f"{t2}.{c}" for c in TABLES[t2]["str"]]
        if jt == "LEFT JOIN":
            # predicates over the nullable right side change LEFT JOIN
            # row counts identically in both engines, but keep the
            # filter on the left side so null-extension survives
            ints = [f"{t1}.{c}" for c in TABLES[t1]["int"]]
            strs = [f"{t1}.{c}" for c in TABLES[t1]["str"]]
        full_join = jt == "FULL JOIN"
    else:
        t = rng.choice(list(TABLES))
        frm = t
        ints = TABLES[t]["int"]
        strs = TABLES[t]["str"]
    # FULL JOIN runs unfiltered: a WHERE over either side would drop
    # the null-extended rows that make the shape worth fuzzing
    where = (f" WHERE {pred(rng, ints, strs)}"
             if rng.random() < 0.8 and not full_join else "")
    if rng.random() < 0.5:
        # aggregate shape
        g = rng.choice(ints + strs)
        aggs = [f"count(*) AS n",
                f"CAST(sum({int_expr(rng, ints)}) AS BIGINT) AS s",
                f"min({int_expr(rng, ints)}) AS mn",
                f"max({rng.choice(ints)}) AS mx",
                # count(expr) skips the NULLs the nullif/CASE forms inject
                f"count({int_expr(rng, ints)}) AS cn"]
        rng.shuffle(aggs)
        aggs = aggs[:rng.randrange(1, len(aggs) + 1)]
        sel = f"{g} AS g, " + ", ".join(aggs)
        sql = f"SELECT {sel} FROM {frm}{where} GROUP BY {g}"
        if rng.random() < 0.3:
            sql += f" HAVING count(*) > {rng.randrange(1, 4)}"
        return sql
    # projection shape, order-limited for determinism
    exprs = [f"{int_expr(rng, ints)} AS e{i}"
             for i in range(rng.randrange(1, 4))]
    if strs and rng.random() < 0.6:
        exprs.append(f"{str_expr(rng, strs)} AS sc")
    distinct = "DISTINCT " if rng.random() < 0.2 else ""
    names = [e.split(" AS ")[1] for e in exprs]
    order = ", ".join(f"{n} NULLS FIRST" for n in names)
    return (f"SELECT {distinct}{', '.join(exprs)} FROM {frm}{where} "
            f"ORDER BY {order} LIMIT {rng.randrange(1, 200)}")


def canon(rows):
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def cmp_val(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        return (math.isnan(fa) and math.isnan(fb)) or fa == fb
    return str(a) == str(b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--seeds", type=int, default=200)
    ap.add_argument("--start", type=int, default=0)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", 8)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf}/{t}.parquet"
        spark.read.parquet(path).createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_pass = n_fail = 0
    fails = []
    for seed in range(args.start, args.start + args.seeds):
        rng = random.Random(seed)
        sql = gen_query(rng)
        try:
            s_rows = [tuple(r) for r in spark.sql(sql).collect()]
            d_rows = con.execute(sql).fetchall()
        except Exception as e:
            n_fail += 1
            fails.append((seed, sql, f"exec: {str(e).splitlines()[0][:160]}"))
            continue
        s, d = canon(s_rows), canon(d_rows)
        if len(s) != len(d):
            n_fail += 1
            fails.append((seed, sql, f"rows spark={len(s)} duck={len(d)}"))
            continue
        bad = next((i for i, (sr, dr) in enumerate(zip(s, d))
                    if not all(cmp_val(a, b) for a, b in zip(sr, dr))), None)
        if bad is not None:
            n_fail += 1
            fails.append((seed, sql, f"row {bad}: spark={s[bad]} duck={d[bad]}"))
        else:
            n_pass += 1
        if (seed + 1) % 100 == 0:
            print(f"  ... {seed + 1 - args.start}/{args.seeds} done "
                  f"({n_fail} fail)", flush=True)
    for seed, sql, why in fails:
        print(f"FAIL seed={seed}: {why}\n  {sql}")
    print(f"== fuzz: {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
