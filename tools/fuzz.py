#!/usr/bin/env python3
"""Differential query fuzzer: random plans, Spark vs DuckDB.

Usage: python3 tools/fuzz.py [--sf DIR] [--seeds N] [--start S]
                             [--grammar rel|text|kernels] [--guard-selftest]

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

The TEXT grammar (--grammar text) fuzzes the engine's differentiating
surface — string functions, array slicing, and lambda HOFs — over the
`documents` table. Some of that surface has DIVERGENT spellings or
index semantics between the engines (split vs string_split, size vs
len, filter vs list_filter, slice(l,i,n) vs list_slice(l,i,i+n-1),
element_at vs list_extract, array_join vs array_to_string, LATERAL
VIEW explode vs unnest), so every text-grammar expression is built as
a (spark_sql, duckdb_sql) PAIR from one tree — the random structure is
identical, only the rendering differs. Shared-subset rules:
 - arrays never reach the output row raw (repr differs) — they exit
   through array_join / size / element_at;
 - element_at is always guarded by `CASE WHEN size(l) >= i` (Spark
   ANSI mode throws on out-of-bounds where DuckDB returns NULL);
 - list_distinct drops NULLs in DuckDB, so distinct/sort only ever
   wrap split-derived arrays (non-null elements by construction);
 - lambda bodies stick to functions spelled identically in both
   dialects (length, upper, lower, left, reverse, contains, ||).

The KERNELS grammar (--grammar kernels) fuzzes the single-pass
dedup/fingerprint Catalyst kernels (shingle_set / minhash_sig /
simhash64 / md5_simhash64, SQL-registered by GraftExtensions) against
their explode+aggregate reference formulations — BOTH sides run on
Spark (the harness routes that grammar spark-vs-spark), over random
slices of `documents` unioned with adversarial literal rows (empties,
repeated whitespace, tabs/newlines, unicode, heavy repetition). This
extends the hand-picked parity property specs (TextFunctionsSpec /
DedupSpec) to randomized (text, n, k) coverage.
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
    if shape < 0.07:
        # rollup / cube / grouping sets — the Expand-based aggregate
        # plans; grouping() flags disambiguate the rollup-generated
        # NULL keys from data NULLs so canonical compare stays exact.
        # KNOWN DIALECT DIVERGENCE (found by this shape, seeds 96/113):
        # over EMPTY input the SQL-standard empty grouping set () emits
        # one global row (count=0) in DuckDB, while Spark's Expand-
        # based plan emits zero rows. So the variants whose set list
        # contains () run UNFILTERED (whole table, never empty), and
        # only the ()-free GROUPING SETS variant takes a random WHERE.
        t = rng.choice(list(TABLES))
        ints, strs = TABLES[t]["int"], TABLES[t]["str"]
        g1, g2 = rng.choice(strs), rng.choice(ints)
        if rng.random() < 0.5:
            op = rng.choice([f"ROLLUP({g1}, {g2})", f"CUBE({g1}, {g2})"])
            where = ""
        else:
            op = f"GROUPING SETS (({g1}, {g2}), ({g1}))"
            where = f" WHERE {pred(rng, ints, strs)}"
        return (f"SELECT {g1} AS a, {g2} AS b, "
                f"CAST(grouping({g1}) AS INT) AS ga, "
                f"CAST(grouping({g2}) AS INT) AS gb, "
                f"count(*) AS n, CAST(sum({int_expr(rng, ints)}) AS BIGINT) AS s "
                f"FROM {t}{where} "
                f"GROUP BY {op}")
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
        # sliding / RANGE frames over the unique integer key — frame
        # boundary semantics (inclusive value offsets vs row offsets,
        # empty frames at partition edges) are where engines diverge
        k1, k2 = rng.randrange(1, 4), rng.randrange(0, 3)
        rows_frame = (f"(PARTITION BY {part} ORDER BY {key} NULLS FIRST "
                      f"ROWS BETWEEN {k1} PRECEDING AND {k2} FOLLOWING)")
        range_frame = (f"(PARTITION BY {part} ORDER BY {key} NULLS FIRST "
                       f"RANGE BETWEEN {rng.randrange(1, 2000)} PRECEDING "
                       f"AND CURRENT ROW)")
        w = rng.choice([
            f"row_number() OVER {over}",
            f"rank() OVER {over}",
            f"dense_rank() OVER {over}",
            f"ntile({rng.randrange(2, 7)}) OVER {over}",
            f"CAST(sum({int_expr(rng, ints)}) OVER "
            f"(PARTITION BY {part} ORDER BY {key} NULLS FIRST "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
            f"CAST(sum({rng.choice(ints)}) OVER {rows_frame} AS BIGINT)",
            f"CAST(sum({rng.choice(ints)}) OVER {range_frame} AS BIGINT)",
            f"CAST(count({int_expr(rng, ints)}) OVER {rows_frame} AS BIGINT)",
            f"lag({rng.choice(ints)}, {rng.randrange(1, 3)}) OVER {over}",
            f"lead({rng.choice(ints)}, {rng.randrange(1, 3)}) OVER {over}",
            f"first_value({rng.choice(ints)}) OVER {rows_frame}",
            f"last_value({rng.choice(ints)}) OVER {rows_frame}",
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
    # a unique non-null per-row key makes argmax deterministic; only
    # the single-table shape has one (a one-to-many join repeats t1's
    # key, and a nondeterministic argmax would fuzz the fuzzer)
    ukey = TABLES[frm]["key"] if frm in TABLES else None
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
        if ukey is not None:
            # argmax over the unique key (tie-free); the value is
            # coalesced because the engines disagree on whether a NULL
            # value at the extremum row is returned or skipped
            aggs.append(f"max_by(coalesce({rng.choice(ints)}, 0), {ukey}) AS ab")
            aggs.append(f"min_by(coalesce({rng.choice(ints)}, 0), {ukey}) AS bb")
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


# ---------------- text/array grammar (dual-dialect pairs) ----------------

# vocabulary the synthetic documents actually draw from, so contains /
# array_contains / instr probes hit sometimes and miss sometimes
WORDS = ["the", "data", "join", "scan", "batch", "spark", "row", "key",
         "agg", "window", "merge", "zebra"]


def ap(fmt, *ps):
    """Render a format string against the spark / duckdb sides of pairs."""
    return (fmt.format(*[p[0] for p in ps]),
            fmt.format(*[p[1] for p in ps]))


def t_splitws(p, sep=" "):
    # Spark split() takes a REGEX separator, DuckDB string_split() a
    # literal — a regex-metachar separator would silently diverge the
    # two dialects, so only regex-safe separators are admitted here
    assert sep == " " or sep.isalnum(), f"regex-unsafe split separator {sep!r}"
    return (f"split({p[0]}, '{sep}')", f"string_split({p[1]}, '{sep}')")


def t_size(p):
    return (f"size({p[0]})", f"len({p[1]})")


def t_slice(p, start, n):
    # Spark slice is (start, LENGTH); DuckDB list_slice is an INCLUSIVE
    # (begin, end) index range — same result iff end = start + n - 1
    return (f"slice({p[0]}, {start}, {n})",
            f"list_slice({p[1]}, {start}, {start + n - 1})")


def t_elem_guarded(p, i):
    # out-of-bounds: Spark ANSI throws, DuckDB returns NULL — guard so
    # both produce NULL (and the NULL then flows through the diff)
    return (f"(CASE WHEN size({p[0]}) >= {i} THEN element_at({p[0]}, {i}) END)",
            f"(CASE WHEN len({p[1]}) >= {i} THEN list_extract({p[1]}, {i}) END)")


def t_join(p, sep="-"):
    # empty list: Spark array_join -> '', DuckDB array_to_string ->
    # NULL — normalize both to NULL via a size guard
    return (f"(CASE WHEN size({p[0]}) > 0 THEN array_join({p[0]}, '{sep}') END)",
            f"(CASE WHEN len({p[1]}) > 0 THEN array_to_string({p[1]}, '{sep}') END)")


def t_contains_arr(p, w):
    return (f"array_contains({p[0]}, '{w}')", f"list_contains({p[1]}, '{w}')")


def t_sort_distinct(p):
    return (f"array_sort(array_distinct({p[0]}))",
            f"list_sort(list_distinct({p[1]}))")


def t_lam_str(rng, var):
    """Lambda-body string expr over `var` — identical spelling in both."""
    return rng.choice([
        f"upper({var})", f"lower({var})", f"reverse({var})",
        f"left({var}, {rng.randrange(1, 4)})", f"({var} || '_x')"])


def t_lam_pred(rng, var):
    return rng.choice([
        f"length({var}) > {rng.randrange(2, 7)}",
        f"{var} = '{rng.choice(WORDS)}'",
        f"contains({var}, '{rng.choice('aeskrw')}')"])


def t_arr(rng, depth=0):
    """Array-typed pair expr rooted at the CTE's `toks` column."""
    if depth >= 2 or rng.random() < 0.4:
        return ("toks", "toks")
    inner = t_arr(rng, depth + 1)
    form = rng.randrange(5)
    if form == 0:
        return t_slice(inner, rng.randrange(1, 6), rng.randrange(0, 6))
    if form == 1:
        v = rng.choice("tuv")
        pr = t_lam_pred(rng, v)
        return (f"filter({inner[0]}, {v} -> {pr})",
                f"list_filter({inner[1]}, {v} -> {pr})")
    if form == 2:
        v = rng.choice("tuv")
        e = t_lam_str(rng, v)
        return (f"transform({inner[0]}, {v} -> {e})",
                f"list_transform({inner[1]}, {v} -> {e})")
    if form == 3:
        return t_sort_distinct(inner)
    return inner


def t_str(rng, depth=0):
    """Scalar string pair expr (never a raw array)."""
    if depth >= 2 or rng.random() < 0.35:
        base = rng.random()
        if base < 0.3:
            return ("lang", "lang")
        if base < 0.5:
            return ("source", "source")
        return ap(f"substr(text, 1, {rng.randrange(3, 30)})")
    form = rng.randrange(8)
    if form == 0:
        return t_join(t_arr(rng, depth + 1), rng.choice("-_|"))
    if form == 1:
        return t_elem_guarded(t_arr(rng, depth + 1), rng.randrange(1, 8))
    inner = t_str(rng, depth + 1)
    if form == 2:
        return ap("upper({0})", inner)
    if form == 3:
        return ap("replace({0}, '" + rng.choice("aes ") + "', '_')", inner)
    if form == 4:
        return ap(f"lpad({{0}}, {rng.randrange(2, 12)}, '*')", inner)
    if form == 5:
        return ap(f"{rng.choice(['left', 'right'])}({{0}}, {rng.randrange(1, 6)})",
                  inner)
    if form == 6:
        return ap("({0} || '#' || {1})", inner, t_str(rng, depth + 1))
    return ap("reverse(trim({0}))", inner)


def t_int(rng, depth=0):
    """Integer pair expr; may be NULL via nullif / ELSE-less CASE."""
    if depth >= 2 or rng.random() < 0.3:
        base = rng.random()
        if base < 0.25:
            return ("doc_id", "doc_id")
        if base < 0.45:
            return ("n_chars", "n_chars")
        if base < 0.75:
            return ap("length({0})", t_str(rng, depth + 1))
        return t_size(t_arr(rng, depth + 1))
    form = rng.randrange(6)
    if form == 0:
        return ap("({0} + {1})", t_int(rng, depth + 1), t_int(rng, depth + 1))
    if form == 5:
        # the DSIR 16-bit md5 bucket (Dsir.bucketOf vs the oracle's
        # strpos-nibble arithmetic) over an arbitrary string expr —
        # the exactness linchpin of the text_dsir_* oracles, fuzzed
        # here beyond the fixed n-gram inputs those queries feed it.
        # md5 of NULL null-propagates identically in both dialects.
        s = t_str(rng, depth + 1)
        nib = "(strpos('0123456789abcdef', substr(md5({e}), {i}, 1)) - 1)"
        duck = "((" + " + ".join(
            f"{nib.format(e=s[1], i=i + 1)} * {m}"
            for i, m in enumerate([4096, 256, 16, 1])) + ") % 256)"
        return (f"(CAST(conv(substring(md5({s[0]}), 1, 4), 16, 10) AS BIGINT)"
                f" % 256)", duck)
    if form == 1:
        return ap(f"(abs({{0}}) % {rng.randrange(2, 20)})", t_int(rng, depth + 1))
    if form == 2:
        return ap(f"instr({{0}}, '{rng.choice(WORDS)}')", t_str(rng, depth + 1))
    if form == 3:
        return ap(f"nullif((abs({{0}}) % {rng.randrange(2, 10)}), "
                  f"{rng.randrange(0, 4)})", t_int(rng, depth + 1))
    return ap("(CASE WHEN {0} THEN {1} END)",
              t_pred(rng, depth + 1), t_int(rng, depth + 1))


def t_pred(rng, depth=0):
    if depth < 2 and rng.random() < 0.25:
        op = rng.choice(["AND", "OR"])
        return ap(f"({{0}} {op} {{1}})",
                  t_pred(rng, depth + 1), t_pred(rng, depth + 1))
    form = rng.randrange(6)
    if form == 0:
        return ap(f"contains({{0}}, '{rng.choice(WORDS)}')", t_str(rng, depth + 1))
    if form == 1:
        return ap(f"({{0}} LIKE '%{rng.choice(WORDS)}%')", t_str(rng, depth + 1))
    if form == 2:
        return t_contains_arr(t_arr(rng, depth + 1), rng.choice(WORDS))
    if form == 3:
        neg = "NOT " if rng.random() < 0.5 else ""
        return ap(f"{{0}} IS {neg}NULL", t_int(rng, depth + 1))
    cmp_op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
    if rng.random() < 0.5:
        return ap(f"({{0}} {cmp_op} {rng.randrange(0, 300)})", t_int(rng, depth + 1))
    return ap(f"({{0}} {cmp_op} {{1}})",
              t_int(rng, depth + 1), t_int(rng, depth + 1))


def gen_text_query(rng):
    """One random text/array query as a (spark_sql, duckdb_sql) pair."""
    sep = " " if rng.random() < 0.8 else rng.choice("ae")
    cte = ap("WITH d AS (SELECT doc_id, lang, source, text, n_chars, "
             "{0} AS toks FROM documents{1}) ",
             t_splitws(("lower(text)", "lower(text)"), sep),
             ap(f" WHERE (abs(doc_id) % {rng.randrange(2, 8)}) = "
                f"{rng.randrange(0, 2)}") if rng.random() < 0.5 else ("", ""))
    shape = rng.random()
    if shape < 0.18:
        # explode/unnest: dialects differ structurally, not just in names
        tokp = ap("tok")
        wh = t_lam_pred(rng, "tok")
        return ap(
            "{0}SELECT doc_id AS k, tok, length(tok) AS n FROM "
            "(SELECT doc_id, explode(toks) AS tok FROM d) e WHERE {1}",
            cte, (wh, wh))[0], ap(
            "{0}SELECT doc_id AS k, tok, length(tok) AS n FROM "
            "(SELECT doc_id, unnest(toks) AS tok FROM d) e WHERE {1}",
            cte, (wh, wh))[1]
    if shape < 0.55:
        # aggregate over string/array-derived keys
        g = rng.choice([("lang", "lang"), ("source", "source"),
                        ap(f"(abs({{0}}) % {rng.randrange(2, 6)})", t_int(rng))])
        aggs = [ap("count(*) AS n"),
                ap("CAST(sum({0}) AS BIGINT) AS s", t_int(rng)),
                ap("count({0}) AS cn", t_int(rng)),
                ap("min({0}) AS mn", t_str(rng)),
                ap("max({0}) AS mx", t_str(rng))]
        rng.shuffle(aggs)
        aggs = aggs[:rng.randrange(1, len(aggs) + 1)]
        agg_p = (", ".join(a[0] for a in aggs), ", ".join(a[1] for a in aggs))
        having = (f" HAVING count(*) > {rng.randrange(1, 5)}"
                  if rng.random() < 0.3 else "")
        wh = ap(" WHERE {0}", t_pred(rng)) if rng.random() < 0.6 else ("", "")
        return ap("{0}SELECT {1} AS g, {2} FROM d{3} GROUP BY {1}{4}",
                  cte, g, agg_p, wh, (having, having))
    # order-limited projection keyed by the unique doc_id
    exprs = [ap(f"{{0}} AS e{i}",
                rng.choice([t_int, t_str])(rng))
             for i in range(rng.randrange(1, 4))]
    sel = (", ".join(e[0] for e in exprs), ", ".join(e[1] for e in exprs))
    wh = ap(" WHERE {0}", t_pred(rng)) if rng.random() < 0.6 else ("", "")
    return ap("{0}SELECT doc_id AS k, {1} FROM d{2} "
              "ORDER BY k NULLS FIRST LIMIT {3}",
              cte, sel, wh, ap(str(rng.randrange(1, 120))))


# ---------------- kernel-parity grammar (spark vs spark) ----------------

# adversarial texts the documents table never contains: empties, runs
# of whitespace, tabs/newlines, unicode, heavy token repetition (no
# apostrophes — these are spliced into SQL literals)
KERNEL_ADVERSARIAL = [
    "", " ", "  a  b ", "a\tb\nc", "é ß 中 文",
    "the the the data data", "x", "zebra  zebra\tzebra", " \t ",
]

# tokenization shared by every kernel: \s+ split of lowercase text
# (keeps empty tokens, like TextFunctions.tokens)
KTOKS = "split(lower(text), '\\\\s+')"


def _kshingle_agg(n):
    # HOF reference form of shingle_set(text, n) over a `toks` column:
    # guarded sequence (Spark's sequence(0, -1) DESCENDS), first-
    # occurrence-order distinct
    return (f"array_distinct(CASE WHEN size(toks) >= {n} THEN "
            f"transform(sequence(0, size(toks) - {n}), "
            f"i -> concat_ws(' ', slice(toks, i + 1, {n}))) "
            f"ELSE cast(array() AS array<string>) END)")


def gen_kernel_query(rng):
    """One kernel-parity pair (kernel_sql, aggform_sql) — both Spark."""
    pred = (f"(abs(doc_id) % {rng.randrange(2, 8)}) = {rng.randrange(0, 2)}"
            if rng.random() < 0.7 else "true")
    lits = rng.sample(KERNEL_ADVERSARIAL,
                      rng.randrange(1, len(KERNEL_ADVERSARIAL)))
    vals = ", ".join(f"({90000 + i}, '{t}')" for i, t in enumerate(lits))
    cte = (f"WITH d AS (SELECT doc_id, text FROM documents WHERE {pred} "
           f"UNION ALL SELECT * FROM VALUES {vals} AS v(doc_id, text)) ")
    n = rng.randrange(1, 5)
    kind = rng.randrange(4)
    if kind == 0:
        return (cte + f"SELECT doc_id AS k, shingle_set(text, {n}) AS v FROM d",
                cte + f"SELECT doc_id AS k, {_kshingle_agg(n)} AS v FROM "
                      f"(SELECT doc_id, {KTOKS} AS toks FROM d)")
    if kind == 1:
        # minhash: null signature (no shingles) <=> absent from the agg
        # form (explode emits no rows) — filter the kernel side to match
        k = rng.choice([4, 8, 16])
        mins = ", ".join(f"min(xxhash64(shingle, {i}))" for i in range(k))
        return (cte + f"SELECT k, v FROM (SELECT doc_id AS k, "
                      f"minhash_sig(text, {n}, {k}) AS v FROM d) "
                      f"WHERE v IS NOT NULL",
                cte + f"SELECT doc_id AS k, array({mins}) AS v FROM "
                      f"(SELECT doc_id, explode({_kshingle_agg(n)}) AS shingle "
                      f"FROM (SELECT doc_id, {KTOKS} AS toks FROM d)) "
                      f"GROUP BY doc_id")
    if kind == 2:
        # xxhash64 simhash: empty tokens vote too (split keeps them),
        # so every doc appears on both sides
        bits = " | ".join(
            f"(CASE WHEN sum(CASE WHEN (shiftright(xxhash64(tok), {j}) & 1) = 1 "
            f"THEN 1 ELSE -1 END) > 0 THEN shiftleft(1L, {j}) ELSE 0L END)"
            for j in range(64))
        return (cte + "SELECT doc_id AS k, simhash64(text) AS v FROM d",
                cte + f"SELECT doc_id AS k, ({bits}) AS v FROM "
                      f"(SELECT doc_id, explode({KTOKS}) AS tok FROM d) "
                      f"GROUP BY doc_id")
    # md5 simhash, compared in the 4x16-bit chunk form the pair
    # pipeline consumes; kernel NULL (no non-empty tokens) <=> absent
    # from the agg form (length filter drops every row)
    chunks_k = ", ".join(
        f"cast((shiftrightunsigned(v, {c * 16}) & 65535) AS int) AS c{c}"
        for c in range(4))

    def bvote(j):
        # bit j of a token = bit (j mod 4) of hex nibble (j div 4)
        return (f"sum(CASE WHEN (shiftright(cast(conv(substring(h, "
                f"{j // 4 + 1}, 1), 16, 10) AS int), {j % 4}) & 1) = 1 "
                f"THEN 1 ELSE -1 END)")
    chunks_a = ", ".join(
        "(" + " + ".join(
            f"(CASE WHEN {bvote(c * 16 + b)} > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(16)) + f") AS c{c}"
        for c in range(4))
    return (cte + f"SELECT k, {chunks_k} FROM (SELECT doc_id AS k, "
                  f"md5_simhash64(text) AS v FROM d) WHERE v IS NOT NULL",
            cte + f"SELECT doc_id AS k, {chunks_a} FROM "
                  f"(SELECT doc_id, md5(tok) AS h FROM "
                  f"(SELECT doc_id, explode({KTOKS}) AS tok FROM d) "
                  f"WHERE length(tok) > 0) GROUP BY doc_id")


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
    ap.add_argument("--grammar", choices=["rel", "text", "kernels"],
                    default="rel")
    ap.add_argument("--guard-selftest", action="store_true",
                    help="assert the dialect-divergence guards fire, then exit")
    args = ap.parse_args()

    if args.guard_selftest:
        # adversarial separator: Spark split() treats it as regex
        # alternation, DuckDB string_split() as a literal — the guard
        # must refuse it instead of silently diverging the dialects
        try:
            t_splitws(("text", "text"), "|")
        except AssertionError:
            print("guard ok: t_splitws rejects regex-metachar separators")
            sys.exit(0)
        print("GUARD FAIL: t_splitws accepted regex metachar '|'")
        sys.exit(1)

    import duckdb
    from pyspark.sql import SparkSession
    builder = (SparkSession.builder.master("local[8]")
               .config("spark.sql.shuffle.partitions", 8)
               .config("spark.sql.session.timeZone", "UTC")
               .config("spark.ui.enabled", "false"))
    if args.grammar == "kernels":
        # the kernels are Catalyst expressions in the library jar —
        # register them as SQL functions in the pyspark JVM
        builder = (builder
                   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
                   .config("spark.driver.extraClassPath",
                           "/root/repo/target/scala-2.13/classes"))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in list(TABLES) + ["documents"]:
        path = f"{args.sf}/{t}.parquet"
        spark.read.parquet(path).createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_pass = n_fail = 0
    fails = []
    for seed in range(args.start, args.start + args.seeds):
        rng = random.Random(seed)
        if args.grammar == "text":
            s_sql, d_sql = gen_text_query(rng)
            sql = s_sql if s_sql == d_sql else f"spark: {s_sql}\n  duck: {d_sql}"
        elif args.grammar == "kernels":
            s_sql, d_sql = gen_kernel_query(rng)
            sql = f"kernel: {s_sql}\n  aggform: {d_sql}"
        else:
            sql = s_sql = d_sql = gen_query(rng)
        try:
            s_rows = [tuple(r) for r in spark.sql(s_sql).collect()]
            # kernel parity is spark-vs-spark; the other grammars diff
            # against DuckDB
            d_rows = ([tuple(r) for r in spark.sql(d_sql).collect()]
                      if args.grammar == "kernels"
                      else con.execute(d_sql).fetchall())
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
