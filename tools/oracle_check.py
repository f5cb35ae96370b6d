#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), runs
each SQL in DuckDB over the parquet tables in <sf_dir>, and compares
against the Spark result parquet in <verify_out_dir>/<name>/.

Comparison: sort columns by name, sort rows by all columns, compare
values exactly (floats exact — queries are written to be
order-independent-deterministic). Reports per-query PASS/FAIL.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:] if a != "--lint"]
    lint_only = "--lint" in sys.argv[1:]
    out_dir, sf_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    only = None
    import os
    if os.environ.get("SPARK_GRAFT_ONLY"):
        only = {s.strip() for s in os.environ["SPARK_GRAFT_ONLY"].split(",")}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        bad = lint_types(con, sql)
        if bad:
            print(f"FAIL {name}: oracle emits driver-hostile column type(s): "
                  f"{bad} — wrap in CAST(... AS BIGINT)")
            n_fail += 1
            continue
        if lint_only:
            print(f"PASS {name} (lint)")
            n_pass += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        ok, msg = compare(exp, got)
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if only is not None and n_pass + n_fail == 0:
        # a filter matching nothing (typo'd name) must not read as green
        print(f"FAIL: SPARK_GRAFT_ONLY matched no oracle names: {sorted(only)}")
        sys.exit(1)
    sys.exit(1 if n_fail else 0)


def lint_types(con, sql):
    """DESCRIBE the oracle query and reject output column types the
    driver's hasher renders differently from Spark's (the r11 lesson:
    DuckDB promotes SUM(BIGINT) -> HUGEINT = decimal128(38,0), which
    hash-mismatches an identical-valued Spark int64 column)."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return []  # the run itself will report the SQL error
    bad = []
    for row in desc:
        cname, ctype = row[0], str(row[1]).upper()
        if "HUGEINT" in ctype or ctype.startswith("DECIMAL"):
            bad.append(f"{cname}:{ctype}")
    return bad


def compare(exp, got):
    import pandas as pd
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        return False, f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}"
    if len(exp) != len(got):
        return False, f"row count: oracle={len(exp)} spark={len(got)}"
    for c in exp.columns:
        e, g = exp[c], got[c]
        ek, gk = e.dtype.kind, g.dtype.kind
        # dtype KIND must agree for numerics: a float/decimal oracle
        # column vs an integer Spark column hash-mismatches in the
        # driver even when every value compares equal (r11 red rows).
        # Width differences within a kind (int32 vs int64) are fine.
        if ek != gk and ("i" in (ek, gk) or "u" in (ek, gk)) \
                and {ek, gk} & {"f", "O", "i", "u", "b"} == {ek, gk}:
            return False, (f"col {c} dtype-kind mismatch: oracle={e.dtype} "
                           f"spark={g.dtype} — driver hashes these "
                           f"differently even on equal values")
        if not series_equal(e, g):
            i = first_diff(e, g)
            return False, (f"col {c} differs (dtype oracle={e.dtype} "
                           f"spark={g.dtype}) first diff at row {i}: "
                           f"oracle={e.iloc[i]!r} spark={g.iloc[i]!r}")
    return True, ""


def series_equal(e, g):
    import numpy as np
    import pandas as pd
    if len(e) == 0:
        return True
    try:
        en, gn = e.isna(), g.isna()
        if not (en.values == gn.values).all():
            return False
        e2, g2 = e[~en], g[~gn]
        if e.dtype.kind in "fi" and g.dtype.kind in "fi":
            return (e2.values.astype("float64") == g2.values.astype("float64")).all() or \
                   (e2.values.astype("object") == g2.values.astype("object")).all()
        return (e2.astype(str).values == g2.astype(str).values).all()
    except Exception:
        return list(e) == list(g)


def first_diff(e, g):
    for i in range(len(e)):
        a, b = e.iloc[i], g.iloc[i]
        try:
            if (a != b) and not (a != a and b != b):  # NaN==NaN ok
                return i
        except Exception:
            return i
    return 0


if __name__ == "__main__":
    main()
