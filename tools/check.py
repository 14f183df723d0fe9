#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each key in oracle_sql.json UNION each <name>/ parquet dir in
verifyOutDir (so a query that threw inside Verify and produced no
output dir is counted as FAIL, not silently skipped), runs the oracle
SQL in DuckDB (tables = parquet files in sfDir), then compares:
schema (column names), row count, and a TYPE-SENSITIVE canonical form
of all values with columns sorted by name and rows sorted — a float64
and a decimal.Decimal of equal numeric value do NOT compare equal,
matching the driver's stricter hashing (validated against
CORRECTNESS_r01.json, where str()-loose comparison reported green
while the driver reported hash_match=false on decimal columns).
"""
import json
import math
import os
import sys

import duckdb


def canon(rows, cols):
    """Rows as list of tuples, columns sorted by name, values normalized.

    Normalization is type-tagged: the Python type reached via the
    materialization path is part of the canonical value, so Decimal vs
    float vs int representation differences are failures.
    """
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return f"bool:{v}"
        if isinstance(v, float):
            if math.isnan(v):
                return "float:NaN"
            return f"float:{v!r}"
        if isinstance(v, int):
            return f"int:{v}"
        if isinstance(v, bytes):
            return f"bytes:{v.hex()}"
        if isinstance(v, (list, tuple)):
            return "list:[" + ",".join(norm(x) for x in v) + "]"
        return f"{type(v).__name__}:{v}"

    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    out.sort()
    return sorted(cols), out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    names = sorted(dirs | set(oracle))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        if name not in dirs:
            print(f"  ✗ {name}: NO OUTPUT DIR (query threw inside Verify?)")
            n_fail += 1
            continue
        got_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = list(got_rel.columns)
        got_rows = got_rel.fetchall()
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({len(got_rows)} rows)")
            n_rows_only += 1
            if len(got_rows) == 0:
                print(f"    !! ZERO ROWS")
                n_fail += 1
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = list(exp_rel.columns)
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        # A 0-row oracle can never verify anything — even if Spark also
        # returns 0 rows, treat it as a broken oracle, not a pass (the
        # round-6 s07 bug shipped `WHERE rn <= 0` via an uninitialized
        # interpolated constant and the driver caught it before we did).
        if len(exp_rows) == 0:
            print(f"  ✗ {name}: DEGENERATE ORACLE (0 rows) — "
                  "likely an uninitialized interpolated constant")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"  ✗ {name}: SCHEMA got={gc} exp={ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"  ✗ {name}: ROWS got={len(gr)} exp={len(er)}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i in range(len(gr)) if gr[i] != er[i])
            print(f"  ✗ {name}: VALUES differ at sorted-row {bad}:")
            print(f"      got={gr[bad]}")
            print(f"      exp={er[bad]}")
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"PASS={n_pass} ROWS_ONLY={n_rows_only} FAIL={n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
