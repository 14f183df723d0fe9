#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each key in oracle_sql.json UNION each <name>/ parquet dir in
verifyOutDir (so a query that threw inside Verify and produced no
output dir is counted as FAIL, not silently skipped), runs the oracle
SQL in DuckDB (tables = parquet files in sfDir), then compares:
schema (column names), row count, and a TYPE-SENSITIVE canonical form
of all values with columns sorted by name and rows sorted.

BOTH sides are materialized through Arrow (`rel.arrow()`), never
`fetchall()`: fetchall() flattens DuckDB HUGEINT to Python int, which
hid the round-8 q30/q31 driver hash-fails (oracle SUM(BIGINT) →
HUGEINT → Arrow decimal128(38,0) vs Spark int64 — value-equal,
type-divergent). The Arrow COLUMN TYPE is part of the canonical form,
so decimal128 vs int64 is a schema-level failure here exactly as it
is a hash failure at the driver. Validated against the full round-8
Verify dump: 178 clean / exactly q30+q31 divergent, matching
CORRECTNESS_r08.json bit for bit.
"""
import json
import math
import os
import sys
from decimal import Decimal

import duckdb
import pyarrow as pa


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return f"float:{v!r}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    if isinstance(v, (list, tuple)):
        return "list:[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "struct:{" + ",".join(
            f"{k}={norm(v[k])}" for k in sorted(v)) + "}"
    return f"{type(v).__name__}:{v}"


def nested_cols(tbl):
    """Column names whose Arrow type the DRIVER's checker cannot sort.

    The driver row-sorts through pandas, and pandas' lexsort dies with
    `unhashable type: numpy.ndarray` on list/struct cells (the round-10
    e63 FAIL). This local gate handles Arrow lists fine via norm(), so
    without this check it green-lights outputs the driver will crash
    on. Oracle-checked queries must stringify arrays (concat_ws — e15's
    discipline) instead of emitting them raw."""
    import pyarrow.types as pat
    return [f.name for f in tbl.schema
            if pat.is_list(f.type) or pat.is_large_list(f.type)
            or pat.is_fixed_size_list(f.type) or pat.is_struct(f.type)
            or pat.is_map(f.type)]


def canon(tbl):
    """Arrow table → (sorted col names, sorted row tuples).

    Schema compare is NAME-only: the driver collapses integer widths
    (int32 vs int64 pass). Type sensitivity lives in the VALUES —
    `to_pylist()` yields Python int for any Arrow int width but
    Decimal for decimal128, and norm() tags them differently, which is
    exactly the driver's observed behavior on the round-8 dump (int
    widths pass, q30/q31's decimal128-vs-int64 fail)."""
    cols = tbl.column_names
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    schema = [cols[i] for i in idx]
    data = [tbl.column(i).to_pylist() for i in idx]
    normed = [[norm(x) for x in d] for d in data]
    out = [tuple(normed[c][r] for c in range(len(idx)))
           for r in range(tbl.num_rows)]
    out.sort()
    return schema, out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Sharded big-SF runs oversubscribe the box unless each DuckDB is
    # capped: 8 uncapped shards at the 500k-doc corpus each grabbed all
    # 32 threads and one staged-replay oracle hit 22 GB RSS → OOM kill.
    if os.environ.get("CHECK_THREADS"):
        con.execute(f"SET threads = {int(os.environ['CHECK_THREADS'])}")
    if os.environ.get("CHECK_MEM"):
        con.execute(f"SET memory_limit = '{os.environ['CHECK_MEM']}'")
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
    # CHECK_ONLY=k1,k2 restricts the compare to the named keys (dev aid
    # for re-judging a few keys without re-running every heavy oracle)
    only = os.environ.get("CHECK_ONLY")
    if only:
        keep = {k.strip() for k in only.split(",")}
        names = [n for n in names if n in keep]
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        if name not in dirs:
            print(f"  ✗ {name}: NO OUTPUT DIR (query threw inside Verify?)")
            n_fail += 1
            continue
        got_tbl = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").arrow()
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({got_tbl.num_rows} rows)")
            n_rows_only += 1
            if got_tbl.num_rows == 0:
                print(f"    !! ZERO ROWS")
                n_fail += 1
            continue
        nested = nested_cols(got_tbl)
        if nested:
            print(f"  ✗ {name}: RAW ARRAY/STRUCT OUTPUT {nested} — the "
                  "driver's pandas row-sort crashes on these; stringify "
                  "via concat_ws (e15's discipline)")
            n_fail += 1
            continue
        try:
            exp_tbl = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        # A 0-row oracle can never verify anything — even if Spark also
        # returns 0 rows, treat it as a broken oracle, not a pass (the
        # round-6 s07 bug shipped `WHERE rn <= 0` via an uninitialized
        # interpolated constant and the driver caught it before we did).
        if exp_tbl.num_rows == 0:
            print(f"  ✗ {name}: DEGENERATE ORACLE (0 rows) — "
                  "likely an uninitialized interpolated constant")
            n_fail += 1
            continue
        gc, gr = canon(got_tbl)
        ec, er = canon(exp_tbl)
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
