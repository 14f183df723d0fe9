#!/usr/bin/env python3
"""Synthesize an sf1-scale bench dataset from sf0.1 (driver-side tooling,
not library code): the scaling fact/dim tables are replicated 10x with
every key column shifted by a replica stride, so join fan-outs and
group cardinalities scale like a real 10x — not 10 identical copies
landing on the same keys. Bounded dims (region/nation) and the
fixed-size documents/embeddings tables copy through unchanged (the
bench's dedup/ANN queries run on fixed-size corpora at every sf, per
Bench.scala's headline note). Timestamps in events shift by replica
too, spreading cohorts/windows across a wider range like real growth.

Usage: python3 tools/make_sf1.py [OUT_DIR] [REPLICAS]
       (defaults: /tmp/sf1, 10 — REPLICAS=100 builds an sf10 probe)
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # replicas
STRIDE = 10_000_000  # > every key in sf0.1

# table -> key columns to shift per replica
SHIFT = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}
COPY = ["region", "nation", "documents", "embeddings"]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, keys in SHIFT.items():
        cols = con.sql(f"SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0").columns
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + r.k * {STRIDE} AS {c}")
            elif t == "events" and c == "ts":
                # spread each replica a year apart so time-bucketed
                # queries see 10x the groups, not 10x the density
                sel.append(f"ts + INTERVAL (r.k) YEAR AS ts")
            else:
                sel.append(c)
        q = (f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet', "
             f"range({R}) r(k)) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        con.sql(q)
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    for t in COPY:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")


if __name__ == "__main__":
    main()
