#!/usr/bin/env python3
"""Synthesize the PLANS.md scaling probe: replicate the fact tables of
an sf directory N times with consistently shifted keys (joins stay
intact — lineitem.l_orderkey and orders.o_orderkey shift together;
events.event_id shifts, user_id stays so per-user timelines deepen),
copy the dims and fixed-size corpora unchanged.

Usage: python3 tools/make_sfbig.py <srcSfDir> <dstDir> [factor=10]

Driver-side tooling only (duckdb) — the library itself never runs this.
"""
import os
import sys

import duckdb


def main(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def cp(name, sql=None):
        q = sql or f"SELECT * FROM '{src}/{name}.parquet'"
        con.sql(f"COPY ({q}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"  {name}: {n} rows")

    for dim in ["region", "nation", "customer", "supplier", "part",
                "documents", "embeddings"]:
        cp(dim)

    ok = con.sql(f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'").fetchone()[0]
    ek = con.sql(f"SELECT max(event_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
    reps = f"(SELECT unnest(generate_series(0, {factor - 1})) AS rep)"

    cp("orders", f"""
        SELECT o_orderkey + rep * {ok} AS o_orderkey,
               o.* EXCLUDE (o_orderkey)
        FROM '{src}/orders.parquet' o CROSS JOIN {reps}""")
    cp("lineitem", f"""
        SELECT l_orderkey + rep * {ok} AS l_orderkey,
               l.* EXCLUDE (l_orderkey)
        FROM '{src}/lineitem.parquet' l CROSS JOIN {reps}""")
    cp("events", f"""
        SELECT event_id + rep * {ek} AS event_id,
               e.* EXCLUDE (event_id)
        FROM '{src}/events.parquet' e CROSS JOIN {reps}""")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10)
