#!/usr/bin/env python3
"""Synthesize an sf1-scale bench dataset from sf0.1 (driver-side tooling,
not library code): the scaling fact/dim tables are replicated 10x with
every key column shifted by a replica stride, so join fan-outs and
group cardinalities scale like a real 10x — not 10 identical copies
landing on the same keys. Bounded dims (region/nation) copy through
unchanged. Timestamps in events shift by replica too, spreading
cohorts/windows across a wider range like real growth.

documents/embeddings scale too (round-12 verdict ask #2 — the dedup/
ANN/text candidate joins must see >fixture-sized corpora), with each
replica's token/vector space SALTED so per-replica verdict structure
is preserved instead of creating 10x cross-replica duplicates:
- documents: doc_id shifts by the stride (PARITY-PRESERVING — the
  stride is even, so the even/odd base/delta convention of d15/d20/d23
  holds per replica); replica k>0 suffixes every whitespace token with
  "qK", so shingle/minhash/gram structure within a replica is
  isomorphic to the original while replicas share no tokens; n_chars
  is recomputed from the salted text.
- embeddings: vec_id shifts; replica k>0 applies a deterministic
  per-replica SIGNED PERMUTATION of the dimensions (an exact
  orthogonal transform: within-replica dot products / cosines are
  bit-preserved, cross-replica cosines collapse to noise), so ANN
  verdict structure replicates without cross-replica near-dups. A
  plain diagonal sign pattern is NOT enough: corpus vectors carry
  dominant coordinates, and sign flips alone leave same-base
  cross-replica cosines up to ~0.8; permuting the dimensions breaks
  the coordinate alignment.
Replica 0 is byte-identical to the source at every scale.

Usage: python3 tools/make_sf1.py [OUT_DIR] [REPLICAS] [corpus-only]
       (defaults: /tmp/sf1, 10 — REPLICAS=100 builds an sf10 probe;
       "corpus-only" replicates ONLY documents/embeddings and copies
       the relational tables verbatim — the dedup/ANN-focused sfbig
       probe, where REPLICAS=1000 would otherwise drag 600M lineitem
       rows along)
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # replicas
CORPUS_ONLY = len(sys.argv) > 3 and sys.argv[3] == "corpus-only"
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
COPY = ["region", "nation"]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    if CORPUS_ONLY:
        for t in list(SHIFT) + COPY:
            con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
            print(f"{t}: copied (corpus-only)")
        replicate_corpus(con)
        return
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
    replicate_corpus(con)


def replicate_corpus(con):
    # documents: id-shifted, token-salted replicas (replica 0 verbatim)
    salted = (r"CASE WHEN r.k = 0 THEN text "
              r"ELSE regexp_replace(text, '(\S+)', '\1q' || r.k, 'g') END")
    con.sql(f"""COPY (SELECT doc_id + r.k * {STRIDE} AS doc_id,
                 {salted} AS text, lang, source,
                 length({salted}) AS n_chars
               FROM '{SRC}/documents.parquet', range({R}) r(k))
               TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()[0]
    print(f"documents: {n} rows (token-salted replicas)")
    # embeddings: id-shifted replicas under a per-replica SIGNED
    # PERMUTATION (orthogonal: within-replica cosines bit-preserved,
    # cross-replica cosines ~0 even for coordinate-concentrated vectors)
    import random
    dim = con.sql(f"SELECT array_length(embedding) "
                  f"FROM '{SRC}/embeddings.parquet' LIMIT 1").fetchone()[0]
    reps = []
    for k in range(R):
        rng = random.Random(0xCAFE + k)
        perm = list(range(1, dim + 1))
        signs = [1] * dim
        if k:
            rng.shuffle(perm)
            signs = [1 if rng.random() < 0.5 else -1 for _ in range(dim)]
        reps.append((k, perm, signs))
    con.execute("CREATE OR REPLACE TABLE rep (k BIGINT, p INT[], s INT[])")
    con.executemany("INSERT INTO rep VALUES (?, ?, ?)", reps)
    con.sql(f"""COPY (SELECT vec_id + r.k * {STRIDE} AS vec_id,
                 CASE WHEN r.k = 0 THEN embedding
                 ELSE list_transform(range(1, {dim} + 1),
                   i -> CAST(r.s[i] * embedding[r.p[i]] AS FLOAT))
                 END AS embedding, label
               FROM '{SRC}/embeddings.parquet', rep r)
               TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/embeddings.parquet'").fetchone()[0]
    print(f"embeddings: {n} rows (signed-permutation replicas)")


if __name__ == "__main__":
    main()
