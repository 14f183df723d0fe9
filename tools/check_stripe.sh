#!/usr/bin/env bash
# One-stripe XXH64 replay gate (round-13 ADVICE): the DuckDB MinHash
# oracle carries a dedicated path for 32..63-byte shingles (XXH64's
# one-stripe slice), but no committed fixture produces them — sf0.01
# shingles stay under 32 bytes, so a regression in that SQL would pass
# the default gate and only surface on a multi-hour sf10 run.
#
# This script synthesizes a corpus whose EVERY 3-gram shingle lands in
# 32..63 bytes (lengths swept across the slice), dumps the two staged-
# replay keys (d02, d14) with graft.Verify, and judges them against
# the DuckDB oracle with tools/check.py — the same engines, same
# compare, in ~2 minutes.
#
# Usage: tools/check_stripe.sh            # fresh temp fixture
#        SPARK_GRAFT_CPUS=8 tools/check_stripe.sh
set -euo pipefail
cd "$(dirname "$0")/.."

DIR=$(mktemp -d /tmp/stripe_fixture.XXXXXX)
OUT=$(mktemp -d /tmp/stripe_verify.XXXXXX)
trap 'rm -rf "$DIR" "$OUT"' EXIT

# the non-document tables only need to EXIST for check.py's views
cp /root/testdata/sf0.001/*.parquet "$DIR/"

python3 - "$DIR" <<'EOF'
import sys
import duckdb
out = sys.argv[1]
con = duckdb.connect()
# 400 docs x 3 long tokens -> exactly one shingle per doc, 37..51
# bytes (length swept via i%9 padding), every one on the one-stripe
# path; i//3 families make real exact-dup candidate pairs so the
# banding + est_jaccard chain is exercised, not just the hash; the
# %50==0 rows double as d14's benchmark split.
con.sql(f"""
COPY (
  SELECT i AS doc_id,
         'stripetok' || (i // 3) || repeat('a', 1 + (i // 3) % 9)
           || ' midsharetok' || (i // 3)
           || ' tailtoken' || (i // 3) || 'zz' AS text,
         'en' AS lang, 'web' AS source,
         CAST(0 AS INT) AS n_chars
  FROM range(400) t(i)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
lens = con.sql(f"""
  SELECT min(strlen(text)), max(strlen(text))
  FROM '{out}/documents.parquet'""").fetchone()
assert 32 <= lens[0] and lens[1] <= 63, f"fixture out of slice: {lens}"
print(f"[stripe] fixture shingle lengths {lens[0]}..{lens[1]} bytes (one-stripe slice)")
EOF

KEYS="d02_dedup_minhash,d14_fuzzy_decontaminate"
echo "[stripe] verify $KEYS"
SPARK_GRAFT_ONLY="$KEYS" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $DIR $OUT" >/dev/null
echo "[stripe] oracle compare"
CHECK_ONLY="$KEYS" python3 tools/check.py "$DIR" "$OUT"
echo "[stripe] OK — the 32..63-byte XXH64 replay path matches Spark"
