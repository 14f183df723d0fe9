#!/usr/bin/env bash
# Pre-commit snapshot gate: a commit may not land unless the tree
# compiles (main + test) and the oracle gate passes on the keys it
# touches. Round 9's end-of-round snapshot shipped 84 lines that did
# not compile and zeroed every driver artifact for the round; this
# script makes that class of failure mechanical to prevent.
#
# Usage:
#   tools/gate.sh                 # full gate: compile + all registered keys
#   tools/gate.sh d18 q37         # compile + only the named keys
#   SKIP_SBT_TEST=0 tools/gate.sh # additionally run the ScalaTest suite
#
# Exit 0 = safe to commit. Anything else = do not commit.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
OUT_DIR="$(mktemp -d /tmp/gate_verify.XXXXXX)"
trap 'rm -rf "$OUT_DIR"' EXIT

echo "[gate] 1/3 compile (main + test)"
sbt -batch "Test/compile" >/dev/null

if [[ "${SKIP_SBT_TEST:-1}" == "0" ]]; then
  echo "[gate] 1.5/3 full ScalaTest suite"
  sbt -batch test >/dev/null
fi

if [[ $# -gt 0 ]]; then
  KEYS="$(IFS=,; echo "$*")"
  echo "[gate] 2/3 verify keys: $KEYS at $SF_DIR"
  SPARK_GRAFT_ONLY="$KEYS" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" >/dev/null
  echo "[gate] 3/3 oracle compare (named keys must pass; others report FAIL-by-absence, ignored)"
  # check.py exits non-zero whenever FAIL>0, which filtered mode
  # produces by construction — judge per-key below instead.
  python3 tools/check.py "$SF_DIR" "$OUT_DIR" > /tmp/gate_check.log || true
  tail -3 /tmp/gate_check.log
  for k in "$@"; do
    grep -qE "(✓|~) $k[ :]" /tmp/gate_check.log || {
      echo "[gate] FAIL: key $k did not pass the oracle gate"; exit 1; }
  done
else
  echo "[gate] 2/3 verify FULL surface at $SF_DIR"
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" >/dev/null
  echo "[gate] 3/3 oracle compare (FAIL must be 0)"
  python3 tools/check.py "$SF_DIR" "$OUT_DIR" > /tmp/gate_check.log || true
  tail -3 /tmp/gate_check.log
  grep -qE 'FAIL=0$' /tmp/gate_check.log || {
    echo "[gate] FAIL: oracle gate reported failures"; exit 1; }
fi

# Registration audit (round-11 verdict ask #7): every key the tree
# registers must already appear in the round's own audit artifacts —
# SURVEY.md §2, PLANS.md, and the committed BENCH_FULL.json — so a
# snapshot commit can never land a query the docs and bench don't
# cover. Verify writes one <key>.parquet dir per registered (or
# filtered) key, which makes the registry listable without sbt.
echo "[gate] 4/5 registration audit vs SURVEY.md / PLANS.md / BENCH_FULL.json"
MISS=0
for k in $(ls "$OUT_DIR" | sed 's/\.parquet$//' | grep -v '^oracle_sql'); do
  for f in SURVEY.md PLANS.md BENCH_FULL.json; do
    # anchored: the key as a whole token, not a substring of another
    # key's prose or an unrelated JSON value
    grep -qE "(^|[^a-z0-9_])$k([^a-z0-9_]|$)" "$f" || {
      echo "[gate] UNAUDITED: $k missing from $f"; MISS=1; }
  done
done
if [[ "$MISS" != 0 ]]; then
  echo "[gate] FAIL: unaudited registrations (add the key to the named artifacts first)"
  exit 1
fi

# Job-level bench coverage (round-13 verdict ask #5): the committed
# record must carry CurateCorpus/CurateDelta timings so job
# regressions are machine-detected, not PLANS prose.
python3 - <<'EOF' || { echo "[gate] FAIL: BENCH_FULL.json lacks the jobs section"; exit 1; }
import json
jobs = json.load(open("BENCH_FULL.json")).get("jobs", {})
need = {"job_curate_corpus", "job_delta_index", "job_curate_delta"}
missing = need - set(jobs)
if missing:
    raise SystemExit(f"missing job timings: {sorted(missing)}")
EOF

echo "[gate] 5/5 PLANS.md bench quotes vs the committed BENCH_FULL.json"
python3 tools/check_plans_bench.py || {
  echo "[gate] FAIL: PLANS.md quotes a bench number the committed record does not contain"
  exit 1
}
# probe-coverage reminder (warn-only): the current-round PLANS section
# should record a full-surface sf>=1 probe
if ! sed '/^# Archived/q' PLANS.md | grep -qiE 'sf(1|10).*(PASS=|FAIL=0)|probe.*green'; then
  echo "[gate] WARN: no sf>=1 probe note found in PLANS.md's current-round section"
fi

echo "[gate] OK — safe to commit"
