#!/usr/bin/env bash
# 8-way sharded oracle compare with per-shard logs that SURVIVE the
# session (round-13 lesson: the single-process 2.6 h sf10 check lost
# its failing-key names to an output tail). Shards are assigned
# round-robin over the key list from oracle_sql.json ∪ output dirs,
# so the heavy staged-replay oracles spread across processes.
#
# Each shard's DuckDB is capped (CHECK_THREADS / CHECK_MEM, both
# overridable via env): 8 uncapped shards at the 500k-doc corpus each
# grabbed all 32 threads and one staged-replay oracle hit 22 GB RSS →
# OOM kill. Defaults: threads = nproc/N, memory = 80% of MemAvailable
# split across shards.
#
# Shard failures are NOT swallowed (round-13 ADVICE): every shard PID
# is waited individually, a shard that dies without printing its
# PASS= summary line (the OOM-kill signature) fails the run, and the
# summed PASS+ROWS_ONLY+FAIL is reconciled against the key count so a
# partial run can never print a green-looking total.
#
# Usage: tools/check_sharded.sh <sfDir> <verifyOutDir> <logDir> [nShards=8]
set -euo pipefail
SF="$1"; OUT="$2"; LOGS="$3"; N="${4:-8}"
mkdir -p "$LOGS"
KEYS=$(python3 - "$OUT" <<'EOF'
import json, os, sys
out = sys.argv[1]
with open(os.path.join(out, "oracle_sql.json")) as f:
    oracle = set(json.load(f))
dirs = {d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))}
print("\n".join(sorted(oracle | dirs)))
EOF
)
mapfile -t ALL <<< "$KEYS"

NPROC=$(nproc)
: "${CHECK_THREADS:=$(( NPROC / N > 0 ? NPROC / N : 1 ))}"
AVAIL_MB=$(awk '/MemAvailable/{print int($2 / 1024)}' /proc/meminfo)
: "${CHECK_MEM:=$(( AVAIL_MB * 8 / 10 / N ))MB}"
export CHECK_THREADS CHECK_MEM
echo "[check_sharded] ${#ALL[@]} keys, $N shards, CHECK_THREADS=$CHECK_THREADS CHECK_MEM=$CHECK_MEM"

declare -a PIDS
for ((s = 0; s < N; s++)); do
  SHARD=""
  for ((i = s; i < ${#ALL[@]}; i += N)); do SHARD+="${ALL[$i]},"; done
  CHECK_ONLY="${SHARD%,}" python3 tools/check.py "$SF" "$OUT" \
    > "$LOGS/shard_$s.log" 2>&1 &
  PIDS[$s]=$!
done
DEAD=0
for ((s = 0; s < N; s++)); do
  rc=0; wait "${PIDS[$s]}" || rc=$?
  # rc=1 with a PASS= line is check.py's normal FAIL>0 exit — the
  # totals below carry it; anything without a summary line is a crash.
  if ! grep -q '^PASS=' "$LOGS/shard_$s.log"; then
    echo "✗ shard $s DIED (exit $rc) without a PASS= summary — partial run" >&2
    DEAD=1
  fi
done
grep -h '✗' "$LOGS"/shard_*.log || true
awk -F'[= ]' '/^PASS=/{p+=$2; r+=$4; f+=$6} END{printf "TOTAL PASS=%d ROWS_ONLY=%d FAIL=%d\n", p, r, f}' "$LOGS"/shard_*.log
COUNTED=$(awk -F'[= ]' '/^PASS=/{t+=$2+$4+$6} END{print t+0}' "$LOGS"/shard_*.log)
# >= : a zero-row rows-only key counts in BOTH ROWS_ONLY and FAIL
if (( DEAD != 0 || COUNTED < ${#ALL[@]} )); then
  echo "✗ RECONCILE FAIL: counted $COUNTED outcomes for ${#ALL[@]} keys (dead=$DEAD)" >&2
  exit 1
fi
