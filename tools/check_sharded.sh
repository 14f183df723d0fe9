#!/usr/bin/env bash
# 8-way sharded oracle compare with per-shard logs that SURVIVE the
# session (round-13 lesson: the single-process 2.6 h sf10 check lost
# its failing-key names to an output tail). Shards are assigned
# round-robin over the key list from oracle_sql.json ∪ output dirs,
# so the heavy staged-replay oracles spread across processes.
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
for ((s = 0; s < N; s++)); do
  SHARD=""
  for ((i = s; i < ${#ALL[@]}; i += N)); do SHARD+="${ALL[$i]},"; done
  CHECK_ONLY="${SHARD%,}" python3 tools/check.py "$SF" "$OUT" \
    > "$LOGS/shard_$s.log" 2>&1 &
done
wait
grep -h '✗' "$LOGS"/shard_*.log || true
awk -F'[= ]' '/^PASS=/{p+=$2; r+=$4; f+=$6} END{printf "TOTAL PASS=%d ROWS_ONLY=%d FAIL=%d\n", p, r, f}' "$LOGS"/shard_*.log
