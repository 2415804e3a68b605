#!/bin/bash
# ZK_SLOW evidence run (VERDICT r4 #5): the heavy tests that constitute
# the aggregation and mesh claims, scripted and recorded — the analog of
# the reference CI's slow jobs (/root/reference/.github/workflows/
# ci.yml:99-195). Writes a timestamped log + a JSON summary committed to
# the repo (ci_slow_results.json).
#
# Usage: bash scripts/ci_slow.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
LOG=ci_slow_run.log
: > "$LOG"

# Ordered fastest/highest-value first so a partial run still records
# the round's new claims (the sharded real-table proves alone are
# hour-scale on a 4-core box).
TESTS=(
  # cdk: GER block prove, kernel-POSEIDON rows prove, scenario, negatives
  tests/test_cdk_flavor.py
  # succinct block wrap: block 3 proven + wrapped + wrap-verified
  tests/test_aggregate_tape.py
  # 2-block chain e2e + block statement algebra
  tests/test_aggregation.py
  # real b1033 batch: segment chain proven + verified (test config)
  tests/test_real_block_witness.py
  # sharded real tables over the 8-device virtual mesh
  tests/test_sharded_real_tables.py
)

START=$(date -u +%Y-%m-%dT%H:%M:%SZ)
T0=$SECONDS
ZK_SLOW=1 python -m pytest "${TESTS[@]}" -q "$@" 2>&1 | tee -a "$LOG"
RC=${PIPESTATUS[0]}
WALL=$((SECONDS - T0))

SUMMARY=$(tail -n 3 "$LOG" | grep -E "passed|failed" | tail -n 1)
python - "$RC" "$WALL" "$START" "$SUMMARY" <<'EOF'
import json, sys
rc, wall, start, summary = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
json.dump({"started": start, "wall_s": wall, "exit_code": rc,
           "pytest_summary": summary.strip(),
           "suite": "ZK_SLOW (sharded real tables, b1033 chain, "
                    "2-block e2e, cdk)"},
          open("ci_slow_results.json", "w"), indent=1)
print(open("ci_slow_results.json").read())
EOF
exit $RC
