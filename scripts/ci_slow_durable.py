#!/usr/bin/env python3
"""Durable ZK_SLOW evidence runner (VERDICT r4 #5).

Runs the heavy suite ONE pytest invocation per step, appending a result
record to ci_slow_results.json after EACH step — so a partial run (the
box can reboot mid-suite; it did on 2026-08-21) still records every
completed claim. Analog of the reference CI's slow jobs
(/root/reference/.github/workflows/ci.yml:99-195), restructured for
durability instead of one monolithic pytest process.

Order: fastest / highest-value first. The cdk file already has a
committed complete run this round (ci_slow_run.log @ a9f5e49), so it
runs last here.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "ci_slow_run.log")
OUT = os.path.join(REPO, "ci_slow_results.json")

STEPS = [
    # (name, paths/ids, needs ZK_SLOW)
    ("agg+tape fast tests",
     ["tests/test_aggregation.py", "tests/test_aggregate_tape.py"], False),
    ("prove block 3 e2e",
     ["tests/test_aggregation.py::test_prove_block_3_end_to_end"], True),
    ("wrap real segment chain",
     ["tests/test_aggregate_tape.py::test_wrap_real_segment_chain"], True),
    ("two-block chain e2e",
     ["tests/test_aggregation.py::test_two_blocks_chain_end_to_end"], True),
    ("block 3 succinct wrap e2e",
     ["tests/test_aggregate_tape.py::test_block3_succinct_wrap_end_to_end"],
     True),
    ("b1033 real-block witness chain",
     ["tests/test_real_block_witness.py"], True),
    ("sharded real tables (8-dev mesh)",
     ["tests/test_sharded_real_tables.py"], True),
    ("cdk flavor (rerun; first run @ a9f5e49)",
     ["tests/test_cdk_flavor.py"], True),
]


def record(entry):
    results = []
    if os.path.exists(OUT):
        try:
            results = json.load(open(OUT))
            if not isinstance(results, list):
                results = [results]
        except Exception:
            results = []
    results.append(entry)
    tmp = OUT + ".tmp"
    json.dump(results, open(tmp, "w"), indent=1)
    os.replace(tmp, OUT)


def main():
    start_at = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    for i, (name, ids, slow) in enumerate(STEPS):
        if i < start_at:
            continue
        env = dict(os.environ)
        if slow:
            env["ZK_SLOW"] = "1"
        # Steps run sequentially in child processes, so they can safely
        # SHARE one persistent XLA cache (conftest honors a preset
        # ZK_EVM_TPU_CACHE via setdefault; its per-run tmpdir isolation
        # exists for CONCURRENT pytest sessions) — later steps reuse the
        # earlier steps' compiles instead of cold-compiling everything.
        env.setdefault("ZK_EVM_TPU_CACHE",
                       os.path.expanduser("~/.cache/zk_evm_tpu/ci_slow"))
        t0 = time.time()
        started = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(LOG, "a") as lf:
            lf.write(f"\n=== [{started}] step {i}: {name} ===\n")
            lf.flush()
            rc = subprocess.call(
                [sys.executable, "-u", "-m", "pytest", "-q",
                 "-p", "no:cacheprovider", *ids],
                cwd=REPO, env=env, stdout=lf, stderr=subprocess.STDOUT)
        record({"step": i, "name": name, "started": started,
                "wall_s": round(time.time() - t0, 1), "exit_code": rc})
        print(f"step {i} ({name}): rc={rc} "
              f"{round(time.time() - t0, 1)}s", flush=True)


if __name__ == "__main__":
    main()
