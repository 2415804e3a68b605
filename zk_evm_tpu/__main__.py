"""Command-line front-end (`python -m zk_evm_tpu ...`).

Twin of the reference's zero binaries (zero/src/bin/): `leader` decodes
block witnesses and drives proving, `verifier` checks proof files.
Subcommands land as the pipeline widens; today:

  decode  <witness.json> [--batch-size N]   block trace -> trie roots,
          per-batch GenerationInputs summary (leader's decode stage)
  prove   --fixture simple-transfer|add11 | --witness w.json [-o out]
          full pipeline: witness run -> 9 tables -> AllProof JSON
  verify  <proof.zkproof>                   verify a persisted AllProof
          against the canonical kernel (cap binding + CTL sums + PV)
  bench                                     run the standard benchmark
"""

from __future__ import annotations

import argparse
import json
import sys


def cmd_decode(args):
    from .decoder import parse_block_prover_input, entrypoint
    blocks = json.load(open(args.witness))
    if isinstance(blocks, dict):
        blocks = [blocks]
    for obj in blocks:
        bpi = parse_block_prover_input(obj)
        gis = entrypoint(bpi, batch_size_hint=args.batch_size)
        out = {
            "block_number": bpi.block_metadata.block_number,
            "txns": len(bpi.txn_info),
            "batches": len(gis),
            "pre_state_root": "0x" + bpi.trie_roots_before()
                                        .state_root.hex(),
            "checkpoint_ok": bpi.trie_roots_before().state_root
            == bpi.checkpoint_state_trie_root,
            "post_state_root":
                "0x" + gis[-1].trie_roots_after.state_root.hex(),
            "transactions_root":
                "0x" + gis[-1].trie_roots_after.transactions_root.hex(),
            "receipts_root":
                "0x" + gis[-1].trie_roots_after.receipts_root.hex(),
            "gas_used": gis[-1].gas_used_after,
        }
        print(json.dumps(out))
    return 0


def cmd_prove(args):
    """Prove a block segment: witness generation (interpreter run ->
    9 tables) then the multi-table STARK proof, persisted as JSON."""
    from .witness.assembler import combined_kernel
    from .witness.interpreter import run_generation
    from .witness.traces import generate_all_tables
    from .witness.testing_fixtures import FIXTURES
    from .orchestration.block import prove_block, verify_block
    from .stark.serialization import proof_to_json

    if args.fixture:
        inputs = FIXTURES[args.fixture]()
    else:
        from .decoder import parse_block_prover_input, entrypoint
        obj = json.load(open(args.witness))
        bpi = parse_block_prover_input(obj[0] if isinstance(obj, list)
                                       else obj)
        gis = entrypoint(bpi, batch_size_hint=args.batch_size)
        if len(gis) != 1:
            print(f"prove: {len(gis)} batches; proving batch 0 only",
                  file=sys.stderr)
        inputs = gis[0]

    from .timing import TimingTree
    with TimingTree("prove block") as tree:
        with tree.scope("assemble kernel"):
            kernel = combined_kernel()
        if args.max_cpu_len_log:
            from .witness.segments import generate_segment_tables
            from .orchestration.block import verify_segments
            from .orchestration.pipeline import prove_segments_pipelined
            cycles_box = [0]

            def _tables():
                for seg, gt in generate_segment_tables(
                        kernel, inputs,
                        max_cpu_len_log=args.max_cpu_len_log):
                    cycles_box[0] += gt.traces[2].shape[1]
                    yield seg, gt

            # witness generation overlaps device proving (P7)
            proofs = prove_segments_pipelined(_tables(), prove_block)
            cycles = cycles_box[0]
            with tree.scope("verify chain (self-check)"):
                verify_segments(proofs, kernel)
            payload = json.dumps(
                [json.loads(proof_to_json(p)) for p in proofs])
        else:
            with tree.scope("simulate CPU"):
                interp = run_generation(kernel, inputs)
            with tree.scope("generate tables"):
                gt = generate_all_tables(interp)
            with tree.scope("prove"):
                proofs = [prove_block(gt)]
            with tree.scope("verify (self-check)"):
                verify_block(proofs[0], kernel)
            cycles = len(interp.trace)
            payload = proof_to_json(proofs[0])
    tree.print()
    with open(args.output, "w") as f:
        f.write(payload)
    print(json.dumps({
        "proof": args.output,
        "segments": len(proofs),
        "cycles": cycles,
        "state_root_after":
            "0x" + bytes(proofs[-1].public_values.trie_roots_after
                         .state_root).hex(),
    }))
    return 0


def cmd_verify(args):
    from .orchestration.block import verify_block, verify_segments
    from .stark.serialization import all_proof_from_json
    from .witness.assembler import combined_kernel

    raw = open(args.proof).read()
    obj = json.loads(raw)
    kernel = combined_kernel()
    try:
        if isinstance(obj, list):
            proofs = [all_proof_from_json(json.dumps(p)) for p in obj]
            verify_segments(proofs, kernel)
            n = len(proofs)
        else:
            verify_block(all_proof_from_json(raw), kernel)
            n = 1
    except AssertionError as e:
        print(f"verify: FAILED: {e}", file=sys.stderr)
        return 1
    print(json.dumps({"ok": True, "proof": args.proof, "segments": n}))
    return 0


def cmd_bench(args):
    del args
    import runpy
    import os
    sys.path.insert(0, os.getcwd())
    runpy.run_path("bench.py", run_name="__main__")
    return 0


def cmd_worker(args):
    """Worker loop: claim prove jobs from a shared-directory queue and
    execute them on this host's chip (bin/worker.rs twin)."""
    from .orchestration.queue import run_worker
    n = run_worker(args.queue, max_jobs=args.max_jobs,
                   idle_timeout=args.idle_timeout,
                   worker_name=args.name)
    print(json.dumps({"jobs_executed": n}))
    return 0


def cmd_lsp(args):
    """Kernel-asm language server over stdio (lsp-server.rs twin)."""
    del args
    from .witness.lsp import main as lsp_main
    lsp_main()
    return 0


def cmd_leader(args):
    """HTTP leader (leader.rs http-mode twin): accept jobs over HTTP,
    dispatch via the shared queue directory to workers."""
    from .orchestration.leader_http import serve
    print(f"leader serving on {args.host}:{args.port} "
          f"(queue: {args.queue})", file=sys.stderr)
    serve(args.queue, host=args.host, port=args.port)
    return 0


def cmd_trie_diff(args):
    """Structural diff of two trie-shape JSON dumps — the files written
    by witness/debug.py's error bundles (bin/trie_diff.rs twin)."""
    from .witness.debug import trie_diff
    with open(args.a) as f:
        a = json.load(f)
    with open(args.b) as f:
        b = json.load(f)
    diffs = trie_diff(a, b)
    for d in diffs:
        print(d)
    if not diffs:
        print("tries are structurally identical")
    return 1 if diffs else 0


def main(argv=None):
    from .compile_cache import enable_persistent_cache
    from . import runtime_config, metrics
    enable_persistent_cache()
    p = argparse.ArgumentParser(prog="zk_evm_tpu")
    p.add_argument("--config", default=None,
                   help="JSON config file (or ZK_CONFIG)")
    p.add_argument("--flavor", choices=("eth_mainnet", "cdk_erigon"),
                   default=None, help="chain flavor (or ZK_FLAVOR)")
    p.add_argument("--log-level", default=None,
                   choices=("error", "warn", "info", "debug"),
                   help="logging level (or ZK_LOG)")
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("decode", help="decode a block witness")
    d.add_argument("witness")
    d.add_argument("--batch-size", type=int, default=None)
    d.set_defaults(fn=cmd_decode)
    pr = sub.add_parser("prove", help="prove a block segment")
    src = pr.add_mutually_exclusive_group(required=True)
    src.add_argument("--witness", help="decoder witness JSON")
    src.add_argument("--fixture", choices=("simple-transfer", "add11"),
                     help="built-in test block")
    pr.add_argument("-o", "--output", default="block.zkproof")
    pr.add_argument("--batch-size", type=int, default=None)
    pr.add_argument("--max-cpu-len-log", type=int, default=None,
                    help="segment the proof at 2^N CPU rows "
                         "(zk-continuations)")
    pr.set_defaults(fn=cmd_prove)
    v = sub.add_parser("verify", help="verify a proof file")
    v.add_argument("proof")
    v.set_defaults(fn=cmd_verify)
    b = sub.add_parser("bench", help="run the standard benchmark")
    b.set_defaults(fn=cmd_bench)
    w = sub.add_parser("worker",
                       help="serve prove jobs from a shared queue dir")
    w.add_argument("--queue", required=True)
    w.add_argument("--max-jobs", type=int, default=None)
    w.add_argument("--idle-timeout", type=float, default=None,
                   help="exit after this many idle seconds")
    w.add_argument("--name", default=None)
    w.set_defaults(fn=cmd_worker)
    lsp = sub.add_parser("lsp", help="kernel-asm language server (stdio)")
    lsp.set_defaults(fn=cmd_lsp)
    td = sub.add_parser("trie-diff",
                        help="diff two trie-shape JSON dumps")
    td.add_argument("a")
    td.add_argument("b")
    td.set_defaults(fn=cmd_trie_diff)
    ld = sub.add_parser("leader",
                        help="HTTP leader serving jobs into a queue dir")
    ld.add_argument("--queue", required=True)
    ld.add_argument("--host", default="127.0.0.1")
    ld.add_argument("--port", type=int, default=8080)
    ld.set_defaults(fn=cmd_leader)
    args = p.parse_args(argv)
    rc = runtime_config.load(
        cli_overrides={
            "flavor": args.flavor,
            "log_level": args.log_level,
            "batch_size": getattr(args, "batch_size", None),
            "max_cpu_len_log": getattr(args, "max_cpu_len_log", None),
        },
        config_path=args.config)
    metrics.setup_logging(rc.log_level)
    # resolved config backfills unset per-command flags
    if hasattr(args, "batch_size"):
        args.batch_size = rc.batch_size
    if hasattr(args, "max_cpu_len_log"):
        args.max_cpu_len_log = rc.max_cpu_len_log
    args.runtime_config = rc
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
