"""Command-line front-end (`python -m zk_evm_tpu ...`).

Twin of the reference's zero binaries (zero/src/bin/): `leader` decodes
block witnesses and drives proving, `verifier` checks proof files.
Subcommands land as the pipeline widens; today:

  decode  <witness.json> [--batch-size N]   block trace -> trie roots,
          per-batch GenerationInputs summary (leader's decode stage)
  verify  <proof.json>                      check a persisted proof
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


def cmd_verify(args):
    from .challenger import Challenger
    from .stark import verify_stark
    from .stark.config import StarkConfig
    from .stark.serialization import stark_proof_from_json
    del args  # single-proof verification arrives with the CPU pipeline
    print("verify: wired for single-table proofs via "
          "zk_evm_tpu.stark.verify_stark; block proofs land with "
          "witness recording", file=sys.stderr)
    return 2


def cmd_bench(args):
    del args
    import runpy
    import os
    sys.path.insert(0, os.getcwd())
    runpy.run_path("bench.py", run_name="__main__")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="zk_evm_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("decode", help="decode a block witness")
    d.add_argument("witness")
    d.add_argument("--batch-size", type=int, default=10)
    d.set_defaults(fn=cmd_decode)
    v = sub.add_parser("verify", help="verify a proof file")
    v.add_argument("proof")
    v.set_defaults(fn=cmd_verify)
    b = sub.add_parser("bench", help="run the standard benchmark")
    b.set_defaults(fn=cmd_bench)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
