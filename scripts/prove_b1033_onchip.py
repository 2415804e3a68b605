"""Prove a real witness_b1033 batch ON THE TPU at the production config.

The proving half of the reference CI's witness_b1033 job
(/root/reference/.github/workflows/ci.yml:166-195), run where it counts:
decoder -> kernel execution -> zk-continuation segment tables -> full
9-table AllStark proofs at StarkConfig::standard_fast_config (84 FRI
query rounds, 16-bit PoW, rate 1/2) on the chip, then the block
verifier (kernel-cap binding + extra looking sums + register and
MemAfter/MemBefore chaining).

Usage: python scripts/prove_b1033_onchip.py [batch_size_hint] [max_cpu_len_log]
Writes b1033_batch0.zkproof + a JSON result line.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

WITNESS = "/root/reference/artifacts/witness_b1033.json"


def main():
    hint = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mcl = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    from zk_evm_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    print(f"backend={jax.default_backend()} hint={hint} "
          f"max_cpu_len_log={mcl}", flush=True)

    from zk_evm_tpu.decoder import parse_block_prover_input, entrypoint
    from zk_evm_tpu.witness.assembler import combined_kernel
    from zk_evm_tpu.witness.segments import generate_segment_tables
    from zk_evm_tpu.orchestration.block import prove_block, verify_segments
    from zk_evm_tpu.stark.config import StarkConfig
    from zk_evm_tpu.stark.serialization import proof_to_json
    from zk_evm_tpu.timing import TimingTree

    t_all = time.time()
    blocks = json.load(open(WITNESS))
    bpi = parse_block_prover_input(blocks[0] if isinstance(blocks, list)
                                   else blocks)
    gi = entrypoint(bpi, batch_size_hint=hint)[0]
    cfg = StarkConfig.standard_fast_config()
    print(f"config: {cfg}", flush=True)

    with TimingTree("prove b1033 batch0 (production, on-chip)") as tree:
        with tree.scope("assemble kernel"):
            kernel = combined_kernel()
        proofs = []
        with tree.scope("witness + prove segments"):
            for si, (_seg, gt) in enumerate(generate_segment_tables(
                    kernel, gi, max_cpu_len_log=mcl)):
                rows = [0 if t is None else t.shape[-1] if t.ndim > 1 else t.shape[0]
                        for t in gt.traces]
                print(f"segment {si}: table rows {rows}", flush=True)
                with tree.scope(f"prove segment {si}"):
                    t0 = time.time()
                    proofs.append(prove_block(gt, cfg))
                    print(f"segment {si} proved in "
                          f"{time.time()-t0:.1f}s", flush=True)
        with tree.scope("verify chain"):
            verify_segments(proofs, kernel, cfg)
    tree.print()

    out = "b1033_batch0.zkproof"
    with open(out, "w") as f:
        f.write(json.dumps([json.loads(proof_to_json(p))
                            for p in proofs]))
    wall = time.time() - t_all
    print(json.dumps({
        "artifact": "witness_b1033.json", "batch": 0,
        "txns_hint": hint, "segments": len(proofs),
        "config": "standard_fast (84 queries, 16-bit PoW)",
        "platform": jax.default_backend(),
        "wall_s": round(wall, 1),
        "proof": out, "proof_bytes": os.path.getsize(out),
        "verified": True,
    }), flush=True)


if __name__ == "__main__":
    main()
