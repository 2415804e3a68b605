"""Witness-generation profiler: b19807080 batch 0 (the mainnet CI block).

Measures the three phases the round-4/5 targets name (VERDICT #6):
  pre-run     — segment-iterator interpreter pass, no recording
  recording   — tracing pass (native zvm + trace export)
  table build — generate_all_tables (vectorized numpy builders)

Usage: python scripts/prof_witness.py [witness] [batch]
"""
import json
import sys
import time

sys.path.insert(0, ".")

WITNESS = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/artifacts/witness_b19807080.json"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 0


def main():
    from zk_evm_tpu import tune_allocator
    tune_allocator()
    from zk_evm_tpu.decoder import parse_block_prover_input, entrypoint
    from zk_evm_tpu.witness.assembler import combined_kernel
    from zk_evm_tpu.witness.interpreter import run_generation
    from zk_evm_tpu.witness.traces import generate_all_tables

    t0 = time.time()
    blocks = json.load(open(WITNESS))
    bpi = parse_block_prover_input(blocks[0] if isinstance(blocks, list)
                                   else blocks)
    gi = entrypoint(bpi, batch_size_hint=100)[BATCH]
    kernel = combined_kernel()
    t_setup = time.time() - t0

    # pre-run (no recording): the segment-iterator pass
    from zk_evm_tpu.witness.interpreter import Interpreter
    t0 = time.time()
    interp = Interpreter(kernel, kernel.global_labels["init"],
                         max_cycles=80_000_000)
    interp.record_trace = False
    interp.initialize_from_inputs(gi)
    from zk_evm_tpu.witness.segments import initial_registers
    interp.run_segment(initial_registers(kernel))
    t_pre = time.time() - t0
    cycles = interp.clock

    # recording run
    t0 = time.time()
    interp = run_generation(kernel, gi, max_cycles=80_000_000)
    t_rec = time.time() - t0

    # table build
    t0 = time.time()
    gt = generate_all_tables(interp)
    t_tab = time.time() - t0
    rows = {i: (0 if t is None else t.shape[-1])
            for i, t in enumerate(gt.traces)}

    print(json.dumps({
        "witness": WITNESS.rsplit("/", 1)[-1], "batch": BATCH,
        "cycles": cycles,
        "setup_s": round(t_setup, 2),
        "prerun_s": round(t_pre, 2),
        "prerun_kcyc_s": round(cycles / t_pre / 1e3, 1),
        "recording_s": round(t_rec, 2),
        "recording_kcyc_s": round(cycles / t_rec / 1e3, 1),
        "table_build_s": round(t_tab, 2),
        "total_witness_s": round(t_pre + t_rec + t_tab, 2),
        "table_rows": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
