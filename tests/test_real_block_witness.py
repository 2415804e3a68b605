"""Real-block witness generation: jerigon blocks from the reference's
shipped artifacts run through decoder -> kernel -> 9 tables, with every
AIR and CTL checked.

This is the L3 -> L1' integration the reference exercises via its
`zero` pipeline on the same witness files (artifacts/witness_b3_b6.json,
6 jerigon blocks with real txns, contract execution, jumpdest analysis
and beacon-root system calls)."""

import json
import os

import pytest

from zk_evm_tpu.witness.assembler import combined_kernel
from zk_evm_tpu.witness.interpreter import run_generation
from zk_evm_tpu.witness.traces import generate_all_tables
from zk_evm_tpu.stark.debug import check_constraints_np, check_ctl_balance
from zk_evm_tpu.tables.all_stark import (all_cross_table_lookups,
                                         MEMORY_CTL_IDX)
from zk_evm_tpu.stark.public_values import memory_extra_looking_values
from zk_evm_tpu.native import keccak256

WITNESSES = "/root/reference/artifacts/witness_b3_b6.json"

pytestmark = pytest.mark.skipif(not os.path.exists(WITNESSES),
                                reason="reference artifacts not mounted")


@pytest.fixture(scope="module")
def kernel():
    return combined_kernel()


def _batch_inputs(block_idx: int, batch: int):
    from zk_evm_tpu.decoder import parse_block_prover_input, entrypoint
    blocks = json.load(open(WITNESSES))
    bpi = parse_block_prover_input(blocks[block_idx])
    return entrypoint(bpi, batch_size_hint=100)[batch]


def test_all_blocks_halt(kernel):
    """Every batch of blocks 3-6 executes init -> halt in the kernel."""
    from zk_evm_tpu.decoder import parse_block_prover_input, entrypoint
    blocks = json.load(open(WITNESSES))
    halt = kernel.global_labels["halt"]
    for obj in blocks:
        bpi = parse_block_prover_input(obj)
        for gi in entrypoint(bpi, batch_size_hint=100):
            interp = run_generation(kernel, gi, max_cycles=5_000_000)
            assert interp.final_registers.program_counter == halt, \
                f"block {bpi.block_metadata.block_number} did not halt"


def test_block4_tables_sound(kernel):
    """Block 4 (real signed txn): all AIRs hold, all CTLs balance."""
    interp = run_generation(kernel, _batch_inputs(1, 0),
                            max_cycles=5_000_000)
    gt = generate_all_tables(interp)
    for trace, stark in zip(gt.traces, gt.starks):
        if trace is not None:
            check_constraints_np(stark, trace)
    kh = int.from_bytes(keccak256(bytes(kernel.code)), "big")
    extra = memory_extra_looking_values(gt.public_values, kh,
                                        len(kernel.code))
    check_ctl_balance(all_cross_table_lookups(), gt.traces,
                      {MEMORY_CTL_IDX: extra})


@pytest.mark.skipif("ZK_SLOW" not in os.environ,
                    reason="multi-minute CI-scale blocks; set ZK_SLOW=1")
@pytest.mark.parametrize("artifact,max_cycles", [
    ("witness_b1033.json", 50_000_000),
    ("witness_b19807080.json", 80_000_000),
])
def test_ci_scale_blocks_generate_tables(kernel, artifact, max_cycles):
    """The reference CI's proof workloads (block 1033 with 118 txns; the
    mainnet block 19807080) run decoder -> kernel -> all 9 tables, with
    the vectorized all-rows constraint check on every table."""
    from zk_evm_tpu.decoder import parse_block_prover_input, entrypoint
    path = os.path.join(os.path.dirname(WITNESSES), artifact)
    if not os.path.exists(path):
        pytest.skip(f"{artifact} not mounted")
    blocks = json.load(open(path))
    halt = kernel.global_labels["halt"]
    for obj in blocks:
        bpi = parse_block_prover_input(obj)
        for gi in entrypoint(bpi, batch_size_hint=100):
            interp = run_generation(kernel, gi, max_cycles=max_cycles)
            assert interp.final_registers.program_counter == halt
            gt = generate_all_tables(interp)
            for trace, stark in zip(gt.traces, gt.starks):
                if trace is not None:
                    check_constraints_np(stark, trace)


@pytest.mark.skipif("ZK_SLOW" not in os.environ,
                    reason="proves a real mainnet-shaped batch; ZK_SLOW=1")
def test_prove_b1033_batch_segment_chain():
    """PROVE (not just constraint-check) one real b1033 batch: a full
    zk-continuation segment chain at test config, verified through the
    block verifier (kernel-cap binding + extra looking sums + register
    and MemAfter/MemBefore chaining) — the proving half of the reference
    CI's witness_b1033 job (.github/workflows/ci.yml:166-195)."""
    from zk_evm_tpu.decoder import parse_block_prover_input, entrypoint
    from zk_evm_tpu.witness.assembler import combined_kernel
    from zk_evm_tpu.witness.segments import generate_segment_tables
    from zk_evm_tpu.orchestration.block import prove_block, verify_segments
    from zk_evm_tpu.stark.config import StarkConfig

    path = os.path.join(os.path.dirname(WITNESSES), "witness_b1033.json")
    if not os.path.exists(path):
        pytest.skip("witness_b1033.json not mounted")
    blocks = json.load(open(path))
    bpi = parse_block_prover_input(blocks[0] if isinstance(blocks, list)
                                   else blocks)
    gi = entrypoint(bpi, batch_size_hint=2)[0]   # 2 real txns
    kernel = combined_kernel()
    cfg = StarkConfig.test_config()
    proofs = [prove_block(gt, cfg)
              for _seg, gt in generate_segment_tables(
                  kernel, gi, max_cpu_len_log=17)]
    assert len(proofs) >= 1
    verify_segments(proofs, kernel, cfg)


@pytest.mark.skipif("ZK_SLOW" not in os.environ,
                    reason="full prove of a real-block segment; ZK_SLOW=1")
def test_b1033_segment_proves_and_verifies(kernel):
    """PROVE (not just constraint-check) a real witness_b1033 segment:
    the proving half of the reference CI's b1033 job
    (.github/workflows/ci.yml:166-195) at the weak-FRI test config the
    reference's own CI uses (testing_utils.rs TEST_STARK_CONFIG)."""
    from zk_evm_tpu.decoder import parse_block_prover_input, entrypoint
    from zk_evm_tpu.witness.segments import generate_segment_tables
    from zk_evm_tpu.orchestration.block import prove_block, verify_segments
    from zk_evm_tpu.stark import StarkConfig, FriConfig

    path = os.path.join(os.path.dirname(WITNESSES), "witness_b1033.json")
    if not os.path.exists(path):
        pytest.skip("witness_b1033.json not mounted")
    blocks = json.load(open(path))
    bpi = parse_block_prover_input(blocks[0])
    gi = entrypoint(bpi, batch_size_hint=2)[0]
    cfg = StarkConfig(
        security_bits=1,
        fri_config=FriConfig(rate_bits=1, cap_height=4,
                             proof_of_work_bits=0, num_query_rounds=1,
                             arity_bits=4, final_poly_bits=5))
    proofs = []
    for _seg, gt in generate_segment_tables(kernel, gi,
                                            max_cpu_len_log=14):
        proofs.append(prove_block(gt, cfg))
    assert proofs
    verify_segments(proofs, kernel, cfg)
