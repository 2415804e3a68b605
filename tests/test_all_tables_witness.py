"""All-table witness integration: the simple-transfer block's witness
generates all 9 table traces, every table's AIR holds on every row, and
all 10 CTL multisets balance exactly (with the verifier-side memory
extra looking values recomputed from public values alone).

Mirrors the trace side of the reference's
evm_arithmetization/tests/simple_transfer.rs:33-182 combined with
verifier.rs:319-512 (get_memory_extra_looking_sum)."""

import pytest

from zk_evm_tpu.witness.assembler import combined_kernel
from zk_evm_tpu.witness.interpreter import run_generation
from zk_evm_tpu.witness.traces import generate_all_tables
from zk_evm_tpu.tables.all_stark import (all_cross_table_lookups,
                                         MEMORY_CTL_IDX, Table)
from zk_evm_tpu.stark.debug import check_ctl_balance, check_constraints_np
from zk_evm_tpu.stark.public_values import memory_extra_looking_values
from zk_evm_tpu.native import keccak256

from test_witness_gen import build_simple_transfer_inputs


@pytest.fixture(scope="module")
def generated():
    kernel = combined_kernel()
    interp = run_generation(kernel, build_simple_transfer_inputs(),
                            max_cycles=2_000_000)
    assert interp.final_registers is not None
    return kernel, interp, generate_all_tables(interp)


def test_all_airs_hold(generated):
    _, _, gt = generated
    for i, (trace, stark) in enumerate(zip(gt.traces, gt.starks)):
        if trace is None:
            assert not gt.table_in_use[i]
            continue
        check_constraints_np(stark, trace)


def test_all_ctls_balance(generated):
    kernel, _, gt = generated
    kernel_hash = int.from_bytes(keccak256(bytes(kernel.code)), "big")
    extra = memory_extra_looking_values(gt.public_values, kernel_hash,
                                        len(kernel.code))
    check_ctl_balance(all_cross_table_lookups(), gt.traces,
                      {MEMORY_CTL_IDX: extra})


def test_mandatory_tables_present(generated):
    _, _, gt = generated
    for t in (Table.Arithmetic, Table.Cpu, Table.Keccak,
              Table.KeccakSponge, Table.Logic, Table.Memory,
              Table.MemBefore):
        assert gt.table_in_use[t] and gt.traces[t] is not None
