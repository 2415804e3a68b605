"""AllStark registry: the 9 EVM tables and their cross-table lookups.

Functional twin of the reference's all_stark.rs (Table enum :74-107,
all_cross_table_lookups :153-172, eth_mainnet feature set). CPU-side
looking views are registered from cpu_ctls() once the CPU table lands
(round 2); until then those views contribute zero sums for absent CPU
traces and the verifier's extra_looking_sums hook covers scenarios that
dispatch work without a CPU trace (verifier.rs:319's mechanism).
"""

from __future__ import annotations

from ..stark import CrossTableLookup, CtlView

from . import (arithmetic, byte_packing, keccak, keccak_sponge, logic,
               memory, memory_continuation)
from .arithmetic import ArithmeticStark
from .byte_packing import BytePackingStark
from .keccak import KeccakStark
from .keccak_sponge import KeccakSpongeStark
from .logic import LogicStark
from .memory import MemoryStark
from .memory_continuation import MemoryContinuationStark


class Table:
    """Table indices, in the reference's order (all_stark.rs:74-107)."""
    Arithmetic = 0
    BytePacking = 1
    Cpu = 2
    Keccak = 3
    KeccakSponge = 4
    Logic = 5
    Memory = 6
    MemBefore = 7
    MemAfter = 8


NUM_TABLES = 9

# Optional tables that may be skipped when their trace is empty
# (all_stark.rs:110-126)
OPTIONAL_TABLES = (Table.BytePacking, Table.Keccak, Table.KeccakSponge,
                   Table.Logic, Table.MemAfter)

MEMORY_CTL_IDX = 6


def all_starks():
    """Stark instances in Table order (Cpu pending: placeholder None)."""
    return [
        ArithmeticStark(),
        BytePackingStark(),
        None,                        # CpuStark (round 2)
        KeccakStark(),
        KeccakSpongeStark(),
        LogicStark(),
        MemoryStark(),
        MemoryContinuationStark(),
        MemoryContinuationStark(),
    ]


def all_cross_table_lookups() -> list[CrossTableLookup]:
    """The 10 eth_mainnet CTLs (all_stark.rs:153-172). CPU looking views
    are appended by register_cpu_views once the CPU table exists."""
    return [
        # ctl_arithmetic: CPU -> Arithmetic (looking views pending CPU)
        CrossTableLookup(
            name="arithmetic",
            looking=(),
            looked=CtlView(
                table=Table.Arithmetic,
                columns=_arithmetic_looked_columns(),
                filter=_arithmetic_looked_filter())),
        # ctl_byte_packing: CPU (4 views, pending) -> BytePacking
        CrossTableLookup(
            name="byte_packing",
            looking=(),
            looked=CtlView(table=Table.BytePacking,
                           columns=byte_packing.ctl_looked_data(),
                           filter=byte_packing.ctl_looked_filter())),
        # ctl_keccak_sponge: CPU (pending) -> KeccakSponge
        CrossTableLookup(
            name="keccak_sponge",
            looking=(),
            looked=CtlView(table=Table.KeccakSponge,
                           columns=keccak_sponge.ctl_looked_data(),
                           filter=keccak_sponge.ctl_looked_filter())),
        # ctl_keccak_inputs: KeccakSponge -> Keccak
        CrossTableLookup(
            name="keccak_inputs",
            looking=(CtlView(
                table=Table.KeccakSponge,
                columns=keccak_sponge.ctl_looking_keccak_inputs(),
                filter=keccak_sponge.ctl_looking_keccak_filter()),),
            looked=CtlView(table=Table.Keccak,
                           columns=keccak.ctl_data_inputs(),
                           filter=keccak.ctl_filter_inputs())),
        # ctl_keccak_outputs: KeccakSponge -> Keccak
        CrossTableLookup(
            name="keccak_outputs",
            looking=(CtlView(
                table=Table.KeccakSponge,
                columns=keccak_sponge.ctl_looking_keccak_outputs(),
                filter=keccak_sponge.ctl_looking_keccak_filter()),),
            looked=CtlView(table=Table.Keccak,
                           columns=keccak.ctl_data_outputs(),
                           filter=keccak.ctl_filter_outputs())),
        # ctl_logic: CPU (pending) + 5 KeccakSponge views -> Logic
        CrossTableLookup(
            name="logic",
            looking=tuple(
                CtlView(table=Table.KeccakSponge,
                        columns=keccak_sponge.ctl_looking_logic(i),
                        filter=keccak_sponge.ctl_looking_logic_filter())
                for i in range(keccak_sponge.NUM_LOGIC_CTLS)),
            looked=CtlView(table=Table.Logic, columns=logic.ctl_data(),
                           filter=logic.ctl_filter())),
        # ctl_memory (index 6): CPU views (pending) + 136 sponge readers
        # + 32 byte_packing ops + MemBefore rows -> Memory
        CrossTableLookup(
            name="memory",
            looking=tuple(
                CtlView(table=Table.KeccakSponge,
                        columns=keccak_sponge.ctl_looking_memory(i),
                        filter=keccak_sponge.ctl_looking_memory_filter(i))
                for i in range(keccak_sponge.RATE_BYTES))
            + tuple(
                CtlView(table=Table.BytePacking,
                        columns=byte_packing.ctl_looking_memory(i),
                        filter=byte_packing.ctl_looking_memory_filter(i))
                for i in range(32))
            + (CtlView(table=Table.MemBefore,
                       columns=memory_continuation.ctl_data_memory(),
                       filter=memory_continuation.ctl_filter()),),
            looked=CtlView(table=Table.Memory, columns=memory.ctl_data(),
                           filter=memory.ctl_filter())),
        # ctl_mem_before: Memory -> MemBefore
        CrossTableLookup(
            name="mem_before",
            looking=(CtlView(table=Table.Memory,
                             columns=memory.ctl_looking_mem(),
                             filter=memory.ctl_filter_mem_before()),),
            looked=CtlView(table=Table.MemBefore,
                           columns=memory_continuation.ctl_data(),
                           filter=memory_continuation.ctl_filter())),
        # ctl_mem_after: Memory -> MemAfter
        CrossTableLookup(
            name="mem_after",
            looking=(CtlView(table=Table.Memory,
                             columns=memory.ctl_looking_mem(),
                             filter=memory.ctl_filter_mem_after()),),
            looked=CtlView(table=Table.MemAfter,
                           columns=memory_continuation.ctl_data(),
                           filter=memory_continuation.ctl_filter())),
        # ctl_context_pruning: CPU (pending) -> Memory stale contexts
        CrossTableLookup(
            name="context_pruning",
            looking=(),
            looked=CtlView(
                table=Table.Memory,
                columns=memory.ctl_context_pruning_looked(),
                filter=memory.ctl_context_pruning_looked_filter())),
    ]


def _arithmetic_looked_columns():
    """The arithmetic table exposes (opcode, in0, in1, in2, out) registers
    combined over two-row ops (arithmetic_stark.rs ctl_arithmetic_rows:
    op flags weighted by opcode + the 4 x 16-limb registers)."""
    from ..stark import ColExpr
    from .arithmetic import (OP_FLAGS, OPCODE_COL, INPUT_REGISTER_0,
                            INPUT_REGISTER_1, INPUT_REGISTER_2,
                            OUTPUT_REGISTER)
    opcodes = {
        "add": 0x01, "mul": 0x02, "sub": 0x03, "div": 0x04, "mod": 0x06,
        "addmod": 0x08, "mulmod": 0x09, "addfp254": 0x0c,
        "mulfp254": 0x0d, "subfp254": 0x0e, "submod": 0x0f, "lt": 0x10,
        "gt": 0x11, "byte": 0x1a, "shl": 0x1b, "shr": 0x1c,
    }
    from .arithmetic import BINARY_FLAG, TERNARY_FLAG
    flag_terms = []
    for name, code in opcodes.items():
        flag = BINARY_FLAG.get(name, TERNARY_FLAG.get(name))
        flag_terms.append((flag, code))
    out = [ColExpr(terms=tuple(flag_terms) + ((OPCODE_COL, 1),))]
    for reg in (INPUT_REGISTER_0, INPUT_REGISTER_1, INPUT_REGISTER_2,
                OUTPUT_REGISTER):
        out.extend(ColExpr(terms=((c, 1),)) for c in reg)
    return tuple(out)


def _arithmetic_looked_filter():
    from ..stark import Filter
    from .arithmetic import OP_FLAGS
    return Filter(sum_cols=tuple(OP_FLAGS))
