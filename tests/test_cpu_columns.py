"""CPU column layout invariants."""

import zk_evm_tpu.tables.cpu_columns as cc


def test_layout_shape():
    assert cc.NUM_CPU_COLUMNS == 85
    assert len(cc.OP) == 18
    assert len(cc.OPCODE_BITS) == 8
    assert len(cc.GENERAL) == 8
    assert len(cc.MEM_CHANNELS) == 3
    assert all(len(ch.value) == 8 for ch in cc.MEM_CHANNELS)


def test_indices_are_a_partition():
    seen = ([cc.CONTEXT, cc.CODE_CONTEXT, cc.PROGRAM_COUNTER,
             cc.STACK_LEN, cc.IS_KERNEL_MODE, cc.GAS, cc.CLOCK]
            + list(cc.OP.values()) + cc.OPCODE_BITS + cc.GENERAL)
    for ch in cc.MEM_CHANNELS:
        seen += ch.all
    seen += [cc.PARTIAL_CHANNEL.used, cc.PARTIAL_CHANNEL.is_read,
             cc.PARTIAL_CHANNEL.addr_context,
             cc.PARTIAL_CHANNEL.addr_segment,
             cc.PARTIAL_CHANNEL.addr_virtual]
    assert sorted(seen) == list(range(cc.NUM_CPU_COLUMNS))


def test_general_union_views_alias_shared_slots():
    # every view lives inside the 8 shared slots
    assert cc.LOGIC_DIFF_PINV == cc.GENERAL
    assert cc.EXC_CODE_BITS == cc.GENERAL[:3]
    assert cc.STACK_LEN_BOUNDS_AUX == cc.GENERAL[-1]
    # the stack view coexists with the 1-2 column views (not with logic)
    assert cc.STACK_INV > cc.JUMPS_COND_SUM_PINV
