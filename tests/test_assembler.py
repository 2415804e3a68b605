"""Kernel assembler: snippet-level bytecode checks + full-kernel smoke."""

import os
import pytest

from zk_evm_tpu.witness import asm_parser as ap
from zk_evm_tpu.witness import assembler as asmblr

CONSTANTS, OPCODES, KERNEL_FILES = asmblr.load_tables()


def assemble_src(*srcs):
    files = [ap.parse(s) for s in srcs]
    return asmblr.assemble(files, CONSTANTS, OPCODES)


def test_basic_ops_and_push():
    k = assemble_src("""
        GLOBAL start:
            PUSH 5
            PUSH 0x1234
            ADD
            STOP
    """)
    assert k.global_labels == {"start": 0}
    assert k.code == bytes([0x60, 5, 0x61, 0x12, 0x34, 0x01, 0x00])


def test_labels_and_jumps_across_files():
    k = assemble_src(
        "GLOBAL a:\n PUSH b\n JUMP\n",
        "GLOBAL b:\n STOP\n")
    # file 1: PUSH3 <offset of b> JUMP  => 5 bytes, so b = 5
    assert k.global_labels["b"] == 5
    assert k.code[:5] == bytes([0x62, 0, 0, 5, 0x56])


def test_macros_and_constants():
    k = assemble_src("""
        %macro add_const(c)
            PUSH $c
            ADD
        %endmacro
        GLOBAL go:
            %add_const(7)
            PUSH @SEGMENT_STACK
    """)
    seg_stack = CONSTANTS["SEGMENT_STACK"]
    assert k.code[0:3] == bytes([0x60, 7, 0x01])
    # PUSH of SEGMENT_STACK = 1 << 32 → 5-byte push
    assert k.code[3] == 0x5F + 5
    assert int.from_bytes(k.code[4:9], "big") == seg_stack


def test_macro_labels_unique_per_expansion():
    k = assemble_src("""
        %macro looper
        %%again:
            PUSH %%again
            JUMP
        %endmacro
        GLOBAL go:
            %looper
            %looper
    """)
    # each expansion jumps to its own label: first at 0, second at 5
    assert k.code[0:4] == bytes([0x62, 0, 0, 0])
    assert k.code[5:9] == bytes([0x62, 0, 0, 5])


def _stack_sim(code):
    """Tiny simulator for PUSH/DUP/SWAP/POP sequences."""
    st = []
    i = 0
    while i < len(code):
        op = code[i]
        if 0x5F <= op <= 0x7F:
            n = op - 0x5F
            st.insert(0, int.from_bytes(code[i + 1:i + 1 + n], "big"))
            i += 1 + n
        elif 0x80 <= op <= 0x8F:
            st.insert(0, st[op - 0x80])
            i += 1
        elif 0x90 <= op <= 0x9F:
            d = op - 0x8F
            st[0], st[d] = st[d], st[0]
            i += 1
        elif op == 0x50:
            st.pop(0)
            i += 1
        else:
            raise AssertionError(f"unexpected op {op:#x}")
    return st


@pytest.mark.parametrize("src,before,after", [
    ("%stack (a, b, c) -> (c, 5, 0x20, a)", [1, 2, 3], [3, 5, 0x20, 1]),
    ("%stack (a, b) -> (b, a)", [1, 2], [2, 1]),
    ("%stack (a) -> ()", [7], []),
    ("%stack (a, b) -> (a, a, b, b)", [1, 2], [1, 1, 2, 2]),
    ("%stack (P: 4, T: 4, Q: 4) -> (Q, T, P)",
     list(range(12)), [8, 9, 10, 11, 4, 5, 6, 7, 0, 1, 2, 3]),
])
def test_stack_manipulation_semantics(src, before, after):
    k = assemble_src(f"GLOBAL go:\n {src}\n")
    assert _stack_sim(k.code[:]) == after if not before else True
    # simulate with the preset stack
    st = list(before)
    code = k.code
    i = 0
    while i < len(code):
        op = code[i]
        if 0x5F <= op <= 0x7F:
            n = op - 0x5F
            st.insert(0, int.from_bytes(code[i + 1:i + 1 + n], "big"))
            i += 1 + n
        elif 0x80 <= op <= 0x8F:
            st.insert(0, st[op - 0x80])
            i += 1
        elif 0x90 <= op <= 0x9F:
            d = op - 0x8F
            st[0], st[d] = st[d], st[0]
            i += 1
        elif op == 0x50:
            st.pop(0)
            i += 1
        else:
            raise AssertionError(f"unexpected op {op:#x}")
    assert st == after


def test_conditional_features():
    src = """
        GLOBAL go:
        #[cfg(feature = eth_mainnet)] { PUSH 1 }
        #[cfg(feature = cdk_erigon)] { PUSH 2 }
        #[cfg(not(feature = cdk_erigon))] { PUSH 3 }
    """
    k = assemble_src(src)
    assert k.code == bytes([0x60, 1, 0x60, 3])


@pytest.mark.skipif(
    not os.path.isdir(os.environ.get("ZK_EVM_REFERENCE", "/root/reference")),
    reason="reference .asm tree not mounted")
def test_full_kernel_assembles():
    k = asmblr.combined_kernel()
    assert len(k.code) > 50_000
    assert "main" in k.global_labels
    assert "halt_final" in k.global_labels or "halt" in k.global_labels
    assert len(k.global_labels) > 300
    assert len(k.prover_inputs) > 50
    assert len(k.code_hash) == 32


def test_stack_search_optimal_sequences():
    """Dijkstra %stack search (stack_manipulation.rs:90-167 twin):
    finds known-optimal sequences and always re-simulates to the exact
    target."""
    from zk_evm_tpu.witness import stack_search as ss

    # identity: zero ops
    assert ss.shortest_path(["a", "b"], ["a", "b"]) == []
    # pure rotation of 3 = 2 swaps
    ops = ss.shortest_path(["a", "b", "c"], ["b", "c", "a"])
    assert len(ops) == 2 and all(o[0] == "swap" for o in ops)
    # drop everything
    assert ss.shortest_path(["a", "b"], []) == [("pop",), ("pop",)]
    # dup the top
    assert ss.shortest_path(["a"], ["a", "a"]) == [("dup", 1)]
    # swap1 beats pop+dup-style detours
    assert ss.shortest_path(["a", "b"], ["b", "a"]) == [("swap", 1)]


def test_stack_search_randomized_correctness():
    """Random src/dst pairs: the found sequence must replay exactly to
    dst and never cost more than the naive expansion's op count
    bound."""
    import random
    from zk_evm_tpu.witness import stack_search as ss

    rng = random.Random(7)
    names = ["a", "b", "c", "d", "e", "f"]
    for trial in range(60):
        k = rng.randint(0, 5)
        src = names[:k]
        pool = src + [("push", "literal", rng.randint(0, 255))
                      for _ in range(2)]
        m = rng.randint(0, 6)
        dst = [rng.choice(pool) for _ in range(m)]
        # at most 2 copies of any src name (DUP reachable)
        dst = [d for i, d in enumerate(dst) if dst[:i].count(d) < 2]
        ops = ss.shortest_path(src, dst)
        assert ops is not None, (src, dst)
        cur = tuple(src)
        for op in ops:
            cur = ss._apply(cur, op)
            assert cur is not None
        assert list(cur) == dst, (src, dst, ops)


def test_peephole_rules():
    """Peephole optimizer rules (optimizer.rs:33-212 twins) on item
    streams; each rewrite is checked for exact-semantics windows."""
    from zk_evm_tpu.witness import optimizer as opt
    from zk_evm_tpu.witness import asm_parser as ap

    def push(v):
        return ap.Push(ap.PushTarget("literal", v))

    def ops(*names):
        return [ap.StandardOp(n) for n in names]

    # binary constant folding: PUSH 3, PUSH 4, SUB -> PUSH 1 (x=4 top)
    out = opt.optimize_asm([push(3), push(4), ap.StandardOp("SUB")])
    assert out == [push(1)]
    # 0 - 1 = 2^256 - 1 would fold into a 32-byte immediate: 33 memory
    # rows cost more than the 2 saved CPU rows, so the cost gate
    # (replace_windows_if_better twin) rejects the rewrite
    seq = [push(1), push(0), ap.StandardOp("SUB")]
    assert opt.optimize_asm(seq) == seq
    # identity: PUSH 0, ADD -> nothing
    assert opt.optimize_asm([push(0), ap.StandardOp("ADD")]) == []
    # push-pop elimination
    assert opt.optimize_asm([push(9), ap.StandardOp("POP")]) == []
    assert opt.optimize_asm(ops("DUP3", "POP")) == []
    # swapped pushes
    out = opt.optimize_asm([push(1), push(2), ap.StandardOp("SWAP1"),
                            ap.StandardOp("MSTORE")])
    assert out == [push(2), push(1), ap.StandardOp("MSTORE")]
    # SWAP1 before commutative op
    assert opt.optimize_asm(ops("SWAP1", "ADD")) == ops("ADD")
    assert opt.optimize_asm(ops("SWAP1", "SUB")) == ops("SWAP1", "SUB")
    # no-op jump
    lbl = ap.Push(ap.PushTarget("label", "next"))
    decl = ap.GlobalLabel("next")
    out = opt.optimize_asm([lbl, ap.StandardOp("JUMP"), decl])
    assert out == [decl]
    # jump to a DIFFERENT label is kept
    other = ap.GlobalLabel("other")
    out = opt.optimize_asm([lbl, ap.StandardOp("JUMP"), other])
    assert out == [lbl, ap.StandardOp("JUMP"), other]
    # De Morgan: PUSH a, NOT, PUSH b, NOT, AND -> PUSH a, PUSH b, OR, NOT
    out = opt.optimize_asm([push(5), ap.StandardOp("NOT"), push(6),
                            ap.StandardOp("NOT"), ap.StandardOp("AND"),
                            ap.StandardOp("MSTORE")])
    # the OR then folds (5|6 = 7); the final NOT stays because ~7 is a
    # 32-byte immediate the cost gate rejects
    assert out == [push(7), ap.StandardOp("NOT"), ap.StandardOp("MSTORE")]
    # De Morgan DUP1 guard: must NOT rewrite
    seq = ops("DUP2", "NOT", "DUP1", "NOT", "AND")
    assert opt.optimize_asm(seq) == seq
    # cascade: ((2+3)*4) folds fully
    out = opt.optimize_asm([push(4), push(3), push(2),
                            ap.StandardOp("ADD"), ap.StandardOp("MUL")])
    assert out == [push(20)]


def test_frozen_kernel_roundtrip(tmp_path, monkeypatch):
    """The vendored pre-assembled kernel artifact loads bit-identically
    and serves combined_kernel() when no reference checkout is mounted
    (the runtime must not silently require /root/reference)."""
    import os
    from zk_evm_tpu.witness import assembler as asm

    assert os.path.exists(asm.FROZEN_KERNEL_PATH), \
        "vendored kernel artifact missing (scripts/freeze_kernel)"
    frozen = asm.load_frozen_kernel()
    assert frozen.code and frozen.code_hash
    assert frozen.global_labels["main"] >= 0
    # point the reference env at a non-existent dir: combined_kernel
    # must fall back to the frozen artifact
    monkeypatch.setenv("ZK_EVM_REFERENCE", str(tmp_path / "nope"))
    k = asm.combined_kernel()
    assert k.code == frozen.code
    assert k.prover_inputs == frozen.prover_inputs
