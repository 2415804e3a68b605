"""Proof / kernel disk persistence."""

import os

from zk_evm_tpu.orchestration import persistence as per
from zk_evm_tpu.witness import asm_parser as ap
from zk_evm_tpu.witness import assembler as asmblr
from zk_evm_tpu.witness.interpreter import run_kernel, DEFAULT_HALT_OFFSET


def test_kernel_save_load(tmp_path):
    consts, opcodes, _ = asmblr.load_tables()
    k = asmblr.assemble([ap.parse("GLOBAL f:\n ADD\n SWAP1 JUMP\n")],
                        consts, opcodes)
    path = per.save_kernel(str(tmp_path), k)
    k2 = per.load_kernel(path)
    assert k2.code == k.code and k2.global_labels == k.global_labels
    out = run_kernel(k2, "f", [DEFAULT_HALT_OFFSET, 2, 3]).stack()
    assert out == [5]


def test_proof_file_naming(tmp_path):
    assert per.proof_path(str(tmp_path), 1033).endswith("b1033.zkproof")
