"""Disk persistence: proof files and the assembled-kernel cache.

Twin of the reference's zero/src/fs.rs (proof files named
`b{height}.zkproof`) and prover_state/persistence.rs (artifacts keyed by
an 8-hex-char kernel-hash prefix so caches invalidate when the kernel
changes)."""

from __future__ import annotations

import json
import os

from ..stark.serialization import proof_to_json, all_proof_from_json


def proof_path(output_dir: str, block_height: int) -> str:
    return os.path.join(output_dir, f"b{block_height}.zkproof")


def save_block_proof(output_dir: str, block_height: int, proof) -> str:
    os.makedirs(output_dir, exist_ok=True)
    path = proof_path(output_dir, block_height)
    with open(path, "w") as f:
        f.write(proof_to_json(proof))
    return path


def load_block_proof(output_dir: str, block_height: int):
    with open(proof_path(output_dir, block_height)) as f:
        return all_proof_from_json(f.read())


def kernel_cache_path(cache_dir: str, kernel_hash: bytes) -> str:
    return os.path.join(cache_dir, f"kernel_{kernel_hash[:4].hex()}.json")


def save_kernel(cache_dir: str, kernel) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    path = kernel_cache_path(cache_dir, kernel.code_hash)
    with open(path, "w") as f:
        json.dump({
            "code": kernel.code.hex(),
            "code_hash": kernel.code_hash.hex(),
            "global_labels": kernel.global_labels,
            "ordered_labels": kernel.ordered_labels,
            "prover_inputs": {str(k): list(v)
                              for k, v in kernel.prover_inputs.items()},
        }, f)
    return path


def load_kernel(path: str):
    from ..witness.assembler import Kernel
    with open(path) as f:
        d = json.load(f)
    return Kernel(
        code=bytes.fromhex(d["code"]),
        code_hash=bytes.fromhex(d["code_hash"]),
        global_labels={k: int(v) for k, v in d["global_labels"].items()},
        ordered_labels=list(d["ordered_labels"]),
        prover_inputs={int(k): tuple(v)
                       for k, v in d["prover_inputs"].items()})
