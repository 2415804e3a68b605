"""P2 per-table parallelism: parallel trace commitments must be
bit-identical to sequential (the determinism contract that keeps the
Fiat-Shamir transcript stable)."""

import numpy as np

from tests.test_verify_tape import _toy_ctl_setup, _child_cfg
from zk_evm_tpu.stark import prove_all, verify_all
from zk_evm_tpu.stark.serialization import proof_to_json


def test_parallel_commits_bit_identical():
    starks, traces, ctls = _toy_ctl_setup()
    cfg = _child_cfg()
    seq = prove_all(starks, traces, ctls, cfg)
    par = prove_all(starks, traces, ctls, cfg, parallel_commits=True)
    assert seq.proofs[0].trace_cap == par.proofs[0].trace_cap
    assert proof_to_json(seq.proofs[0]) == proof_to_json(par.proofs[0])
    assert proof_to_json(seq.proofs[1]) == proof_to_json(par.proofs[1])
    verify_all(starks, par, ctls, cfg)


def test_parallel_commits_with_device_list():
    import jax
    starks, traces, ctls = _toy_ctl_setup()
    cfg = _child_cfg()
    devs = jax.devices()
    par = prove_all(starks, traces, ctls, cfg, parallel_commits=True,
                    devices=devs)
    verify_all(starks, par, ctls, cfg)
