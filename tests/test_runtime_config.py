"""Runtime config resolution: defaults, file, env, CLI precedence."""

import json

import pytest

from zk_evm_tpu import runtime_config as rc


def test_defaults():
    c = rc.load(env={})
    assert c.flavor == "eth_mainnet"
    assert c.prove_config == "test"
    assert c.stark_config().fri_config.num_query_rounds == 1


def test_file_then_env_then_cli(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"flavor": "cdk_erigon", "batch_size": 5}))
    c = rc.load(config_path=str(p), env={"ZK_BATCH_SIZE": "7"})
    assert c.flavor == "cdk_erigon"
    assert c.batch_size == 7                      # env beats file
    c2 = rc.load(config_path=str(p), env={"ZK_BATCH_SIZE": "7"},
                 cli_overrides={"batch_size": 9})
    assert c2.batch_size == 9                     # CLI beats env


def test_standard_config_and_validation():
    c = rc.load(env={"ZK_PROVE_CONFIG": "standard"})
    assert c.stark_config().fri_config.num_query_rounds == 84
    with pytest.raises(AssertionError):
        rc.load(env={"ZK_FLAVOR": "bogus"})
    with pytest.raises(AssertionError):
        rc.load(env={"ZK_MAX_CPU_LEN_LOG": "3"})


def test_unknown_file_keys_rejected(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"flavour": "typo"}))
    with pytest.raises(AssertionError):
        rc.load(config_path=str(p), env={})


def test_cli_plumbs_config(tmp_path, capsys):
    """--flavor/--log-level parse and resolve without running a prove."""
    from zk_evm_tpu.__main__ import main
    with pytest.raises(SystemExit):
        main(["--flavor", "cdk_erigon", "badcmd"])
