"""Runtime configuration: env + file + CLI flags.

The reference's zero binaries are configured by clap flags and env vars
(zero/src/prover.rs CliProverConfig; RUST_LOG etc.). TPU twin: one
`RuntimeConfig` resolved in precedence order CLI > env > config file >
defaults, consumed by the CLI entry points and orchestration.

Env vars (all optional):
    ZK_FLAVOR        eth_mainnet | cdk_erigon
    ZK_CONFIG        path to a JSON config file
    ZK_PROVE_CONFIG  standard | test        (FRI strength)
    ZK_MAX_CPU_LEN_LOG  segment size 2^N    (zk-continuations)
    ZK_BATCH_SIZE    txns per batch (decoder)
    ZK_PROOF_DIR     proof output directory
    ZK_LOG           error|warn|info|debug  (metrics.setup_logging)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, fields
from typing import ClassVar


@dataclass
class RuntimeConfig:
    flavor: str = "eth_mainnet"
    prove_config: str = "test"          # "standard" on real deployments
    max_cpu_len_log: int = 0            # 0 = no segmentation
    batch_size: int = 10
    proof_dir: str = "."
    log_level: str = "warning"

    _ENV: ClassVar[dict] = {
        "flavor": "ZK_FLAVOR",
        "prove_config": "ZK_PROVE_CONFIG",
        "max_cpu_len_log": "ZK_MAX_CPU_LEN_LOG",
        "batch_size": "ZK_BATCH_SIZE",
        "proof_dir": "ZK_PROOF_DIR",
        "log_level": "ZK_LOG",
    }

    def stark_config(self):
        from .stark import StarkConfig
        if self.prove_config == "standard":
            return StarkConfig.standard_fast_config()
        return StarkConfig.test_config()

    def validate(self) -> "RuntimeConfig":
        assert self.flavor in ("eth_mainnet", "cdk_erigon",
                               "polygon_pos"), self.flavor
        assert self.prove_config in ("standard", "test"), self.prove_config
        assert self.max_cpu_len_log == 0 or \
            8 <= self.max_cpu_len_log <= 24, self.max_cpu_len_log
        return self


def load(cli_overrides: dict | None = None,
         config_path: str | None = None,
         env: dict | None = None) -> RuntimeConfig:
    """Resolve CLI > env > file > defaults."""
    env = os.environ if env is None else env
    values: dict = {}
    path = config_path or env.get("ZK_CONFIG")
    if path:
        with open(path) as f:
            file_cfg = json.load(f)
        known = {f.name for f in fields(RuntimeConfig)
                 if not f.name.startswith("_")}
        unknown = set(file_cfg) - known
        assert not unknown, f"unknown config keys: {sorted(unknown)}"
        values.update(file_cfg)
    for name, var in RuntimeConfig._ENV.items():
        if var in env:
            values[name] = env[var]
    for k, v in (cli_overrides or {}).items():
        if v is not None:
            values[k] = v
    for int_key in ("max_cpu_len_log", "batch_size"):
        if int_key in values:
            values[int_key] = int(values[int_key])
    return RuntimeConfig(**values).validate()
