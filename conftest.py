# Root conftest: force tests onto the CPU backend with a virtual 8-device mesh
# BEFORE any test imports jax. Benchmarks (bench.py) run on the real TPU;
# tests exercise the same code paths on a virtual mesh, mirroring the
# reference's "in-memory runtime" CI strategy (SURVEY.md §4.6).
#
# Note: the environment's axon sitecustomize force-registers the TPU tunnel
# backend and sets jax_platforms="axon,cpu" regardless of JAX_PLATFORMS, so
# the env var alone is not enough — we must update jax.config after import.
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
