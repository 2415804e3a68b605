# Root conftest: force tests onto the CPU backend with a virtual 8-device mesh
# BEFORE jax is imported anywhere. Benchmarks (bench.py) run on the real TPU;
# tests exercise the same code paths on a virtual mesh, mirroring the
# reference's "in-memory runtime" CI strategy (SURVEY.md §4.6).
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
