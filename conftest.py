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

# Isolate the persistent XLA cache: some tests drive the CLI in-process,
# whose enable_persistent_cache() would otherwise point the WHOLE pytest
# process at the user's shared cache dir — concurrent sessions writing
# the same entries produced a corrupt zstd blob that segfaulted jax's
# cache reader (round 5). Each pytest run gets its own scratch dir.
import tempfile  # noqa: E402

os.environ.setdefault(
    "ZK_EVM_TPU_CACHE",
    os.path.join(tempfile.mkdtemp(prefix="zk_xla_cache_"), "xla"))

# Raise the main-thread stack soft limit: XLA:CPU's compiler recurses
# deeply on large fused programs and the default 8 MiB stack segfaults
# late in the suite once the process is big (the reference ships the
# same fix as RUST_MIN_STACK=33554432, scripts/prove_stdio.rs:38-46).
import resource  # noqa: E402

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 256 << 20
if _soft != resource.RLIM_INFINITY and _soft < _want:
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
    except (ValueError, OSError):
        pass


# Clear jax's in-process caches between test modules: after ~300 tests
# the accumulated compiled executables reproducibly segfault XLA:CPU's
# next big compile (backend_compile_and_load) regardless of the stack
# limit. Dropping executables between modules bounds process state;
# cross-module reuse is negligible and the persistent cache (isolated
# above) still serves repeat shapes.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    import jax

    jax.clear_caches()
