"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on a real TPU chip; tests validate numerics and the
multi-device sharding path without TPU hardware (SURVEY.md section 4 item 4).

This environment injects an axon-TPU PJRT plugin via a sitecustomize on
PYTHONPATH that routes ALL XLA compiles (including CPU) through a remote
compile service — measured 100-400 s per jit in tests vs ~1 s local. Tests
are CPU-only, so if the plugin's env markers are present we re-exec the
interpreter once with the plugin stripped and the CPU platform forced.
"""
import os
import sys

_GUARD = "SPECTRAL_TPU_TEST_REEXEC"


def _strip_axon_and_reexec() -> None:
    if os.environ.get(_GUARD):
        return
    py_path = os.environ.get("PYTHONPATH", "")
    has_axon = any("axon" in p for p in py_path.split(os.pathsep) if p)
    if not (has_axon or os.environ.get("PALLAS_AXON_REMOTE_COMPILE")):
        return
    env = dict(os.environ)
    env[_GUARD] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in py_path.split(os.pathsep) if p and "axon" not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


_strip_axon_and_reexec()

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _free_compiled_executables():
    """Drop JIT caches after every test module.

    One pytest process compiles hundreds of XLA CPU programs over the
    full suite; each JIT'd executable holds mmap'd code/data sections,
    and the process crosses the kernel's vm.max_map_count (65530 here)
    around the ~90th test — LLVM then fails with 'Cannot allocate
    memory' and the interpreter segfaults (observed twice at
    test_parity_contract). Clearing per module keeps the map count
    bounded at the cost of recompiling shared programs (~minutes over
    the suite)."""
    yield
    import jax

    jax.clear_caches()
    gc.collect()
