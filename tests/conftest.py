"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on a real TPU chip; tests validate numerics and the
multi-device sharding path without TPU hardware (SURVEY.md section 4 item 4).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
