"""Test harness: run everything on a virtual 8-device CPU mesh with x64 enabled.

Mirrors the reference's CI strategy (``.github/workflows/ci.yml:46-75``): the same
suite is exercised single-device and re-run under parallelism — here via
``--xla_force_host_platform_device_count=8`` so sharded paths execute real
collectives without TPU hardware.
"""

import os

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
