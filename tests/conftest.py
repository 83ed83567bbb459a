"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the rebuild test strategy (SURVEY.md §4): the dense oracle renderer
runs on CPU so kernel-vs-oracle and gradient tests need no TPU, and
multi-chip sharding is validated with XLA's host-platform device virtualization.
"""

import os

# Hard override: the ambient environment pins JAX_PLATFORMS to the TPU
# tunnel; unit tests must run on local CPU with 8 virtual devices.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
# This box compiles XLA slowly (2 vCPUs); persist compiled executables so
# repeated test runs skip compilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
