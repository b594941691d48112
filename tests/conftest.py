"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is covered by `bench.py` and the driver's compile checks;
tests use the CPU backend for determinism and to exercise multi-chip sharding
via --xla_force_host_platform_device_count (SURVEY.md environment notes).

Note: the ambient environment pre-imports jax with the axon TPU plugin
(sitecustomize) and exports JAX_PLATFORMS=axon, so we must override via
jax.config *after* import — plain env vars are already consumed.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
