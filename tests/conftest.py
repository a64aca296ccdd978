"""Test configuration: force a virtual 8-device CPU mesh so all sharding
(data-parallel training / inference tile-batch sharding) is testable without
TPU hardware, and enable float64 so geometry kernels can be validated at
double precision against host oracles.

NOTE: this environment's sitecustomize force-registers an `axon` TPU PJRT
plugin and overwrites `jax_platforms` via jax.config, so the JAX_PLATFORMS
env var alone is NOT sufficient — we must override through jax.config after
import."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
