"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is exercised without TPU hardware by running JAX on
the host platform with 8 virtual devices (SURVEY.md §4's test strategy).

Note: this environment's sitecustomize registers a remote-TPU ("axon")
backend and forces ``jax_platforms=axon,cpu`` via ``jax.config.update`` —
which overrides the JAX_PLATFORMS env var — so the override here must also go
through ``jax.config.update`` and must run before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert len(jax.devices()) == 8, "tests require the 8-device virtual CPU mesh"
