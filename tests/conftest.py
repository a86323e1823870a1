"""Test configuration: force a local 8-device virtual CPU mesh.

Multi-chip sharding behaviour (mesh, collectives, table sharding) is
exercised on a virtual CPU mesh per SURVEY.md §4.

The session environment boots every interpreter through an `axon`
sitecustomize that registers the remote-TPU PJRT plugin and calls
``jax.config.update("jax_platforms", "axon,cpu")`` — overriding the
JAX_PLATFORMS env var.  Undo it with the same config API before any backend
is initialised so unit tests run on the fast local CPU backend.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
