"""Pallas TPU kernels with jnp reference fallbacks.

Every kernel module exposes a functional op whose default path is chosen by
:func:`use_pallas` — the Pallas kernel on TPU backends, the pure-jnp
reference elsewhere (CPU tests, interpret-mode checks).  The jnp reference is
also the ground truth each kernel is unit-tested against.
"""
from __future__ import annotations

import os

import jax


def use_pallas() -> bool:
    """True when the Pallas TPU path should be used by default."""
    forced = os.environ.get("RECSYS_TPU_FORCE_PALLAS")
    if forced is not None:
        return forced not in ("0", "false", "")
    # "axon" is the tunnelled TPU PJRT plugin used in this environment
    return jax.default_backend() in ("tpu", "axon")
