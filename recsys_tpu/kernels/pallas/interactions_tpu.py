"""Pallas TPU kernels: FM pairwise interaction and DLRM dot-interaction.

Fused single-pass kernels for the interaction ops of
recsys_tpu/kernels/interactions.py (the jnp reference and ground truth).

Design notes (per the TPU kernel playbook):
* Grid over batch tiles; each program holds a (TILE_B, F, D) block in VMEM.
* FM pairwise is pure VPU work: (sum_f v)^2 - sum_f v^2, reduced over D.
* Dot-interaction computes the per-example Gram matrix with a batched
  ``dot_general`` (MXU) and packs the strictly-lower triangle with a SECOND
  matmul against a static 0/1 selection matrix S (F*F, P) — packing as
  MXU work instead of an in-kernel gather, which TPU lane indexing handles
  poorly.  The selection matmul is exact (0/1 coefficients).
* fp32 accumulation everywhere (`preferred_element_type`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fm_kernel(x_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)  # (TILE_B, F, D)
    s = jnp.sum(x, axis=1)  # (TILE_B, D)
    sq = jnp.sum(x * x, axis=1)  # (TILE_B, D)
    out_ref[:] = 0.5 * (s * s - sq)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fm_pairwise_vector_pallas(
    field_embs: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """(B, F, D) -> (B, D) bi-interaction vector (sum over D done by caller)."""
    b, f, d = field_embs.shape
    tile_b = min(512, b)
    grid = (pl.cdiv(b, tile_b),)
    return pl.pallas_call(
        _fm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (tile_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        interpret=interpret,
    )(field_embs)


def _dot_kernel(x_ref, out_ref, *, self_interaction: bool):
    x = x_ref[:].astype(jnp.float32)  # (TILE_B, F, D)
    gram = jax.lax.dot_general(
        x,
        x,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TILE_B, F, F)
    tb, f, _ = gram.shape
    # Pack the (strict) lower triangle.  jnp.tril_indices order is row-major
    # over rows i with j ascending, so the packed layout is contiguous
    # per-row segments: out[:, start_i : start_i + len_i] = gram[:, i, :len_i].
    # Static per-row slices — Mosaic cannot shape-cast (tb, f, f)->(tb, f*f)
    # across the lane dims, so a flatten+select-matmul formulation fails to
    # compile; this one lowers cleanly.
    start = 0
    lo = 0 if self_interaction else 1
    for i in range(lo, f):
        length = i + 1 if self_interaction else i
        out_ref[:, pl.ds(start, length)] = gram[:, i, :length]
        start += length


@functools.partial(
    jax.jit, static_argnames=("self_interaction", "interpret")
)
def dot_interaction_pallas(
    vectors: jnp.ndarray,
    *,
    self_interaction: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, F, D) -> (B, P) packed pairwise dots, P = F(F±1)/2."""
    b, f, d = vectors.shape
    p = f * (f + 1) // 2 if self_interaction else f * (f - 1) // 2
    tile_b = min(256, b)
    grid = (pl.cdiv(b, tile_b),)
    return pl.pallas_call(
        functools.partial(_dot_kernel, self_interaction=self_interaction),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, p), jnp.float32),
        interpret=interpret,
    )(vectors)
