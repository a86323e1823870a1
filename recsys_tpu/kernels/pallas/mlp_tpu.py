"""Pallas TPU kernel: fused multi-layer MLP forward + backward.

Why: XLA runs each Dense layer as its own matmul with every hidden
activation round-tripping HBM; at recsys tower widths that traffic plus
per-op overhead dominates — the DLRM bench's bottom MLP (13->512->256->16,
B=16384, 4.6 GF x3) measured ~1.0 ms against a 0.07 ms MXU bound, the top
MLP (367->1024x2->512->256->1) 2.0 ms against 1.04 ms.

This kernel keeps ALL the stack's weights VMEM-resident, tiles the batch,
and materialises hidden activations only in VMEM:

* forward: one pass, writes only the (B, D_out) output;
* backward: recomputes the hiddens from the x tile (cheap flops, zero
  saved residuals), then walks the stack in reverse, ACCUMULATING dW/db
  into revisited output blocks across grid steps (Pallas keeps an output
  block resident while consecutive steps map to it) and emitting dx.

Semantics: relu hidden activations, linear final layer, f32 params;
matmuls run with bf16 inputs and f32 accumulation (``mm_bf16=False``
keeps f32 at Precision.HIGHEST for parity tests).  Exposed to models via
ops.mlp.FusedMLP with a jax.custom_vjp.

Reference perf surface: the DNN towers in every reference model
(/root/reference/src/ctr/layers/modules.py:114-135 etc.).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _cast(x, dt):
    return x.astype(dt) if x.dtype != dt else x


def _fwd_kernel(x_ref, *refs, n_layers, mm_dtype, precision):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]
    h = _cast(x_ref[...], mm_dtype)
    for i in range(n_layers):
        z = lax.dot_general(
            h, _cast(w_refs[i][...], mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) + b_refs[i][...]
        h = _cast(jnp.maximum(z, 0.0) if i < n_layers - 1 else z, mm_dtype)
    out_ref[...] = h.astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, *refs, n_layers, mm_dtype, precision):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    dx_ref = refs[2 * n_layers]
    dw_refs = refs[2 * n_layers + 1:3 * n_layers + 1]
    db_refs = refs[3 * n_layers + 1:4 * n_layers + 1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for i in range(n_layers):
            dw_refs[i][...] = jnp.zeros_like(dw_refs[i])
            db_refs[i][...] = jnp.zeros_like(db_refs[i])

    # recompute hiddens (store pre-activation sign via the relu output)
    hs = [_cast(x_ref[...], mm_dtype)]
    for i in range(n_layers):
        z = lax.dot_general(
            hs[-1], _cast(w_refs[i][...], mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) + b_refs[i][...]
        hs.append(_cast(jnp.maximum(z, 0.0) if i < n_layers - 1 else z,
                        mm_dtype))

    dh = _cast(g_ref[...], mm_dtype)
    for i in range(n_layers - 1, -1, -1):
        if i < n_layers - 1:
            # relu mask: compare in f32 — Mosaic cannot lower a bf16 cmpf
            # on this target ("Target does not support this comparison")
            mask = hs[i + 1].astype(jnp.float32) > 0.0
            dh = _cast(dh * mask.astype(mm_dtype), mm_dtype)
        dw_refs[i][...] += lax.dot_general(
            hs[i], dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        db_refs[i][...] += jnp.sum(dh.astype(jnp.float32), axis=0,
                                   keepdims=True)
        dh = lax.dot_general(
            dh, _cast(w_refs[i][...], mm_dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dh = _cast(dh, mm_dtype)
    dx_ref[...] = dh.astype(dx_ref.dtype)


def _specs(n_layers, tile_b, dims, out_dim):
    xspec = pl.BlockSpec((tile_b, dims[0]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_layers)]
    bspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_layers)]
    yspec = pl.BlockSpec((tile_b, out_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return xspec, wspecs, bspecs, yspec


@functools.partial(jax.jit, static_argnames=("tile_b", "mm_bf16", "interpret"))
def mlp_fwd_pallas(x, ws, bs, *, tile_b=512, mm_bf16=True, interpret=False):
    """x (B, D0); ws [(D_{i-1}, D_i)]; bs [(1, D_i)] -> (B, D_k) f32."""
    n = len(ws)
    b = x.shape[0]
    tile_b = min(tile_b, b)
    dims = [x.shape[1]] + [w.shape[1] for w in ws]
    xs, wss, bss, ys = _specs(n, tile_b, dims, dims[-1])
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    precision = None if mm_bf16 else lax.Precision.HIGHEST
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers=n, mm_dtype=mm_dtype,
                          precision=precision),
        grid=(pl.cdiv(b, tile_b),),
        in_specs=[xs, *wss, *bss],
        out_specs=ys,
        out_shape=jax.ShapeDtypeStruct((b, dims[-1]), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, *ws, *bs)


@functools.partial(jax.jit, static_argnames=("tile_b", "mm_bf16", "interpret"))
def mlp_bwd_pallas(x, g, ws, bs, *, tile_b=512, mm_bf16=True,
                   interpret=False):
    """-> (dx, [dW_i], [db_i]); dW/db accumulated across batch tiles."""
    n = len(ws)
    b = x.shape[0]
    tile_b = min(tile_b, b)
    dims = [x.shape[1]] + [w.shape[1] for w in ws]
    xs, wss, bss, _ = _specs(n, tile_b, dims, dims[-1])
    gs = pl.BlockSpec((tile_b, dims[-1]), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    dxs = pl.BlockSpec((tile_b, dims[0]), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    dws = [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in ws]
    dbs = [pl.BlockSpec(bb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for bb in bs]
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    precision = None if mm_bf16 else lax.Precision.HIGHEST
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers=n, mm_dtype=mm_dtype,
                          precision=precision),
        grid=(pl.cdiv(b, tile_b),),
        in_specs=[xs, gs, *wss, *bss],
        out_specs=(dxs, *dws, *dbs),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws],
            *[jax.ShapeDtypeStruct(bb.shape, jnp.float32) for bb in bs],
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, g, *ws, *bs)
