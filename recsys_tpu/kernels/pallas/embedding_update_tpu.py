"""Pallas TPU kernel: fused streaming embedding backward + dense Adam.

Replaces the two slowest phases of the embedding update — XLA's dense
scatter-add of the cotangent into a (V_phys, pack*D) gradient buffer and
the optax Adam pass over tables + moments — with ONE streaming kernel per
table (plus an XLA gather that pre-sorts the cotangent rows, which XLA
runs at its fast pipelined-gather rate):

  grid over table row-blocks; per block k
    * fori over the block's cotangent chunks (host-prepped, chunk-aligned):
      read the (CH, D) sorted-cot slice and the (1, CH) ids row from
      VMEM-resident inputs, build the (BLOCK, CH) row one-hot and the
      (CH, pack*D) sub-slot spread, and accumulate the block gradient
      G += onehot @ spread on the MXU — exact dense-grad semantics
      (duplicate ids sum, like scatter-add);
    * dense Adam on the (BLOCK, pack*D) p/m/v blocks in VMEM (all rows
      decayed, exactly optax.adam's math; bias corrections are computed
      outside the kernel — Mosaic cannot lower powf(traced)).

Host prep per table (train/streaming_embed.py, numpy or the native C++
builder): stable argsort of vocab ids by physical row + per-block chunk
pointers, padded to a STATIC chunk count so batches never recompile.

Measured v5e, bench shapes (26 x 100k-vocab packed tables, B=16384,
.scratch probes committed in tools/stream_probe snapshots): XLA
scatter-add 4.74 ms + optax Adam 2.98 ms = 7.7 ms -> XLA id-permute +
this kernel = 3.62 ms (block=512, ch=256, bf16 accumulate-to-f32).
The r1 'parked' design's blocker (a 3.4 ms cot permute at (1,128)
granularity) is dissolved by letting XLA's pipelined gather do the
permute (26 independent narrow gathers run concurrently at ~130 us each)
and by never needing a sort on device.

Reference perf surface: the embedding gather/update dominating every CTR
train loop (/root/reference/src/ctr/deep_fm/train.py:58-65 under dense
Keras Adam).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cptr_ref, corr_ref, ids_ref, cot_ref, p_ref, m_ref, v_ref,
            po_ref, mo_ref, vo_ref, g_scr,
            *, block, ch, pack, d, lr, b1, b2, eps, wd, mm_dtype, precision,
            streams, nc_s, nb1, p_dtype):
    k = pl.program_id(0)
    g_scr[...] = jnp.zeros_like(g_scr)

    lane_w = lax.broadcasted_iota(jnp.int32, (ch, pack * d), 1)
    row_iota = lax.broadcasted_iota(jnp.int32, (block, ch), 0)

    def chunk_body(row, _):
        buf = cot_ref[pl.ds(pl.multiple_of(row * ch, ch), ch), :]  # (ch, d)
        ids_row = ids_ref[pl.ds(row, 1), :]  # (1, ch) int32 vocab ids
        local = ids_row // pack - k * block  # (1, ch)
        onehot = (row_iota == local).astype(mm_dtype)  # (block, ch)
        if pack > 1:
            sub_col = (ids_row % pack).reshape(ch, 1)  # (ch, 1)
            tiled = jnp.concatenate([buf] * pack, axis=1)  # (ch, pack*d)
            spread = jnp.where(lane_w // d == sub_col, tiled, 0.0)
        else:
            spread = buf
        g_scr[...] += lax.dot_general(
            onehot, spread.astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        return 0

    # ``streams`` independently host-sorted chunk streams (one per data
    # shard under the local-prep contract; 1 under global prep).  Each
    # stream carries its own nb+1-entry cptr segment and a static
    # nc_s-chunk payload window; block k consumes every stream's
    # [cptr_s[k], cptr_s[k+1]) chunks.  The static python loop keeps the
    # single-stream case's code shape (and cost) exactly.
    for s in range(streams):
        c0 = cptr_ref[s * nb1 + k]
        c1 = cptr_ref[s * nb1 + k + 1]
        lax.fori_loop(c0 + s * nc_s, c1 + s * nc_s, chunk_body, 0)

    g = g_scr[...]
    # bf16 master tables read up to f32 for the update math (moments are
    # always f32); the write casts back to the table dtype
    p_cur = p_ref[...].astype(jnp.float32)
    if wd:
        # decoupled (AdamW-style) weight decay, matching the Trainer's
        # dense-path optax.adamw and the sparse path's masked decay
        decay = wd * p_cur
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * g * g
    upd = lr * (m * corr_ref[0]) / (jnp.sqrt(v * corr_ref[1]) + eps)
    if wd:
        upd = upd + lr * decay
    po_ref[...] = (p_cur - upd).astype(p_dtype)
    mo_ref[...] = m
    vo_ref[...] = v


@functools.partial(
    jax.jit,
    static_argnames=("block", "ch", "pack", "d", "lr", "b1", "b2", "eps",
                     "wd", "mm_bf16", "interpret", "streams"),
)
def fused_bwd_adam(
    p: jnp.ndarray,      # (V_phys, pack*d) f32 packed table
    m: jnp.ndarray,      # Adam moments, like p
    v: jnp.ndarray,
    cot_sorted: jnp.ndarray,  # (streams*nc_s*ch, d) cot rows, sorted per stream
    ids2d: jnp.ndarray,  # (streams*nc_s, ch) int32 vocab ids, sentinel-padded
    cptr: jnp.ndarray,   # (streams*(nb+1),) int32 chunk ptrs, one seg/stream
    step: jnp.ndarray,   # int32 1-based global step (bias correction)
    *,
    block: int = 512,
    ch: int = 256,
    pack: int = 8,
    d: int = 16,
    lr: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    wd: float = 0.0,
    mm_bf16: bool = True,
    interpret: bool = False,
    streams: int = 1,
):
    """One fused dense-Adam step for one packed table; returns (p, m, v).

    ``mm_bf16=True`` runs the grad-accumulation matmuls with bf16 inputs
    (f32 accumulation) — the right pairing for bf16-compute training, and
    what the bench measures.  ``mm_bf16=False`` keeps f32 inputs at
    Precision.HIGHEST (exact-f32 grads for f32-compute training).
    Sentinel ids (>= nb*block*pack) contribute nothing; the chunk padding
    rows of ``cot_sorted``/``ids2d`` are therefore inert.

    ``streams > 1`` (the host-local multihost data contract): the payload
    arrays concatenate ``streams`` INDEPENDENTLY sorted chunk streams —
    one per data shard, each host-prepped from that shard's local batch
    only — with per-stream cptr segments of nb+1 entries.  Block k sums
    every stream's chunks for k; the math equals the single-stream global
    sort up to f32 accumulation order across streams.
    """
    vp, wide = p.shape
    assert wide == pack * d, (wide, pack, d)
    nb = pl.cdiv(vp, block)
    assert cptr.shape[0] == streams * (nb + 1), (cptr.shape, streams, nb)
    assert ids2d.shape[0] % streams == 0, (ids2d.shape, streams)
    t = step.astype(jnp.float32)
    corr = jnp.stack([1.0 / (1.0 - b1 ** t), 1.0 / (1.0 - b2 ** t)])
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    precision = None if mm_bf16 else lax.Precision.HIGHEST
    if mm_bf16:
        cot_sorted = cot_sorted.astype(jnp.bfloat16)

    blk = lambda: pl.BlockSpec((block, wide), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # cptr, corr
        grid=(nb,),
        in_specs=[full(), full(), blk(), blk(), blk()],
        out_specs=(blk(), blk(), blk()),
        scratch_shapes=[pltpu.VMEM((block, wide), jnp.float32)],
    )
    kern = functools.partial(
        _kernel, block=block, ch=ch, pack=pack, d=d, lr=lr, b1=b1, b2=b2,
        eps=eps, wd=wd, mm_dtype=mm_dtype, precision=precision,
        streams=streams, nc_s=ids2d.shape[0] // streams, nb1=nb + 1,
        p_dtype=p.dtype,
    )
    return pl.pallas_call(
        kern,
        grid_spec=gs,
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(m.shape, m.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        input_output_aliases={4: 0, 5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cptr, corr, ids2d, cot_sorted, p, m, v)


# -- fused rowwise AdaGrad ----------------------------------------------------
#
# The DLRM-paper embedding optimizer: ONE accumulator scalar per vocab row
# (mean of the squared row gradient).  For wd=0 the dense update is
# IDENTICAL to the sparse touched-rows update (untouched rows see g=0:
# acc += 0, p -= 0), so this kernel is also the fast path for
# embedding_optimizer='rowwise_adagrad' semantics.  Optimizer-state traffic
# is pack*d/1 smaller than Adam's two moments: the whole update streams
# ~2.2x table bytes instead of ~6.2x.

def _adagrad_kernel(cptr_ref, hyp_ref, ids_ref, cot_ref, p_ref, a_ref,
                    po_ref, ao_ref, g_scr,
                    *, block, ch, pack, d, eps, wd, mm_dtype, precision,
                    streams, nc_s, nb1, p_dtype):
    k = pl.program_id(0)
    g_scr[...] = jnp.zeros_like(g_scr)

    lane_w = lax.broadcasted_iota(jnp.int32, (ch, pack * d), 1)
    row_iota = lax.broadcasted_iota(jnp.int32, (block, ch), 0)

    def chunk_body(row, _):
        buf = cot_ref[pl.ds(pl.multiple_of(row * ch, ch), ch), :]
        ids_row = ids_ref[pl.ds(row, 1), :]
        local = ids_row // pack - k * block
        onehot = (row_iota == local).astype(mm_dtype)
        if pack > 1:
            sub_col = (ids_row % pack).reshape(ch, 1)
            tiled = jnp.concatenate([buf] * pack, axis=1)
            spread = jnp.where(lane_w // d == sub_col, tiled, 0.0)
        else:
            spread = buf
        g_scr[...] += lax.dot_general(
            onehot, spread.astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        return 0

    # per-stream chunk windows, as in _kernel
    for s in range(streams):
        c0 = cptr_ref[s * nb1 + k]
        c1 = cptr_ref[s * nb1 + k + 1]
        lax.fori_loop(c0 + s * nc_s, c1 + s * nc_s, chunk_body, 0)

    lr = hyp_ref[0]
    g = g_scr[...]
    # per-sub-slot mean(g^2) and its lane spread, both as exact-coefficient
    # matmuls (no lane-splitting reshapes in Mosaic)
    wl = lax.broadcasted_iota(jnp.int32, (pack * d, pack), 0)
    sl = lax.broadcasted_iota(jnp.int32, (pack * d, pack), 1)
    m_mean = ((wl // d) == sl).astype(jnp.float32) / d  # (wide, pack)
    msq = lax.dot_general(
        g * g, m_mean, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )  # (block, pack)
    acc = a_ref[...] + msq
    denom = jnp.sqrt(acc) + eps  # (block, pack)
    wl2 = lax.broadcasted_iota(jnp.int32, (pack, pack * d), 1)
    sl2 = lax.broadcasted_iota(jnp.int32, (pack, pack * d), 0)
    m_spread = ((wl2 // d) == sl2).astype(jnp.float32)  # (pack, wide)
    denom_l = lax.dot_general(
        denom, m_spread, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )  # (block, wide)
    p_cur = p_ref[...].astype(jnp.float32)
    upd = lr * g / denom_l
    if wd:
        upd = upd + lr * wd * p_cur
    po_ref[...] = (p_cur - upd).astype(p_dtype)
    ao_ref[...] = acc


@functools.partial(
    jax.jit,
    static_argnames=("block", "ch", "pack", "d", "eps", "wd", "mm_bf16",
                     "interpret", "streams"),
)
def fused_bwd_rowwise_adagrad(
    p: jnp.ndarray,       # (V_phys, pack*d) f32 packed table
    acc: jnp.ndarray,     # (V_phys, pack) f32 rowwise accumulator
    cot_sorted: jnp.ndarray,
    ids2d: jnp.ndarray,
    cptr: jnp.ndarray,
    lr,
    *,
    block: int = 512,
    ch: int = 256,
    pack: int = 8,
    d: int = 16,
    eps: float = 1e-8,
    wd: float = 0.0,
    mm_bf16: bool = True,
    interpret: bool = False,
    streams: int = 1,
):
    """One fused rowwise-AdaGrad step for one packed table -> (p, acc).

    Same grad accumulation as :func:`fused_bwd_adam` (including the
    ``streams`` multi-stream form); the update keeps ONE f32 accumulator
    per vocab row (train/sparse_embed.rowwise_adagrad semantics; identical
    to the sparse path at wd=0, dense decoupled decay otherwise).
    """
    vp, wide = p.shape
    assert wide == pack * d and acc.shape == (vp, pack)
    nb = pl.cdiv(vp, block)
    assert cptr.shape[0] == streams * (nb + 1), (cptr.shape, streams, nb)
    assert ids2d.shape[0] % streams == 0, (ids2d.shape, streams)
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    precision = None if mm_bf16 else lax.Precision.HIGHEST
    if mm_bf16:
        cot_sorted = cot_sorted.astype(jnp.bfloat16)
    hyp = jnp.asarray([lr], jnp.float32)

    blk = lambda w: pl.BlockSpec((block, w), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # cptr, hyp
        grid=(nb,),
        in_specs=[full(), full(), blk(wide), blk(pack)],
        out_specs=(blk(wide), blk(pack)),
        scratch_shapes=[pltpu.VMEM((block, wide), jnp.float32)],
    )
    kern = functools.partial(
        _adagrad_kernel, block=block, ch=ch, pack=pack, d=d, eps=eps, wd=wd,
        mm_dtype=mm_dtype, precision=precision,
        streams=streams, nc_s=ids2d.shape[0] // streams, nb1=nb + 1,
        p_dtype=p.dtype,
    )
    return pl.pallas_call(
        kern,
        grid_spec=gs,
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        ),
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cptr, hyp, ids2d, cot_sorted, p, acc)
