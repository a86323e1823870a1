"""Pallas TPU kernel: fused masked attention (flash-style online softmax).

Fused SDPA for the framework's attention ops (AutoInt interacting layers,
SASRec encoder blocks, DIN target attention) replacing the materialised
(S_q, S_k) logits + softmax + matmul of the jnp reference
(recsys_tpu/kernels/attention.py) with a blockwise kernel: Q blocks stay in
VMEM while K/V blocks stream; softmax is computed online (running max and
normaliser), so HBM traffic is O(S) not O(S^2) — the long-history SASRec
scaling path SURVEY.md §5 calls for.

Supports a key-padding mask (B, S_k) and optional causal masking.
Grid: (batch*heads, q_blocks, k_blocks); k is the innermost (fastest)
dimension, so the VMEM accumulator scratch carries across the k sweep.

Default tile 512x512 (measured on v5e, B*H=512, D=64, causal fwd+bwd vs
XLA's fused softmax: S=512 10.2 vs 13.0 ms, S=1024 27.7 vs 44.4 ms; the
original 128x128 tiles LOST to XLA at those sizes — 60.7 vs 43.1 ms at
S=1024 — too many grid steps per useful matmul).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale: float, causal: bool, blk_q: int, blk_k: int, sk: int,
    precision,
):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)
    qb = pl.program_id(1)
    g = pl.program_id(0)  # hoisted: program_id is illegal inside pl.when

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # causal early exit: a kv block strictly above this q block's diagonal
    # contributes nothing — skip its matmuls entirely (≈2x fewer FLOPs)
    if causal:
        needed = kb * blk_k <= qb * blk_q + (blk_q - 1)
    else:
        needed = kb >= 0  # always true (traced)

    @pl.when(needed)
    def _body():
        # key positions past the real sequence end are block padding: their
        # k/v contents are undefined (can be NaN) — exclude them everywhere
        # and zero v so 0-weight x garbage can't produce NaN.
        k_ids_row = (
            jax.lax.broadcasted_iota(jnp.int32, (blk_k, 1), 0)[:, 0]
            + kb * blk_k
        )
        k_valid = k_ids_row < sk  # (blk_k,)

        q = q_ref[0].astype(jnp.float32)  # (blk_q, D)
        k = k_ref[0].astype(jnp.float32)  # (blk_k, D)
        v = v_ref[0].astype(jnp.float32)  # (blk_k, D)
        v = jnp.where(k_valid[:, None], v, 0.0)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale  # (blk_q, blk_k)

        # mask block carries ALL bh rows (Mosaic tiling forbids a 1-row
        # block); select this program's row dynamically
        row = mask_ref[pl.ds(g, 1), :]  # (1, blk_k)
        kmask = (row[0] > 0) & k_valid  # (blk_k,)
        s = jnp.where(kmask[None, :].reshape(1, -1), s, NEG_INF)
        if causal:
            q_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)
                + qb * blk_q
            )
            k_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
                + kb * blk_k
            )
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)

        m_prev = m_ref[:]  # (blk_q, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard: when every key so far is masked m_new == NEG_INF and the
        # naive exp(s - m_new) would be exp(0) = 1 for masked entries
        p = jnp.where(s > NEG_INF / 2, jnp.exp(s - m_new), 0.0)
        correction = jnp.exp(m_prev - m_new)  # (blk_q, 1)
        l_ref[:] = l_ref[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        m_ref[:] = m_new

    @pl.when(kb == nk - 1)
    def _finalize():
        # fully-masked rows have l == 0; emit 0 (matches masked-out queries)
        l = l_ref[:]
        out_ref[0] = jnp.where(l > 0, acc_ref[:] / jnp.maximum(l, 1e-30), 0.0)
        # per-row logsumexp residual for the backward kernels
        lse_ref[0] = jnp.where(
            l > 0, m_ref[:] + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF
        )


@functools.partial(
    jax.jit, static_argnames=("causal", "blk_q", "blk_k", "interpret",
                          "precision")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    causal: bool = False,
    blk_q: int = 512,
    blk_k: int = 512,
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """q (B, H, Sq, D), k/v (B, H, Sk, D), mask (B, Sk) key-padding
    (1 = attend).  Returns (B, H, Sq, D) in q's dtype."""
    out, _ = flash_attention_fwd(
        q, k, v, mask, causal=causal, blk_q=blk_q, blk_k=blk_k,
        interpret=interpret, precision=precision,
    )
    return out


def _prep(q, k, v, mask, blk_q, blk_k):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bh = b * h
    qr = q.reshape(bh, sq, d)
    kr = k.reshape(bh, sk, d)
    vr = v.reshape(bh, sk, d)
    if mask is None:
        mask = jnp.ones((b, sk), jnp.int32)
    maskr = jnp.repeat(mask.astype(jnp.int32), h, axis=0)  # (bh, Sk)
    return qr, kr, vr, maskr, bh, sq, sk, d, min(blk_q, sq), min(blk_k, sk)


def _params(interpret, semantics):
    return None if interpret else pltpu.CompilerParams(
        dimension_semantics=semantics
    )


@functools.partial(
    jax.jit, static_argnames=("causal", "blk_q", "blk_k", "interpret",
                          "precision")
)
def flash_attention_fwd(
    q, k, v, mask=None, *, causal=False, blk_q=512, blk_k=512,
    interpret=False, precision=None,
):
    """Forward pass returning (out, lse) — lse (B, H, Sq) feeds the
    backward kernels."""
    b, h = q.shape[:2]
    qr, kr, vr, maskr, bh, sq, sk, d, blk_q, blk_k = _prep(
        q, k, v, mask, blk_q, blk_k
    )
    scale = 1.0 / (d ** 0.5)
    grid = (bh, pl.cdiv(sq, blk_q), pl.cdiv(sk, blk_k))
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, causal=causal,
            blk_q=blk_q, blk_k=blk_k, sk=sk, precision=precision,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, blk_k), lambda g, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, 1), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, d), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
        ],
        # batch*heads and q blocks are independent (megacore-parallel);
        # the kv sweep is the online-softmax reduction.  (interpret mode
        # rejects compiler params, so only set them for real lowering.)
        compiler_params=_params(interpret,
                                ("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qr, kr, vr, maskr)
    return (
        out.reshape(b, h, sq, d).astype(q.dtype),
        lse.reshape(b, h, sq),
    )


def _recompute_p(q, k, mask_row, lse, scale, causal, qb, kb,
                 blk_q, blk_k, sk, precision):
    """Shared backward helper: softmax probabilities for one (q, k) block."""
    k_ids_row = (
        jax.lax.broadcasted_iota(jnp.int32, (blk_k, 1), 0)[:, 0] + kb * blk_k
    )
    k_valid = k_ids_row < sk
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) * scale  # (blk_q, blk_k)
    kmask = (mask_row > 0) & k_valid
    s = jnp.where(kmask[None, :].reshape(1, -1), s, NEG_INF)
    if causal:
        q_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)
            + qb * blk_q
        )
        k_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
            + kb * blk_k
        )
        s = jnp.where(q_ids >= k_ids, s, NEG_INF)
    # p = exp(s - lse); fully-masked rows have lse = NEG_INF -> p = 0
    p = jnp.where(
        (s > NEG_INF / 2) & (lse > NEG_INF / 2), jnp.exp(s - lse), 0.0
    )
    return p, k_valid


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, lse_ref, do_ref, delta_ref, dq_ref,
    dq_acc, *, scale, causal, blk_q, blk_k, sk, precision,
):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)
    qb = pl.program_id(1)
    g = pl.program_id(0)

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    if causal:
        needed = kb * blk_k <= qb * blk_q + (blk_q - 1)
    else:
        needed = kb >= 0

    @pl.when(needed)
    def _body():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]  # (blk_q, 1)
        delta = delta_ref[0]  # (blk_q, 1)
        row = mask_ref[pl.ds(g, 1), :][0]
        p, _ = _recompute_p(q, k, row, lse, scale, causal, qb, kb,
                            blk_q, blk_k, sk, precision)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # (blk_q, blk_k)
        ds = p * (dp - delta)
        dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale

    @pl.when(kb == nk - 1)
    def _emit():
        dq_ref[0] = dq_acc[:]


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, lse_ref, do_ref, delta_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale, causal, blk_q, blk_k, sk, precision,
):
    qb = pl.program_id(2)  # q innermost here
    nq = pl.num_programs(2)
    kb = pl.program_id(1)
    g = pl.program_id(0)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    if causal:
        needed = kb * blk_k <= qb * blk_q + (blk_q - 1)
    else:
        needed = qb >= 0

    @pl.when(needed)
    def _body():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]
        delta = delta_ref[0]
        row = mask_ref[pl.ds(g, 1), :][0]
        p, _ = _recompute_p(q, k, row, lse, scale, causal, qb, kb,
                            blk_q, blk_k, sk, precision)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # (blk_k, D)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - delta)  # (blk_q, blk_k)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale

    @pl.when(qb == nq - 1)
    def _emit():
        dk_ref[0] = dk_acc[:]
        dv_ref[0] = dv_acc[:]


@functools.partial(
    jax.jit, static_argnames=("causal", "blk_q", "blk_k", "interpret",
                          "precision")
)
def flash_attention_bwd(
    q, k, v, mask, out, lse, do, *, causal=False, blk_q=512, blk_k=512,
    interpret=False, precision=None,
):
    """Backward pass: returns (dq, dk, dv) given forward residuals."""
    b, h = q.shape[:2]
    qr, kr, vr, maskr, bh, sq, sk, d, blk_q, blk_k = _prep(
        q, k, v, mask, blk_q, blk_k
    )
    scale = 1.0 / (d ** 0.5)
    dor = do.reshape(bh, sq, d).astype(jnp.float32)
    outr = out.reshape(bh, sq, d).astype(jnp.float32)
    lser = lse.reshape(bh, sq, 1)
    delta = jnp.sum(dor * outr, axis=-1, keepdims=True)  # (bh, sq, 1)

    common_in = [
        pl.BlockSpec((1, blk_q, d), lambda g, i, j: (g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda g, i, j: (g, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda g, i, j: (g, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bh, blk_k), lambda g, i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_q, 1), lambda g, i, j: (g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_q, d), lambda g, i, j: (g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_q, 1), lambda g, i, j: (g, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, causal=causal,
            blk_q=blk_q, blk_k=blk_k, sk=sk, precision=precision,
        ),
        grid=(bh, pl.cdiv(sq, blk_q), pl.cdiv(sk, blk_k)),
        in_specs=common_in,
        out_specs=pl.BlockSpec((1, blk_q, d), lambda g, i, j: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
        compiler_params=_params(interpret,
                                ("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qr, kr, vr, maskr, lser, dor, delta)

    # dk/dv sweep: k blocks outer, q blocks inner (the reduction)
    dkv_in = [
        pl.BlockSpec((1, blk_q, d), lambda g, j, i: (g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda g, j, i: (g, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda g, j, i: (g, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bh, blk_k), lambda g, j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_q, 1), lambda g, j, i: (g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_q, d), lambda g, j, i: (g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_q, 1), lambda g, j, i: (g, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, causal=causal,
            blk_q=blk_q, blk_k=blk_k, sk=sk, precision=precision,
        ),
        grid=(bh, pl.cdiv(sk, blk_k), pl.cdiv(sq, blk_q)),
        in_specs=dkv_in,
        out_specs=(
            pl.BlockSpec((1, blk_k, d), lambda g, j, i: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda g, j, i: (g, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, sk, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_k, d), jnp.float32),
            pltpu.VMEM((blk_k, d), jnp.float32),
        ],
        compiler_params=_params(interpret,
                                ("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qr, kr, vr, maskr, lser, dor, delta)

    shape = (b, h, sq, d)
    kshape = (b, h, sk, d)
    return (
        dq.reshape(shape).astype(q.dtype),
        dk.reshape(kshape).astype(k.dtype),
        dv.reshape(kshape).astype(v.dtype),
    )
