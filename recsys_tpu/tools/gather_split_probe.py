"""Zipf-split forward gather experiment (VERDICT r3 next-step #9).

The forward embedding gather is the last DLRM phase pinned at XLA's ~90
GB/s random-gather floor (roofline: 2.09 ms vs a 0.27 ms HBM bound).  The
host already computes per-step id histograms for the fused update's prep —
this probe asks whether splitting the traffic by popularity buys anything:

  hot path  — the top-H physical rows per table (H=1024 -> 512 KB, VMEM-
              resident) cover most of a Zipf batch; gather them with a
              Pallas one-hot MATMUL from the staged hot buffer (MXU work
              instead of HBM random access, the same trick the fused
              update kernel uses for scatter).
  cold path — the tail goes through XLA's pipelined gather as before.
  recombine — one (n, d) take back into batch order (cost included).

Measures, per variant on bench shapes (26 x 100k-vocab packed tables,
D=16, B=16384, Zipf(1.1) ids like realistic traffic — NOTE the bench's own
batch is uniform, where a hot split cannot help by construction):

  xla_full    — the production path (jnp.take + packed_select x26)
  split       — hot-buffer staging + Pallas hot matmul-gather + XLA cold
                gather + batch-order recombine

Run: python -m recsys_tpu.tools.gather_split_probe [--zipf 1.1] [--hot 1024]
One JSON object on stdout; the verdict (win or loss, with numbers) goes to
BASELINE.md either way.
"""
from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recsys_tpu.kernels.embedding import packed_gather
from recsys_tpu.tools.roofline import (
    EMBED_DIM, NUM_SPARSE, VOCAB, _opaque_zero_i32, time_chained,
)

# bench shapes, derived from the roofline's single source of truth
NUM_TABLES = NUM_SPARSE
D = EMBED_DIM
WIDE = 128          # one physical row = one 128-lane register row
PACK = WIDE // D
BATCH = 16384       # bench.py's saturating batch
CH = 256


def _zipf_ids(rng, s: float, n: int) -> np.ndarray:
    p = 1.0 / np.arange(1, VOCAB + 1) ** s
    p /= p.sum()
    perm = rng.permutation(VOCAB)  # ids are hash-like, not rank-ordered
    return perm[rng.choice(VOCAB, size=n, p=p)].astype(np.int32)


# -- Pallas hot gather: one-hot matmul from a VMEM-resident hot buffer ------
def _hot_gather_kernel(idx_ref, hot_ref, out_ref, *, ch, pack, d,
                       mm_dtype, precision):
    k = pl.program_id(0)
    idx_row = idx_ref[pl.ds(k, 1), :]  # (1, ch) int32 hot ids: slot*pack+sub
    slot = idx_row.reshape(ch, 1) // pack
    h = hot_ref.shape[0]
    col = lax.broadcasted_iota(jnp.int32, (ch, h), 1)
    onehot = (col == slot).astype(mm_dtype)  # sentinel slots match nothing
    wide = lax.dot_general(
        onehot, hot_ref[...].astype(mm_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (ch, pack*d)
    sub = idx_row.reshape(ch, 1) % pack
    lane = lax.broadcasted_iota(jnp.int32, (ch, pack * d), 1)
    masked = jnp.where(lane // d == sub, wide, 0.0)
    # lane compress (pack*d -> d) as an exact-coefficient matmul (no lane
    # reshapes in Mosaic): out[c, j] = sum_l masked[c, l] * [l % d == j]
    lc = lax.broadcasted_iota(jnp.int32, (pack * d, d), 0)
    jc = lax.broadcasted_iota(jnp.int32, (pack * d, d), 1)
    comp = ((lc % d) == jc).astype(jnp.float32)
    out_ref[...] = lax.dot_general(
        masked, comp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("pack", "d", "ch", "mm_bf16",
                                             "interpret"))
def hot_gather_pallas(hot_buf, hot_idx2d, *, pack, d, ch=CH, mm_bf16=True,
                      interpret=False):
    """hot_buf (H, pack*d) f32 VMEM-resident; hot_idx2d (nc, ch) int32 hot
    vocab-slot ids (slot*pack + sub; sentinel >= H*pack selects nothing)
    -> (nc*ch, d)."""
    nc = hot_idx2d.shape[0]
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    precision = None if mm_bf16 else lax.Precision.HIGHEST
    kern = functools.partial(_hot_gather_kernel, ch=ch, pack=pack, d=d,
                             mm_dtype=mm_dtype, precision=precision)
    out = pl.pallas_call(
        kern,
        grid=(nc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ch, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc * ch, d), jnp.float32),
        interpret=interpret,
    )(hot_idx2d, hot_buf)
    return out


def host_split(ids: np.ndarray, hot_n: int):
    """Per-table host prep: top-hot_n physical rows by batch count.

    Returns (hot_rows (hot_n,), hot_idx2d (nc, CH) int32 sentinel-padded,
    positions (n,) int32 = concat(hot positions, cold positions),
    cold_ids (n_cold_cap,) padded with id 0, n_hot, n_cold)."""
    prow = ids // PACK
    counts = np.bincount(prow, minlength=VOCAB // PACK + 1)
    hot_rows = np.argsort(-counts, kind="stable")[:hot_n].astype(np.int32)
    hot_slot_of = np.full(counts.shape[0], -1, np.int32)
    hot_slot_of[hot_rows] = np.arange(hot_n, dtype=np.int32)
    slot = hot_slot_of[prow]
    is_hot = slot >= 0
    hot_pos = np.nonzero(is_hot)[0].astype(np.int32)
    cold_pos = np.nonzero(~is_hot)[0].astype(np.int32)
    n_hot = len(hot_pos)
    nc = -(-n_hot // CH)
    sentinel = np.int32(hot_n * PACK)
    hot_idx = np.full(nc * CH, sentinel, np.int32)
    hot_idx[:n_hot] = slot[hot_pos] * PACK + (ids[hot_pos] % PACK)
    cold_ids = ids[cold_pos]
    positions = np.concatenate([hot_pos, cold_pos])
    inv = np.empty_like(positions)
    inv[positions] = np.arange(len(positions), dtype=np.int32)
    return (hot_rows, hot_idx.reshape(nc, CH), inv, cold_ids,
            n_hot, len(cold_pos))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--zipf", type=float, default=1.1)
    p.add_argument("--hot", type=int, default=1024)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--uniform", action="store_true",
                   help="use the bench's uniform ids instead of Zipf")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from recsys_tpu.kernels import use_pallas

    interp = not use_pallas()
    rng = np.random.default_rng(0)
    vp = -(-VOCAB // PACK)
    vp += (-vp) % 8
    keys = jax.random.split(jax.random.PRNGKey(0), NUM_TABLES)
    tables = [jax.random.uniform(k, (vp, WIDE), minval=-0.05, maxval=0.05)
              for k in keys]
    if args.uniform:
        ids_np = [rng.integers(0, VOCAB, BATCH).astype(np.int32)
                  for _ in range(NUM_TABLES)]
    else:
        ids_np = [_zipf_ids(rng, args.zipf, BATCH)
                  for _ in range(NUM_TABLES)]
    ids = [jnp.asarray(a) for a in ids_np]

    # baseline: the production XLA path
    def xla_full(s):
        shift = _opaque_zero_i32(s)
        total = 0.0
        for g in range(NUM_TABLES):
            e = packed_gather(tables[g], ids[g] + shift, PACK, D)
            total = total + jnp.sum(e)
        return jnp.abs(jnp.tanh(total * 1e-12))

    ms_xla = time_chained(xla_full, jnp.float32(0.5), args.iters)

    # split variant
    preps = [host_split(a, args.hot) for a in ids_np]
    coverage = float(np.mean([pr[4] / BATCH for pr in preps]))
    hot_rows = [jnp.asarray(pr[0]) for pr in preps]
    hot_idx = [jnp.asarray(pr[1]) for pr in preps]
    invs = [jnp.asarray(pr[2]) for pr in preps]
    cold_ids = [jnp.asarray(pr[3]) for pr in preps]

    def split_fn(s):
        shift = _opaque_zero_i32(s)
        total = 0.0
        for g in range(NUM_TABLES):
            hot_buf = jnp.take(tables[g], hot_rows[g] + shift, axis=0)
            hot_out = hot_gather_pallas(hot_buf, hot_idx[g], pack=PACK,
                                        d=D, interpret=interp)
            n_hot = preps[g][4]
            cold_out = packed_gather(tables[g], cold_ids[g] + shift,
                                     PACK, D)
            both = jnp.concatenate([hot_out[:n_hot], cold_out], axis=0)
            e = jnp.take(both, invs[g], axis=0)  # batch-order recombine
            total = total + jnp.sum(e)
        return jnp.abs(jnp.tanh(total * 1e-12))

    ms_split = time_chained(split_fn, jnp.float32(0.5), args.iters)

    # correctness of the split path (values must match the XLA gather)
    g = 0
    hot_buf = jnp.take(tables[g], hot_rows[g], axis=0)
    hot_out = hot_gather_pallas(hot_buf, hot_idx[g], pack=PACK, d=D,
                                interpret=interp)
    both = jnp.concatenate(
        [hot_out[: preps[g][4]],
         packed_gather(tables[g], cold_ids[g], PACK, D)], axis=0)
    got = np.asarray(jnp.take(both, invs[g], axis=0))
    want = np.asarray(packed_gather(tables[g], ids[g], PACK, D))
    max_err = float(np.abs(got - want).max())

    rep = {
        "device": jax.devices()[0].device_kind,
        "batch": BATCH, "tables": NUM_TABLES, "hot_rows": args.hot,
        "distribution": "uniform" if args.uniform else f"zipf({args.zipf})",
        "hot_coverage": round(coverage, 4),
        "xla_full_ms": round(ms_xla, 3),
        "split_ms": round(ms_split, 3),
        "speedup": round(ms_xla / ms_split, 3),
        "max_abs_err": max_err,
    }
    sys.stderr.write(f"{rep}\n")
    payload = json.dumps(rep)
    if args.out:
        # append (one JSON line per variant); re-read the tail to verify
        # THIS run's payload actually landed in the artifact
        with open(args.out, "a") as f:
            f.write(payload + "\n")
        with open(args.out) as f:
            if not f.read().rstrip().endswith(payload):
                raise RuntimeError(f"artifact write did not land in "
                                   f"{args.out!r}")
    print(payload)


if __name__ == "__main__":
    main()
