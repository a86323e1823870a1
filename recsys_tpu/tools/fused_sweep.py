"""Geometry sweep for the fused streaming embedding update kernel.

The fused backward+Adam phase measures 3.53 ms vs a 1.32 ms HBM bound
(BENCH_BREAKDOWN_r04) and round 3 pinned the gap on the chunk loop, not
bandwidth: each (block, ch) kernel runs ~(B/ch + vp/block) fori
iterations per table, and the per-iteration fixed cost (dynamic slices,
one-hot build, control) dominates the streamed bytes.  Larger ch cuts
B/ch; larger block cuts vp/block (fewer grid programs and boundary
chunks) at the price of more one-hot MXU work (~2*pack*d*(B*block +
vp*ch) FLOPs/table) and a bigger VMEM block.

This times the EXACT phase composition the bench runs (XLA cotangent
permute + fused_bwd_adam over the 26 bench tables, scan-chained, one
scalar fetch) across a (block, ch) grid, on the current backend.
Geometry changes host-prep output shapes too, so each point re-preps.

Run: python -m recsys_tpu.tools.fused_sweep [--iters 20]
     [--blocks 256,512,1024,2048] [--chs 128,256,512,1024]
     [--out artifacts/fused_sweep.json]
One JSON object on stdout; markdown table on stderr.  A Mosaic compile
failure at a point (VMEM overflow) is recorded verbatim, not fatal.
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.tools.roofline import (
    EMBED_DIM, NUM_SPARSE, VOCAB, time_chained,
)

WIDE = 128
PACK = WIDE // EMBED_DIM
BATCH = 16384


def time_point(block: int, ch: int, iters: int,
               tables, cots, ids_np) -> dict:
    from recsys_tpu.kernels import use_pallas
    from recsys_tpu.kernels.pallas.embedding_update_tpu import fused_bwd_adam
    from recsys_tpu.train.streaming_embed import host_prep_group

    vp = tables[0].shape[0]
    prep = [host_prep_group(ids_np[g], pack=PACK, vp=vp, block=block, ch=ch)
            for g in range(NUM_SPARSE)]
    ids2ds = [jnp.asarray(p[0]) for p in prep]
    idxs = [jnp.asarray(p[1]) for p in prep]
    cptrs = [jnp.asarray(p[2]) for p in prep]
    interp = not use_pallas()

    def fn(carry):
        ts, ms, vs, t = carry
        outs = []
        for g in range(NUM_SPARSE):
            cs = jnp.take(cots[g], idxs[g], axis=0).astype(jnp.bfloat16)
            outs.append(fused_bwd_adam(
                ts[g], ms[g], vs[g], cs, ids2ds[g], cptrs[g], t,
                block=block, ch=ch, pack=PACK, d=EMBED_DIM,
                interpret=interp,
            ))
        return ([o[0] for o in outs], [o[1] for o in outs],
                [o[2] for o in outs], t + 1)

    carry = (list(tables), [jnp.zeros_like(t) for t in tables],
             [jnp.zeros_like(t) for t in tables], jnp.int32(1))
    ms = time_chained(fn, carry, iters)
    nb = -(-vp // block)
    nc = prep[0][0].shape[0]
    return {"block": block, "ch": ch, "ms": round(ms, 3),
            "chunks_per_table": nc, "blocks_per_table": nb}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--blocks", default="256,512,1024,2048")
    p.add_argument("--chs", default="128,256,512,1024")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    rng = np.random.default_rng(0)
    vp = -(-VOCAB // PACK)
    vp += (-vp) % 8
    keys = jax.random.split(jax.random.PRNGKey(0), NUM_SPARSE)
    tables = [jax.random.uniform(k, (vp, WIDE), minval=-0.05, maxval=0.05)
              for k in keys]
    ids_np = [rng.integers(0, VOCAB, BATCH).astype(np.int32)
              for _ in range(NUM_SPARSE)]
    cots = [jnp.asarray(rng.standard_normal((BATCH, EMBED_DIM)),
                        jnp.float32) * 1e-2 for _ in range(NUM_SPARSE)]

    points = []
    for block in (int(x) for x in args.blocks.split(",")):
        for ch in (int(x) for x in args.chs.split(",")):
            try:
                pt = time_point(block, ch, args.iters, tables, cots,
                                ids_np)
            except Exception as e:  # Mosaic VMEM overflow etc: record it
                pt = {"block": block, "ch": ch,
                      "error": f"{type(e).__name__}: {str(e)[:200]}"}
            points.append(pt)
            sys.stderr.write(f"{pt}\n")

    ok = [p_ for p_ in points if "ms" in p_]
    rep = {"device": jax.devices()[0].device_kind, "batch": BATCH,
           "tables": NUM_SPARSE, "vp": vp, "points": points}
    if ok:
        best = min(ok, key=lambda p_: p_["ms"])
        rep["best"] = best
        base = next((p_ for p_ in ok
                     if p_["block"] == 512 and p_["ch"] == 256), None)
        if base:
            rep["best_vs_default"] = round(base["ms"] / best["ms"], 3)

    payload = json.dumps(rep)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload + "\n")
        with open(args.out) as f:
            if not f.read().rstrip().endswith(payload):
                raise RuntimeError(f"artifact write failed at {args.out!r}")
    print(payload)


if __name__ == "__main__":
    main()
