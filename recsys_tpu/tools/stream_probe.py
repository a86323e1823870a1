"""Committed, re-runnable versions of the round-3 streaming-ceiling probes.

Round 3's honest-accounting narrative ("the fused update phase is bounded
by a ~430 GB/s effective streaming ceiling, not the 819 GB/s spec sheet;
XLA's random gather runs ~90 GB/s over 26 concurrent tables; per-row VMEM
access inside a Pallas kernel costs ~45 cycles/row") lived only in commit
messages — VERDICT r3 weak #3 asked for the probes as runnable artifacts.
This is them, at the bench shapes (26 x 100k-vocab packed tables, D=16,
pack=8 -> (12504, 128) f32 per table, B=16384):

probe 1 — streaming ceiling: optax's fused Adam elementwise pass over the
  26 tables (reads p/m/v/g, writes p/m/v -> 7x table bytes) and a
  hand-rolled Pallas equivalent of the same pass.  Effective GB/s of both
  is the real elementwise-stream ceiling the update phases compete with.
probe 2 — XLA random-gather floor: 26 concurrent narrow gathers of B
  uniform physical rows each.  The rate here is the floor for every
  batch-order <-> sorted-order crossing, and why the fused path leaves the
  cotangent permute to XLA (kernels/pallas/embedding_update_tpu.py).
probe 3 — in-kernel per-row access: a Pallas kernel walking a VMEM block
  one (1, wide) row at a time (dynamic-slice read + accumulate), the
  access pattern a per-row gather/scatter kernel would need.  Reported as
  ns/row and cycles/row at the v5e's published 940 MHz core clock — the
  measured ~8x disadvantage vs XLA's pipelined gather is the reason the
  permute is NOT in-kernel.

Run: python -m recsys_tpu.tools.stream_probe [--out artifacts/stream_probe.json]
Prints one JSON object on stdout; human summary on stderr.
"""
from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from recsys_tpu.tools.roofline import (
    EMBED_DIM, NUM_SPARSE, SPECS, VOCAB, _opaque_zero_i32, time_chained,
)

# bench shapes, derived from the roofline's single source of truth
NUM_TABLES = NUM_SPARSE
D = EMBED_DIM
WIDE = 128          # one physical row = one 128-lane register row
PACK = WIDE // D
BATCH = 16384       # bench.py's saturating batch

_CLOCK_HZ = {"TPU v5 lite": 940e6}  # published v5e core clock


def _tables(rng):
    vp = -(-VOCAB // PACK)
    vp += (-vp) % 8
    keys = jax.random.split(jax.random.PRNGKey(0), NUM_TABLES)
    ps = [jax.random.uniform(k, (vp, WIDE), minval=-0.05, maxval=0.05)
          for k in keys]
    return vp, ps


def probe_adam_stream(iters: int) -> dict:
    """optax fused Adam over 26 tables: 7x table bytes per pass."""
    rng = np.random.default_rng(0)
    vp, ps = _tables(rng)
    gs = [jax.random.normal(k, (vp, WIDE)) * 1e-3
          for k in jax.random.split(jax.random.PRNGKey(1), NUM_TABLES)]
    tx = optax.adam(1e-3)

    def fn(carry):
        params, opt = carry
        upd, opt = tx.update(gs, opt, params)
        return (optax.apply_updates(params, upd), opt)

    ms = time_chained(fn, (ps, tx.init(ps)), iters)
    table_bytes = NUM_TABLES * vp * WIDE * 4
    gbs = 7 * table_bytes / (ms / 1e3) / 1e9
    return {"ms": round(ms, 3), "traffic_gb": round(7 * table_bytes / 1e9, 3),
            "effective_gb_s": round(gbs, 1)}


def _pallas_adam_kernel(p_ref, m_ref, v_ref, g_ref, po_ref, mo_ref, vo_ref,
                        *, b1, b2, eps, lr):
    g = g_ref[...]
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * g * g
    po_ref[...] = p_ref[...] - lr * m / (jnp.sqrt(v) + eps)
    mo_ref[...] = m
    vo_ref[...] = v


def probe_pallas_adam_stream(iters: int) -> dict:
    """Hand-written Pallas elementwise Adam (no bias correction — pure
    stream): same 7x traffic, shows the ceiling is the machine's, not
    optax's codegen."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from recsys_tpu.kernels import use_pallas

    rng = np.random.default_rng(0)
    vp, ps = _tables(rng)
    gs = [jax.random.normal(k, (vp, WIDE)) * 1e-3
          for k in jax.random.split(jax.random.PRNGKey(1), NUM_TABLES)]
    block = 1024
    nb = pl.cdiv(vp, block)
    blk = pl.BlockSpec((block, WIDE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_pallas_adam_kernel, b1=0.9, b2=0.999,
                             eps=1e-8, lr=1e-3)

    def one(p, m, v, g):
        return pl.pallas_call(
            kern, grid=(nb,), in_specs=[blk] * 4, out_specs=(blk,) * 3,
            out_shape=(jax.ShapeDtypeStruct(p.shape, p.dtype),) * 3,
            input_output_aliases={0: 0, 1: 1, 2: 2},
            interpret=not use_pallas(),
        )(p, m, v, g)

    def fn(carry):
        ps, ms, vs = carry
        outs = [one(p, m, v, g) for p, m, v, g in zip(ps, ms, vs, gs)]
        return ([o[0] for o in outs], [o[1] for o in outs],
                [o[2] for o in outs])

    zero = [jnp.zeros_like(p) for p in ps]
    ms_t = time_chained(fn, (ps, list(zero), list(zero)), iters)
    table_bytes = NUM_TABLES * vp * WIDE * 4
    gbs = 7 * table_bytes / (ms_t / 1e3) / 1e9
    return {"ms": round(ms_t, 3), "effective_gb_s": round(gbs, 1)}


def probe_random_gather(iters: int) -> dict:
    """26 concurrent narrow gathers of B uniform rows (the cot permute /
    fwd lookup pattern)."""
    rng = np.random.default_rng(0)
    vp, ps = _tables(rng)
    ids = [jnp.asarray(rng.integers(0, vp, BATCH, dtype=np.int64)
                       .astype(np.int32)) for _ in range(NUM_TABLES)]

    def fn(s):
        shift = _opaque_zero_i32(s)
        total = 0.0
        for g in range(NUM_TABLES):
            total = total + jnp.sum(jnp.take(ps[g], ids[g] + shift, axis=0))
        return jnp.abs(jnp.tanh(total * 1e-12))

    ms = time_chained(fn, jnp.float32(0.5), iters)
    bytes_moved = NUM_TABLES * BATCH * WIDE * 4  # rows read (writes ~free)
    return {"ms": round(ms, 3),
            "gathered_gb": round(bytes_moved / 1e9, 3),
            "effective_gb_s": round(bytes_moved / (ms / 1e3) / 1e9, 1)}


def probe_gather_bytes_vs_rows(iters: int) -> dict:
    """Is the random-gather floor BYTE-bound or ROW-bound?  Same 26 x B
    uniform row gathers against three row widths: f32x128 (the production
    512 B packed row), bf16x128 (256 B — what a bf16 shadow copy of the
    tables would serve the forward gather from), and f32x64 (256 B by
    width).  If halving row bytes halves the time, the floor is bandwidth
    and a bf16 shadow table is worth its (small) extra update-write cost;
    if the time barely moves, the floor is per-row DMA issue latency and
    no byte diet can help (round-4 verdict lives in BASELINE.md)."""
    rng = np.random.default_rng(0)
    vp, ps = _tables(rng)
    ids = [jnp.asarray(rng.integers(0, vp, BATCH, dtype=np.int64)
                       .astype(np.int32)) for _ in range(NUM_TABLES)]

    def run(tabs, row_bytes):
        def fn(s):
            shift = _opaque_zero_i32(s)
            total = 0.0
            for g in range(NUM_TABLES):
                e = jnp.take(tabs[g], ids[g] + shift, axis=0)
                total = total + jnp.sum(e.astype(jnp.float32))
            return jnp.abs(jnp.tanh(total * 1e-12))

        ms = time_chained(fn, jnp.float32(0.5), iters)
        gb = NUM_TABLES * BATCH * row_bytes / 1e9
        return {"ms": round(ms, 3), "row_bytes": row_bytes,
                "effective_gb_s": round(gb / (ms / 1e3), 1)}

    out = {
        "f32_w128": run(ps, WIDE * 4),
        "bf16_w128": run([p.astype(jnp.bfloat16) for p in ps], WIDE * 2),
        "f32_w64": run([p[:, : WIDE // 2] for p in ps], WIDE // 2 * 4),
    }
    out["bf16_speedup_vs_f32"] = round(
        out["f32_w128"]["ms"] / out["bf16_w128"]["ms"], 3)
    return out


def _perrow_kernel(x_ref, o_ref, acc):
    from jax.experimental import pallas as pl

    n = x_ref.shape[0]

    def body(i, _):
        acc[...] += x_ref[pl.ds(i, 1), :]
        return 0

    acc[...] = jnp.zeros_like(acc)
    lax.fori_loop(0, n, body, 0)
    o_ref[...] = acc[...]


def probe_perrow_vmem(iters: int) -> dict:
    """Pallas per-row VMEM walk: (1, WIDE) dynamic-slice reads, one row per
    fori step — what an in-kernel gather/scatter at row granularity pays."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from recsys_tpu.kernels import use_pallas

    n = 8192  # one VMEM-resident block of rows
    x = jax.random.normal(jax.random.PRNGKey(2), (n, WIDE), jnp.float32)

    def call(x):
        return pl.pallas_call(
            _perrow_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, WIDE), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, WIDE), jnp.float32)],
            interpret=not use_pallas(),
        )(x)

    def fn(x):
        return x + 1e-30 * jnp.sum(call(x))

    ms = time_chained(fn, x, iters)
    ns_per_row = ms * 1e6 / n
    out = {"rows": n, "ms": round(ms, 4), "ns_per_row": round(ns_per_row, 2)}
    kind = jax.devices()[0].device_kind
    for prefix, hz in _CLOCK_HZ.items():
        if kind.startswith(prefix):
            out["cycles_per_row_at_clock"] = round(ns_per_row * hz / 1e9, 1)
            out["clock_hz"] = hz
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    kind = jax.devices()[0].device_kind
    spec = next((s for k, s in SPECS.items() if kind.startswith(k)), None)
    rep = {"device": kind,
           "spec_hbm_gb_s": round(spec["hbm_bw"] / 1e9, 1) if spec else None}
    rep["adam_stream_optax"] = probe_adam_stream(args.iters)
    rep["adam_stream_pallas"] = probe_pallas_adam_stream(args.iters)
    rep["random_gather_26tables"] = probe_random_gather(args.iters)
    rep["gather_bytes_vs_rows"] = probe_gather_bytes_vs_rows(args.iters)
    rep["perrow_vmem_walk"] = probe_perrow_vmem(args.iters)

    w = sys.stderr.write
    w(f"device={kind} (spec HBM {rep['spec_hbm_gb_s']} GB/s)\n")
    w(f"optax Adam stream : {rep['adam_stream_optax']['effective_gb_s']} GB/s "
      f"({rep['adam_stream_optax']['ms']} ms for "
      f"{rep['adam_stream_optax']['traffic_gb']} GB)\n")
    w(f"pallas Adam stream: {rep['adam_stream_pallas']['effective_gb_s']} GB/s\n")
    w(f"random gather x26 : {rep['random_gather_26tables']['effective_gb_s']}"
      f" GB/s\n")
    gb = rep["gather_bytes_vs_rows"]
    w(f"gather byte diet  : f32x128 {gb['f32_w128']['ms']} ms, bf16x128 "
      f"{gb['bf16_w128']['ms']} ms ({gb['bf16_speedup_vs_f32']}x), f32x64 "
      f"{gb['f32_w64']['ms']} ms\n")
    pr = rep["perrow_vmem_walk"]
    cyc = pr.get("cycles_per_row_at_clock")
    w(f"per-row VMEM walk : {pr['ns_per_row']} ns/row"
      + (f" (~{cyc} cycles at {pr['clock_hz']/1e6:.0f} MHz)\n" if cyc else "\n"))

    payload = json.dumps(rep)
    if args.out:
        import os

        with open(args.out, "w") as f:
            f.write(payload + "\n")
        size = os.path.getsize(args.out)
        if size <= 2:
            raise RuntimeError(f"artifact write produced {size} bytes")
        sys.stderr.write(f"wrote {size} bytes -> {args.out}\n")
    print(payload)


if __name__ == "__main__":
    main()
