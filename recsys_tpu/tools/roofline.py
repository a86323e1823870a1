"""Per-phase speed-of-light accounting for the DLRM bench step.

Decomposes the benched DLRM train step (bench.py shapes: B=16384, 26x100k
vocab, D=16, packed rows, bf16 dense compute) into its four device phases,
times each in isolation with scan-chained jits (the chain defeats async
dispatch; one scalar fetch bounds the dependency chain — the only reliable
sync on the tunnelled chip), and compares each phase against an analytic
roofline bound built from published chip specs:

    phase        bound
    ------------ -------------------------------------------------------
    gather       HBM: B*F physical-row reads (512 B each, packed layout)
    dense        MXU: 3x fwd matmul FLOPs (fwd + dgrad + wgrad), bf16
    scatter      HBM: cotangent read + expected-unique-row RMW
    update       HBM: dense Adam on tables = 7x table bytes (p/m/v RW + g R)

The reference publishes no perf numbers (SURVEY.md §6); the roofline is the
absolute yardstick instead.  Run:

    python -m recsys_tpu.tools.roofline [--batch 16384] [--iters 30]

Prints a human table on stderr and one JSON object on stdout.
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from recsys_tpu.kernels.embedding import pack_factor, packed_gather, packed_select

# Published peaks.  v5e: 197 TFLOP/s bf16, 819 GB/s HBM (16 GB).
SPECS = {
    "TPU v5 lite": {"bf16_flops": 197e12, "hbm_bw": 819e9},
    "TPU v4": {"bf16_flops": 275e12, "hbm_bw": 1228e9},
    "TPU v5p": {"bf16_flops": 459e12, "hbm_bw": 2765e9},
    "TPU v6 lite": {"bf16_flops": 918e12, "hbm_bw": 1640e9},
}

VOCAB = 100_000
NUM_SPARSE = 26
NUM_DENSE = 13
EMBED_DIM = 16
BOTTOM = (512, 256)
TOP = (1024, 1024, 512, 256)


def _specs():
    kind = jax.devices()[0].device_kind
    for prefix, s in SPECS.items():
        if kind.startswith(prefix):
            return kind, s
    return kind, None


def _fetch(tree):
    """Pull one element to host — bounds the whole dependency chain."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def time_chained(fn, carry, iters: int, warmup: int = 1) -> float:
    """ms per call of carry->carry `fn`, chained through lax.scan.

    TWO-POINT measurement: each host-side timing includes one fixed
    dispatch + scalar-fetch round trip through the (tunnelled) backend —
    measured ~25 ms on this environment, i.e. ~0.8 ms/iter of inflation
    at the old single-point iters=30 (the round-4 phase numbers carry
    it).  Timing the chain at ``iters`` AND ``iters//4`` and dividing the
    DIFFERENCE by the extra iterations cancels the fixed cost exactly;
    the single-point value is the fallback when iters is too small to
    split."""

    def run(n):
        many = jax.jit(
            lambda c: lax.scan(
                lambda c, _: (fn(c), None), c, None, length=n
            )[0]
        )
        for _ in range(warmup):
            _fetch(many(carry))
        t0 = time.perf_counter()
        _fetch(many(carry))
        return time.perf_counter() - t0

    lo = max(1, iters // 4)
    if iters - lo < 2:
        return run(iters) / iters * 1e3
    t_hi = run(iters)
    t_lo = run(lo)
    return max(t_hi - t_lo, 1e-9) / (iters - lo) * 1e3


def _opaque_zero_i32(s: jnp.ndarray) -> jnp.ndarray:
    """An int32 zero XLA cannot constant-fold (s is nonneg at runtime)."""
    return jnp.minimum(s.astype(jnp.int32), 0)


def build_phases(batch: int, rng: np.random.Generator):
    """Returns {phase: (fn, carry)} + analytic {phase: (bytes, flops)}."""
    pack = pack_factor(EMBED_DIM, VOCAB)  # 8 at D=16
    v_phys = -(-VOCAB // pack)
    v_phys += (-v_phys) % 8  # _pad8
    wide = pack * EMBED_DIM  # 128 lanes

    keys = jax.random.split(jax.random.PRNGKey(0), NUM_SPARSE)
    tables = [
        jax.random.uniform(k, (v_phys, wide), minval=-0.05, maxval=0.05)
        for k in keys
    ]
    ids = jnp.asarray(
        rng.integers(0, VOCAB, (batch, NUM_SPARSE), dtype=np.int64).astype(np.int32)
    )
    dense_x = jnp.asarray(rng.random((batch, NUM_DENSE), np.float32))
    labels = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))
    embs = jnp.asarray(rng.standard_normal((batch, NUM_SPARSE, EMBED_DIM)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((batch, NUM_SPARSE, EMBED_DIM)), jnp.float32)

    # ---- phase 1: gather (fwd packed lookup of all 26 fields) -------------
    def gather_fn(s):
        shift = _opaque_zero_i32(s)
        total = 0.0
        for g in range(NUM_SPARSE):
            rows = ids[:, g] + shift
            w = jnp.take(tables[g], rows // pack, axis=0)
            total = total + jnp.sum(packed_select(w, rows, pack, EMBED_DIM))
        return jnp.abs(jnp.tanh(total * 1e-12))

    # ---- phase 2: dense tail fwd + bwd (bf16, DLRM math minus embedding) --
    from recsys_tpu.kernels import dispatch as ikernels
    from recsys_tpu.ops.mlp import MLP

    import flax.linen as nn

    class DenseTail(nn.Module):
        @nn.compact
        def __call__(self, dense, e):
            z = MLP(BOTTOM, out_dim=EMBED_DIM, dtype=jnp.bfloat16)(dense)
            feats = jnp.concatenate(
                [z[:, None, :], e.astype(jnp.bfloat16)], axis=1
            )
            inter = ikernels.dot_interaction(feats)
            logits = MLP(TOP, out_dim=1, dtype=jnp.bfloat16)(
                jnp.concatenate([z, inter], axis=-1)
            )[..., 0]
            return logits.astype(jnp.float32)

    tail = DenseTail()
    dense_params = tail.init(jax.random.PRNGKey(1), dense_x, embs)["params"]

    def dense_fn(p):
        def loss(p, e):
            logits = tail.apply({"params": p}, dense_x, e)
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(logits, labels)
            )

        (gp, ge) = jax.grad(loss, argnums=(0, 1))(p, embs)
        # consume d(loss)/d(embeddings) — part of the real backward
        eps = 1e-30 * jnp.sum(ge)
        return jax.tree_util.tree_map(lambda a, g: a - 1e-30 * g - eps, p, gp)

    # ---- phase 3: scatter (backward of the packed gather) -----------------
    def scatter_fn(ts):
        def consume(ts):
            total = 0.0
            for g in range(NUM_SPARSE):
                e = packed_gather(ts[g], ids[:, g], pack, EMBED_DIM)
                total = total + jnp.sum(e * cot[:, g, :])
            return total

        grads = jax.grad(consume)(ts)  # scatter-adds; fwd gather is DCE'd
        return [t - 1e-30 * gt for t, gt in zip(ts, grads)]

    # ---- phase 4: dense Adam update of the tables --------------------------
    tx = optax.adam(1e-3)
    grads_fixed = [
        jax.random.normal(k, (v_phys, wide)) * 1e-3 for k in keys
    ]
    upd_carry = (list(tables), tx.init(list(tables)))

    def update_fn(carry):
        params, opt = carry
        upd, opt = tx.update(grads_fixed, opt, params)
        return (optax.apply_updates(params, upd), opt)

    # ---- fused phase: XLA id-permute + streaming kernel (r3 default path) --
    from recsys_tpu.kernels.pallas.embedding_update_tpu import fused_bwd_adam
    from recsys_tpu.train.streaming_embed import host_prep_group

    prep = [
        host_prep_group(np.asarray(ids[:, g]), pack=pack, vp=v_phys)
        for g in range(NUM_SPARSE)
    ]
    ids2ds = [jnp.asarray(p[0]) for p in prep]
    idxs = [jnp.asarray(p[1]) for p in prep]
    cptrs = [jnp.asarray(p[2]) for p in prep]
    cots = jnp.asarray(
        rng.standard_normal((NUM_SPARSE, batch, EMBED_DIM)), jnp.float32
    ) * 1e-2

    from recsys_tpu.kernels import use_pallas

    interp = not use_pallas()

    def fused_bwd_fn(carry):
        ts, ms, vs, t = carry
        outs = []
        for g in range(NUM_SPARSE):
            cs = jnp.take(cots[g], idxs[g], axis=0).astype(jnp.bfloat16)
            outs.append(fused_bwd_adam(
                ts[g], ms[g], vs[g], cs, ids2ds[g], cptrs[g], t,
                pack=pack, d=EMBED_DIM, interpret=interp,
            ))
        return ([o[0] for o in outs], [o[1] for o in outs],
                [o[2] for o in outs], t + 1)

    fused_carry = (
        list(tables),
        [jnp.zeros_like(t) for t in tables],
        [jnp.zeros_like(t) for t in tables],
        jnp.int32(1),
    )

    phases = {
        "gather": (gather_fn, jnp.float32(0.5)),
        "dense": (dense_fn, dense_params),
        "scatter": (scatter_fn, list(tables)),
        "update": (update_fn, upd_carry),
        "fused_bwd": (fused_bwd_fn, fused_carry),
    }

    # ---- analytic bytes / flops -------------------------------------------
    table_bytes = NUM_SPARSE * v_phys * wide * 4
    row_bytes = wide * 4  # one physical row = 512 B
    lookups = batch * NUM_SPARSE
    # expected unique physical rows touched per table by `batch` uniform ids
    uniq = v_phys * (1.0 - (1.0 - 1.0 / v_phys) ** batch)

    def mlp_flops(in_dim, units, out_dim):
        dims = [in_dim, *units, out_dim]
        return 2 * batch * sum(a * b for a, b in zip(dims, dims[1:]))

    f = NUM_SPARSE + 1
    n_inter = f * (f - 1) // 2
    fwd_flops = (
        mlp_flops(NUM_DENSE, BOTTOM, EMBED_DIM)
        + 2 * batch * f * f * EMBED_DIM  # dot-interaction gram
        + mlp_flops(EMBED_DIM + n_inter, TOP, 1)
    )
    analytic = {
        "gather": {"bytes": lookups * row_bytes, "flops": 0},
        "dense": {"bytes": 0, "flops": 3 * fwd_flops},  # fwd + dgrad + wgrad
        "scatter": {
            # wide-spread cotangent read + read-modify-write of touched rows
            "bytes": int(lookups * row_bytes + 2 * NUM_SPARSE * uniq * row_bytes),
            "flops": 0,
        },
        "update": {"bytes": 7 * table_bytes, "flops": 0},
        # permute (narrow cot r+w) + kernel stream (p/m/v r+w, sorted cot r)
        "fused_bwd": {
            "bytes": int(
                6 * table_bytes
                + 3 * lookups * EMBED_DIM * 4  # cot read + sorted write+read
            ),
            "flops": 0,
        },
    }
    return phases, analytic


def full_step_ms(batch: int, rng: np.random.Generator, iters: int,
                 fused: bool = False, fused_mlps: bool = False) -> float:
    """The actual bench step (framework DLRM, bf16, donated), scan-chained.

    ``fused=True`` times the round-3 default bench composition (tap +
    fused streaming table update); ``fused_mlps`` additionally routes the
    MLP towers through the fused Pallas MLP kernels."""
    from recsys_tpu.data.synthetic import synthetic_ctr
    from recsys_tpu.models.ctr.dlrm import DLRM
    from recsys_tpu.train.losses import bce_with_logits

    schema, _ = synthetic_ctr(
        num_examples=8, num_dense=NUM_DENSE, num_sparse=NUM_SPARSE,
        vocab_size=VOCAB, embed_dim=EMBED_DIM,
    )
    model = DLRM(schema, bottom_units=(*BOTTOM, EMBED_DIM),
                 top_units=TOP, compute_dtype=jnp.bfloat16,
                 sparse_embed_grads=fused, fused_mlps=fused_mlps)
    b = {
        "dense": jnp.asarray(rng.random((batch, NUM_DENSE), np.float32)),
        "sparse": jnp.asarray(
            rng.integers(0, VOCAB, (batch, NUM_SPARSE), dtype=np.int64).astype(np.int32)
        ),
        "label": jnp.asarray(rng.integers(0, 2, batch).astype(np.float32)),
    }
    variables = model.init(jax.random.PRNGKey(0), b, training=False)
    params = variables["params"]
    tx = optax.adam(1e-3)

    if not fused:
        def step(state):
            params, opt = state

            def loss_fn(p):
                return bce_with_logits(
                    model.apply({"params": p}, b, training=False), b["label"]
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt, params)
            return (optax.apply_updates(params, upd), opt)

        return time_chained(step, (params, tx.init(params)), iters)

    from recsys_tpu.train import sparse_embed, streaming_embed

    plan = sparse_embed.build_plan(params, schema)
    rest, tables = sparse_embed.split_params(params, plan)
    emb0 = sparse_embed.init_state(tables, "lazy_adam", plan)
    aux = {k: jnp.asarray(v) for k, v in
           streaming_embed.make_host_prep(plan)(np.asarray(b["sparse"])).items()}
    b = dict(b, **aux)
    import flax

    pert0 = jax.tree_util.tree_map(
        jnp.zeros_like, flax.core.unfreeze(variables["perturbations"])
    )

    def step(state):
        rest, tables, emb, opt, t = state

        def loss_fn(rest_p, pert):
            full = sparse_embed.merge_params(rest_p, tables, plan)
            return bce_with_logits(
                model.apply({"params": full, "perturbations": pert}, b,
                            training=False),
                b["label"],
            )

        _, (grest, gpert) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(rest, pert0)
        upd, opt = tx.update(grest, opt, rest)
        rest = optax.apply_updates(rest, upd)
        tables2, emb2 = streaming_embed.apply_updates_fused(
            tables, emb, plan, b, jax.tree_util.tree_leaves(gpert)[0],
            lr=1e-3, step=t + 1, mm_bf16=True,
        )
        return (rest, tables2, emb2, opt, t + 1)

    return time_chained(
        step, (rest, tables, emb0, tx.init(rest), jnp.int32(0)), iters
    )


def run(batch: int, iters: int, fused: bool = True,
        fused_mlps: bool = False) -> dict:
    """``fused=True`` (the round-3 bench default): the step-relevant phase
    set is gather + dense + fused_bwd (scatter/update replaced); the old
    phases are still timed for the comparison table."""
    kind, spec = _specs()
    rng = np.random.default_rng(0)
    phases, analytic = build_phases(batch, rng)
    report = {"device": kind, "batch": batch, "fused": fused, "phases": {}}
    step_phases = (
        ("gather", "dense", "fused_bwd") if fused
        else ("gather", "dense", "scatter", "update")
    )

    for name, (fn, carry) in phases.items():
        ms = time_chained(fn, carry, iters)
        entry = {"ms": round(ms, 3)}
        a = analytic[name]
        if spec is not None:
            bw_ms = a["bytes"] / spec["hbm_bw"] * 1e3
            fl_ms = a["flops"] / spec["bf16_flops"] * 1e3
            sol = max(bw_ms, fl_ms)
            entry.update(
                sol_ms=round(sol, 3),
                pct_sol=round(100 * sol / ms, 1),
                bound="hbm" if bw_ms >= fl_ms else "mxu",
                gb=round(a["bytes"] / 1e9, 3),
                gflops=round(a["flops"] / 1e9, 1),
            )
        report["phases"][name] = entry

    total_ms = full_step_ms(batch, rng, iters, fused=fused,
                            fused_mlps=fused_mlps)
    phase_sum = sum(report["phases"][p]["ms"] for p in step_phases)
    report["step_phases"] = list(step_phases)
    report["full_step_ms"] = round(total_ms, 3)
    report["phase_sum_ms"] = round(phase_sum, 3)
    report["residual_ms"] = round(total_ms - phase_sum, 3)
    if spec is not None:
        sol_total = sum(report["phases"][p]["sol_ms"] for p in step_phases)
        report["sol_step_ms"] = round(sol_total, 3)
        report["pct_sol_step"] = round(100 * sol_total / total_ms, 1)
        report["examples_per_s"] = round(batch / (total_ms / 1e3), 1)
        report["sol_examples_per_s"] = round(batch / (sol_total / 1e3), 1)
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--optax-path", action="store_true",
                   help="time the round-2 optax composition instead of the "
                   "fused default")
    p.add_argument("--fused-mlps", action="store_true")
    args = p.parse_args(argv)
    rep = run(args.batch, args.iters, fused=not args.optax_path,
              fused_mlps=args.fused_mlps)

    w = sys.stderr.write
    w(f"device={rep['device']} batch={rep['batch']}\n")
    w(f"{'phase':<10}{'ms':>9}{'SoL ms':>9}{'% SoL':>8}  bound  traffic\n")
    for name, e in rep["phases"].items():
        if "sol_ms" in e:
            traffic = f"{e['gb']} GB" if e["bound"] == "hbm" else f"{e['gflops']} GF"
            w(f"{name:<10}{e['ms']:>9.3f}{e['sol_ms']:>9.3f}"
              f"{e['pct_sol']:>8.1f}  {e['bound']:<5}  {traffic}\n")
        else:
            w(f"{name:<10}{e['ms']:>9.3f}\n")
    w(f"full step {rep['full_step_ms']:.3f} ms; phase sum "
      f"{rep['phase_sum_ms']:.3f} ms; residual {rep['residual_ms']:.3f} ms\n")
    if "pct_sol_step" in rep:
        w(f"step speed-of-light {rep['sol_step_ms']:.3f} ms -> "
          f"{rep['pct_sol_step']:.1f}% of SoL "
          f"({rep['examples_per_s']:.0f} vs {rep['sol_examples_per_s']:.0f} ex/s)\n")
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
