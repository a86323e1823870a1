"""Dense-phase ceiling probe: pin the DLRM bench's 3.53 ms dense fwd+bwd
to a per-matmul, shape-measured floor (VERDICT r4 weak #1 / next-step #2).

The bench's dense phase (tools/roofline.py DenseTail: bottom MLP
13->512->256->16, 27-feature dot interaction, top MLP 367->1024->1024->
512->256->1 at B=16384, bf16) runs at 31.6% of the v5e's 197 TFLOP/s
MXU peak.  "The MLPs are narrow" was a story, not a number.  This tool:

1. measures the chip's ACHIEVABLE bf16 matmul rate on a large square
   matmul (the practical peak — typically 80-95% of spec);
2. times every matmul in the phase standalone — forward, input-grad and
   weight-grad shapes — and reports each one's TFLOP/s and % of the
   achievable rate;
3. sums the per-matmul standalone times into a composition floor: the
   time the phase would take if XLA ran each matmul at its isolated
   rate with zero fusion overhead;
4. sweeps the plausible levers end-to-end on the SAME DenseTail step:
   bf16 (bench default) vs f32 IO, Pallas vs plain-einsum interaction,
   and a batch-split variant (2 x 8192 scan) that trades one big launch
   for two half-size ones.

Verdict semantics: if the composition floor is close to the measured
phase time, the gap to the analytic SoL bound is SHAPE-IMPOSED (narrow-K
matmuls cannot feed the MXU) and 3.53 ms is a closed ceiling; if the
floor is far below, XLA's fusion/scheduling is leaving time on the table
and the levers section says which knob recovers it.

Run: python -m recsys_tpu.tools.dense_probe --out artifacts/dense_probe.json

Reference perf surface: the dense towers of every CTR model
(/root/reference/src/ctr/dlrm/model.py:42-54, the reference's broken
DLRM; widths follow the bench config, not the reference's defaults).
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from recsys_tpu.tools import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import optax
from jax import lax

from recsys_tpu.tools.roofline import (
    BOTTOM, EMBED_DIM, NUM_DENSE, NUM_SPARSE, TOP, time_chained,
)

BATCH = 16384
N_FEATS = NUM_SPARSE + 1  # 26 embeddings + bottom-MLP output
N_INTER = N_FEATS * (N_FEATS - 1) // 2  # 351
TOP_IN = EMBED_DIM + N_INTER  # 367


def _opaque(x, s):
    """Shift by a runtime zero so XLA cannot constant-fold the operand."""
    return x + jnp.minimum(s.astype(x.dtype), 0.0)


import functools
import time


@functools.partial(jax.jit, static_argnames=("iters",))
def _matmul_chain(x, w, c, iters):
    """iters chained (m,k)@(k,n) matmuls.  x/w are ARGUMENTS, not closure
    constants — closures embed the operands in the compile payload, which
    blows the remote-compile tunnel's size limit at large shapes (HTTP
    413, same ceiling kernel_sweep hit).  The carry-dependent scale (==1
    at runtime) keeps the loop body un-hoistable; it multiplies the
    SMALLER operand so the anti-hoist pass costs min(|x|,|w|) bytes, not
    an extra full pass over the activations (which put a ~0.85 ms HBM
    floor under every narrow matmul in the first version of this tool)."""
    def step(c, _):
        s = (1.0 + jnp.minimum(c, 0.0)).astype(x.dtype)
        if x.size <= w.size:
            y = jnp.dot(x * s, w, preferred_element_type=jnp.float32)
        else:
            y = jnp.dot(x, w * s, preferred_element_type=jnp.float32)
        return jnp.sum(y).astype(jnp.float32) * 1e-12, None

    return lax.scan(step, c, None, length=iters)[0]


def time_matmul(m: int, k: int, n: int, dtype, iters: int = 120) -> dict:
    """Standalone (m,k)@(k,n) timing; returns ms + TFLOP/s.

    Two-point (iters vs iters//4) like roofline.time_chained: the fixed
    ~25 ms dispatch+fetch round trip through the tunnelled backend put a
    ~0.9 ms floor under every matmul in this tool's first two cuts —
    differencing two chain lengths cancels it."""
    kx, kw = jax.random.split(jax.random.PRNGKey(np.int64(m * k + n)))
    x = jax.random.normal(kx, (m, k), jnp.float32).astype(dtype)
    w = jax.random.normal(kw, (k, n), jnp.float32).astype(dtype) * 0.05
    c0 = jnp.float32(0.0)

    def run(nit):
        float(_matmul_chain(x, w, c0, nit))  # warm (compile) + sync
        t0 = time.perf_counter()
        float(_matmul_chain(x, w, c0, nit))
        return time.perf_counter() - t0

    lo = max(1, iters // 4)
    # median of three two-point estimates: the ~1-2 ms round-trip jitter
    # lands whole on each difference, so single estimates of
    # tens-of-microsecond matmuls can read ~0 (or negative)
    ests = sorted(
        max(run(iters) - run(lo), 0.0) / (iters - lo) * 1e3
        for _ in range(3)
    )
    ms = ests[1]
    fl = 2.0 * m * k * n
    out = {"m": m, "k": k, "n": n, "ms": round(ms, 4),
           "tflops": round(fl / (ms * 1e-3) / 1e12, 1) if ms > 5e-3
           else None}
    if ms <= 5e-3:
        out["below_resolution"] = True  # < ~5 us/iter: jitter-dominated
    return out


def phase_matmuls():
    """(label, m, k, n) for every matmul in the dense phase: fwd, dgrad
    (dy @ W^T: m x n @ n x k) and wgrad (x^T @ dy: k x m @ m x n)."""
    dims = [NUM_DENSE, *BOTTOM, EMBED_DIM]  # 13, 512, 256, 16
    layers = [("bot", dims[i], dims[i + 1]) for i in range(len(dims) - 1)]
    tdims = [TOP_IN, *TOP, 1]  # 367, 1024, 1024, 512, 256, 1
    layers += [("top", tdims[i], tdims[i + 1]) for i in range(len(tdims) - 1)]
    out = []
    for tag, k, n in layers:
        out.append((f"{tag}:{k}->{n} fwd", BATCH, k, n))
        out.append((f"{tag}:{k}->{n} dgrad", BATCH, n, k))
        out.append((f"{tag}:{k}->{n} wgrad", k, BATCH, n))
    return out


def build_tail(compute_dtype, use_pallas_interaction: bool):
    import flax.linen as nn

    from recsys_tpu.kernels import dispatch as ikernels
    from recsys_tpu.ops.mlp import MLP

    class DenseTail(nn.Module):
        @nn.compact
        def __call__(self, dense, e):
            z = MLP(BOTTOM, out_dim=EMBED_DIM, dtype=compute_dtype)(dense)
            feats = jnp.concatenate(
                [z[:, None, :], e.astype(compute_dtype)], axis=1
            )
            if use_pallas_interaction:
                inter = ikernels.dot_interaction(feats)
            else:
                gram = jnp.einsum("bfd,bgd->bfg", feats, feats)
                r, c = jnp.tril_indices(N_FEATS, k=-1)
                inter = gram[:, r, c]
            logits = MLP(TOP, out_dim=1, dtype=compute_dtype)(
                jnp.concatenate([z, inter], axis=-1)
            )[..., 0]
            return logits.astype(jnp.float32)

    return DenseTail()


def time_phase(compute_dtype=jnp.bfloat16, use_pallas_interaction=True,
               split: int = 1, iters: int = 20) -> float:
    """Full dense fwd+bwd (the roofline dense_fn), optionally scanning
    ``split`` batch slices of B/split each."""
    rng = np.random.default_rng(0)
    dense_x = jnp.asarray(rng.random((BATCH, NUM_DENSE), np.float32))
    labels = jnp.asarray(rng.integers(0, 2, BATCH).astype(np.float32))
    embs = jnp.asarray(
        rng.standard_normal((BATCH, NUM_SPARSE, EMBED_DIM)), jnp.float32
    )
    tail = build_tail(compute_dtype, use_pallas_interaction)
    params = tail.init(jax.random.PRNGKey(1), dense_x, embs)["params"]

    def loss(p, d, e, y):
        logits = tail.apply({"params": p}, d, e)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

    if split == 1:
        def fn(p):
            gp, ge = jax.grad(loss, argnums=(0, 1))(p, dense_x, embs, labels)
            eps = 1e-30 * jnp.sum(ge)
            return jax.tree_util.tree_map(
                lambda a, g: a - 1e-30 * g - eps, p, gp
            )
    else:
        bs = BATCH // split
        ds = dense_x.reshape(split, bs, -1)
        es = embs.reshape(split, bs, NUM_SPARSE, EMBED_DIM)
        ys = labels.reshape(split, bs)

        def fn(p):
            def body(c, xs):
                d, e, y = xs
                gp, ge = jax.grad(loss, argnums=(0, 1))(p, d, e, y)
                eps = 1e-30 * jnp.sum(ge)
                c = jax.tree_util.tree_map(
                    lambda a, g: a + g * (1.0 / split) + eps, c, gp
                )
                return c, None

            z = jax.tree_util.tree_map(jnp.zeros_like, params)
            acc, _ = lax.scan(body, z, (ds, es, ys))
            return jax.tree_util.tree_map(
                lambda a, g: a - 1e-30 * g, p, acc
            )

    return time_chained(fn, params, iters)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)
    w = sys.stderr.write

    dev = jax.devices()[0].device_kind
    rep: dict = {"device": dev, "batch": BATCH,
                 "widths": {"bottom": list(BOTTOM) + [EMBED_DIM],
                            "top": [TOP_IN, *TOP, 1]}}

    # 1. achievable peak: large square bf16 matmul (two-point at 60 — the
    # 6.7 ms body needs few iterations to dominate measurement noise)
    big = time_matmul(8192, 8192, 8192, jnp.bfloat16, 60)
    rep["achievable_peak"] = big
    w(f"achievable bf16 peak (8192^3): {big['tflops']} TFLOP/s "
      f"({big['ms']} ms)\n")
    peak = big["tflops"]

    # 2. per-matmul isolation at phase shapes (480 iterations: the
    # narrow layers run tens of microseconds, so the two-point difference
    # needs a long chain to rise above the ~1-2 ms round-trip jitter)
    rows = []
    floor_ms = 0.0
    for label, m, k, n in phase_matmuls():
        r = time_matmul(m, k, n, jnp.bfloat16, 480)
        r["label"] = label
        if r["tflops"] is not None:
            r["pct_of_achievable"] = round(100 * r["tflops"] / peak, 1)
            w(f"{label:22s} {r['ms']:7.4f} ms {r['tflops']:7.1f} TF/s "
              f"({r['pct_of_achievable']:5.1f}% of achievable)\n")
        else:
            w(f"{label:22s} {r['ms']:7.4f} ms (below timing resolution)\n")
        rows.append(r)
        floor_ms += r["ms"]
    rep["matmuls"] = rows

    # interaction einsum standalone: (B,27,16)x(B,27,16)->(B,27,27)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(
        rng.standard_normal((BATCH, N_FEATS, EMBED_DIM)), jnp.bfloat16
    )

    def inter_fn(s):
        f = feats + jnp.minimum(s.astype(jnp.bfloat16), 0)
        gram = jnp.einsum("bfd,bgd->bfg", f, f,
                          preferred_element_type=jnp.float32)
        r, c = jnp.tril_indices(N_FEATS, k=-1)
        return jnp.sum(gram[:, r, c]) * 1e-9

    ms_inter = time_chained(inter_fn, jnp.float32(0.0), args.iters)
    # fwd + ~2x for backward (two einsum grads of the same shape)
    rep["interaction_fwd_ms"] = round(ms_inter, 4)
    floor_ms += 3 * ms_inter
    w(f"interaction einsum fwd: {ms_inter:.4f} ms (x3 for fwd+bwd)\n")
    rep["composition_floor_ms"] = round(floor_ms, 3)

    # 3. end-to-end phase under each lever
    phases = {}
    for name, kw in (
        ("bf16_pallas_inter (bench)", dict()),
        ("bf16_einsum_inter", dict(use_pallas_interaction=False)),
        ("f32", dict(compute_dtype=jnp.float32)),
        ("bf16_split2", dict(split=2)),
        ("bf16_split4", dict(split=4)),
    ):
        try:
            ms = time_phase(**kw, iters=args.iters // 2 or 1)
            phases[name] = round(ms, 3)
            w(f"phase {name:28s} {ms:7.3f} ms\n")
        except Exception as e:  # record tunnel/VMEM failures verbatim
            phases[name] = f"{type(e).__name__}: {str(e)[:160]}"
            w(f"phase {name:28s} ERROR {phases[name]}\n")
    rep["phase_ms"] = phases

    measured = phases.get("bf16_pallas_inter (bench)")
    if isinstance(measured, float):
        rep["floor_vs_measured"] = round(measured / floor_ms, 3)
        w(f"\ncomposition floor {floor_ms:.3f} ms vs measured "
          f"{measured:.3f} ms -> x{rep['floor_vs_measured']}\n")

    out = json.dumps(rep, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
