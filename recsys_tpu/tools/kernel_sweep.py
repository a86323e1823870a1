"""On-chip shape sweep: Pallas interaction / top-k kernels vs their XLA paths.

Round-1 measured the Pallas FM-pairwise and DLRM dot-interaction kernels
~7% BEHIND XLA's fused einsum at the bench shape (B=4096, F=26, D=16) and
the fused score+top-k kernel behind ``lax.top_k`` at N=100k — so they
shipped opt-in.  The round-1 verdict asks for the decision to be settled by
measurement: sweep F in {26..128}, D in {16..128} (incl. the packed-table
regime F>=64, D=128) and realistic retrieval catalogs; if a kernel never
wins, retire its opt-in flag and record the conclusion in ARCHITECTURE.md.

    python -m recsys_tpu.tools.kernel_sweep interactions [--iters 20]
    python -m recsys_tpu.tools.kernel_sweep topk         [--iters 20]

Timing uses tools/roofline.time_chained (scan-chained jits + one scalar
fetch — the only reliable sync on the tunnelled chip).  Interaction ops are
timed as TRAIN steps (fwd + grad wrt the field embeddings), which is what
the dispatch decision affects; top-k is forward-only (an eval op).
Prints one JSON object on stdout, a table on stderr.
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.tools.roofline import time_chained


def _train_ms(kernel_fn, x, iters: int) -> float:
    """ms/step of x -> x - eps*d(sum kernel(x))/dx, scan-chained."""

    def step(x):
        g = jax.grad(lambda v: jnp.sum(kernel_fn(v)))(x)
        return x - 1e-30 * g

    return time_chained(step, x, iters)


def sweep_interactions(
    iters: int, interpret: bool = False, quick: bool = False
) -> list[dict]:
    from recsys_tpu.kernels import dispatch
    from recsys_tpu.kernels import interactions as ref

    rows = []
    rng = np.random.default_rng(0)
    for b in (256,) if quick else (4096, 16384):
        for f in ((8,) if quick else (26, 64, 128)):
            for d in ((16,) if quick else (16, 64, 128)):
                if b * f * d * 4 > 512 * 1024 * 1024:  # keep carries sane
                    continue
                x = jnp.asarray(
                    rng.standard_normal((b, f, d)), jnp.float32
                )
                row = {"b": b, "f": f, "d": d}
                row["fm_xla_ms"] = round(
                    _train_ms(ref.fm_pairwise_vector, x, iters), 3
                )
                row["fm_pallas_ms"] = round(
                    _train_ms(
                        lambda v: dispatch._fm_vec_pallas(v, interpret), x, iters
                    ),
                    3,
                )
                row["dot_xla_ms"] = round(
                    _train_ms(ref.dot_interaction, x, iters), 3
                )
                row["dot_pallas_ms"] = round(
                    _train_ms(
                        lambda v: dispatch._dot_pallas(v, False, interpret),
                        x, iters,
                    ),
                    3,
                )
                row["fm_speedup"] = round(row["fm_xla_ms"] / row["fm_pallas_ms"], 3)
                row["dot_speedup"] = round(
                    row["dot_xla_ms"] / row["dot_pallas_ms"], 3
                )
                rows.append(row)
                sys.stderr.write(f"{row}\n")
                sys.stderr.flush()
    return rows


def sweep_topk(
    iters: int, interpret: bool = False, quick: bool = False,
    sizes: tuple[int, ...] | None = None,
) -> list[dict]:
    from recsys_tpu.kernels.pallas.topk_tpu import topk_scores_pallas
    from recsys_tpu.train.retrieval import topk_scores, topk_scores_streaming

    rows = []
    rng = np.random.default_rng(0)
    q_n, k = (128, 10) if quick else (1024, 10)
    if sizes is None:
        sizes = (2048,) if quick else (100_000, 1_000_000)
    for n in sizes:
        for d in ((64,) if quick else (64, 128)):
            q = jnp.asarray(rng.standard_normal((q_n, d)), jnp.float32)
            items = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)

            def run(fn):
                # a single variant failing (e.g. a tunnel compile-payload
                # limit on the largest shapes) must not lose the sweep: the
                # error string becomes the measurement and the JSON still
                # lands
                def step(q):
                    v, _ = fn(q, items)
                    return q * (1.0 + 1e-30 * jnp.sum(v))

                try:
                    return round(time_chained(step, q, iters), 3)
                except Exception as e:  # noqa: BLE001 — record, keep sweeping
                    msg = f"error: {type(e).__name__}: {e}"
                    sys.stderr.write(msg[:200] + "\n")
                    return msg[:200]

            row = {"q": q_n, "n": n, "d": d, "k": k}
            row["xla_full_ms"] = run(lambda q, it: topk_scores(q, it, k=k))
            row["xla_stream_ms"] = run(
                lambda q, it: topk_scores_streaming(q, it, k=k)
            )
            for tile_n in (512, 2048):
                row[f"pallas_t{tile_n}_ms"] = run(
                    lambda q, it, t=tile_n: topk_scores_pallas(
                        q, it, k=k, tile_n=t, interpret=interpret
                    )
                )
            pallas_ok = [
                v for kk, v in row.items()
                if kk.startswith("pallas") and isinstance(v, float)
            ]
            xla_ok = [
                v for kk in ("xla_full_ms", "xla_stream_ms")
                if isinstance((v := row[kk]), float)
            ]
            if pallas_ok and xla_ok:
                row["speedup_vs_best_xla"] = round(
                    min(xla_ok) / min(pallas_ok), 3
                )
            rows.append(row)
            sys.stderr.write(f"{row}\n")
            sys.stderr.flush()
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(prog="recsys_tpu.tools.kernel_sweep")
    p.add_argument("mode", choices=["interactions", "topk", "all"])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes, harness smoke only")
    p.add_argument("--out", default=None,
                   help="also write the JSON report here; the write is "
                   "VERIFIED non-empty (round-2's topk artifact silently "
                   "landed as a 0-byte file via shell redirection)")
    p.add_argument("--sizes", default=None,
                   help="comma-separated catalog sizes for the topk sweep "
                   "(splits the run across sessions: tunnel compiles "
                   "dominate and all four default points exceed 10 min)")
    args = p.parse_args(argv)
    sizes = (tuple(int(s) for s in args.sizes.split(","))
             if args.sizes else None)

    rep = {"device": jax.devices()[0].device_kind}
    if args.mode in ("interactions", "all"):
        rep["interactions"] = sweep_interactions(
            args.iters, args.interpret, args.quick
        )
    if args.mode in ("topk", "all"):
        rep["topk"] = sweep_topk(args.iters, args.interpret, args.quick,
                                 sizes=sizes)
    payload = json.dumps(rep)
    if args.out:
        import os

        with open(args.out, "w") as f:
            f.write(payload + "\n")
        size = os.path.getsize(args.out)
        if size <= 2:
            raise RuntimeError(
                f"artifact write produced {size} bytes at {args.out!r}"
            )
        sys.stderr.write(f"wrote {size} bytes -> {args.out}\n")
    print(payload)


if __name__ == "__main__":
    main()
