"""Data-parallel scaling-efficiency harness.

Measures DLRM train-step throughput at 1, 2, ..., N devices on the current
backend (real chips when available; the virtual CPU mesh otherwise — which
validates mechanics, not ICI bandwidth) and reports examples/s plus scaling
efficiency vs the single-device run, per the SURVEY.md §6 performance axis.

    python -m recsys_tpu.tools.scaling [--per-device-batch 2048] [--steps 10]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np
import optax


def measure(per_device_batch: int, steps: int, vocab: int, embed_dim: int):
    import jax.numpy as jnp

    from recsys_tpu.data.synthetic import synthetic_ctr
    from recsys_tpu.models.ctr.dlrm import DLRM
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.train.loop import Trainer

    devices = jax.devices()
    results = []
    n = 1
    while n <= len(devices):
        batch = per_device_batch * n
        schema, data = synthetic_ctr(
            num_examples=batch, num_dense=13, num_sparse=26,
            vocab_size=vocab, embed_dim=embed_dim, seed=0,
        )
        mesh = make_mesh(data=n, model=1, devices=devices[:n])
        tr = Trainer(DLRM(schema, bottom_units=(128, 64),
                          top_units=(256, 128)),
                     learning_rate=1e-3, mesh=mesh)
        tr.fit(data, batch_size=batch, epochs=1, verbose=False)  # compile
        t0 = time.perf_counter()
        tr.fit(data, batch_size=batch, epochs=steps, verbose=False)
        # fit syncs per-epoch via float(loss)
        dt = time.perf_counter() - t0
        ex_s = batch * steps / dt
        results.append({"devices": n, "examples_per_s": round(ex_s, 1)})
        n *= 2
    base = results[0]["examples_per_s"]
    for r in results:
        r["scaling_efficiency"] = round(
            r["examples_per_s"] / (base * r["devices"]), 3
        )
    return results


def project_v5e_slice(
    step_ms: float = 8.37,
    n_cot_rows: int = 26 * 16384,
    embed_dim: int = 16,
    dense_params: int | None = None,
    ici_gbps: float = 45.0,
    max_chips: int = 16,
):
    """Multi-chip DP step-time model from the measured single-chip phases.

    No multi-chip hardware exists in this environment, so the scaling
    axis is bounded analytically from quantities the repo HAS measured:
    the single-chip fused DLRM step (BENCH_BREAKDOWN: 8.37 ms at
    B=16384) and the per-step wire payloads of the fused-DP path —
    ONE (n, D) f32 cotangent all-gather (the dominant transfer; the same
    bytes under the global and host-local contracts) plus the dense-param
    gradient all-reduce.  ``ici_gbps`` is the public per-direction v5e
    ICI link figure (How to Scale Your Model, jax-ml.github.io/
    scaling-book: 4.5e10 B/s); per-chip batch is held at the bench's
    16384 (weak scaling, the production regime).

    Reported per chip count: comm-time, serialized efficiency
    (step+comm, no overlap — pessimistic) and overlapped efficiency
    (max(step, comm) — what the a2a_pipelined-style schedules target).
    A PROJECTION, labeled as such: the number multi-chip hardware would
    check, not a measurement.
    """
    if dense_params is None:
        # bench DLRM dense tower: bottom 13-512-256-16, top 367-1024-
        # 1024-512-256-1
        dims = [13, 512, 256, 16]
        dense_params = sum(dims[i] * dims[i + 1] + dims[i + 1]
                           for i in range(3))
        t = [367, 1024, 1024, 512, 256, 1]
        dense_params += sum(t[i] * t[i + 1] + t[i + 1] for i in range(5))
    cot_bytes = n_cot_rows * embed_dim * 4
    grad_bytes = dense_params * 4
    bw = ici_gbps * 1e9
    out = []
    n = 2
    while n <= max_chips:
        # all-gather: each chip receives (n-1)/n of the global payload;
        # ring all-reduce moves ~2x(n-1)/n of the payload per chip
        t_ag = cot_bytes * (n - 1) / n / bw * 1e3
        t_ar = 2 * grad_bytes * (n - 1) / n / bw * 1e3
        comm = t_ag + t_ar
        out.append({
            "chips": n,
            "comm_ms": round(comm, 3),
            "cot_allgather_ms": round(t_ag, 3),
            "dense_allreduce_ms": round(t_ar, 3),
            "eff_serialized": round(step_ms / (step_ms + comm), 3),
            "eff_overlapped": round(
                step_ms / max(step_ms, comm), 3
            ),
        })
        n *= 2
    return {
        "kind": "projection (no multi-chip hardware in this environment)",
        "model": "weak-scaling DP, per-chip batch 16384, fused-adam path",
        "single_chip_step_ms": step_ms,
        "cot_allgather_bytes": cot_bytes,
        "dense_allreduce_bytes": grad_bytes,
        "ici_gbytes_per_s_per_direction": ici_gbps,
        "per_chips": out,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=2048)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--vocab", type=int, default=10_000)
    p.add_argument("--embed-dim", type=int, default=16)
    p.add_argument("--out", default=None)
    p.add_argument("--step-ms", type=float, default=8.37,
                   help="measured single-chip step for the projection "
                   "(BENCH_BREAKDOWN r4: 8.37 ms)")
    args = p.parse_args(argv)
    dev = jax.devices()[0]
    measured = measure(args.per_device_batch, args.steps, args.vocab,
                       args.embed_dim)
    rep = {
        "backend": dev.platform,
        "device_kind": dev.device_kind,
        "kind": (
            "mechanics only (virtual CPU mesh: validates the SPMD "
            "program + collective placement, NOT ICI bandwidth)"
            if dev.platform == "cpu" else "measured"
        ),
        "measured": measured,
        "v5e_projection": project_v5e_slice(step_ms=args.step_ms),
    }
    out = json.dumps(rep, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
