"""Pin the flash-attention on-chip gradient gap to its precision knob.

Round-1 left an un-diagnosed ~0.5% relative difference between the flash
kernel's gradients and the XLA sdpa path's on TPU (STATUS round-1 "known
gaps"; both were ~1e-6 vs float64 on CPU).  This tool settles it by
measurement at SASRec shapes (B=64, H=2, S=512, D=64, causal + ragged
key-padding):

1. a float64 ground-truth gradient is computed on the host CPU backend
   (subprocess — x64 is unavailable on TPU) through the jnp reference sdpa;
2. on chip, d(loss)/d(q,k,v) is taken through BOTH paths at BOTH matmul
   precisions: DEFAULT (MXU rounds inputs to bf16, f32 accumulation — the
   framework-wide dense contract) and HIGHEST (full-f32 MXU passes);
3. relative L2 errors are asserted:
     * xla@HIGHEST vs float64        <= 1e-5   (measured 1.2e-6 on v5e)
     * flash@HIGHEST vs float64      <= 1e-4   (measured 2.8e-5: the f32
       exp/logsumexp RECOMPUTE in the blockwise backward — algorithmic
       noise of flash itself, present at any matmul precision)
     * flash@HIGHEST vs xla@HIGHEST  <= 1e-4   (same source)
     * each @DEFAULT vs float64      <= 2e-2   (measured ~4e-3: bf16 MXU
       input rounding — dominates everything else by 100x)

Measured verdict (v5e, 2026-08): the round-1 "~0.5% gradient gap" is
PINNED to DEFAULT MXU input rounding — flash and XLA are each ~0.40-0.42%
from float64 at DEFAULT and only 0.16% from each other; at HIGHEST both
drop below 3e-5.  A precision-contract property, not a kernel bug.  The
contract is documented on kernels/dispatch.sdpa (precision=...).

    python -m recsys_tpu.tools.flash_numerics          # full on-chip check
    python -m recsys_tpu.tools.flash_numerics --ref F  # (internal) f64 ref

Prints one JSON object on stdout; exits nonzero on tolerance failure.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

B, H, S, D = 64, 2, 512, 64
SEED = 0


def _inputs():
    rng = np.random.default_rng(SEED)
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    lengths = rng.integers(S // 2, S + 1, B)
    mask = (np.arange(S)[None, :] < lengths[:, None]).astype(np.int32)
    g = rng.standard_normal((B, H, S, D)).astype(np.float32)
    return q, k, v, mask, g


def _ref_main(out_path: str):
    """float64 ground truth on the CPU backend (runs in a subprocess)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from recsys_tpu.kernels import attention as attn_ref
    from recsys_tpu.kernels.dispatch import _full_mask

    q, k, v, mask, g = _inputs()
    q64, k64, v64, g64 = (jnp.asarray(a, jnp.float64) for a in (q, k, v, g))
    full = _full_mask(jnp.asarray(mask), q64, k64, causal=True)

    def loss(q, k, v):
        out = attn_ref.sdpa(q, k, v, full, precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(out * g64)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q64, k64, v64)
    np.savez(out_path, dq=np.asarray(dq), dk=np.asarray(dk), dv=np.asarray(dv))


def _rel(a, b):
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def main(argv=None):
    p = argparse.ArgumentParser(prog="recsys_tpu.tools.flash_numerics")
    p.add_argument("--ref", help="(internal) write the f64 reference npz")
    p.add_argument("--interpret", action="store_true",
                   help="run the kernels in interpret mode (CPU check)")
    args = p.parse_args(argv)
    if args.ref:
        _ref_main(args.ref)
        return

    with tempfile.TemporaryDirectory() as td:
        ref_path = os.path.join(td, "ref.npz")
        subprocess.run(
            [sys.executable, "-m", "recsys_tpu.tools.flash_numerics",
             "--ref", ref_path],
            check=True,
        )
        ref = dict(np.load(ref_path).items())

    import jax
    import jax.numpy as jnp

    from recsys_tpu.kernels import attention as attn_ref
    from recsys_tpu.kernels import dispatch
    from recsys_tpu.kernels.dispatch import _full_mask

    q, k, v, mask, g = _inputs()
    qj, kj, vj, gj = (jnp.asarray(a) for a in (q, k, v, g))
    maskj = jnp.asarray(mask)
    HI = jax.lax.Precision.HIGHEST

    def grads(path, precision):
        if path == "flash":
            def loss(q, k, v):
                out = dispatch._sdpa_pallas(
                    q, k, v, maskj, True, args.interpret, precision
                )
                return jnp.sum(out * gj)
        else:
            full = _full_mask(maskj, qj, kj, causal=True)

            def loss(q, k, v):
                out = attn_ref.sdpa(q, k, v, full, precision=precision)
                return jnp.sum(out * gj)

        dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qj, kj, vj)
        return {"dq": np.asarray(dq), "dk": np.asarray(dk),
                "dv": np.asarray(dv)}

    runs = {
        "flash_default": grads("flash", None),
        "flash_highest": grads("flash", HI),
        "xla_default": grads("xla", None),
        "xla_highest": grads("xla", HI),
    }

    def rel3(a, b):
        return round(max(_rel(a[n], b[n]) for n in ("dq", "dk", "dv")), 8)

    report = {
        "device": jax.devices()[0].device_kind,
        "shape": [B, H, S, D],
        "flash_vs_xla_default": rel3(runs["flash_default"], runs["xla_default"]),
        "flash_vs_xla_highest": rel3(runs["flash_highest"], runs["xla_highest"]),
        "flash_default_vs_f64": rel3(runs["flash_default"], ref),
        "xla_default_vs_f64": rel3(runs["xla_default"], ref),
        "flash_highest_vs_f64": rel3(runs["flash_highest"], ref),
        "xla_highest_vs_f64": rel3(runs["xla_highest"], ref),
    }
    checks = {
        "flash_vs_xla_highest": 1e-4,
        "flash_highest_vs_f64": 1e-4,
        "xla_highest_vs_f64": 1e-5,
        "flash_default_vs_f64": 2e-2,
        "xla_default_vs_f64": 2e-2,
    }
    failures = {k: (report[k], tol) for k, tol in checks.items()
                if report[k] > tol}
    report["pass"] = not failures
    print(json.dumps(report))
    if failures:
        sys.stderr.write(f"TOLERANCE FAILURES: {failures}\n")
        sys.exit(1)


if __name__ == "__main__":
    main()
