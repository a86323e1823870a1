"""Host-dedup-before-gather probe: the last forward-gather lever, measured
(VERDICT r4 missing #1 / next-step #1).

Round 4 closed the forward gather's byte-side levers (512B->256B rows: no
change — the floor is per-row DMA issue latency) and named ONE remaining
lever: fetch fewer rows by deduplicating ids on the host (unique + inverse
map in the prefetch thread), a win "only under skewed real traffic".  This
tool measures that lever directly at the bench shapes (26 x 100k-vocab
packed tables, B=16384, 512B physical rows) under uniform AND Zipf(1.1)
ids (the Criteo-categorical regime,
/root/reference/src/ctr/utils/data_process.py:57-66):

* ``plain``        — the production path: 26 x take(table, prows).
* ``uniq_only``    — fetch each field's U unique physical rows only.
* ``expand_only``  — the B-row inverse-map expansion from a (U, 128)
                     compact buffer (the second half of any dedup scheme).
* ``dedup_chain``  — uniq fetch + expansion chained (the full scheme).

Measured verdict (v5e, artifacts/dedup_probe.json): the expansion gather
costs the SAME as the original gather (~4.1 ns/row — per-row issue cost,
source-size-invariant), small gathers pipeline WORSE (7-11 ns/row at
4-9k rows vs 4.3 at 16k), and the plain gather is skew-invariant
(1.84 uniform vs 1.86 ms zipf).  dedup_chain loses on BOTH distributions
(2.2 / 3.0 ms vs 1.84 / 1.86).  Host-side dedup-before-gather is a
CLOSED NEGATIVE: every dedup-then-expand scheme pays the expansion, which
alone equals the cost it tries to save.  The forward gather stays on
XLA's pipelined path at its measured per-row floor.

Run: python -m recsys_tpu.tools.dedup_probe --out artifacts/dedup_probe.json
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

from recsys_tpu.tools.roofline import time_chained

B = 16384
F = 26
VOCAB = 100_000
PACK = 8
VP = 12504  # _pad8(ceil(VOCAB / PACK))
WIDE = 128


def zipf_ids(rng, n, vocab, a=1.1):
    """Zipf(a) ranks mapped through a random per-field vocab permutation
    (data/realistic.py's categorical model)."""
    r = rng.zipf(a, size=n * 4)
    r = r[r <= vocab][:n]
    while r.shape[0] < n:
        extra = rng.zipf(a, size=n)
        r = np.concatenate([r, extra[extra <= vocab]])[:n]
    perm = rng.permutation(vocab)
    return perm[r - 1].astype(np.int32)


def _opaque(s):
    return jnp.minimum(s.astype(jnp.int32), 0)


def run(dist: str, iters: int, rng) -> dict:
    tables = [
        jax.random.uniform(k, (VP, WIDE), minval=-0.05, maxval=0.05)
        for k in jax.random.split(jax.random.PRNGKey(0), F)
    ]
    if dist == "uniform":
        ids = [rng.integers(0, VOCAB, B).astype(np.int32) for _ in range(F)]
    else:
        ids = [zipf_ids(rng, B, VOCAB) for _ in range(F)]
    prows = [i // PACK for i in ids]
    uniq_inv = [np.unique(p, return_inverse=True) for p in prows]
    ucounts = [u.shape[0] for u, _ in uniq_inv]
    ucap = max(8, int(np.ceil(max(ucounts) / 256) * 256))
    uniq_p = [np.zeros(ucap, np.int32) for _ in range(F)]
    invs = []
    for g, (u, inv) in enumerate(uniq_inv):
        uniq_p[g][: u.shape[0]] = u
        invs.append(inv.astype(np.int32))

    prows_d = [jnp.asarray(p) for p in prows]
    uniq_d = [jnp.asarray(u) for u in uniq_p]
    inv_d = [jnp.asarray(i) for i in invs]
    compacts = [jnp.asarray(np.random.default_rng(g).standard_normal(
        (ucap, WIDE)), jnp.float32) for g in range(F)]

    def plain(s):
        z = _opaque(s)
        return sum(jnp.sum(jnp.take(tables[g], prows_d[g] + z, axis=0))
                   for g in range(F))

    def uniq_only(s):
        z = _opaque(s)
        return sum(jnp.sum(jnp.take(tables[g], uniq_d[g] + z, axis=0))
                   for g in range(F))

    def expand_only(s):
        z = _opaque(s)
        return sum(jnp.sum(jnp.take(compacts[g], inv_d[g] + z, axis=0))
                   for g in range(F))

    def dedup_chain(s):
        z = _opaque(s)
        total = 0.0
        for g in range(F):
            compact = jnp.take(tables[g], uniq_d[g] + z, axis=0)
            total = total + jnp.sum(jnp.take(compact, inv_d[g], axis=0))
        return total

    out = {"unique_phys_rows_per_field": {
        "min": int(min(ucounts)), "mean": int(np.mean(ucounts)),
        "max": int(max(ucounts)), "of": B}, "ucap": ucap}
    rows_of = {"plain": F * B, "uniq_only": F * ucap,
               "expand_only": F * B, "dedup_chain": F * (ucap + B)}
    for name, fn in (("plain", plain), ("uniq_only", uniq_only),
                     ("expand_only", expand_only),
                     ("dedup_chain", dedup_chain)):
        ms = time_chained(fn, jnp.float32(0.0), iters)
        out[name] = {
            "ms": round(ms, 3),
            "rows": rows_of[name],
            "ns_per_row": round(ms * 1e6 / rows_of[name], 2),
        }
        sys.stderr.write(
            f"[{dist}] {name:12s} {ms:7.3f} ms "
            f"({out[name]['ns_per_row']:6.2f} ns/row)\n"
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)
    rng = np.random.default_rng(0)
    rep = {"device": jax.devices()[0].device_kind, "batch": B, "fields": F,
           "vocab": VOCAB, "row_bytes": WIDE * 4}
    for dist in ("uniform", "zipf"):
        rep[dist] = run(dist, args.iters, rng)
    pl, ch = rep["zipf"]["plain"]["ms"], rep["zipf"]["dedup_chain"]["ms"]
    rep["verdict"] = (
        f"dedup_chain/plain = {ch / pl:.2f}x on zipf "
        f"({rep['uniform']['dedup_chain']['ms'] / rep['uniform']['plain']['ms']:.2f}x uniform): "
        "closed negative — the inverse-map expansion costs the same as "
        "the gather it replaces (per-row issue cost is source-size-"
        "invariant) and sub-10k-row gathers pipeline worse"
    )
    out = json.dumps(rep, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
