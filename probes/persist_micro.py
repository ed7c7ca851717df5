"""Micro-arithmetic of the persistent cross-cast compaction proposal
(VERDICT r3 item 1): what a full-R wavefront permute costs vs the per-cast
take + scatter it would replace.

The persistent scheme keeps the wavefront in packed order across casts:
per deep depth it must permute the live state (O, u, ri + color accum +
throughput = 13 f32 rows) by the FULL R-permutation, gather that depth's 2
uniform rows, and compose the permutation (1 int row) — replacing the
compact branch's (10-11, R)->(., C) take and (5, C)->(5, R) scatter at
C << R.  All moves here are minor-axis takes (the cheap row form).
Run on TPU; prints one JSON line.
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from raytracinggpu_tpu.bench._timing import setup_cache, timed_scan

    setup_cache()
    R = 524288
    C1, C2 = 40960, 69632  # production ladder tiers at 512k chunks
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, R).astype(jnp.int32)
    state13 = jax.random.normal(key, (13, R), jnp.float32)
    rows10 = state13[:10]
    out = {"R": R, "floor_ms": round(timed_scan(
        lambda x: x + 1.0, (jnp.ones((128,)),), 30) * 1e3, 3)}

    # persistent-scheme costs (per deep depth)
    out["permute13_at_R_ms"] = round(timed_scan(
        lambda s, p: jnp.take(s, p, axis=1), (state13, perm), 30) * 1e3, 3)
    out["compose_perm_ms"] = round(timed_scan(
        lambda p: jnp.take(p, p), (perm,), 30) * 1e3, 3)
    out["uniforms2_gather_ms"] = round(timed_scan(
        lambda s, p: jnp.take(s[:2], p, axis=1), (state13, perm),
        30) * 1e3, 3)

    # current per-cast costs it would replace (closest cast at each tier)
    for name, C in (("t1", C1), ("t2", C2)):
        src = perm[:C]
        vals5 = jax.random.normal(key, (5, C), jnp.float32)
        dflt = jnp.zeros((5, R), jnp.float32)
        out[f"take10_at_{name}_ms"] = round(timed_scan(
            lambda s, sc=src: jnp.take(rows10, sc, axis=1), (rows10,),
            30) * 1e3, 3)
        out[f"scatter5_at_{name}_ms"] = round(timed_scan(
            lambda v, sc=src: dflt.at[:, sc].set(v), (vals5,),
            30) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
