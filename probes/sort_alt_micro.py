"""Price the compaction sort alternatives at production shapes (r4).

The deep-cast serial chain is key -> sort@R -> take -> kernel -> scatter;
the full-R ``lax.sort`` is the biggest single link.  We only need the
n_act (= a few % of R) active rays grouped by key — candidates:

  a) status quo: lax.sort of (R,) packed int32 (key<<shift | lane)
  b) partition-then-sort: cumsum(act) dest + one int32 scatter into a
     (C+1,) buffer + lax.sort at C
  c) the scatter@R and cumsum@R priced separately

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
    out = {}
    key = jax.random.PRNGKey(0)
    for R, C, frac in ((524288, 69632, 0.13), (524288, 40960, 0.06)):
        nc = 32
        shift = 31 - ((nc + 1) * (nc + 1) - 1).bit_length()
        act = jax.random.uniform(key, (R,)) < frac
        kraw = jax.random.randint(key, (R,), 0, (nc + 1) * (nc + 1) - 1,
                                  jnp.int32)
        kfull = jnp.where(act, kraw, np.int32((nc + 1) * (nc + 1) - 1))
        lane = jnp.arange(R, dtype=jnp.int32)
        skey = (kfull << shift) | lane
        tag = f"R{R}_C{C}_f{frac}"

        out[f"{tag}_sortR_ms"] = round(timed_scan(
            lambda s: jax.lax.sort(s)[:C] & np.int32((1 << shift) - 1),
            (skey,), 30) * 1e3, 3)

        def part_sort(kf, a):
            dest = jnp.where(a, jnp.cumsum(a.astype(jnp.int32)) - 1, C)
            buf = jnp.full((C + 1,), np.int32(2**31 - 1))
            packed = buf.at[dest].set((kf << shift) | lane)[:C]
            return jax.lax.sort(packed) & np.int32((1 << shift) - 1)

        out[f"{tag}_partsort_ms"] = round(timed_scan(
            part_sort, (kfull, act), 30) * 1e3, 3)

        out[f"{tag}_cumsum_ms"] = round(timed_scan(
            lambda a: jnp.cumsum(a.astype(jnp.int32)), (act,),
            30) * 1e3, 3)
        dest = jnp.where(act, jnp.cumsum(act.astype(jnp.int32)) - 1, C)
        out[f"{tag}_scatterRtoC_ms"] = round(timed_scan(
            lambda d, s: jnp.full((C + 1,), np.int32(2**31 - 1)).at[d].set(s)[:C],
            (dest, skey), 30) * 1e3, 3)
        out[f"{tag}_sortC_ms"] = round(timed_scan(
            lambda p: jax.lax.sort(p), (skey[:C],), 30) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
