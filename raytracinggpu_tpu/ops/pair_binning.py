"""Ray-tile pair binning (wavefront compaction groundwork).

The tiled kernel (ops/pallas_trace.py) pays for the UNION of active tiles
across each 64-ray subgroup (~2-8 tiles) while the per-RAY mean is only
~1.4 (PERF_NOTES.md).  Pair binning restructures the work to exactly the
(ray, tile) pairs that need testing:

    1. per-ray slab tests give each ray its active tiles sorted by entry
       distance (up to K_MAX slots; overflow rays keep a remainder list),
    2. pairs scatter into tile-major order with per-tile regions padded to
       the kernel block size, so every 1024-pair block is tile-uniform,
    3. a pair kernel runs Moller-Trumbore per block against its single tile,
    4. per-ray results come back via a segment-min over pair rows.

This module provides the XLA-side construction (steps 1-2) and the
scatter-min reduction (step 4) with exact-correctness tests.  Everything
is static-shaped: the pair capacity is R*K_MAX plus per-tile padding.

STATUS (round 2): this front-packed pair-LIST form was measured and
superseded — the (S x n_tiles)-row scatter of step 2 runs at the
hardware's ~5-cycle/row rate (~1.8 ms per 262k-ray cast), which is why
the production pair traversal (ops/pairs_trace.py) keeps the same
exactly-the-needed-pairs idea but crosses into the kernel as a packed
BITMASK walked by the scalar core instead of a materialized pair list.
Kept as the measured groundwork + oracle for the pair-construction
semantics (tests/test_pair_binning.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracinggpu_tpu.core.vec import Vec3
from raytracinggpu_tpu.ops.pallas_trace import slab_enter_exit

INF = 1e9 + 9
PAIR_BLOCK = 1024  # pairs per (tile-uniform) kernel block


class PairPlan(NamedTuple):
    """Static-shaped pair layout.

    pair_ray:  (P,) int32 — source ray per pair row (-1 for padding).
    block_tile: (P // PAIR_BLOCK,) int32 — the single tile id each block
        tests (-1 for all-padding blocks).
    overflow:  (R,) bool — rays with more than K_MAX active tiles; their
        remaining tiles must go through the subgroup-list kernel.
    n_pairs:   () int32 — live pairs (diagnostics).
    """

    pair_ray: jnp.ndarray
    block_tile: jnp.ndarray
    overflow: jnp.ndarray
    n_pairs: jnp.ndarray


def per_ray_tiles(O: Vec3, u: Vec3, aabb, n_tiles: int, k_max: int, cap=None):
    """Per-ray active tiles, nearest-entry first: (R, k_max) int32 tile ids
    (n_tiles = inactive sentinel), plus the overflow mask."""
    big = np.float32(3.4e38)
    R = O.x.shape[0]
    enter, exit_, hit = slab_enter_exit(O, u, aabb, n_tiles)
    if cap is not None:
        hit = hit & (enter <= cap[None, :])

    key = jnp.where(hit, enter, big)                    # (nt, R)
    # k nearest active tiles per ray via top_k on -entry (top_k requires
    # k <= axis size, so small meshes clamp and pad with the sentinel).
    k_eff = min(k_max, n_tiles)
    neg, idx = jax.lax.top_k(-key.T, k_eff)             # (R, k_eff)
    active = neg > -big
    tiles = jnp.where(active, idx, n_tiles).astype(jnp.int32)
    if k_eff < k_max:
        tiles = jnp.concatenate(
            [tiles, jnp.full((R, k_max - k_eff), n_tiles, jnp.int32)], axis=1
        )
    overflow = hit.sum(axis=0) > k_max
    return tiles, overflow, hit


def build_pair_plan(
    tiles: jnp.ndarray, n_tiles: int, k_max: int
) -> PairPlan:
    """Scatter (ray, slot) pairs into tile-major, block-padded order.

    Capacity: every tile's region is padded up to PAIR_BLOCK, so
    P = R*k_max + n_tiles*PAIR_BLOCK (static).
    """
    R = tiles.shape[0]
    P = R * k_max + n_tiles * PAIR_BLOCK

    flat_tiles = tiles.reshape(-1)                      # (R*k, ) tile per slot
    live = flat_tiles < n_tiles

    # Per-tile counts and block-padded offsets.
    counts = jnp.zeros((n_tiles,), jnp.int32).at[flat_tiles].add(
        live.astype(jnp.int32), mode="drop"
    )
    padded = -(-counts // PAIR_BLOCK) * PAIR_BLOCK
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )

    # Rank of each pair within its tile: running count over the flattened
    # slot order (ray-major), one cumsum per tile in (nt, R*k) layout.
    # NOTE: O(nt * R * k) intermediates — fine for validation; the
    # production plan is an in-kernel binning pass (PERF_NOTES.md).
    onehot = (
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None] == flat_tiles[None, :]
    ) & live[None, :]
    running = jnp.cumsum(onehot.astype(jnp.int32), axis=1)
    rank = (
        jnp.take_along_axis(
            running, jnp.minimum(flat_tiles, n_tiles - 1)[None, :], axis=0
        )[0]
        - 1
    )
    pos = jnp.where(live, offsets[jnp.minimum(flat_tiles, n_tiles - 1)] + rank, P)

    ray_ids = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None], (R, k_max)
    ).reshape(-1)
    pair_ray = jnp.full((P,), -1, jnp.int32).at[pos].set(ray_ids, mode="drop")

    # Block -> tile id map (blocks fully inside one tile's padded region).
    block_starts = jnp.arange(P // PAIR_BLOCK, dtype=jnp.int32) * PAIR_BLOCK
    ends = offsets + padded
    blk_tile = jnp.sum(
        (block_starts[:, None] >= offsets[None, :])
        & (block_starts[:, None] < ends[None, :]),
        axis=1,
    )  # 1 if inside some region
    region = jnp.argmax(
        (block_starts[:, None] >= offsets[None, :])
        & (block_starts[:, None] < ends[None, :]),
        axis=1,
    ).astype(jnp.int32)
    block_tile = jnp.where(blk_tile > 0, region, -1)

    return PairPlan(
        pair_ray=pair_ray,
        block_tile=block_tile,
        overflow=jnp.zeros((R,), bool),  # caller overwrites
        n_pairs=live.sum().astype(jnp.int32),
    )


def segment_min_to_rays(pair_t, pair_idx, pair_ray, R: int):
    """Per-ray nearest hit from pair rows: scatter-min of t, then recover the
    winning pair's triangle index by matching t (lowest index on ties)."""
    safe_ray = jnp.maximum(pair_ray, 0)
    t_best = jnp.full((R,), INF, jnp.float32).at[safe_ray].min(
        jnp.where(pair_ray >= 0, pair_t, INF), mode="drop"
    )
    won = (pair_ray >= 0) & (pair_t == t_best[safe_ray])
    big = jnp.int32(2**30)
    idx_best = jnp.full((R,), big, jnp.int32).at[safe_ray].min(
        jnp.where(won, pair_idx, big), mode="drop"
    )
    return t_best, jnp.where(idx_best == big, 0, idx_best)
