"""Pair-binning construction: exactness of the tile-major pair layout and
the segment-min reduction (round-2 traversal groundwork)."""
import jax.numpy as jnp
import numpy as np

from raytracinggpu_tpu.core.vec import Vec3
from raytracinggpu_tpu.ops.pair_binning import (
    PAIR_BLOCK,
    build_pair_plan,
    per_ray_tiles,
    segment_min_to_rays,
)
from raytracinggpu_tpu.ops.pallas_trace import TILE_T, build_pallas_tables


def _cat_tables(cat_mesh_raw):
    from raytracinggpu_tpu.scene.mesh import build_mesh

    mesh = build_mesh(cat_mesh_raw)
    return build_pallas_tables(mesh.A, mesh.B, mesh.C)


def test_per_ray_tiles_sorted_and_complete(cat_mesh_raw, rng):
    tab = _cat_tables(cat_mesh_raw)
    n_tiles = tab.fields.shape[1] // TILE_T
    n = 512
    o = rng.uniform(-25, 25, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    K = 8
    tiles, overflow, hit = per_ray_tiles(O, u, tab.tile_aabb, n_tiles, K)
    tiles = np.asarray(tiles)
    hitn = np.asarray(hit)  # (nt, R)
    for r in range(0, n, 37):
        act = set(np.nonzero(hitn[:, r])[0].tolist())
        got = set(t for t in tiles[r] if t < n_tiles)
        if len(act) <= K:
            assert got == act, f"ray {r}"
            assert not np.asarray(overflow)[r]
        else:
            assert got <= act and len(got) == K
            assert np.asarray(overflow)[r]


def test_pair_plan_layout(cat_mesh_raw, rng):
    tab = _cat_tables(cat_mesh_raw)
    n_tiles = tab.fields.shape[1] // TILE_T
    n = 1024
    o = rng.uniform(-25, 25, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    K = 8
    tiles, overflow, hit = per_ray_tiles(O, u, tab.tile_aabb, n_tiles, K)
    plan = build_pair_plan(tiles, n_tiles, K)
    pair_ray = np.asarray(plan.pair_ray)
    block_tile = np.asarray(plan.block_tile)

    # Every live (ray, tile) slot appears exactly once, inside a block whose
    # tile id matches.
    tiles_np = np.asarray(tiles)
    want = {(r, t) for r in range(n) for t in tiles_np[r] if t < n_tiles}
    got = set()
    for p, r in enumerate(pair_ray):
        if r < 0:
            continue
        t = block_tile[p // PAIR_BLOCK]
        assert t >= 0
        got.add((int(r), int(t)))
    assert got == want
    assert int(plan.n_pairs) == len(want)
    # Padding blocks carry tile -1 and only -1 rays.
    for b, t in enumerate(block_tile):
        rows = pair_ray[b * PAIR_BLOCK : (b + 1) * PAIR_BLOCK]
        if t < 0:
            assert (rows < 0).all()


def test_segment_min_reduction():
    # 3 rays; pairs with known t/idx; padding rows ignored.
    pair_ray = jnp.asarray(np.array([0, 0, 1, -1, 2, 2, 2, -1], np.int32))
    pair_t = jnp.asarray(np.array([5.0, 3.0, 7.0, 0.0, 2.0, 2.0, 9.0, 0.0], np.float32))
    pair_idx = jnp.asarray(np.array([10, 11, 12, 0, 14, 13, 15, 0], np.int32))
    t, idx = segment_min_to_rays(pair_t, pair_idx, pair_ray, 3)
    np.testing.assert_allclose(np.asarray(t), [3.0, 7.0, 2.0])
    # Ray 2 has an exact tie at t=2.0 -> lowest idx wins.
    np.testing.assert_array_equal(np.asarray(idx), [11, 12, 13])
