"""Sharded rendering == single-chip BITWISE when the sample-fusion group
aligns with the sample shard (VERDICT r2 weak item 4), and the PRODUCTION
pairs kernel running under per-device row shards (weak item 3).

Alignment rule: with cfg.spp_fuse == spp // n_sp, the single-chip path
scans n_sp fusion groups sequentially (acc = ((0 + G0) + G1) ...) and each
sp-shard device computes exactly one group G_i with identical code, merged
by psum over the sp axis — both sides reduce the identical partials in
ascending device order, so frames match bit for bit.
"""
import jax
import numpy as np
import pytest

from raytracinggpu_tpu.parallel.sharding import make_mesh, render_frame_sharded
from raytracinggpu_tpu.render.pipeline import Camera, render_frame
from raytracinggpu_tpu.scene.presets import build_preset


def _render_both(cfg, tables, n_px, n_sp, seed=7):
    cam = Camera.fixed(cfg.camera_c)
    key = jax.random.PRNGKey(seed)
    ref, _ = render_frame(tables, cfg, cam, key)
    mesh = make_mesh(n_px=n_px, n_sp=n_sp)
    img, _ = render_frame_sharded(tables, cfg, cam, key, mesh)
    return np.asarray(ref), np.asarray(img)


@pytest.mark.parametrize("n_px,n_sp,spp", [(4, 2, 4), (2, 4, 8), (4, 2, 8)])
def test_sharded_bitwise_when_fuse_aligned(n_px, n_sp, spp):
    cfg, tables = build_preset(
        "global", width=16, height=16, spp=spp, max_depth=2,
        traversal="dense", spp_fuse=spp // n_sp,
    )
    ref, img = _render_both(cfg, tables, n_px, n_sp)
    np.testing.assert_array_equal(img, ref)


def test_sharded_pairs_with_compaction(cat_mesh_raw):
    """Grouped activity compaction under per-device row shards: the sort/
    gather/scatter run per shard (no cross-device comm) and compaction is
    exact, so aligned-fuse sharding stays bitwise equal.  pairs_block is
    shrunk so the compact capacity (rounded to whole blocks) stays below
    the per-device ray count — on tiny shards _compact_ok disables
    compaction, which would leave this path untested."""
    from raytracinggpu_tpu.scene.mesh import build_mesh

    mesh_data = build_mesh(cat_mesh_raw)
    cfg, tables = build_preset(
        "array_bvh", mesh=mesh_data, width=64, height=64, spp=2,
        max_depth=2, traversal="pairs", spp_fuse=1, pairs_block=128,
        pairs_compact=0.25, pairs_cluster="sah", pairs_pack="pave",
        pairs_cut=32,
    )
    assert tables.pairs_mesh is not None
    ref, img = _render_both(cfg, tables, 4, 2)
    np.testing.assert_array_equal(img, ref)


def test_sharded_pairs_production_kernel(cat_mesh_raw):
    """The pairs traversal (interpret mode on CPU) under an (px x sp) mesh:
    per-device row shards shrink R per device, exercising the SMEM-budget
    chunk sizing under sharding; aligned fuse -> bitwise equality."""
    from raytracinggpu_tpu.scene.mesh import build_mesh

    mesh_data = build_mesh(cat_mesh_raw)
    cfg, tables = build_preset(
        "array_bvh", mesh=mesh_data, width=16, height=16, spp=2, max_depth=2,
        traversal="pairs", spp_fuse=1,
    )
    assert tables.pairs_mesh is not None
    ref, img = _render_both(cfg, tables, 4, 2)
    np.testing.assert_array_equal(img, ref)
