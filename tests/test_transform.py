"""Device-side mesh pose transform (scene/transform.py).

The reference's transform path is dead code (rotation built+uploaded at
realtime_render.cu:1311-1335, transform kernel never called); here it is a
live jitted op, so the tests compare against host-side rebuilds.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinggpu_tpu.render.pipeline import render_preset_frame
from raytracinggpu_tpu.scene.presets import build_preset
from raytracinggpu_tpu.scene.transform import pose_mesh, rotation_y


def _small_scene(**over):
    over.setdefault("traversal", "pallas")
    return build_preset(
        "array_bvh", width=48, height=48, spp=2, max_depth=2, **over,
    )


def test_identity_pose_is_noop():
    cfg, tables = _small_scene()
    posed = jax.jit(lambda s: pose_mesh(s, rotation_y(0.0)))(tables)
    np.testing.assert_allclose(
        np.asarray(posed.pallas_mesh.fields),
        np.asarray(tables.pallas_mesh.fields), rtol=0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(posed.mesh.mt), np.asarray(tables.mesh.mt),
        rtol=0, atol=1e-5)
    # identity render matches the unposed render bit-for-bit is too strict
    # (field rebuild reassociates float ops); compare tonemapped frames:
    from raytracinggpu_tpu.render.image_io import tonemap

    img0, _ = render_preset_frame(tables, cfg, seed=0)
    img1, _ = render_preset_frame(posed, cfg, seed=0)
    d = np.abs(tonemap(img0).astype(int) - tonemap(img1).astype(int))
    assert (d.max(axis=-1) <= 1).mean() > 0.995


def test_tile_aabbs_contain_rotated_vertices():
    _, tables = _small_scene()
    ang = 0.7
    posed = jax.jit(lambda s: pose_mesh(s, rotation_y(ang)))(tables)
    aabb = np.asarray(posed.pallas_mesh.tile_aabb)
    src = tables.mesh_src
    valid = np.asarray(src.valid)
    from raytracinggpu_tpu.ops.pallas_trace import TILE_T

    c, s = np.cos(ang), np.sin(ang)
    M = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    for corner in (src.A, src.B, src.C):
        v = np.stack([np.asarray(corner.x), np.asarray(corner.y),
                      np.asarray(corner.z)], axis=1)
        v = v @ M.T
        n_tiles = aabb.shape[0]
        for j in range(n_tiles):
            sl = slice(j * TILE_T, (j + 1) * TILE_T)
            m = valid[sl]
            if not m.any():
                continue
            pts = v[sl][m]
            assert (pts >= aabb[j, 0:3] - 1e-4).all()
            assert (pts <= aabb[j, 3:6] + 1e-4).all()


def test_bvh_boxes_contain_rotated_root():
    _, tables = _small_scene()
    ang = -np.pi / 3  # the reference's intended pose (realtime_render.cu:1313)
    posed = jax.jit(lambda s: pose_mesh(s, rotation_y(ang)))(tables)
    src = tables.mesh_src
    valid = np.asarray(src.valid)
    c, s = np.cos(ang), np.sin(ang)
    M = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    root_mn = np.array([float(posed.bvh.mn.x[0]), float(posed.bvh.mn.y[0]),
                        float(posed.bvh.mn.z[0])])
    root_mx = np.array([float(posed.bvh.mx.x[0]), float(posed.bvh.mx.y[0]),
                        float(posed.bvh.mx.z[0])])
    for corner in (src.A, src.B, src.C):
        v = np.stack([np.asarray(corner.x), np.asarray(corner.y),
                      np.asarray(corner.z)], axis=1)[valid] @ M.T
        assert (v >= root_mn - 1e-3).all() and (v <= root_mx + 1e-3).all()


def test_member_boxes_contain_rotated_vertices():
    """The jitted pose rebuild refits MEMBER cluster boxes (the production
    culling geometry) by segment reduction; every rotated triangle vertex
    must lie inside its member's refit box."""
    _, tables = _small_scene()
    ang = 0.7
    posed = jax.jit(lambda s: pose_mesh(s, rotation_y(ang)))(tables)
    pm = posed.pairs_mesh
    slot_src = np.asarray(pm.slot_src)
    m_slot = np.asarray(pm.member_slot)
    aabb = np.asarray(pm.member_aabb)
    src = tables.mesh_src
    stack = lambda v: np.stack(
        [np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)], axis=1)
    c, s = np.cos(ang), np.sin(ang)
    Rm = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    for corner in (src.A, src.B, src.C):
        V = stack(corner) @ Rm.T
        live = slot_src >= 0
        m = m_slot[live]
        pts = V[slot_src[live]]
        assert (pts >= aabb[m, 0:3] - 1e-3).all()
        assert (pts <= aabb[m, 3:6] + 1e-3).all()


@pytest.mark.parametrize("traversal", ["pallas", "dense", "pairs"])
def test_rotated_render_matches_host_rebuild(traversal):
    """pose_mesh(R_y(a)) render == render of a scene whose mesh vertices were
    rotated on host before the BVH build.  The BVH differs (topology built
    from rotated centroids) but the geometry is identical, so the images
    agree up to float-reassociation noise on a handful of silhouette paths."""
    ang = 0.9
    cfg, tables = _small_scene(traversal=traversal)
    posed = jax.jit(lambda s: pose_mesh(s, rotation_y(ang)))(tables)
    img_dev, _ = render_preset_frame(posed, cfg, seed=0)

    from raytracinggpu_tpu.scene.mesh import build_mesh, rescale, rotate_y
    from raytracinggpu_tpu.scene.obj import CAT_OBJ_PATH, read_obj
    from raytracinggpu_tpu.scene.presets import build_preset as bp

    obj = read_obj(CAT_OBJ_PATH)
    obj.vertices = rotate_y(
        rescale(obj.vertices, 0.6, (0.0, -10.0, 0.0)), ang)
    mesh = build_mesh(obj)
    cfg2, tables2 = bp("array_bvh", mesh=mesh, width=48, height=48, spp=2,
                       max_depth=2, traversal=traversal)
    img_host, _ = render_preset_frame(tables2, cfg2, seed=0)

    from raytracinggpu_tpu.render.image_io import tonemap

    # identical RNG and geometry; only fp tie-breaks may flip a path
    d = np.abs(tonemap(img_dev).astype(int) - tonemap(img_host).astype(int))
    assert (d.max(axis=-1) <= 1).mean() > 0.98


def test_pose_composes_with_translation():
    cfg, tables = _small_scene()
    posed = jax.jit(
        lambda s: pose_mesh(s, rotation_y(0.0), t=(3.0, 0.0, 0.0))
    )(tables)
    a0 = np.asarray(tables.pallas_mesh.tile_aabb)
    a1 = np.asarray(posed.pallas_mesh.tile_aabb)
    live = a0[:, 0] < 1e9
    np.testing.assert_allclose(a1[live, 0], a0[live, 0] + 3.0, atol=1e-4)
    np.testing.assert_allclose(a1[live, 1], a0[live, 1], atol=1e-4)


def test_realtime_animated_mesh():
    """cfg.animate_mesh spins the cat per frame: frames differ, the mesh
    angle advances, and determinism holds for equal seeds."""
    from raytracinggpu_tpu.render.realtime import init_state, step

    cfg, tables = build_preset(
        "realtime", width=32, height=32, spp=2, max_depth=2,
        traversal="pallas", animate_mesh=True,
    )
    st = init_state(cfg, tables, seed=0)
    st, d1 = step(tables, cfg, st)
    d1 = np.asarray(d1).copy()  # materialize before the donated next step
    acc1 = np.asarray(st.accum).copy()
    a1 = float(st.mesh_angle)
    st, _d2 = step(tables, cfg, st)
    assert float(st.mesh_angle) > a1 > 0.0
    # the second frame saw a rotated mesh (and fresh RNG): raw radiance
    # accumulation cannot repeat (u8 displays may quantize equal at 32^2)
    assert not np.array_equal(np.asarray(st.accum), 2.0 * acc1)

    st_b = init_state(cfg, tables, seed=0)
    st_b, d1b = step(tables, cfg, st_b)
    assert np.array_equal(d1, np.asarray(d1b))
