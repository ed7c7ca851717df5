"""Pair-compaction traversal (ops/pairs_trace.py) vs the tiled pallas kernel.

Both modes must produce identical nearest hits (same t bits — each triangle's
MT quantities are computed by the same factorized formula — and the same
winner index under the reference's lowest-index tie-break,
global_launcher.cu:268-278).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinggpu_tpu.core.vec import Vec3
from raytracinggpu_tpu.ops.pairs_trace import (
    build_pairs_tables,
    intersect_tris_pairs,
    intersect_tris_pairs_shadow,
)
from raytracinggpu_tpu.ops.pallas_trace import (
    intersect_tris_pallas,
    intersect_tris_shadow,
)
from raytracinggpu_tpu.scene.presets import build_preset


@pytest.fixture(scope="module")
def cat():
    cfg, tables = build_preset("array_bvh", traversal="pairs")
    return cfg, tables


def _rays(kind: str, R: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    if kind == "camera":
        # fan of rays from the camera toward the scene
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d[:, 2] = -np.abs(d[:, 2]) - 0.5
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        O = np.tile(np.array([0.0, 0.0, 55.0], np.float32), (R, 1))
    else:  # scattered: random origins in the box, random directions
        O = rng.uniform(-25, 25, (R, 3)).astype(np.float32)
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        Vec3(*(jnp.asarray(O[:, i].copy()) for i in range(3))),
        Vec3(*(jnp.asarray(d[:, i].copy()) for i in range(3))),
    )


@pytest.mark.parametrize("kind", ["camera", "scattered"])
def test_closest_matches_pallas(cat, kind):
    _, tables = cat
    O, u = _rays(kind, 3000)
    a = intersect_tris_pairs(
        O, u, tables.pairs_mesh, 1e-4, interpret=True, subg=16, blk=1024)
    b = intersect_tris_pallas(
        O, u, tables.pallas_mesh, 1e-4, interpret=True, sort_rays=False)
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    hit = np.asarray(a.t) < 1e9
    np.testing.assert_array_equal(
        np.asarray(a.idx)[hit], np.asarray(b.idx)[hit])


def test_closest_with_cap(cat):
    _, tables = cat
    O, u = _rays("scattered", 2000, seed=3)
    cap = jnp.asarray(
        np.random.default_rng(5).uniform(1.0, 40.0, 2000).astype(np.float32))
    a = intersect_tris_pairs(
        O, u, tables.pairs_mesh, 1e-4, cap=cap, interpret=True, blk=1024)
    b = intersect_tris_pallas(
        O, u, tables.pallas_mesh, 1e-4, cap=cap, interpret=True,
        sort_rays=False)
    # cap culling is conservative: results at/below the cap must be equal
    ta, tb = np.asarray(a.t), np.asarray(b.t)
    capn = np.asarray(cap)
    m = (ta <= capn) | (tb <= capn)
    np.testing.assert_array_equal(ta[m], tb[m])


def test_shadow_matches_pallas(cat):
    _, tables = cat
    O, u = _rays("scattered", 2000, seed=7)
    cap = jnp.full((2000,), 60.0, jnp.float32)
    a = intersect_tris_pairs_shadow(
        O, u, tables.pairs_mesh, 1e-4, cap=cap, interpret=True, blk=1024)
    b = intersect_tris_shadow(
        O, u, tables.pallas_mesh, 1e-4, cap=cap, interpret=True,
        sort_rays=False)
    ta, tb = np.asarray(a), np.asarray(b)
    m = (ta <= 60.0) | (tb <= 60.0)
    np.testing.assert_array_equal(ta[m], tb[m])


def test_shadow_active_mask(cat):
    """Relevance masking: active lanes' distances are unchanged by the mask;
    masked lanes do no mesh work and return INF (their occlusion result is
    provably unused by the integrator — wavefront.py sh_active)."""
    _, tables = cat
    R = 2000
    O, u = _rays("scattered", R, seed=9)
    active = jnp.asarray(np.random.default_rng(4).random(R) < 0.6)
    full = intersect_tris_pairs_shadow(
        O, u, tables.pairs_mesh, 1e-4, interpret=True, blk=1024)
    masked = intersect_tris_pairs_shadow(
        O, u, tables.pairs_mesh, 1e-4, interpret=True, blk=1024,
        active=active)
    am = np.asarray(active)
    f, m = np.asarray(full), np.asarray(masked)
    np.testing.assert_array_equal(m[am], f[am])
    # masking is subgroup-granular: a masked lane may still be swept by its
    # peers' tiles, but it can only ever see a SUBSET of tiles, so its
    # nearest distance is monotonically >= the unmasked one; a lane in a
    # fully-masked subgroup returns INF
    assert (m >= f).all()
    sg_all_masked = ~am.reshape(-1, 16).any(axis=1)
    lanes = np.repeat(sg_all_masked, 16)
    assert (m[lanes] >= 1e9).all()


def test_bitmask_matches_bruteforce_tiles(cat):
    """The packed culling bitmask must cover exactly the tiles whose AABB
    the ray subgroup intersects (no silent drop: a cleared bit for an
    intersected tile would lose hits)."""
    from raytracinggpu_tpu.ops.pairs_trace import _pair_bits
    from raytracinggpu_tpu.ops.pallas_trace import slab_enter_exit

    _, tables = cat
    O, u = _rays("scattered", 1024, seed=11)
    tab = tables.pairs_mesh
    nc = tab.tile_aabb.shape[0]
    subg, blk = 16, 1024
    bits = np.asarray(_pair_bits(O, u, tab.tile_aabb, nc, subg, blk))
    _, _, hit = slab_enter_exit(O, u, tab.tile_aabb, nc)
    want = np.asarray(hit).reshape(nc, -1, subg).any(axis=2)   # (nc, S)
    for j in range(nc):
        got = (bits[j // 32] >> (j % 32)) & 1
        np.testing.assert_array_equal(got.astype(bool), want[j])


def test_member_bits_exact_and_tighter(cat):
    """Production member-box culling: bit (sg, tile) set iff the subgroup
    hits some MEMBER cluster box of the tile — brute-force checked — and
    member bits are a subset of the union-box bits (strictly tighter, never
    adding a tile)."""
    from raytracinggpu_tpu.ops.pairs_trace import _members_of, _pair_bits
    from raytracinggpu_tpu.ops.pallas_trace import slab_enter_exit

    _, tables = cat
    O, u = _rays("scattered", 1024, seed=12)
    tab = tables.pairs_mesh
    nc = tab.tile_aabb.shape[0]
    nm = tab.member_aabb.shape[0]
    assert nm >= nc
    subg, blk = 16, 1024
    bits_m = np.asarray(_pair_bits(O, u, tab.tile_aabb, nc, subg, blk,
                                   members=_members_of(tab)))
    bits_u = np.asarray(_pair_bits(O, u, tab.tile_aabb, nc, subg, blk))
    assert ((bits_m & ~bits_u) == 0).all()
    _, _, hit_m = slab_enter_exit(O, u, tab.member_aabb, nm)
    sg_m = np.asarray(hit_m).reshape(nm, -1, subg).any(axis=2)  # (nm, S)
    m_tile = np.asarray(tab.member_tile)
    for j in range(nc):
        got = (bits_m[j // 32] >> (j % 32)) & 1
        want = sg_m[m_tile == j].any(axis=0)
        np.testing.assert_array_equal(got.astype(bool), want)
    # every live slot belongs to exactly one member (exactness relies on
    # triangle-in-member-box containment, which the pairs-vs-pallas parity
    # tests exercise end to end with member culling active)
    slot_src = np.asarray(tab.slot_src)
    m_slot = np.asarray(tab.member_slot)
    assert ((m_slot >= 0) == (slot_src >= 0)).all()


def test_walk_order_invariance(cat):
    """Subgroup-major (sgw=1, production) and word-major (sgw=0, the r2
    form) walks visit exactly the same (subgroup, tile) pairs in a
    different order; the lexicographic (t, id) fold makes the results
    bit-identical."""
    _, tables = cat
    O, u = _rays("scattered", 2000, seed=21)
    cap = jnp.asarray(
        np.random.default_rng(22).uniform(1.0, 40.0, 2000).astype(np.float32))
    a = intersect_tris_pairs(
        O, u, tables.pairs_mesh, 1e-4, cap=cap, interpret=True, blk=1024,
        sgw=1)
    b = intersect_tris_pairs(
        O, u, tables.pairs_mesh, 1e-4, cap=cap, interpret=True, blk=1024,
        sgw=0)
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    hit = np.asarray(a.t) < 1e9
    np.testing.assert_array_equal(
        np.asarray(a.idx)[hit], np.asarray(b.idx)[hit])
    sa = intersect_tris_pairs_shadow(
        O, u, tables.pairs_mesh, 1e-4, cap=cap, interpret=True, blk=1024,
        sgw=1)
    sb = intersect_tris_pairs_shadow(
        O, u, tables.pairs_mesh, 1e-4, cap=cap, interpret=True, blk=1024,
        sgw=0)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


@pytest.mark.parametrize("subg,blk", [(8, 1024), (32, 2048), (64, 4096)])
def test_subgroup_block_invariance(cat, subg, blk):
    _, tables = cat
    O, u = _rays("camera", 1500, seed=13)
    a = intersect_tris_pairs(
        O, u, tables.pairs_mesh, 1e-4, interpret=True, subg=subg, blk=blk)
    b = intersect_tris_pairs(
        O, u, tables.pairs_mesh, 1e-4, interpret=True, subg=16, blk=1024)
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    hit = np.asarray(a.t) < 1e9
    np.testing.assert_array_equal(
        np.asarray(a.idx)[hit], np.asarray(b.idx)[hit])


def test_cluster_tiles_are_tight(cat):
    """The junk-tile problem the cluster cut removes: no tile AABB may span
    a large fraction of the mesh (tiles are subtree boxes now)."""
    _, tables = cat
    aabb = np.asarray(tables.pairs_mesh.tile_aabb)
    ext = aabb[:, 3:6] - aabb[:, 0:3]
    vol = ext.prod(axis=1)
    mesh_ext = aabb[:, 3:6].max(0) - aabb[:, 0:3].min(0)
    assert vol.max() < 0.10 * mesh_ext.prod(), (
        f"worst tile volume {vol.max():.0f} vs mesh {mesh_ext.prod():.0f}")


def test_render_parity_with_pallas():
    from raytracinggpu_tpu.render.pipeline import render_preset_frame

    cfg_a, tab = build_preset(
        "array_bvh", width=48, height=48, spp=2, max_depth=3,
        traversal="pairs")
    from dataclasses import replace

    img_a, stats_a = render_preset_frame(tab, cfg_a, seed=0)
    img_b, stats_b = render_preset_frame(tab, replace(cfg_a, traversal="pallas"), seed=0)
    np.testing.assert_array_equal(img_a, img_b)
    for a, b in zip(stats_a, stats_b):
        np.testing.assert_array_equal(a, b)


def test_pose_transform_rebuild(cat):
    """pose_mesh must rebuild the pairs tables consistently: a rotated pose
    equals a host build from rotated vertices."""
    from raytracinggpu_tpu.scene.transform import pose_mesh, rotation_y

    _, tables = cat
    ang = 0.6
    posed = jax.jit(lambda s: pose_mesh(s, rotation_y(ang)))(tables)

    src = tables.mesh_src
    c, s = np.cos(ang, dtype=np.float32), np.sin(ang, dtype=np.float32)
    M = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    valid = np.asarray(src.valid)

    O, u = _rays("scattered", 1500, seed=17)
    a = intersect_tris_pairs(
        O, u, posed.pairs_mesh, 1e-4, interpret=True, blk=1024)
    # reference: rotate the BVH-ordered corners on host, rebuild tables
    # through build_pairs_tables with the same FlatBVH (same cluster cut)
    def rot(vec):
        v = np.stack([np.asarray(vec.x), np.asarray(vec.y),
                      np.asarray(vec.z)], axis=1)[valid]
        return v @ M.T

    from raytracinggpu_tpu.scene.mesh import build_mesh, rescale
    from raytracinggpu_tpu.scene.obj import CAT_OBJ_PATH, read_obj

    obj = read_obj(CAT_OBJ_PATH)
    obj.vertices = rescale(obj.vertices, 0.6, (0.0, -10.0, 0.0))
    mesh = build_mesh(obj)
    tb = build_pairs_tables(rot(src.A), rot(src.B), rot(src.C), mesh.bvh)
    b = intersect_tris_pairs(O, u, tb, 1e-4, interpret=True, blk=1024)
    np.testing.assert_allclose(
        np.asarray(a.t), np.asarray(b.t), rtol=1e-5, atol=1e-4)


def test_degenerate_leaf_bigger_than_tile():
    """A degenerate midpoint partition can leave a BVH LEAF with more than
    128 triangles; the pavement must split it across tiles instead of
    silently overwriting spilled slots (every triangle id appears exactly
    once in slot_src)."""
    from raytracinggpu_tpu.accel.bvh import build_bvh
    from raytracinggpu_tpu.ops.pairs_trace import (
        build_pairs_tables,
        intersect_tris_pairs,
    )
    from raytracinggpu_tpu.ops.triangle import (
        build_tri_tables,
        intersect_tris_dense,
    )

    # 200 triangles with IDENTICAL centroids: every midpoint partition
    # degenerates, so the root becomes one 200-triangle leaf.
    n = 200
    rng = np.random.default_rng(3)
    base = np.array([[0.0, 0, 0], [3.0, 0, 0], [0.0, 3, 0]], np.float32)
    tris = []
    for i in range(n):
        d = rng.standard_normal(3).astype(np.float32)
        d -= d.mean(axis=0, keepdims=True) if d.ndim > 1 else d.mean()
        tris.append(base + np.stack([d, -d, np.zeros(3, np.float32)]))
    A = np.stack([t[0] for t in tris])
    B = np.stack([t[1] for t in tris])
    C = np.stack([t[2] for t in tris])
    # force identical centroids exactly
    cent = (A + B + C) / 3.0
    shift = cent[0] - cent
    A, B, C = A + shift, B + shift, C + shift
    bvh = build_bvh(A, B, C)
    leaves = bvh.right == -1
    assert int((bvh.tri_end - bvh.tri_start)[leaves].max()) > 128
    Ao, Bo, Co = A[bvh.order], B[bvh.order], C[bvh.order]
    tab = build_pairs_tables(Ao, Bo, Co, bvh)
    slots = np.asarray(tab.slot_src)
    live = slots[slots >= 0]
    assert len(live) == n and len(np.unique(live)) == n

    m = 256
    o = rng.uniform(-4, 7, (m, 3)).astype(np.float32)
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    ph = intersect_tris_pairs(O, u, tab, 1e-4, interpret=True, blk=256)
    dh = intersect_tris_dense(
        O, u, build_tri_tables(Ao, Bo, Co, pad_to=512), eps_leaf=1e-4)
    np.testing.assert_array_equal(
        np.asarray(ph.t) < 1e9, np.asarray(dh.t) < 1e9)
    hit = np.asarray(ph.t) < 1e9
    np.testing.assert_allclose(
        np.asarray(ph.t)[hit], np.asarray(dh.t)[hit], rtol=1e-5, atol=1e-5)


def test_fat_tiles_bitwise_match(cat_mesh_raw):
    """tile_t in {256, 512} renders bit-identically to the 128-wide tiles:
    fat tiles change only the visit granularity (per-visit scalar-walk cost
    amortization), never the math or the winner selection — culling stays
    per-cluster via member boxes (same member count at every width)."""
    from raytracinggpu_tpu.render.pipeline import render_preset_frame
    from raytracinggpu_tpu.scene.mesh import build_mesh
    from raytracinggpu_tpu.scene.presets import build_preset
    from raytracinggpu_tpu.ops.pairs_trace import tile_width

    mesh_data = build_mesh(cat_mesh_raw)
    imgs, members = {}, {}
    for tt in (128, 512):
        cfg, tables = build_preset(
            "array_bvh", mesh=mesh_data, width=32, height=32, spp=1,
            max_depth=2, traversal="pairs", pairs_tile=tt)
        assert tile_width(tables.pairs_mesh) == tt
        members[tt] = tables.pairs_mesh.member_aabb.shape[0]
        imgs[tt], _ = render_preset_frame(tables, cfg, seed=0)
    assert members[128] == members[512]
    np.testing.assert_array_equal(imgs[512], imgs[128])
