"""Grouped activity compaction (ops/pairs_trace._compact_src).

At depth >= 1 only ~4-13% of rays have any active mesh tile, but union
divergence makes every 16-ray subgroup pay (~14x at depth >= 2) — the
compacted cast packs active rays densely, grouped by first active tile,
and scatters results back.  Exactness contract: identical renders for any
compact fraction, including when the active count overflows the capacity
(lax.cond full-cast fallback).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinggpu_tpu.core.vec import Vec3
from raytracinggpu_tpu.ops.pairs_trace import (
    _compact_ok,
    _compact_src,
    build_pairs_tables,
    intersect_tris_pairs,
    intersect_tris_pairs_shadow,
)
from raytracinggpu_tpu.render.pipeline import Camera, render_frame
from raytracinggpu_tpu.scene.mesh import load_cat_mesh
from raytracinggpu_tpu.scene.obj import CAT_OBJ_PATH
from raytracinggpu_tpu.scene.presets import build_preset


@pytest.fixture(scope="module")
def mesh():
    return load_cat_mesh(CAT_OBJ_PATH, False, 0.6, (0.0, -10.0, 0.0))


def test_compact_src_grouping():
    # Two unit boxes along x: rays 1,5 hit box 0; ray 3 hits box 1;
    # others miss.  Expect src = [1, 5, 3, then inactive lanes in order].
    aabb = np.zeros((2, 8), np.float32)
    aabb[0, 0:3] = (0, 0, 0)
    aabb[0, 3:6] = (1, 1, 1)
    aabb[1, 0:3] = (2, 0, 0)
    aabb[1, 3:6] = (3, 1, 1)
    R = 8
    Ox = np.full(R, -1.0, np.float32)
    Oy = np.full(R, 0.5, np.float32)
    Oz = np.full(R, 0.5, np.float32)
    ux = np.ones(R, np.float32)
    uy = np.zeros(R, np.float32)
    uz = np.zeros(R, np.float32)
    uy[0] = 1.0; ux[0] = 0.0   # ray 0: shoots up, misses
    uy[2] = -1.0; ux[2] = 0.0  # ray 2: down, misses
    uy[4] = 1.0; ux[4] = 0.0
    uy[6] = 1.0; ux[6] = 0.0
    uy[7] = 1.0; ux[7] = 0.0
    # ray 3 hits only box 1: start past box 0
    Ox[3] = 1.5
    O = Vec3(jnp.asarray(Ox), jnp.asarray(Oy), jnp.asarray(Oz))
    u = Vec3(jnp.asarray(ux), jnp.asarray(uy), jnp.asarray(uz))
    src, n_act = _compact_src(O, u, jnp.asarray(aabb), 2, None, None, 8, R)
    assert int(n_act) == 3
    got = np.asarray(src)
    assert list(got[:3]) == [1, 5, 3], got  # grouped by first tile, stable
    assert list(got[3:]) == [0, 2, 4, 6, 7], got  # inactive tail in order


def test_key_mode_selection():
    from raytracinggpu_tpu.ops.pairs_trace import _key_mode

    # nc=31: pairwise key needs 10 bits -> lane budget 2^21
    assert _key_mode(31, 1 << 21) == (2, 21)
    # just past the pairwise budget: falls back to first-tile (5 bits)
    assert _key_mode(31, (1 << 21) + 1) == (1, 26)
    # big mesh: nc=16384 pairwise needs 29 bits (no), single 15 bits
    assert _key_mode(16384, 1 << 16) == (1, 16)
    assert _key_mode(16384, (1 << 16) + 1) == (0, 0)


def test_compact_ok_gates():
    assert _compact_ok(0.0, 31, 262144, 4096) == 0
    assert _compact_ok(0.25, 31, 262144, 4096) == 65536
    # adaptive key/lane split: bigger meshes shrink the lane budget
    assert _compact_ok(0.25, 200, 262144, 4096) == 65536  # 8+23 bits fit
    assert _compact_ok(0.25, 200, 1 << 24, 4096) == 0     # R > 2^23
    assert _compact_ok(0.25, 16384, 1 << 16, 4096) == 16384  # 15+16 bits
    assert _compact_ok(0.25, 16384, (1 << 16) + 8, 4096) == 0
    assert _compact_ok(0.9, 31, 8192, 4096) == 0          # C would be >= R
    # rounding to whole blocks
    assert _compact_ok(0.1, 31, 262144, 4096) == 28672


def test_compact_tiers_ladder():
    from raytracinggpu_tpu.ops.pairs_trace import _compact_tiers

    # ascending, zeros dropped, order-insensitive
    assert _compact_tiers((0.25, 0.0, 0.1), 31, 262144, 4096) == [
        28672, 65536]
    # duplicate capacities collapse (0.1 and 0.105 both round to 28672)
    assert _compact_tiers((0.1, 0.105), 31, 262144, 4096) == [28672]
    # tiers at/above R drop out; empty when nothing is valid
    assert _compact_tiers((0.9,), 31, 8192, 4096) == []
    assert _compact_tiers((0.0, 0.0, 0.0), 31, 262144, 4096) == []


@pytest.mark.parametrize("frac", [0.25, 0.05])
def test_direct_cast_parity(mesh, frac):
    """Direct kernel API: compacted closest + shadow equal the full cast
    bit-for-bit (including the payload normal) on scattered rays."""
    tab = build_pairs_tables(mesh.A, mesh.B, mesh.C, mesh.bvh)
    rng = np.random.default_rng(7)
    R = 8192
    Ov = rng.uniform(-25, 25, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    O = Vec3(*(jnp.asarray(Ov[:, i]) for i in range(3)))
    u = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    cap = jnp.full((R,), 1e9, jnp.float32)
    h0, n0 = intersect_tris_pairs(O, u, tab, 1e-4, cap=cap, interpret=True,
                                  payload="geom")
    h1, n1 = intersect_tris_pairs(O, u, tab, 1e-4, cap=cap, interpret=True,
                                  payload="geom", compact=frac)
    assert np.array_equal(np.asarray(h0.t), np.asarray(h1.t))
    assert np.array_equal(np.asarray(h0.idx), np.asarray(h1.idx))
    for a, b in zip(n0, n1):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    act = rng.uniform(size=R) < 0.5
    t0 = intersect_tris_pairs_shadow(
        O, u, tab, 1e-4, cap=cap, interpret=True, active=jnp.asarray(act))
    t1 = intersect_tris_pairs_shadow(
        O, u, tab, 1e-4, cap=cap, interpret=True, active=jnp.asarray(act),
        compact=frac)
    # Inactive lanes are don't-care by contract (the integrator never
    # reads them; the full cast leaks subgroup-mates' tile results into
    # them, the compacted cast returns INF) — compare active lanes only.
    assert np.array_equal(np.asarray(t0)[act], np.asarray(t1)[act])


def test_sort_stays_inside_compact_branch(mesh):
    """The (R,) compact sort must live in the lax.cond's compact branch,
    not the entry computation — cond *operands* are computed
    unconditionally, so a hoisted sort would tax every overflowing
    (dense) cast with a full-R sort it never uses."""
    import re

    tab = build_pairs_tables(mesh.A, mesh.B, mesh.C, mesh.bvh)
    R = 8192
    O = Vec3(*(jnp.zeros((R,)) for _ in range(3)))
    u = Vec3(jnp.ones((R,)), jnp.zeros((R,)), jnp.zeros((R,)))
    f = jax.jit(lambda O, u: intersect_tris_pairs_shadow(
        O, u, tab, 1e-4, interpret=True, blk=1024, compact=0.25))
    txt = f.lower(O, u).compile().as_text()
    sort_lines = re.findall(r"= .*\bsort\(", txt)
    assert sort_lines, "compaction should compile to exactly one sort"
    entry = txt.split("ENTRY")[1]
    assert not re.findall(r"= .*\bsort\(", entry), (
        "compact sort was hoisted into the entry computation")


def test_render_parity_with_overflow(mesh):
    """Full pipeline: compact renders bit-equal to base, including a tiny
    capacity that forces the overflow fallback on the primary cast."""
    imgs = {}
    for name, kw in {
        "base": {},
        "cmp25": dict(pairs_compact=0.25),
        "cmp_overflow": dict(pairs_compact=0.02),
        # capacity ladder: tight tier overflows, wide tier catches the
        # d0 casts; second variant overflows BOTH tiers (full fallback)
        "ladder": dict(pairs_compact=0.02, pairs_compact2=0.25),
        "ladder_overflow": dict(pairs_compact=0.02, pairs_compact2=0.04),
        # three-rung ladder: both narrow tiers overflow, rung 3 catches;
        # second variant overflows all three (full-width fallback)
        "ladder3": dict(pairs_compact=0.02, pairs_compact2=0.04,
                        pairs_compact3=0.5),
        "ladder3_overflow": dict(pairs_compact=0.02, pairs_compact2=0.03,
                                 pairs_compact3=0.04),
        "sah_pave_cmp": dict(pairs_cluster="sah", pairs_pack="pave",
                             pairs_cut=32, pairs_compact=0.25),
        # coarse compaction key: g-tile union boxes make activity a
        # conservative superset; results must stay bit-identical (the
        # compacted cast re-runs exact per-tile culling)
        "key_coarse": dict(pairs_compact=0.25, pairs_key_coarse=4),
        "key_coarse_overflow": dict(pairs_compact=0.02,
                                    pairs_key_coarse=8),
        # d0-own tier (pairs_compact_d0, measured-negative perf knob):
        # exactness contract is the same overflow-fallback rule
        "d0_tier": dict(pairs_compact=0.25, pairs_compact_d0=0.5,
                        depth_unroll=3),
    }.items():
        cfg, tables = build_preset(
            "array_bvh", mesh=mesh, width=48, height=48, spp=2,
            max_depth=3, traversal="pairs", **kw)
        cam = Camera.fixed(cfg.camera_c)
        img, _ = render_frame(tables, cfg, cam, jax.random.PRNGKey(0))
        imgs[name] = np.asarray(img)
    base = imgs.pop("base")
    assert np.isfinite(base).all()
    for name, a in imgs.items():
        assert np.array_equal(a, base), name


def test_coarse_aabb_unions():
    """_coarse_aabb: g-way unions in tree order, edge-padded tail, and a
    conservative superset of per-tile activity by construction."""
    from raytracinggpu_tpu.ops.pairs_trace import _coarse_aabb

    rng = np.random.default_rng(3)
    nc = 7
    mn = rng.uniform(-5, 5, (nc, 3)).astype(np.float32)
    mx = mn + rng.uniform(0.1, 2.0, (nc, 3)).astype(np.float32)
    aabb = np.concatenate([mn, mx, np.zeros((nc, 2), np.float32)], axis=1)
    coarse, ng = _coarse_aabb(jnp.asarray(aabb), nc, 4)
    assert ng == 2
    c = np.asarray(coarse)
    np.testing.assert_array_equal(c[0, 0:3], mn[0:4].min(0))
    np.testing.assert_array_equal(c[0, 3:6], mx[0:4].max(0))
    # tail group: tiles 4..6 edge-padded with tile 6
    np.testing.assert_array_equal(c[1, 0:3], mn[4:7].min(0))
    np.testing.assert_array_equal(c[1, 3:6], mx[4:7].max(0))
    # every tile box is contained in its group box (superset activity)
    for i in range(nc):
        g = i // 4
        assert (c[g, 0:3] <= mn[i]).all() and (c[g, 3:6] >= mx[i]).all()
