"""In-kernel primitive cost measurements (Pallas, real TPU).

Answers the design questions for the fused cast kernel:

1. per-tile-iteration cost slope: fori_loop body of one (SUBG,128) MT pass —
   time at L iterations per subgroup for L in {1,2,4,8} gives the marginal
   tile cost and the per-subgroup fixed cost intercept,
2. VMEM->SMEM DMA roundtrip: can a kernel compute per-subgroup tile masks on
   the VPU and read them back as scalars cheaply enough to drive its own
   fori loops (kills the XLA-side list building + its SMEM-prefetch budget),
3. scalar-branch cost: @pl.when(scalar) around a tile pass vs unconditional,
4. in-kernel dynamic row gather: does jnp.take along the sublane axis lower
   in Mosaic, and at what rate (candidate for pair-form ray features).

Usage: python -m raytracinggpu_tpu.bench.micro_kernel
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracinggpu_tpu.bench._timing import timed_scan as timed

from raytracinggpu_tpu.bench._timing import setup_cache

setup_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BLK = 1024
SUBG = 64
NF = 16


def _mt_pass(rf_ref, tri_ref, rows, off):
    """One (SUBG,128) Moller-Trumbore pass, same op mix as the real kernel."""
    col = lambda k: rf_ref[rows, k:k + 1]
    ux, uy, uz = col(0), col(1), col(2)
    wx, wy, wz = col(3), col(4), col(5)
    Ox, Oy, Oz = col(6), col(7), col(8)
    tile = tri_ref[:, pl.ds(off, 128)]
    row = lambda k: tile[k:k + 1, :]
    denom = ux * row(0) + uy * row(1) + uz * row(2)
    bnum = (ux * row(3) + uy * row(4) + uz * row(5)) - (
        wx * row(6) + wy * row(7) + wz * row(8))
    gnum = (wx * row(12) + wy * row(13) + wz * row(14)) - (
        ux * row(9) + uy * row(10) + uz * row(11))
    tnum = row(15) - (Ox * row(0) + Oy * row(1) + Oz * row(2))
    rden = 1.0 / denom
    beta = bnum * rden
    gamma = gnum * rden
    tval = tnum * rden
    ok = (jnp.minimum(jnp.minimum(beta, gamma), 1.0 - beta - gamma) >= 0.0) & (
        tval > 1e-4)
    return jnp.where(ok, tval, 1e9)


def bench_tile_slope(R, n_tiles, iters):
    """Cost vs iterations-per-subgroup (dynamic fori, like the real kernel)."""
    rf = jnp.asarray(np.random.rand(R, NF).astype(np.float32))
    tri = jnp.asarray(np.random.rand(NF, n_tiles * 128).astype(np.float32))
    out = {}
    for L in (0, 1, 2, 4, 8):
        lists = np.zeros((R // SUBG, 128), np.int8)
        lists[:, 0] = L
        lists[:, 1:1 + L] = np.arange(L)
        lists = jnp.asarray(lists)

        def kernel(lists_ref, rf_ref, tri_ref, t_ref, t_run):
            b = pl.program_id(0)
            n_sg = BLK // SUBG
            for out_row in range(BLK // 128):
                t_run[:] = jnp.full((128, 128), 1e9, jnp.float32)
                for half in range(128 // SUBG):
                    sg = out_row * (128 // SUBG) + half
                    rows = pl.ds(sg * SUBG, SUBG)
                    scr = pl.ds(half * SUBG, SUBG)

                    def body(i, c, rows=rows, scr=scr, sg=sg):
                        tid = lists_ref[b * n_sg + sg, 1 + i].astype(jnp.int32)
                        t = _mt_pass(rf_ref, tri_ref, rows,
                                     pl.multiple_of(tid * 128, 128))
                        t_run[scr, :] = jnp.minimum(t_run[scr, :], t)
                        return c

                    jax.lax.fori_loop(
                        0, lists_ref[b * n_sg + sg, 0].astype(jnp.int32),
                        body, 0)
                t_ref[out_row:out_row + 1, :] = jnp.min(
                    t_run[:], axis=1).reshape(1, 128)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, NF), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NF, n_tiles * 128), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK // 128, 128), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
        )
        f = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R // 128, 128), jnp.float32))
        dt = timed(lambda l, a, b: f(l, a, b), (lists, rf, tri), iters)
        out[L] = dt
        n_it = (R // SUBG) * L
        per = (dt - out[0]) / max(n_it, 1)
        print(f"tile_slope L={L}: {dt*1e3:8.3f} ms"
              + (f"  marginal/iter {per*1e9:7.1f} ns" if L else "  (intercept)"))
    return out


def bench_dma_smem(R, iters):
    """Per-block VMEM->SMEM DMA of a (32,16) int32 mask + scalar readback
    driving a fori bound."""
    x = jnp.asarray(np.random.rand(R, NF).astype(np.float32))

    def kernel(x_ref, o_ref, vscr, sscr, sem):
        # compute a small mask on the VPU
        m = (x_ref[0:32, 0:16] > 0.5).astype(jnp.int32)
        vscr[:] = m
        cp = pltpu.make_async_copy(vscr, sscr, sem)
        cp.start()
        cp.wait()
        # read scalars and drive a trivial loop
        n = sscr[0, 0] + sscr[1, 1]

        def body(i, c):
            return c

        jax.lax.fori_loop(0, n, body, 0)
        o_ref[:] = x_ref[:] * 2.0

    f = pl.pallas_call(
        kernel,
        grid=(R // BLK,),
        in_specs=[pl.BlockSpec((BLK, NF), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, NF), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, NF), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((32, 16), jnp.int32),
            pltpu.SMEM((32, 16), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def control_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    g = pl.pallas_call(
        control_kernel,
        grid=(R // BLK,),
        in_specs=[pl.BlockSpec((BLK, NF), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, NF), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, NF), jnp.float32),
    )
    dt_dma = timed(lambda x: f(x), (x,), iters)
    dt_ctl = timed(lambda x: g(x), (x,), iters)
    per_blk = (dt_dma - dt_ctl) / (R // BLK)
    print(f"dma_smem: with={dt_dma*1e3:.3f} ms  control={dt_ctl*1e3:.3f} ms"
          f"  marginal/block {per_blk*1e6:.2f} us")


def bench_scalar_branch(R, n_tiles, iters):
    """@pl.when(scalar) around each tile pass (all-true masks) vs
    unconditional loop over the same tiles."""
    rf = jnp.asarray(np.random.rand(R, NF).astype(np.float32))
    tri = jnp.asarray(np.random.rand(NF, n_tiles * 128).astype(np.float32))
    NT = 8

    for frac, name in ((1.0, "all_true"), (0.25, "quarter_true")):
        mask = (np.random.rand(R // SUBG, 128) < frac).astype(np.int32)
        maskj = jnp.asarray(mask)

        def kernel(mask_ref, rf_ref, tri_ref, t_ref, t_run):
            b = pl.program_id(0)
            n_sg = BLK // SUBG
            for out_row in range(BLK // 128):
                t_run[:] = jnp.full((128, 128), 1e9, jnp.float32)
                for half in range(128 // SUBG):
                    sg = out_row * (128 // SUBG) + half
                    rows = pl.ds(sg * SUBG, SUBG)
                    scr = pl.ds(half * SUBG, SUBG)
                    for j in range(NT):
                        @pl.when(mask_ref[b * n_sg + sg, j] > 0)
                        def _(rows=rows, scr=scr, j=j):
                            t = _mt_pass(rf_ref, tri_ref, rows, j * 128)
                            t_run[scr, :] = jnp.minimum(t_run[scr, :], t)
                t_ref[out_row:out_row + 1, :] = jnp.min(
                    t_run[:], axis=1).reshape(1, 128)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, NF), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NF, n_tiles * 128), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK // 128, 128), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
        )
        f = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R // 128, 128), jnp.float32))
        dt = timed(lambda m, a, b: f(m, a, b), (maskj, rf, tri), iters)
        n_active = int(mask[:, :NT].sum())
        print(f"scalar_branch[{name}]: {dt*1e3:8.3f} ms"
              f"  ({n_active} active of {(R//SUBG)*NT})")


def bench_inkernel_gather(R, iters):
    """Dynamic row gather inside a kernel: out[i,:] = table[idx[i], :]."""
    table = jnp.asarray(np.random.rand(2048, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, 2048, (R, 1)).astype(np.int32))

    def kernel(idx_ref, tab_ref, o_ref):
        ids = idx_ref[:, 0]
        o_ref[:] = tab_ref[ids, :]

    try:
        f = pl.pallas_call(
            kernel,
            grid=(R // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2048, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )
        dt = timed(lambda i, t: f(i, t), (idx, table), iters)
        print(f"inkernel_gather_rows: {dt*1e3:.3f} ms"
              f"  ({dt/R*1e9:.1f} ns/row)")
    except Exception as e:
        print(f"inkernel_gather_rows: UNSUPPORTED ({type(e).__name__}: "
              f"{str(e)[:120]})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rays", type=int, default=131072)
    ap.add_argument("--only", type=str, default=None)
    a = ap.parse_args()

    import threading

    threading.Thread(
        target=lambda: np.asarray(jnp.zeros((2,))), daemon=True
    ).start()

    todo = {
        "pairslope": lambda: bench_pair_slope(a.rays, 31, a.iters),
        "slope": lambda: bench_tile_slope(a.rays, 31, a.iters),
        "dma": lambda: bench_dma_smem(a.rays, a.iters),
        "branch": lambda: bench_scalar_branch(a.rays, 31, a.iters),
        "gather": lambda: bench_inkernel_gather(a.rays, a.iters),
    }
    for name, fn in todo.items():
        if a.only and name not in a.only.split(","):
            continue
        try:
            fn()
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")




def bench_pair_slope(R, n_tiles, iters):
    """Flat per-block (subgroup, tile)-pair loop: marginal cost per pair at
    several subgroup sizes.  This is the candidate that removes the ~435 ns
    per-subgroup dynamic-fori fixed cost (one dynamic loop per 1024-ray
    block instead of one per subgroup)."""
    rf = jnp.asarray(np.random.rand(R, NF).astype(np.float32))
    tri = jnp.asarray(np.random.rand(NF, n_tiles * 128).astype(np.float32))
    n_blocks = R // BLK

    for subg in (8, 16, 32, 64):
        n_sg = BLK // subg
        for L in (0, 1, 2, 4):
            maxp = n_sg * min(L + 1, n_tiles)
            pairs = np.zeros((n_blocks, 1 + max(maxp, 8)), np.int32)
            pairs[:, 0] = n_sg * L
            k = 1
            for sg in range(n_sg):
                for j in range(L):
                    pairs[:, k] = sg * 256 + (sg + j) % n_tiles
                    k += 1
            pairs = jnp.asarray(pairs)

            def kernel(pairs_ref, rf_ref, tri_ref, t_ref, t_run, subg=subg):
                b = pl.program_id(0)
                t_run[:] = jnp.full((BLK, 128), 1e9, jnp.float32)

                def body(i, c):
                    p = pairs_ref[b, 1 + i]
                    sg = p >> 8
                    tile = p & 255
                    rows = pl.ds(sg * subg, subg)
                    t = _mt_pass(rf_ref, tri_ref, rows,
                                 pl.multiple_of(tile * 128, 128))
                    t_run[rows, :] = jnp.minimum(t_run[rows, :], t)
                    return c

                jax.lax.fori_loop(0, pairs_ref[b, 0], body, 0)
                for r in range(BLK // 128):
                    t_ref[r:r + 1, :] = jnp.min(
                        t_run[pl.ds(r * 128, 128), :], axis=1
                    ).reshape(1, 128)

            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((BLK, NF), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NF, n_tiles * 128), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK // 128, 128),
                                       lambda i, *_: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((BLK, 128), jnp.float32)],
            )
            f = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((R // 128, 128), jnp.float32))
            dt = timed(lambda l, a, b: f(l, a, b), (pairs, rf, tri), iters)
            n_pairs = n_blocks * n_sg * L
            if L == 0:
                base = dt
                print(f"pair_slope subg={subg} L=0: {dt*1e3:8.3f} ms (intercept)")
            else:
                per = (dt - base) / n_pairs
                print(f"pair_slope subg={subg} L={L}: {dt*1e3:8.3f} ms"
                      f"  marginal/pair {per*1e9:7.1f} ns"
                      f"  per-ray {per*n_pairs/R*1e9:6.1f} ns")

if __name__ == "__main__":
    main()
