#!/usr/bin/env python
"""Mosaic/Pallas microbenchmarks that size the Barnes-Hut traversal kernel.

Findings so far (v5e via axon):
  * usable VMEM scratch tops out between 15 and 16 MB;
  * scalar loads/stores with a DYNAMIC LANE index do not compile
    ("cannot statically prove that index in dimension 1 is a multiple of
    128") — dynamic addressing must ride the SUBLANE dimension, or be a
    128-aligned lane offset (pl.multiple_of);
  * therefore the traversal kernel is octet-vectorized: one (1, 128) row
    holds 4 octets x 8 siblings x 4 fields, classification is 8-wide VPU
    work, and emission goes through a (4, 128) staging accumulator placed
    with a repeat+lane-mask select and flushed at 128-aligned offsets.

This file measures that exact loop shape end-to-end (pop from an SMEM
stack, dynamic-sublane row load, 8-wide classify, staging placement,
children pushes) plus the lane->scalar extraction roundtrip and the
HBM->VMEM range DMA the near-field eval kernel needs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def bench(fn, *args, reps=5):
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best


def octet_loop(n_iter: int, level: int = 5):
    """The traversal-kernel inner-loop shape, cumulative stages:

    level 1: SMEM stack pop + pushes only (scalar loop floor)
    level 2: + dynamic-sublane (1,128) row load + 4 dynamic lane rolls
    level 3: + 8-wide classify arithmetic + mask scalarization (1 reduce)
    level 4: + staging placement (4x repeat + lane-mask select) + flush
    level 5: + near extraction fori (16 masked reduces + SMEM stores)
    Reports ns per pop.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = 10240  # ~5 MB f32 table

    def kern(tab_ref, o_ref, stack, accx, accy, accz, accg):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        l8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

        stack[0] = 0
        o_ref[...] = jnp.zeros_like(o_ref)

        def body(c):
            i, sp, ncom, h = c
            sp = sp - 1
            e = stack[sp]
            b = e & 1
            if level >= 2:
                row = (e >> 2) % ROWS
                base = (e & 3) * 32
                frow = tab_ref[pl.ds(row, 1), :]  # (1,128) dynamic sublane
                # field windows via dynamic lane rotation (see mb_probe)
                cx8 = pltpu.roll(frow, (128 - base) & 127, axis=1)[:, 0:8]
                cy8 = pltpu.roll(frow, (120 - base) & 127, axis=1)[:, 0:8]
                cz8 = pltpu.roll(frow, (112 - base) & 127, axis=1)[:, 0:8]
                gm8 = pltpu.roll(frow, (104 - base) & 127, axis=1)[:, 0:8]
            if level >= 3:
                # classify-like vector arithmetic (AABB distance + MAC)
                dx = jnp.maximum(cx8 - 1.0, 0.0) + jnp.maximum(-1.0 - cx8, 0.0)
                dy = jnp.maximum(cy8 - 1.0, 0.0) + jnp.maximum(-1.0 - cy8, 0.0)
                dz = jnp.maximum(cz8 - 1.0, 0.0) + jnp.maximum(-1.0 - cz8, 0.0)
                d2 = dx * dx + dy * dy + dz * dz
                far8 = (d2 > 0.5) & (gm8 > 0.0)
                near8 = (d2 <= 0.5) & (gm8 > 0.0)
                # one combined mask scalarization (far bits | near bits << 8)
                bits = jnp.sum(
                    jnp.where(far8, jnp.int32(1) << l8, 0)
                    + jnp.where(near8, jnp.int32(1) << (l8 + 8), 0)
                )
                b = bits & 1
                nb = bits >> 8
            if level >= 4:
                # staging placement: planar accumulators, repeat + lane mask
                slot = (ncom >> 3) & 15
                m = (lanes >> 3) == slot
                accx[...] = jnp.where(m, pltpu.repeat(cx8, 16, axis=1), accx[...])
                accy[...] = jnp.where(m, pltpu.repeat(cy8, 16, axis=1), accy[...])
                accz[...] = jnp.where(m, pltpu.repeat(cz8, 16, axis=1), accz[...])
                accg[...] = jnp.where(
                    m,
                    pltpu.repeat(jnp.where(far8, gm8, 0.0), 16, axis=1),
                    accg[...],
                )
                ncom = ncom + 8

                @pl.when((ncom & 127) == 0)
                def _():
                    base_o = pl.multiple_of(((ncom - 128) >> 7) % 8 * 128, 128)
                    o_ref[0:1, pl.ds(base_o, 128)] = accx[...]
                    o_ref[1:2, pl.ds(base_o, 128)] = accy[...]
                    o_ref[2:3, pl.ds(base_o, 128)] = accz[...]
                    o_ref[3:4, pl.ds(base_o, 128)] = accg[...]

            if level >= 5:
                # near-range extraction: per set bit, 2 masked reduces + 2
                # SMEM stores (start/count scalarization)
                def near_k(k, sp2):
                    hit = ((nb >> k) & 1) > 0
                    s_k = jnp.sum(jnp.where(l8 == k, cx8, 0.0)).astype(jnp.int32)
                    c_k = jnp.sum(jnp.where(l8 == k, gm8, 0.0)).astype(jnp.int32)

                    @pl.when(hit)
                    def _():
                        stack[1000 + (i & 7)] = s_k + c_k

                    return sp2 + jnp.where(hit, 0, 0)

                sp = jax.lax.fori_loop(0, 8, near_k, sp)

            # push two children (scalar SMEM stores at dynamic index)
            h2 = (h * 1103515245 + 12345) & 0x7FFFFFFF
            stack[sp] = h2 % (ROWS * 4)
            stack[sp + 1] = (h2 >> 8) % (ROWS * 4)
            sp = sp + jnp.where(b & 1, 2, 1).astype(jnp.int32)
            sp = jnp.minimum(sp, 1000)
            return (i + 1, jnp.maximum(sp, 1), ncom, h2)

        jax.lax.while_loop(
            lambda c: c[0] < n_iter,
            body,
            (jnp.int32(0), jnp.int32(1), jnp.int32(0), jnp.int32(7)),
        )

    tab = jnp.ones((ROWS, 128), jnp.float32)
    f = jax.jit(
        lambda t: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((4, 1024), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((1024 + 8,), jnp.int32),
                pltpu.VMEM((1, 128), jnp.float32),
                pltpu.VMEM((1, 128), jnp.float32),
                pltpu.VMEM((1, 128), jnp.float32),
                pltpu.VMEM((1, 128), jnp.float32),
            ],
        )(t)
    )
    dt = bench(f, tab)
    print(f"octet pop loop (level {level}): {dt / n_iter * 1e9:.1f} ns/pop "
          f"({n_iter} pops, {dt * 1e3:.1f} ms)", flush=True)


def range_dma(n_iter: int):
    """Near-field eval pattern: (32, 4) DMA from an HBM body array at a
    dynamic sublane offset into a VMEM staging slot, double-buffered."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1 << 20

    def kern(pos_ref, o_ref, stage, sems):
        def get_dma(slot, off):
            return pltpu.make_async_copy(
                pos_ref.at[pl.ds(off, 32), :],
                stage.at[slot],
                sems.at[slot],
            )

        get_dma(0, 0).start()

        def body(c):
            i, h, acc = c
            h2 = (h * 1103515245 + 12345) & 0x7FFFFFFF
            off = h2 % (N - 32)
            cur = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < n_iter)
            def _():
                get_dma(nxt, off).start()

            # wait current (offset value irrelevant for wait)
            pltpu.make_async_copy(
                pos_ref.at[pl.ds(0, 32), :], stage.at[cur], sems.at[cur]
            ).wait()
            acc = acc + jnp.sum(stage[cur], axis=0, keepdims=True)  # (1,4)
            return (i + 1, h2, acc)

        _, _, acc = jax.lax.while_loop(
            lambda c: c[0] < n_iter,
            body,
            (jnp.int32(0), jnp.int32(7), jnp.zeros((1, 4), jnp.float32)),
        )
        o_ref[...] = acc

    pos = jnp.ones((N, 4), jnp.float32)
    f = jax.jit(
        lambda p: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 4), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 32, 4), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(p)
    )
    dt = bench(f, pos)
    print(f"(32,4) HBM range DMA: {dt / n_iter * 1e9:.1f} ns/range "
          f"({n_iter} ranges, {dt * 1e3:.1f} ms)", flush=True)


def main():
    from nbody_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    import sys as _sys

    levels = [int(a) for a in _sys.argv[1:]] or [1, 2, 3, 4, 5]
    for lv in levels:
        octet_loop(1 << 19, level=lv)
    range_dma(1 << 16)


if __name__ == "__main__":
    main()
