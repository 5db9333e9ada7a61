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


def octet_loop(n_iter: int):
    """The traversal-kernel inner-loop shape:

    pop (SMEM stack) -> dynamic-sublane (1,128) load from a 5 MB table ->
    4-way 32-lane window select -> 8-wide classify arithmetic -> mask
    scalarization via VMEM roundtrip -> staging placement (repeat trick)
    -> push two children (SMEM stores).  Reports ns per pop.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = 10240  # ~5 MB f32 table

    def kern(tab_ref, o_ref, stack, acc):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        stack[0] = 0
        o_ref[...] = jnp.zeros_like(o_ref)

        def body(c):
            i, sp, ncom, h = c
            sp = sp - 1
            e = stack[sp]
            row = (e >> 2) % ROWS
            sl = e & 3
            frow = tab_ref[pl.ds(row, 1), :]  # (1, 128) dynamic sublane
            w = jax.lax.cond(
                sl < 2,
                lambda: jax.lax.cond(
                    sl == 0, lambda: frow[:, 0:32], lambda: frow[:, 32:64]
                ),
                lambda: jax.lax.cond(
                    sl == 2, lambda: frow[:, 64:96], lambda: frow[:, 96:128]
                ),
            )
            cx8, cy8 = w[:, 0:8], w[:, 8:16]
            cz8, gm8 = w[:, 16:24], w[:, 24:32]
            # classify-like vector arithmetic
            dx = jnp.maximum(cx8 - 1.0, 0.0) + jnp.maximum(-1.0 - cx8, 0.0)
            dy = jnp.maximum(cy8 - 1.0, 0.0) + jnp.maximum(-1.0 - cy8, 0.0)
            dz = jnp.maximum(cz8 - 1.0, 0.0) + jnp.maximum(-1.0 - cz8, 0.0)
            d2 = dx * dx + dy * dy + dz * dz
            far8 = d2 > 0.5
            # scalarize the mask via a lane reduction (scalar stores to
            # VMEM are rejected; reductions lower to usable scalars)
            l8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
            b = jnp.sum(jnp.where(far8, jnp.int32(1) << l8, 0))
            # per-lane value extraction (the cptr pattern): masked reduce
            c0 = jnp.sum(jnp.where(l8 == (b & 7), cx8, 0.0))
            b = b + (c0 > 1e30).astype(jnp.int32)  # keep c0 live, no effect
            # staging placement: (4,8) tile -> repeat -> masked select
            tile8 = jnp.concatenate(
                [cx8, cy8, cz8, jnp.where(far8, gm8, 0.0)], axis=0
            )  # (4, 8)
            tile = pltpu.repeat(tile8, 16, axis=1)  # (4, 128)
            slot = (ncom >> 3) & 15
            m = (lanes >> 3) == slot
            acc[...] = jnp.where(m, tile, acc[...])
            ncom = ncom + 8

            @pl.when((ncom & 127) == 0)
            def _():
                base = pl.multiple_of(((ncom - 128) >> 7) % 8 * 128, 128)
                o_ref[0:4, pl.ds(base, 128)] = acc[...]

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
                pltpu.SMEM((1024,), jnp.int32),
                pltpu.VMEM((4, 128), jnp.float32),
            ],
        )(t)
    )
    dt = bench(f, tab)
    print(f"octet pop loop: {dt / n_iter * 1e9:.1f} ns/pop "
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
    octet_loop(1 << 19)
    range_dma(1 << 16)


if __name__ == "__main__":
    main()
