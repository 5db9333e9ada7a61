#!/usr/bin/env python
"""Targeted Mosaic addressing probes for the fused BH traversal kernel.

Each probe is tiny (fast TPU compile) and answers one layout question:
  1. roll_dyn:   pltpu.roll with a TRACED shift on a (1, 128) row, and the
                 direction convention (we need out[0:8] = row[base:base+8]).
  2. place:      pltpu.repeat((1,8) -> (1,128)) + lane-mask select placement
                 into an accumulator at a dynamic 8-lane slot.
  3. dma_lane:   HBM (4, N) -> VMEM (4, 128) async copy at a DYNAMIC lane
                 offset (the near-field body-window fetch).
  4. bcol:       (B, 1) column slices of a (B, 4) block at lane offsets
                 1 and 2 broadcast against (1, 128) (the eval shape).
Run on TPU; correctness checked against NumPy on the host.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    from nbody_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"backend: {jax.default_backend()}", flush=True)

    # ---- 1. dynamic roll ------------------------------------------------
    def k_roll(x_ref, s_ref, o_ref):
        base = s_ref[0]
        shifted = pltpu.roll(x_ref[...], (128 - base) & 127, axis=1)
        o_ref[...] = shifted

    x = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)
    for base in (0, 8, 32, 96):
        out = pl.pallas_call(
            k_roll,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, jnp.array([base], jnp.int32))
        got = np.asarray(out)[0, :8]
        want = np.arange(base, base + 8, dtype=np.float32)
        ok = np.array_equal(got, want)
        print(f"roll base={base}: {'OK' if ok else f'got {got}'}", flush=True)

    # ---- 2. repeat + mask placement ------------------------------------
    def k_place(x_ref, s_ref, o_ref):
        slot = s_ref[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        v8 = x_ref[:, 0:8]
        tile = pltpu.repeat(v8, 16, axis=1)  # (1, 128)
        o_ref[...] = jnp.where((lanes >> 3) == slot, tile, 0.0)

    for slot in (0, 3, 15):
        out = pl.pallas_call(
            k_place,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, jnp.array([slot], jnp.int32))
        got = np.asarray(out)[0]
        want = np.zeros(128, np.float32)
        want[8 * slot : 8 * slot + 8] = np.arange(8)
        ok = np.array_equal(got, want)
        print(f"place slot={slot}: {'OK' if ok else f'got {got.nonzero()}'}",
              flush=True)

    # ---- 3. DMA at dynamic lane offset ----------------------------------
    N = 1 << 16

    def k_dma(src_ref, s_ref, o_ref):
        def inner(stage, sem):
            # lane-dim DMA slices must be 128-aligned (probed: arbitrary
            # offsets fail to prove divisibility) -> align down + mask later
            off = pl.multiple_of((s_ref[0] >> 7) << 7, 128)
            cp = pltpu.make_async_copy(
                src_ref.at[:, pl.ds(off, 128)], stage, sem
            )
            cp.start()
            cp.wait()
            o_ref[...] = stage[...]

        pl.run_scoped(
            inner,
            pltpu.VMEM((4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        )

    src = jnp.arange(4 * N, dtype=jnp.float32).reshape(4, N)
    for off in (0, 5, 12345):
        out = pl.pallas_call(
            k_dma,
            out_shape=jax.ShapeDtypeStruct((4, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, jnp.array([off], jnp.int32))
        got = np.asarray(out)
        a = (off >> 7) << 7
        want = np.asarray(src)[:, a : a + 128]
        ok = np.array_equal(got, want)
        print(f"dma off={off}: {'OK' if ok else 'MISMATCH'}", flush=True)

    # ---- 3b. VMEM -> SMEM bulk scalarization DMA -------------------------
    def k_v2s(x_ref, o_ref):
        def inner(sm, sem):
            cp = pltpu.make_async_copy(x_ref, sm, sem)
            cp.start()
            cp.wait()
            # read back a few scalars to prove SMEM content
            o_ref[0] = sm[0, 7]
            o_ref[1] = sm[0, 127]

        pl.run_scoped(
            inner,
            pltpu.SMEM((1, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        )

    xi = (jnp.arange(128, dtype=jnp.int32) * 3).reshape(1, 128)
    try:
        out = pl.pallas_call(
            k_v2s,
            out_shape=jax.ShapeDtypeStruct((2,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(xi)
        got = np.asarray(out)
        ok = got[0] == 21 and got[1] == 381
        print(f"v2s dma: {'OK' if ok else f'MISMATCH {got}'}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"v2s dma: FAIL ({str(e)[:160]})", flush=True)

    # ---- 4. (B,1) offset-column broadcast vs (1,128) --------------------
    def k_bcol(pg_ref, s_ref, o_ref):
        yi = pg_ref[:, 1:2]  # (B, 1) lane offset 1
        zi = pg_ref[:, 2:3]
        row = s_ref[0:1, :]  # (1, 128)
        o_ref[...] = (row - yi) + zi

    B = 64
    pg = jnp.arange(B * 4, dtype=jnp.float32).reshape(B, 4)
    srow = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)
    out = pl.pallas_call(
        k_bcol,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(pg, srow)
    got = np.asarray(out)
    pgn, sn = np.asarray(pg), np.asarray(srow)
    want = (sn - pgn[:, 1:2]) + pgn[:, 2:3]
    print(f"bcol: {'OK' if np.allclose(got, want) else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
