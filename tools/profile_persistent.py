#!/usr/bin/env python
"""Decompose the persistent-order step (ops/bh_persistent.py) on silicon.

Times, per step inside a lax.scan (one dispatch per run, the benchmark
accounting): the full KDK step, the force eval alone, the float-table
rebuild (_ft_from_state) alone, and the fused kernel with a FROZEN ft
(isolating the kernel from the rebuild).  The deltas price the KDK
elementwise update and the per-step segment-sum rebuild.

Usage: python tools/profile_persistent.py [N]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    from nbody_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nbody_tpu.ops import bh_persistent as bp
    from nbody_tpu.ops.bh_fused import aux_octet_offsets, fused_group_forces

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    interpret = jax.default_backend() == "cpu"
    if interpret:
        n = min(n, 2000)
    k = 3

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32)
    _, ld, _, _ = bp._layout(n, 1024)
    fkw = dict(theta=0.5, softening_sq=0.01, leaf_cap=64, ld=ld,
               interpret=interpret)
    st = bp.init_state(pos, vel, mass, group_size=1024)
    st = bp.prime(st, **fkw)

    def bench(label, fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        print(f"{label:32s} {best / k * 1e3:8.1f} ms/step")
        return best / k

    # A. full KDK step (the benchmark number)
    full = functools.partial(bp.kdk_steps, n_steps=k, dt=1e-4, **fkw)
    bench("full kdk step", full, st)

    # B. force eval only (rebuild + kernel), scanned
    @jax.jit
    def forces_only(st0):
        def body(c, _):
            acc = bp.state_forces(st0._replace(pg=st0.pg + c * 0), **fkw)
            return jnp.sum(acc) * 1e-30, None
        c, _ = lax.scan(body, jnp.float32(0), None, length=k)
        return c
    bench("force eval (rebuild+kernel)", forces_only, st)

    # C. ft rebuild only, scanned
    @jax.jit
    def rebuild_only(st0):
        def body(c, _):
            ft = bp._ft_from_state(st0.pg + c * 0, st0.nid, ld)
            return jnp.sum(ft) * 1e-30, None
        c, _ = lax.scan(body, jnp.float32(0), None, length=k)
        return c
    bench("ft rebuild (_ft_from_state)", rebuild_only, st)

    # D. kernel with frozen ft, scanned
    ft0 = jax.jit(functools.partial(bp._ft_from_state, ld=ld))(st.pg, st.nid)
    g, _, b = st.pg.shape
    ps0 = jnp.transpose(st.pg, (1, 0, 2)).reshape(4, g * b)

    @jax.jit
    def kernel_only(st0, ft, ps):
        def body(c, _):
            acc, _stats = fused_group_forces(
                st0.gcount, st0.pg + c * 0, ft, st0.it, ps, st0.bsq,
                aux_octet_offsets(),
                theta=0.5, eps2=0.01, leaf_cap=64, ld=ld,
                interpret=interpret,
            )
            return jnp.sum(acc) * 1e-30, None
        c, _ = lax.scan(body, jnp.float32(0), None, length=k)
        return c
    bench("fused kernel (frozen ft)", kernel_only, st, ft0, ps0)


if __name__ == "__main__":
    main()
