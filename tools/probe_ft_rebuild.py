#!/usr/bin/env python
"""Price _ft_from_state variants on silicon (persistent-path rebuild).

Variants: (a) current ((m,3) transpose + 2-D segment_sum), (b) planar
per-coordinate 1-D segment sums (no transpose), (c) = (b) with
indices_are_sorted (slot order is Morton ⇒ nid is non-decreasing over
real slots), (d) the upward sweep + pack only (floor).
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
    from nbody_tpu.ops.bh_fused import pack_ft
    from nbody_tpu.ops.bh_grid import grid_offsets
    from typing import NamedTuple

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = 4
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32)
    _, ld, _, _ = bp._layout(n, 1024)
    st = bp.init_state(pos, vel, mass, group_size=1024)
    k_terminal = 8**ld

    class _F(NamedTuple):
        cx: jax.Array
        cy: jax.Array
        cz: jax.Array
        gm: jax.Array

    def sweep_pack(w, gm):
        ws, gms = [w], [gm]
        for _ in range(ld):
            ws.append(ws[-1].reshape(-1, 8, 3).sum(axis=1))
            gms.append(gms[-1].reshape(-1, 8).sum(axis=1))
        ws.reverse(), gms.reverse()
        w_all = jnp.concatenate(ws, axis=0)
        gm_all = jnp.concatenate(gms, axis=0)
        com = w_all / jnp.maximum(gm_all, 1e-30)[:, None]
        total = grid_offsets(ld)[ld + 1]
        tree = _F(
            com[:, 0].reshape(1, total), com[:, 1].reshape(1, total),
            com[:, 2].reshape(1, total), gm_all.reshape(1, total),
        )
        return pack_ft(tree, ld)

    def var_a(pg, nid):
        return bp._ft_from_state(pg, nid, ld)

    def planar(pg, nid, sorted_ids):
        m = pg.shape[0] * pg.shape[2]
        nid_f = nid.reshape(m)
        gm_f = pg[:, 3, :].reshape(m)
        outs = []
        for c in range(3):
            outs.append(
                jax.ops.segment_sum(
                    gm_f * pg[:, c, :].reshape(m), nid_f,
                    num_segments=k_terminal + 1,
                    indices_are_sorted=sorted_ids,
                )[:k_terminal]
            )
        gm = jax.ops.segment_sum(
            gm_f, nid_f, num_segments=k_terminal + 1,
            indices_are_sorted=sorted_ids,
        )[:k_terminal]
        w = jnp.stack(outs, axis=1)
        return sweep_pack(w, gm)

    def var_d(pg, nid):
        w = jnp.zeros((k_terminal, 3), jnp.float32) + pg[0, 0, 0]
        gm = jnp.zeros((k_terminal,), jnp.float32)
        return sweep_pack(w, gm)

    variants = {
        "a current": var_a,
        "b planar": functools.partial(planar, sorted_ids=False),
        "c planar+sorted": functools.partial(planar, sorted_ids=True),
        "d sweep+pack floor": var_d,
    }
    for label, fn in variants.items():
        @jax.jit
        def run(pg, nid, fn=fn):
            def body(c, _):
                ft = fn(pg + c * 0, nid)
                return jnp.sum(ft) * 1e-30, None
            c, _ = lax.scan(body, jnp.float32(0), None, length=k)
            return c

        out = run(st.pg, st.nid)
        np.asarray(out.ravel()[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(st.pg, st.nid)
            np.asarray(out.ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        print(f"{label:22s} {best / k * 1e3:8.1f} ms/step")


def extra() -> None:
    from nbody_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nbody_tpu.ops import bh_persistent as bp

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    k = 4
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32)
    _, ld, _, _ = bp._layout(n, 1024)
    st = bp.init_state(pos, vel, mass, group_size=1024)
    k_terminal = 8**ld
    m = st.pg.shape[0] * st.pg.shape[2]

    # resort-time sorted nid: pads (gm=0) inherit the running max real nid
    nid_f = st.nid.reshape(m)
    nid_sorted = jax.jit(
        lambda a: lax.cummax(jnp.where(a < k_terminal, a, -1))
    )(nid_f)
    nid_sorted = jnp.maximum(nid_sorted, 0)

    def combined(pg, ids, sorted_ids):
        gm_f = pg[:, 3, :].reshape(m)
        vals = jnp.stack(
            [gm_f * pg[:, 0, :].reshape(m), gm_f * pg[:, 1, :].reshape(m),
             gm_f * pg[:, 2, :].reshape(m), gm_f], axis=1
        )
        return jax.ops.segment_sum(
            vals, ids, num_segments=k_terminal + 1,
            indices_are_sorted=sorted_ids,
        )

    for label, ids, flag in (
        ("e (m,4) unsorted", nid_f, False),
        ("f (m,4) sorted", nid_sorted, True),
    ):
        @jax.jit
        def run(pg, ids=ids, flag=flag):
            def body(c, _):
                w = combined(pg + c * 0, ids, flag)
                return jnp.sum(w) * 1e-30, None
            c, _ = lax.scan(body, jnp.float32(0), None, length=k)
            return c

        out = run(st.pg)
        np.asarray(out.ravel()[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(st.pg)
            np.asarray(out.ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        print(f"{label:22s} {best / k * 1e3:8.1f} ms/step (seg-sum only)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        extra()
    else:
        main()
