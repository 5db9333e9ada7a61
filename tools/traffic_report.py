"""Measured per-chip ICI traffic receipts for the multi-chip paths.

VERDICT r4 item 7: the residency half of the scaling story is gated
(bench/mem_scaling.json); this tool delivers the TRAFFIC half — bytes
over the mesh per step for each sharded path at P in {2, 4, 8} — plus
the ICI-bandwidth-model step-time-vs-P prediction for the flagship
sizes.  The reference analog is the thread-scaling efficiency study
(README.md:80-99, tests_result.txt:40-53); ICI collectives replace its
shared-memory thread scaling.

Method: lower + compile each path on the forced P-device CPU mesh and
parse the post-optimization HLO for collective ops (all-gather,
collective-permute, all-to-all, all-reduce, reduce-scatter).  Every
payload shape is statically visible (the ring loop is Python-unrolled;
the one-step persistent chunk compiles its collectives inline), so the
receipt is exact, not sampled.  Per-chip received bytes per op:

  all-gather:          (P-1)/P x output bytes   (own shard stays local)
  collective-permute:  operand bytes            (one shard per hop)
  all-to-all:          (P-1)/P x payload bytes  (own bucket stays local)
  all-reduce (psum):   2 (P-1)/P x payload      (reduce-scatter + gather)
  reduce-scatter:      (P-1)/P x input bytes

The model constants for the prediction (--predict) follow the public
scaling-book numbers for v5e: one-way ICI bandwidth ~4.5e10 B/s per
link per direction (1-D ring: one link each way).  Compute rates come
from this repo's own gated records (bench/bench_grid_best.json,
bench/bench_scale.json).

Run: JAX_PLATFORMS=cpu python tools/traffic_report.py
     [--out bench/traffic_scaling.json] [--predict]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
from functools import partial

N_EXH = 65536
N_BH = 8192
BH_LD = 4

_DTYPE_BYTES = {"f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s32": 4,
                "u32": 4, "s64": 8, "u64": 8, "s8": 1, "u8": 1, "pred": 1}

_COLL_RE = re.compile(
    r"= (?:\(([^)]*)\)|(\w+)\[([\d,]*)\][^ ]*) "
    r"(all-gather|collective-permute|all-to-all|all-reduce|reduce-scatter)"
    r"(?:-start)?\("
)


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


_GROUPS_RE = re.compile(r"replica_groups=\{?\{([\d,]+)\}")


def collective_ops(hlo_text: str) -> list[dict]:
    """Parse post-optimization HLO for collective ops ->
    [{op, bytes, group}].

    `bytes` is the op's full payload (output tuple summed); `group` is
    the replica-group size — collectives on a 2-D mesh ride ONE torus
    axis, so the traffic factor must use the axis size, not the global
    chip count.  -start/-done async pairs are counted once (the -done
    carries no shape).
    """
    out = []
    for line in hlo_text.splitlines():
        m = _COLL_RE.search(line)
        if not m:
            continue
        tup, dtype, dims, op = m.groups()
        if tup is not None:
            total = 0
            for part in re.finditer(r"(\w+)\[([\d,]*)\]", tup):
                dt, dm = part.groups()
                if dt in _DTYPE_BYTES:
                    total += _shape_bytes(dt, dm)
        else:
            total = _shape_bytes(dtype, dims)
        gm = _GROUPS_RE.search(line)
        group = len(gm.group(1).split(",")) if gm else 0
        out.append({"op": op, "bytes": total, "group": group})
    return out


def per_chip_bytes(ops: list[dict], p: int) -> int:
    """Bytes RECEIVED per chip per step under the standard ring
    algorithms.  Per op (g = replica-group size, default the mesh size;
    payload = the parsed output bytes):

      all-gather:          (g-1)/g x payload  (own shard stays local)
      collective-permute:  payload            (one shard per hop)
      all-to-all:          (g-1)/g x payload  (own bucket stays local)
      all-reduce (psum):   2 (g-1)/g x payload (reduce-scatter + gather)
      reduce-scatter:      (g-1) x payload    (payload is the per-chip
                           OUTPUT = input/g; ring moves g-1 chunks)
    """
    total = 0.0
    for o in ops:
        g = o.get("group") or p
        if g <= 1:
            continue
        if o["op"] == "all-gather":
            total += o["bytes"] * (g - 1) / g
        elif o["op"] == "collective-permute":
            total += o["bytes"]
        elif o["op"] == "all-to-all":
            total += o["bytes"] * (g - 1) / g
        elif o["op"] == "all-reduce":
            total += 2 * o["bytes"] * (g - 1) / g
        elif o["op"] == "reduce-scatter":
            total += o["bytes"] * (g - 1)
    return int(total)


def _summarize(ops: list[dict]) -> list[dict]:
    from collections import Counter

    c = Counter((o["op"], o["bytes"]) for o in ops)
    return [
        {"op": op, "payload_bytes": b, "count": k}
        for (op, b), k in sorted(c.items())
    ]


def _mesh1d(p):
    from nbody_tpu.parallel.mesh import make_mesh

    return make_mesh(jax.devices()[:p])


def _cloud(n, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32),
    )


def exhaustive_traffic(jstream: str, p: int) -> dict:
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.ops.exhaustive import rect_accelerations
    from nbody_tpu.parallel.sharding import shard_bodies, shard_force_fn

    mesh = _mesh1d(p)
    pos, vel, mass = _cloud(N_EXH)
    b = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    force = shard_force_fn(
        partial(rect_accelerations), mesh=mesh, jstream=jstream
    )
    txt = force.lower(b.pos, b.mass).compile().as_text()
    ops = collective_ops(txt)
    row = {
        "path": f"exhaustive/{jstream}", "p": p, "n": N_EXH,
        "collectives": _summarize(ops),
        "per_chip_step_bytes": per_chip_bytes(ops, p),
    }
    # analytic cross-check: both 1-D j-streams move the full remote
    # j-side ((P-1)/P of 16 bytes/body: 12 pos + 4 mass) past each chip
    row["model_bytes"] = int(16 * N_EXH * (p - 1) / p)
    return row


def torus_traffic(shape) -> dict:
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.ops.exhaustive import rect_accelerations
    from nbody_tpu.parallel.mesh import make_mesh2d
    from nbody_tpu.parallel.sharding import shard_bodies, shard_force_fn2d

    pi, pj = shape
    mesh = make_mesh2d(f"{pi}x{pj}")
    pos, vel, mass = _cloud(N_EXH)
    b = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    force = shard_force_fn2d(partial(rect_accelerations), mesh=mesh)
    txt = force.lower(b.pos, b.mass).compile().as_text()
    ops = collective_ops(txt)
    p = pi * pj
    # i-gather (pos rows [a*N/pi, (a+1)*N/pi)) + psum_scatter of the
    # (N/pi, 3) partial block both ride the pj-ring; the j-gather
    # (pos + mass of the strided 1/pj subset) rides the pi-ring
    model = (
        24 * (N_EXH // pi) * (pj - 1) / pj
        + 16 * (N_EXH // pj) * (pi - 1) / pi
    )
    return {
        "path": f"exhaustive/torus{pi}x{pj}", "p": p, "n": N_EXH,
        "collectives": _summarize(ops),
        "per_chip_step_bytes": per_chip_bytes(ops, p),
        "model_bytes": int(model),
    }


def bh_traffic(halo: bool, p: int = 8) -> dict:
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
    txt = steps.lower(state, 1e-3).compile().as_text()
    ops = collective_ops(txt)
    return {
        "path": f"bh-persistent/{'halo' if halo else 'gather'}",
        "p": p, "n": N_BH,
        "collectives": _summarize(ops),
        "per_chip_step_bytes": per_chip_bytes(ops, p),
    }


def collect() -> list[dict]:
    rows = []
    for p in (2, 4, 8):
        rows.append(exhaustive_traffic("gather", p))
        print(rows[-1], flush=True)
        rows.append(exhaustive_traffic("ring", p))
        print(rows[-1], flush=True)
    rows.append(torus_traffic((2, 4)))
    print(rows[-1], flush=True)
    for halo in (False, True):
        rows.append(bh_traffic(halo))
        print(rows[-1], flush=True)
    return rows


# ---------------------------------------------------------------------------
# ICI step-time prediction (the scaling-study analog)
# ---------------------------------------------------------------------------

# v5e 1-D ICI ring: ~4.5e10 B/s one way per link (public scaling-book
# figure); collectives overlap with compute under XLA's async pairs, so
# the prediction reports max(compute, comm) and the no-overlap sum as
# bounds.
W_ICI = 4.5e10


def predict(records: list[dict]) -> list[dict]:
    """Step-time-vs-P prediction for the flagship configs, anchored to
    the repo's own measured single-chip rates (gated records)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    grid = {}
    with open(os.path.join(repo, "bench", "bench_grid_best.json")) as f:
        for line in f:
            if line.strip():
                r = json.loads(line)
                grid[(r["algo"], r["n"])] = r["value"]
    out = []
    for n, algo, mode in (
        (1_000_000, "exhaustive", "ring"),
        (1_000_000, "barnes-hut-persistent", "halo"),
        (10_000_000, "barnes-hut-persistent", "halo"),
    ):
        t1 = grid.get((algo, n))
        if t1 is None and algo == "barnes-hut-persistent":
            # 10M: use the gated scale record
            with open(os.path.join(repo, "bench", "bench_scale.json")) as f:
                for line in f:
                    r = json.loads(line)
                    if r["n"] == n and r["mode"] == "persistent":
                        t1 = r["value"]
        if t1 is None:
            continue
        for p in (2, 4, 8, 16, 64, 256):
            if mode == "ring":
                traffic = 16 * n * (p - 1) / p
                compute = t1 / p  # all-pairs: O(N^2) split P ways
            else:
                # halo: psum'd grid floats (ld 6 dense tables, 4 rows) +
                # all_to_all'd halo rows (16 B x capped shell); both are
                # o(N) — use the measured 8k/ld4 receipt scaled to the
                # ld-6 table size as the dominant term
                tables = 4 * 4 * ((8 ** 7 - 1) // 7)  # f32 x 4 fields
                halo_rows = 16 * min(n // 8, 65536) * p
                traffic = 2 * tables * (p - 1) / p + halo_rows * (p - 1) / p
                compute = t1 / p  # BH: O(N log N) split P ways
            comm = traffic / W_ICI
            out.append({
                "config": f"{algo}/{n}", "p": p,
                "per_chip_step_bytes": int(traffic),
                "compute_s": compute, "comm_s": comm,
                "step_s_overlap": max(compute, comm),
                "step_s_serial": compute + comm,
            })
    return out


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(repo, "bench", "traffic_scaling.json")
    )
    ap.add_argument("--predict", action="store_true")
    args = ap.parse_args()
    rows = collect()
    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {args.out}")
    if args.predict:
        pred = predict(rows)
        out2 = os.path.join(repo, "bench", "scaling_prediction.json")
        with open(out2, "w") as f:
            for r in pred:
                f.write(json.dumps(r) + "\n")
        print(f"wrote {out2}")


if __name__ == "__main__":
    main()
