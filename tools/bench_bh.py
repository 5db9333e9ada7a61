#!/usr/bin/env python
"""Barnes-Hut headline benchmark: 1M bodies, theta = 0.5.

Prints one JSON line like bench.py.  Baseline: the reference's best GPU
Barnes-Hut step time at 1M bodies — bh_cuda 58.764 s / 10 steps
= 5.876 s/step (tests_result.txt:37, BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

REF_BH_1M_SEC_PER_STEP = 58.764 / 10  # bh_cuda, tests_result.txt:37


def _record(n: int, mode: str, sec_per_step: float, vs_baseline) -> None:
    """Append/update bench/bench_scale.json (best per (n, mode)): the
    scale records beyond the reference's own table (10M rows), gated by
    tests/test_bench_gate.py so they stay reproducible receipts instead
    of PERFORMANCE.md prose (VERDICT r3 item 5)."""
    path = os.path.join(os.path.dirname(__file__), "..", "bench",
                        "bench_scale.json")
    rows = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    rows[(r["n"], r["mode"])] = r
    prev = rows.get((n, mode))
    if prev is None or sec_per_step < prev["value"]:
        rows[(n, mode)] = {
            "n": n, "mode": mode, "value": sec_per_step, "unit": "s/step",
            "vs_baseline": vs_baseline, "backend": "tpu",
        }
    with open(path, "w") as f:
        for k in sorted(rows):
            f.write(json.dumps(rows[k]) + "\n")
    print(f"recorded {mode}/{n} -> {os.path.normpath(path)}")


def main() -> None:
    from nbody_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from nbody_tpu.core.types import Bodies
    from nbody_tpu.integrate.leapfrog import leapfrog_steps
    from nbody_tpu.ops.barneshut import barneshut_accelerations
    from nbody_tpu.ops.bh_fused import barneshut_fused

    on_tpu = jax.default_backend() not in ("cpu",)
    n = 1_000_000 if on_tpu else 20_000
    pos_args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if pos_args:
        n = int(pos_args[0])
    steps = 3 if on_tpu else 1
    # fused Pallas traverse+evaluate kernel on TPU; flat XLA path on CPU
    force = barneshut_fused if on_tpu else barneshut_accelerations
    if "--flat" in sys.argv:
        force = barneshut_accelerations

    if "--persistent" in sys.argv:
        # persistent Morton order (ops/bh_persistent.py): group-layout
        # integration, resort every 8 steps
        return _persistent_bench(n, steps, on_tpu)

    dtype = jnp.float32
    kind = "fp32"
    if "--df" in sys.argv:
        # fp64-grade df fused kernel (ops/bh_fused_df.py) under x64
        # state — the apples-to-apples row vs bh_cuda, whose 5.876
        # s/step at 1M is itself an fp64 number (cuda/barnes-hut.cu
        # double* arrays)
        jax.config.update("jax_enable_x64", True)
        from nbody_tpu.ops.bh_fused_df import barneshut_fused_df

        force = barneshut_fused_df
        dtype = jnp.float64
        kind = "fp64-grade df"

    rng = np.random.default_rng(0)
    bodies = Bodies(
        pos=jnp.asarray(rng.uniform(-2.0, 2.0, (n, 3)), dtype),
        vel=jnp.asarray(rng.uniform(-1.0, 1.0, (n, 3)), dtype),
        mass=jnp.asarray(rng.uniform(0.04, 1.0, n), dtype),
    )

    def run():
        out, acc = leapfrog_steps(bodies, steps, 1e-4, force)
        np.asarray(out.pos[:1])  # D2H readback as the timing fence

    run()  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    sec_per_step = best / (steps + 1)  # (steps+1) force evals per run

    # the reference only ran bh_cuda at 1M (tests_result.txt:37); beyond
    # that there is nothing to normalize against
    vsb = REF_BH_1M_SEC_PER_STEP / sec_per_step if n <= 1_000_000 else None
    print(
        json.dumps(
            {
                "metric": f"Barnes-Hut seconds/step ({n} bodies, theta=0.5, "
                f"{kind}; lower is better)",
                "value": sec_per_step,
                "unit": "s/step",
                "vs_baseline": vsb,
            }
        )
    )
    if "--record" in sys.argv:
        _record(
            n, "fused-df" if "--df" in sys.argv else "fused",
            sec_per_step, vsb,
        )


def _persistent_bench(n: int, steps: int, on_tpu: bool) -> None:
    import time as _time

    import jax.numpy as jnp

    from nbody_tpu.ops.bh_persistent import (
        _layout, init_state, kdk_steps, kdk_steps_chunked,
        kdk_steps_donated, prime, prime_chunked,
    )

    # donation halves the ~2x GroupState residency (the 100M margin on
    # a 16 GB v5e); the run loop never touches the old state
    stepper = kdk_steps_donated if on_tpu else kdk_steps

    if n > 20_000_000 and on_tpu:
        # device-side fixture: host-generating 100M bodies and pushing
        # ~3.5 GB through the tunneled chip costs ~10+ min; an on-chip
        # jax.random cloud is deterministic (fixed key) and instant
        import jax

        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        pos = jax.random.uniform(
            k0, (n, 3), jnp.float32, minval=-2.0, maxval=2.0
        )
        vel = jax.random.uniform(
            k1, (n, 3), jnp.float32, minval=-1.0, maxval=1.0
        )
        mass = jax.random.uniform(
            k2, (n,), jnp.float32, minval=0.04, maxval=1.0
        )
    else:
        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.uniform(-2.0, 2.0, (n, 3)), jnp.float32)
        vel = jnp.asarray(rng.uniform(-1.0, 1.0, (n, 3)), jnp.float32)
        mass = jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32)
    ld_arg = 0
    for i, a in enumerate(sys.argv[1:-1]):
        if a == "--ld":
            ld_arg = int(sys.argv[1:][i + 1])
    _, ld, _, _ = _layout(n, 1024, ld=ld_arg or None)
    fkw = dict(theta=0.5, softening_sq=0.01, leaf_cap=64, ld=ld,
               interpret=not on_tpu)
    # the ld override MUST also shape the state: the int tables (it/nid)
    # are depth-dependent, and a kernel traversing deeper than the state
    # was built for reads past the octet table (device crash at 100M)
    st = init_state(pos, vel, mass, group_size=1024, ld=ld_arg or None)
    del pos, vel, mass  # 2.8 GB of device fixture: dead weight vs HBM
    k = max(steps, 3)
    # Beyond ~20M bodies even a SINGLE step (or prime) is one device
    # program past the ~90 s execution watchdog (a 100M eval measured
    # ~210 s in one program; the worker crashed mid-bench) — run the
    # chunked stepper: each force eval is ceil(n/25M) bounded programs.
    per_step = n > 20_000_000
    n_chunks = max(1, -(-n // 25_000_000))
    if per_step:
        st = prime_chunked(st, n_chunks=n_chunks, **fkw)
    else:
        st = prime(st, **fkw)

    def run(st):
        if per_step:
            for _ in range(k):
                st = kdk_steps_chunked(st, 1, 1e-4, n_chunks=n_chunks,
                                       **fkw)
                np.asarray(st.acc[:1, :1])
        else:
            st = stepper(st, k, 1e-4, **fkw)
        np.asarray(st.acc[:1, :1])
        return st

    st = run(st)  # compile
    best = float("inf")
    for _ in range(1 if per_step else 3):
        t0 = _time.perf_counter()
        st = run(st)
        best = min(best, _time.perf_counter() - t0)
    sec_per_step = best / k
    vsb = REF_BH_1M_SEC_PER_STEP / sec_per_step if n <= 1_000_000 else None
    print(
        json.dumps(
            {
                "metric": f"Barnes-Hut seconds/step ({n} bodies, persistent "
                "Morton order, theta=0.5, fp32; lower is better)",
                "value": sec_per_step,
                "unit": "s/step",
                "vs_baseline": vsb,
            }
        )
    )
    if "--record" in sys.argv:
        _record(n, "persistent", sec_per_step, vsb)


if __name__ == "__main__":
    main()
