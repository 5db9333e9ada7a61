"""Headline benchmark: pair-interactions/sec/chip on 100k-body all-pairs.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's best GPU all-pairs throughput, exh_cuda at
100k bodies x 10 steps = 136.669 s => ~8.0e8 pairs/s
(tests_result.txt:13, BASELINE.md).  The BASELINE.json north star is
>= 1e10 pairs/s/chip.

Measured end-to-end through the integrator (leapfrog_steps with the Pallas
force), not a bare kernel loop, so integrator overhead is included.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_BEST_PAIRS_PER_SEC = 8.0e8  # exh_cuda 100k x 10 steps, tests_result.txt:13


def main() -> None:
    from nbody_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from nbody_tpu.core.types import Bodies
    from nbody_tpu.integrate.leapfrog import leapfrog_steps

    on_tpu = jax.default_backend() not in ("cpu",)
    n = 100_000 if on_tpu else 4_000
    steps = 10 if on_tpu else 2

    rng = np.random.default_rng(0)
    bodies = Bodies(
        pos=jnp.asarray(rng.uniform(-2.0, 2.0, (n, 3)), jnp.float32),
        vel=jnp.asarray(rng.uniform(-1.0, 1.0, (n, 3)), jnp.float32),
        mass=jnp.asarray(rng.uniform(0.04, 1.0, (n,)), jnp.float32),
    )

    if on_tpu:
        from nbody_tpu.ops.pallas_exhaustive import pallas_accelerations as force
    else:
        from nbody_tpu.ops.exhaustive import exhaustive_accelerations as force

    def run():
        out, acc = leapfrog_steps(bodies, steps, 0.0001, force)
        # Force full synchronization with a device-to-host readback:
        # block_until_ready is not a reliable fence on every PJRT plugin
        # (the axon tunnel returns immediately), but a D2H copy of the
        # result cannot complete before the computation has.
        np.asarray(out.pos[:1])
        return out

    run()  # warm-up / compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)

    # (steps + 1) force evaluations per run (initial + one per step),
    # N^2 pairs each — the reference's own accounting (BASELINE.md).
    pairs = float(n) * n * (steps + 1)
    pairs_per_sec = pairs / best

    print(
        json.dumps(
            {
                "metric": f"pair-interactions/sec/chip ({n} bodies all-pairs, "
                f"{steps}-step leapfrog, fp32)",
                "value": pairs_per_sec,
                "unit": "pairs/s",
                "vs_baseline": pairs_per_sec / REF_BEST_PAIRS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
