"""HBM-budget capacity sizing for the Barnes-Hut paths.

The reference sizes its CUDA octree node pool from free VRAM at startup
(cuda/barnes-hut.cu:886-890: ``(free_mem * 3 / 4) / (node_mem + 4)``)
so a run either fits or fails immediately with a real number.  The TPU
translation cannot be a literal pool: XLA shapes are static at trace
time and every gather/scatter costs time proportional to its OPERAND
size (docs/PERFORMANCE.md, "why tree codes are hard"), so "allocate as
much as fits" would *slow down* every run that doesn't need the slack.
The TPU-idiomatic contract, implemented here, is:

1. **Predict**: a closed-form estimate of the fused path's HBM
   residency from (n, group_size, keep, ld) — the same quantities the
   trace will allocate — checked against the device budget *before*
   compilation, so an over-capacity config fails with GiB numbers and a
   prescriptive knob instead of an opaque XLA OOM minutes later.
2. **Clamp**: the auto-sized group capacity margin (``auto_keep``)
   shrinks toward its provable-occupancy floor when the budget is
   tight, exactly like the reference's pool shrinks on a busy GPU —
   and stays at the fast legacy margin when memory is plentiful.
3. **Measure + prescribe**: every runtime capacity stat (frontier
   octets, trimmed groups, bucket slots, halo slots) reports the
   measured requirement, and the fail-fast probes convert it into the
   exact flag value that fits (see check_fused / check_sharded_fused).

The axon PJRT plugin returns no ``memory_stats()``, so the budget falls
back to a device-kind table (v5e = 16 GiB HBM) overridable with
``NBODY_HBM_BYTES``.  On CPU the budget is None and all heuristics keep
their legacy (test-deterministic) values.
"""

from __future__ import annotations

import os

from nbody_tpu.ops.barneshut import CapacityError

# Fraction of the budget the predictive check may plan for — the
# reference's free_mem * 3/4 margin (cuda/barnes-hut.cu:886).
BUDGET_FRAC = 0.75
# Fraction of the budget the *slack* group buffers (pg + acc_g) may
# consume before auto_keep shrinks the margin toward its floor.
KEEP_FRAC = 0.25

# HBM per chip by device_kind prefix, for PJRT plugins (axon) that
# expose no memory_stats().  Public numbers: cloud.google.com/tpu/docs.
DEVICE_HBM_GIB = {
    "TPU v5 lite": 16,  # v5e
    "TPU v5e": 16,
    "TPU v5p": 95,
    "TPU v4": 32,
    "TPU v3": 16,  # per core
    "TPU v6": 32,  # Trillium
}


def hbm_limit_bytes(device=None) -> int | None:
    """Total HBM on `device` (default: first jax device), or None (CPU /
    unknown kind).  Order: NBODY_HBM_BYTES env, memory_stats(), kind table."""
    env = os.environ.get("NBODY_HBM_BYTES")
    if env:
        return int(env)
    import jax

    if device is None:
        device = jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    kind = getattr(device, "device_kind", "")
    for prefix, gib in DEVICE_HBM_GIB.items():
        if kind.startswith(prefix):
            return gib * 2**30
    return None


def hbm_free_bytes(device=None) -> int | None:
    """Free HBM right now: limit - bytes_in_use when the plugin reports
    usage, else the full limit (the axon plugin reports nothing)."""
    import jax

    if device is None:
        device = jax.devices()[0]
    limit = hbm_limit_bytes(device)
    if limit is None:
        return None
    stats = getattr(device, "memory_stats", lambda: None)()
    if stats and "bytes_in_use" in stats:
        return max(0, limit - int(stats["bytes_in_use"]))
    return limit


def budget_bytes(device=None, frac: float = BUDGET_FRAC) -> int | None:
    """The plannable budget: frac * free HBM (None off-accelerator)."""
    free = hbm_free_bytes(device)
    return None if free is None else int(free * frac)


# ---------------------------------------------------------------------------
# Sizing


def occupied_groups_floor(n: int, b: int) -> int:
    """Provable-ish lower margin on the group slot count: cell-aligned
    chunking yields ~n/b full chunks plus at most one partial chunk per
    occupied split-level cell (~0.5 n/b by auto_split_level's ~2B-body
    cells), plus slack for clustering."""
    return (3 * (n // b)) // 2 + 64


def auto_keep(n: int, b: int, g_max: int, budget: int | None = None) -> int:
    """Group slot capacity: the legacy 2x-occupancy margin, shrunk toward
    the occupancy floor when the HBM budget is tight.  The margin costs
    real time (pg gather + scatter are O(keep * b)), so plentiful memory
    does NOT inflate it — the budget only ever *clamps*."""
    base = 3 * (n // b) + 256
    if budget:
        hbm_cap = int(budget * KEEP_FRAC) // (32 * b)  # pg 16B + acc_g 16B
        base = min(base, max(hbm_cap, occupied_groups_floor(n, b)))
    return min(g_max, base)


def estimate_fused_bytes(n: int, b: int, keep: int, ld: int) -> dict:
    """Closed-form estimate (+-20%) of the fused Barnes-Hut path's peak
    HBM residency (f32).  Dominant terms only; transient sort buffers are
    folded into the per-body constant (measured at 1M/10M)."""
    np_pad = -(-n // 128) * 128
    octets = (8 ** (ld + 1) - 1) // 7
    terms = {
        "bodies (pos/vel/sorted/keys/sort transients)": 96 * n,
        "planar sources ps": 16 * np_pad,
        "group buffers pg+acc": 32 * keep * b,
        "octet tables ft+it": 24 * octets,
        "dense grid build": 40 * 8**ld,
        "output acc": 12 * n,
    }
    terms["total"] = sum(terms.values())
    return terms


def ensure_fits(
    est: dict, what: str, device=None, budget: int | None = None
) -> None:
    """Raise CapacityError with exact GiB numbers and a prescriptive knob
    when the estimated residency exceeds the device budget.  No-op when
    the budget is unknown (CPU) — XLA's host allocator handles it."""
    if budget is None:
        budget = budget_bytes(device)
    if budget is None:
        return
    total = est["total"]
    if total <= budget:
        return
    gib = 2**30
    breakdown = ", ".join(
        f"{k} {v / gib:.2f}" for k, v in est.items() if k != "total"
    )
    raise CapacityError(
        f"{what} needs ~{total / gib:.2f} GiB HBM but the device budget is "
        f"{budget / gib:.2f} GiB ({BUDGET_FRAC:.0%} of free HBM; override "
        f"with NBODY_HBM_BYTES).  Breakdown (GiB): {breakdown}.  Shard over "
        f"more chips (--shard runs at O(N/P + halo) per chip) or reduce "
        f"resolution (--bh-group-size up, --theta up)."
    )
