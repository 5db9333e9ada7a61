"""Data-adaptive grid depth: price candidate terminal levels from the
Morton occupancy histogram and the kernel's own measured unit costs.

Round 3 shipped the outlier-robust hybrid with a fixed auto-deepened
default (`ld = auto_ld + 2`, max 8).  Measured on silicon that default
is data-dependent in the worst way (docs/PERFORMANCE.md "robust"
tables): the core-dense 1M Plummer gains 3.7x from ld 8 (near volume
423M -> 47M), while a shell-like 1M Plummer pays 28% for it — at ld 8
the per-step dense-table rebuild (~187 ms, 19.2M nodes) outweighs near
savings the shell never had.  The user had to A/B `--bh-ld` per input.

This module removes the knob by PRICING each candidate depth before the
first compile:

* a host-side dry traversal mirrors the fused kernel's exact
  classification (`ops/bh_fused._fused_kernel`: far iff
  theta^2 * d2 > (border/2^l)^2 with d2 the squared distance from the
  cell COM to the group AABB; near iff not far and (cnt <= leaf_cap or
  terminal)) over a stratified sample of body groups, giving the
  near/far staging volumes a depth-d grid would ship;
* the volumes convert to milliseconds with unit costs MEASURED on the
  v5e chip by the round-4 stage bisects (docs/PERFORMANCE.md):
  ~14 ns per staged source (packed eval + staging), ~130 ns per
  traversal pop, ~9.7 ns per dense-table node for the persistent
  rebuild (187 ms / 19.17M nodes at ld 8);
* `choose_ld` returns the argmin.

The walk is one pass shared by every candidate: classification at level
l < d is candidate-independent (the `terminal` disjunct only fires at
l == d), so a single descent to max(candidates) records per level the
near bodies, far children, opened cells and would-be-terminal bodies,
and each candidate's totals are prefix sums of those.

The reference shares the pathology this fixes: its root cube is sized
by the global max coordinate (serial/barnes-hut.c:326-344) and its
leaves split to unbounded depth, so one escaper costs it ~14-level
chains per body; it has no mechanism to pick resolution from the data.
"""

from __future__ import annotations

import math

import numpy as np

# Unit costs measured on the v5e chip (round-4 stage bisect at 1M
# uniform, docs/PERFORMANCE.md "Round-4"): eval 81 ms + staging 62 ms
# over 10.4M staged sources; traversal 26 ms over 199k pops; persistent
# float-table rebuild 187 ms over 19.17M nodes (shell fixture, ld 8).
NS_PER_SOURCE = 14.0
NS_PER_POP = 130.0
NS_PER_TABLE_NODE = 9.7
# One-shot builds pay the dense grid build instead of the rebuild; the
# per-node share of the measured 61 ms grid+pack phase at ld 6 (~0.3M
# nodes) is mostly per-BODY work, so the node term is small.
NS_PER_BUILD_NODE = 3.0


def _np_spread3(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint32)
    v = (v | (v << np.uint32(16))) & np.uint32(0x030000FF)
    v = (v | (v << np.uint32(8))) & np.uint32(0x0300F00F)
    v = (v | (v << np.uint32(4))) & np.uint32(0x030C30C3)
    v = (v | (v << np.uint32(2))) & np.uint32(0x09249249)
    return v


def np_morton_encode(pos: np.ndarray, border: float, depth: int) -> np.ndarray:
    """NumPy mirror of ops.morton.morton_encode (same clip/centering)."""
    n_cells = np.float32(2**depth)
    scaled = (pos.astype(np.float32) / np.float32(border) + 0.5) * n_cells
    cell = np.clip(scaled.astype(np.int32), 0, 2**depth - 1).astype(np.uint32)
    key = (
        _np_spread3(cell[:, 0])
        | (_np_spread3(cell[:, 1]) << np.uint32(1))
        | (_np_spread3(cell[:, 2]) << np.uint32(2))
    )
    return key.astype(np.int64)


def robust_border_np(pos: np.ndarray, outlier_slots: int = 0):
    """NumPy mirror of bh_fused.barneshut_fused_robust's box sizing:
    center at the coordinate median, border = 2 * (K+1)-th largest
    Chebyshev distance.  Returns (center, border, outlier_index)."""
    n = pos.shape[0]
    k = int(outlier_slots) or max(128, n // 512)
    k = min(k, n - 1)
    pos32 = pos.astype(np.float32)
    center = np.median(pos32, axis=0)
    d = np.max(np.abs(pos32 - center), axis=1)
    idx = np.argpartition(d, n - 1 - k)[n - 1 - k :]
    order = idx[np.argsort(d[idx])[::-1]]
    border = 2.0 * d[order[k]] * 1.0001
    return center, float(border), order[:k]


def estimate_bh_costs(
    pos: np.ndarray,
    mass: np.ndarray,
    *,
    border: float,
    center=None,
    theta: float = 0.5,
    leaf_cap: int = 64,
    group_size: int = 1024,
    depths=(4, 5, 6, 7, 8),
    sample_groups: int = 64,
    persistent: bool = False,
    group_chunk: int = 8,
):
    """Price each candidate terminal level `d` in predicted milliseconds.

    Returns {d: {"near": float, "far": float, "pops": float,
    "pred_ms": float}} where near/far are the estimated per-eval staged
    source volumes (bodies / far-COM children) extrapolated from the
    group sample, and pred_ms adds the measured per-node table term
    (rebuild if `persistent`, build otherwise).
    """
    n = pos.shape[0]
    b = int(group_size)
    max_d = max(depths)
    pos32 = np.asarray(pos, np.float32)
    if center is not None:
        pos32 = pos32 - np.asarray(center, np.float32)
    keys = np_morton_encode(pos32, border, max_d)
    order = np.argsort(keys, kind="stable")
    ps = pos32[order]
    ks = keys[order]
    ms = np.asarray(mass, np.float32)[order]

    # mirror ops.barneshut.group_bodies: B-body chunks that never cross
    # split-level cell boundaries (auto_split_level: cells hold ~2B).
    # Dense regions therefore hold MANY partial groups — sampling plain
    # B-runs instead underestimated the core-dense near volume 10x.
    sl = max(0, round(math.log(max(n / (2.0 * b), 1.0), 8)))
    cell_sl = ks >> (3 * (max_d - min(sl, max_d)))
    first_in_cell = np.concatenate(([True], cell_sl[1:] != cell_sl[:-1]))
    idx = np.arange(n)
    cell_start = np.maximum.accumulate(np.where(first_in_cell, idx, 0))
    new_group = first_in_cell | ((idx - cell_start) % b == 0)
    gstarts = np.flatnonzero(new_group)
    gends = np.concatenate((gstarts[1:], [n]))
    n_groups = len(gstarts)
    stride = max(1, n_groups // max(1, sample_groups))
    gsel = np.arange(0, n_groups, stride)
    weight = n_groups / len(gsel)
    # group AABBs from real members only (pad slots repeat the first
    # body, so they never widen the box — group_bodies' contract)
    glo = np.empty((len(gsel), 3), np.float32)
    ghi = np.empty((len(gsel), 3), np.float32)
    for i, g in enumerate(gsel):
        seg = ps[gstarts[g] : gends[g]]
        glo[i] = seg.min(axis=0)
        ghi[i] = seg.max(axis=0)

    theta_sq = np.float32(theta * theta)
    s = len(gsel)
    # per-level records (candidate-independent for l < d; see module doc)
    near_l = np.zeros(max_d + 1)  # bodies staged near at level l (non-term)
    term_l = np.zeros(max_d + 1)  # bodies that would stage if l were terminal
    far_l = np.zeros(max_d + 1)  # far children classified at level l
    pops_l = np.zeros(max_d + 1)  # opened-cell volume (classify work)

    # paropen[s, c]: did group s open cell c's parent?  level 0 = root
    paropen = np.ones((s, 1), bool)
    parent_keys = np.zeros(1, np.int64)
    for l in range(1, max_d + 1):
        pref = ks >> (3 * (max_d - l))
        bound = np.flatnonzero(np.diff(pref)) + 1
        starts = np.concatenate(([0], bound))
        cells = pref[starts]
        cnt = np.diff(np.concatenate((starts, [n])))
        # max() guards all-massless cells (robust mode's zero-massed
        # outliers): their COM placement barely moves the estimate
        wsum = np.maximum(np.add.reduceat(ms, starts), np.float32(1e-30))
        com = np.add.reduceat(ps * ms[:, None], starts) / wsum[:, None]
        # gate by parent openness: map each cell to its parent's column
        pcol = np.searchsorted(parent_keys, cells >> 3)
        po = paropen[:, pcol]  # (s, C)
        bsq = np.float32((border / 2.0**l) ** 2)
        c_cnt = cnt.shape[0]
        opened = np.zeros((s, c_cnt), bool)
        for j0 in range(0, s, group_chunk):
            j1 = min(j0 + group_chunk, s)
            dx = com[None, :, 0] - np.clip(
                com[None, :, 0], glo[j0:j1, None, 0], ghi[j0:j1, None, 0]
            )
            dy = com[None, :, 1] - np.clip(
                com[None, :, 1], glo[j0:j1, None, 1], ghi[j0:j1, None, 1]
            )
            dz = com[None, :, 2] - np.clip(
                com[None, :, 2], glo[j0:j1, None, 2], ghi[j0:j1, None, 2]
            )
            d2 = dx * dx + dy * dy + dz * dz
            pj = po[j0:j1]
            far = (theta_sq * d2 > bsq) & pj
            notfar = ~far & pj
            near = notfar & (cnt[None, :] <= leaf_cap)
            far_l[l] += far.sum()
            near_l[l] += (near * cnt[None, :]).sum()
            term_l[l] += (notfar * cnt[None, :]).sum()
            opened[j0:j1] = notfar & ~near
            pops_l[l] += pj.sum()
        paropen = opened
        parent_keys = cells

    out = {}
    for d in sorted(depths):
        near = (near_l[1:d].sum() + term_l[d]) * weight
        far = far_l[1 : d + 1].sum() * weight
        pops = pops_l[1 : d + 1].sum() * weight
        nodes = (8 ** (d + 1) - 1) // 7
        node_ns = NS_PER_TABLE_NODE if persistent else NS_PER_BUILD_NODE
        pred = (
            (near + far) * NS_PER_SOURCE
            + (pops / 128.0) * NS_PER_POP
            + nodes * node_ns
        ) * 1e-6
        out[d] = {"near": near, "far": far, "pops": pops, "pred_ms": pred}
    return out


def choose_ld(
    pos: np.ndarray,
    mass: np.ndarray,
    *,
    robust: bool = False,
    outlier_slots: int = 0,
    theta: float = 0.5,
    leaf_cap: int = 64,
    group_size: int = 1024,
    persistent: bool = False,
    min_ld: int = 0,
    max_ld: int = 8,
    sample_groups: int = 64,
    verbose: bool = False,
):
    """Pick the terminal grid level for this input by measured-cost
    pricing.  Mirrors the robust box (median center, K-outlier-trimmed
    border, zero-massed outliers) when `robust`; otherwise prices the
    plain bounding cube.  Returns (ld, costs_dict)."""
    from nbody_tpu.ops.bh_fused import auto_ld

    n = pos.shape[0]
    pos = np.asarray(pos, np.float32)
    mass_w = np.asarray(mass, np.float32)
    center = None
    if robust:
        center, border, out_idx = robust_border_np(pos, outlier_slots)
        mass_w = mass_w.copy()
        mass_w[out_idx] = 0.0
    else:
        border = 2.0 * float(np.max(np.abs(pos)))
    border = max(border, 1e-30)  # degenerate (coincident) inputs
    base = auto_ld(n)
    lo = max(2, min_ld or base)
    hi = max(lo, min(max_ld, base + 2 if not robust else max_ld))
    depths = tuple(range(lo, hi + 1))
    if len(depths) == 1:
        return depths[0], {}
    costs = estimate_bh_costs(
        pos,
        mass_w,
        border=border,
        center=center,
        theta=theta,
        leaf_cap=leaf_cap,
        group_size=group_size,
        depths=depths,
        sample_groups=sample_groups,
        persistent=persistent,
    )
    best = min(costs, key=lambda d: costs[d]["pred_ms"])
    if verbose:
        for d in sorted(costs):
            c = costs[d]
            print(
                f"  ld {d}: near {c['near']:.3e} far {c['far']:.3e} "
                f"pred {c['pred_ms']:.1f} ms"
                + ("  <- pick" if d == best else "")
            )
    return best, costs


# ---------------------------------------------------------------------------
# Persistent cache for the probe (VERDICT r4 weak #7): the host-side dry
# traversal costs 10-13 s at 1M bodies, and a resumed or re-run simulation
# on the same fixture re-paid it every launch.  The pick is a pure function
# of the input distribution and the pricing config, so key it on a cheap
# content hash (a strided coordinate/mass sample — the probe itself only
# looks at a stratified sample of groups) and persist the choice next to
# the XLA compile cache.

_CACHE_SCHEMA = 1  # bump when pricing constants / probe semantics change


def _autold_cache_path() -> str:
    import os

    base = os.environ.get(
        "NBODY_TPU_COMPILE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "nbody_tpu_xla",
        ),
    )
    return os.path.join(base, "autold_cache.json")


def _autold_key(pos, mass, kwargs) -> str:
    import hashlib

    n = pos.shape[0]
    stride = max(1, n // 4096)
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(pos[::stride], np.float32).tobytes())
    h.update(np.ascontiguousarray(mass[::stride], np.float32).tobytes())
    cfg = {k: kwargs.get(k) for k in sorted(kwargs) if k != "verbose"}
    h.update(repr((_CACHE_SCHEMA, n, NS_PER_SOURCE, NS_PER_POP,
                   NS_PER_TABLE_NODE, NS_PER_BUILD_NODE, cfg)).encode())
    return h.hexdigest()


def choose_ld_cached(pos: np.ndarray, mass: np.ndarray, **kwargs):
    """`choose_ld` with a persistent on-disk memo.  Returns (ld, cached)
    where `cached` says whether the probe was skipped.  Cache misses run
    the probe and append; IO failures silently fall back to probing —
    like the compile cache, this is an optimization, never a requirement.
    Disable with NBODY_TPU_NO_COMPILE_CACHE (it rides the same dir)."""
    import json
    import os

    pos = np.asarray(pos, np.float32)
    mass = np.asarray(mass, np.float32)
    if os.environ.get("NBODY_TPU_NO_COMPILE_CACHE"):
        return choose_ld(pos, mass, **kwargs)[0], False
    path = _autold_cache_path()
    key = _autold_key(pos, mass, kwargs)
    table: dict = {}
    try:
        with open(path) as f:
            table = json.load(f)
        if key in table:
            return int(table[key]), True
    except Exception:
        table = {}
    ld, _ = choose_ld(pos, mass, **kwargs)
    try:
        table[key] = int(ld)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp.%d" % os.getpid()
        with open(tmp, "w") as f:
            json.dump(table, f)
        os.replace(tmp, path)
    except Exception:
        pass
    return int(ld), False
