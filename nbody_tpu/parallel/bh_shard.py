"""Morton-range-sharded Barnes-Hut: distributed sort, build and traversal.

Round 1 sharded only the traversal: every chip all_gathered all N bodies
and redundantly Morton-sorted and built the full tree, so per-chip build
cost stayed O(N log N) — the Amdahl floor called out in VERDICT.md.  This
module shards the whole pipeline the way SURVEY.md §7 (hard part 5)
prescribes: each chip OWNS a contiguous Morton key range, sorts and
builds only its own bodies, and shares only fixed-size aggregates.

Per force eval, on a P-chip mesh with N bodies (C = N / P local):

1. global root cube: `pmax` of the local |coord| max (the collective
   analog of the reference's bounding-box reductions,
   cuda/barnes-hut.cu:307-349);
2. local Morton sort O(C log C);
3. splitter selection: each chip contributes S evenly-ranked key samples,
   the P*S samples are all_gathered, and splitters at ranks S, 2S, ... are
   snapped DOWN to terminal-cell boundaries — so a terminal cell never
   straddles chips (sample sort; the snap keeps dense-grid cells
   single-owner, which keeps their body ranges contiguous);
4. redistribution: each chip's sorted bodies fall into P contiguous
   key-range buckets; fixed-capacity buckets ride ONE `all_to_all` over
   ICI, and each chip merge-sorts the <=P runs it received — O(C' log C')
   with C' = bucket_frac * C.  Bucket overflow (pathological imbalance) is
   detected and reported, never silent (the framework-wide capacity
   contract, ops/barneshut.py check_capacities);
5. distributed dense-grid build: each chip segment-sums ITS OWN bodies
   into the 8^ld terminal accumulators; one `psum` makes the (identical,
   VMEM-resident) grid whole on every chip.  This is the "replicate only
   the top levels" plan — the dense grid IS levels 0..ld, a fixed ~5 MB
   at ld=6 regardless of N, and per-chip build work is O(C) + O(8^ld);
6. per-chip fused traversal (ops/bh_fused.py) over the chip's OWN groups
   only; the planar source array for near-field DMA is the all_gather of
   the chips' padded sorted shards (the j-side gather the all-pairs
   sharding also performs — ICI bandwidth, not compute);
7. accelerations routed back to the original sharding through the carried
   original-index field.

Body ranges in the gathered layout may contain padding slots (each chip
pads its shard to a static capacity).  Padding carries gm = 0 and finite
coordinates, so any range that spans it contributes exactly zero force —
the it-table packs each cell's [start, span-to-last-real-descendant]
instead of [start, count], and classification uses span as a conservative
count (span >= count: a straddling cell at worst opens one level early).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from nbody_tpu.core import constants
from nbody_tpu.ops.barneshut import CapacityError
from nbody_tpu.ops.bh_fused import (
    FRONTIER_CAP,
    auto_ld,
    auto_split_level,
    aux_octet_offsets,
    fused_group_forces,
    pack_tables,
)
from nbody_tpu.ops.bh_grid import grid_from_terminal, grid_offsets
from nbody_tpu.ops.morton import morton_encode
from nbody_tpu.parallel.mesh import BODY_AXIS, make_mesh

_SENT_KEY = jnp.int32(1 << 30)  # > any 30-bit Morton key
_DEPTH = 10


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Above this many bodies the all_gathered planar source array stops being
# noise next to HBM (16 bytes/body/chip); the Morton-halo exchange
# (parallel/bh_halo.py) keeps per-chip memory O(N/P + halo) instead.
HALO_THRESHOLD = 4_000_000


def fused_shard_force_fn(
    mesh=None,
    axis_name: str = BODY_AXIS,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    theta: float = constants.THETA,
    group_size: int = 1024,
    leaf_cap: int = 64,
    samples_per_chip: int = 32,
    bucket_frac: float = 2.5,
    burst_rows: int = 16,
    halo: bool | None = None,
    halo_cap: int = 0,
    keep_groups: int = 0,
    frontier_cap: int = 0,
    robust_slots: int = 0,
    ld: int = 0,
    groups_per_program: int = 8,
    interpret: bool | None = None,
    return_stats: bool = False,
):
    """Sharded Barnes-Hut ForceFn: (pos, mass) sharded on axis 0 -> acc.

    `halo` selects the near-field source exchange: False all_gathers the
    planar slots (per-chip O(N) memory), True runs the Morton-halo
    exchange (parallel/bh_halo.py, per-chip O(N/P + halo)); None picks
    halo above HALO_THRESHOLD bodies.  `halo_cap` is the per-chip-pair
    slot capacity (0 = auto), runtime-overflow-checked.

    `robust_slots > 0` is the distributed form of the exact outlier
    hybrid (ops/bh_fused.barneshut_fused_robust): the root cube is sized
    by the global (K+1)-th largest L-inf distance from a
    median-of-chip-medians center (one all_gather of per-chip top-K
    distance candidates), the <=K out-of-cube bodies ride the pipeline
    zero-massed, their (pos, G*mass) rows are gathered into a replicated
    (K, 4) table, and every chip adds the exact (C, K) rectangle to its
    own targets.  Nothing is approximated; the grid deepens to
    auto_ld + 2 (max 8) like the one-shot path.

    With return_stats=True returns (acc, stats) where stats is a dict of
    replicated scalars: bucket_overflow / trimmed_groups / frontier_overflow
    / halo_overflow must all be 0 for exact forces (see
    check_sharded_fused)."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ld_over = int(ld)

    def local(pos_l, mass_l):
        dtype = pos_l.dtype
        C = pos_l.shape[0]
        N = n_dev * C
        b = min(group_size, C)
        ld = ld_over or (
            min(8, auto_ld(N) + 2) if robust_slots else auto_ld(N)
        )
        sl = auto_split_level(N, b)
        k_terminal = 8**ld
        CB = _round_up(max(int(bucket_frac * C / n_dev), min(C, 256)), 128)
        C_own = n_dev * CB
        k = lax.axis_index(axis_name)

        pos32_l = pos_l.astype(jnp.float32)
        otab = None
        if robust_slots:
            # distributed exact outlier hybrid (docstring above);
            # negative = auto, matching barneshut_fused_robust's default
            kq = max(128, N // 512) if robust_slots < 0 else int(robust_slots)
            kq = min(kq, N - 1)
            kq_l = min(kq + 1, C)
            meds = lax.all_gather(
                jnp.median(pos32_l, axis=0), axis_name, axis=0
            )  # (P, 3)
            center = jnp.median(meds, axis=0)
            rel_l = pos32_l - center
            d_l = jnp.max(jnp.abs(rel_l), axis=1)
            v_l, i_l = lax.top_k(d_l, kq_l)
            v_all = lax.all_gather(v_l, axis_name, axis=0, tiled=True)
            thr = lax.top_k(v_all, min(kq + 1, v_all.shape[0]))[0][
                min(kq, v_all.shape[0] - 1)
            ]
            border = 2.0 * thr * 1.0001
            is_out = v_l > thr  # strict: ties stay in the tree (<=K out)
            stash_f = jnp.concatenate(
                [
                    pos32_l[i_l],
                    jnp.where(
                        is_out, jnp.float32(G) * mass_l[i_l], 0.0
                    ).astype(jnp.float32)[:, None],
                ],
                axis=1,
            )  # (kq_l, 4); non-outlier rows are inert (gm = 0)
            sf_all = lax.all_gather(stash_f, axis_name, axis=0, tiled=True)
            sd_all = lax.all_gather(
                jnp.where(is_out, v_l, -1.0), axis_name, axis=0, tiled=True
            )
            sel = lax.top_k(sd_all, min(kq, sd_all.shape[0]))[1]
            otab = sf_all[sel]  # (kq, 4) replicated outlier table
            mass_eff = jnp.where(d_l > thr, 0.0, mass_l)
            pos_enc = rel_l
        else:
            # 1. global root cube ----------------------------------------
            border = 2.0 * lax.pmax(jnp.max(jnp.abs(pos_l)), axis_name)
            mass_eff = mass_l
            pos_enc = pos_l

        # 2. local Morton sort -------------------------------------------
        keys = morton_encode(pos_enc, border, _DEPTH)
        ordl = jnp.argsort(keys)
        keys_s = keys[ordl]
        pos_s = pos_enc[ordl].astype(jnp.float32)
        gm_s = (
            jnp.asarray(G, jnp.float32) * mass_eff[ordl]
        ).astype(jnp.float32)
        orig = (k * C + ordl).astype(jnp.int32)

        # 3. splitters (sample sort, snapped to terminal-cell bounds) ----
        S = samples_per_chip
        samp = keys_s[(jnp.arange(S) * C) // S]
        all_samp = lax.all_gather(samp, axis_name, axis=0, tiled=True)
        ss = jnp.sort(all_samp)
        spl = ss[jnp.arange(1, n_dev) * S]  # (P-1,)
        spl = spl & ~jnp.int32((1 << (3 * (_DEPTH - ld))) - 1)

        # 4. bucket + all_to_all redistribution --------------------------
        o = jnp.concatenate(
            [
                jnp.zeros((1,), jnp.int32),
                jnp.searchsorted(keys_s, spl, side="left").astype(jnp.int32),
                jnp.full((1,), C, jnp.int32),
            ]
        )  # (P+1,) bucket boundaries in local sorted order
        cnt_b = o[1:] - o[:-1]
        bucket_overflow = lax.pmax(jnp.max(cnt_b - CB), axis_name)

        fall = jnp.concatenate(
            [pos_s, gm_s[:, None]], axis=1
        )  # (C, 4) [x y z gm]
        iall = jnp.stack([keys_s, orig], axis=1)  # (C, 2)
        fpad = jnp.pad(fall, ((0, CB), (0, 0)))
        ipad = jnp.pad(iall, ((0, CB), (0, 0)))

        sf, si = [], []
        slot = jnp.arange(CB, dtype=jnp.int32)[:, None]
        for j in range(n_dev):
            valid = slot < cnt_b[j]
            fj = lax.dynamic_slice_in_dim(fpad, o[j], CB, axis=0)
            ij = lax.dynamic_slice_in_dim(ipad, o[j], CB, axis=0)
            fj = jnp.where(valid, fj, jnp.where(jnp.arange(4) == 3, 0.0, fj))
            ij = jnp.where(
                valid, ij, jnp.stack(
                    [jnp.broadcast_to(_SENT_KEY, (CB,)),
                     jnp.full((CB,), -1, jnp.int32)], axis=1
                )
            )
            sf.append(fj)
            si.append(ij)
        send_f = jnp.stack(sf)  # (P, CB, 4)
        send_i = jnp.stack(si)  # (P, CB, 2)
        if n_dev > 1:
            recv_f = lax.all_to_all(
                send_f, axis_name, split_axis=0, concat_axis=0
            )
            recv_i = lax.all_to_all(
                send_i, axis_name, split_axis=0, concat_axis=0
            )
        else:
            recv_f, recv_i = send_f, send_i

        rk = recv_i[:, :, 0].reshape(C_own)
        mo = jnp.argsort(rk)  # merge of <=P sorted runs; pads sink to end
        myk = rk[mo]
        myo = recv_i[:, :, 1].reshape(C_own)[mo]
        myf = recv_f.reshape(C_own, 4)[mo]
        real = myk < _SENT_KEY
        R_l = jnp.sum(real.astype(jnp.int32))

        # 5. distributed dense-grid build --------------------------------
        nid = jnp.where(real, myk >> (3 * (_DEPTH - ld)), k_terminal)
        seg = partial(jax.ops.segment_sum, segment_ids=nid,
                      num_segments=k_terminal)
        gm_masked = jnp.where(real, myf[:, 3], 0.0)
        w_p = seg(gm_masked[:, None] * myf[:, :3])
        gm_p = seg(gm_masked)
        cnt_p = seg(real.astype(jnp.int32))
        gidx = (k * C_own + jnp.arange(C_own)).astype(jnp.int32)
        inf = jnp.int32(2**31 - 1)
        st_p = jax.ops.segment_min(
            jnp.where(real, gidx, inf), nid, num_segments=k_terminal
        )
        en_p = jax.ops.segment_max(
            jnp.where(real, gidx + 1, -1), nid, num_segments=k_terminal
        )
        w_g = lax.psum(w_p, axis_name)
        gm_g = lax.psum(gm_p, axis_name)
        cnt_g = lax.psum(cnt_p, axis_name)
        st_g = lax.pmin(st_p, axis_name)
        en_g = lax.pmax(en_p, axis_name)
        tree = grid_from_terminal(w_g, gm_g, cnt_g, st_g, en_g, ld)
        ft, it = pack_tables(tree, ld)

        # 6. per-chip grouping + fused traversal -------------------------
        from nbody_tpu.ops.barneshut import compact_groups, group_bodies

        gstart, gcount, group_idx, group_valid = group_bodies(
            myk, C_own, _DEPTH, b, sl
        )
        # clamp pad bodies out of the trailing groups; pad slots re-point at
        # the group's first body so the AABB stays tight (group_bodies'
        # convention — origin-coordinate pads would inflate it to the domain)
        gcount = jnp.minimum(gcount, jnp.clip(R_l - gstart, 0))
        slots = jnp.arange(b, dtype=jnp.int32)[None, :]
        group_valid = slots < gcount[:, None]
        group_idx = jnp.clip(
            jnp.where(group_valid, gstart[:, None] + slots, gstart[:, None]),
            0,
            C_own - 1,
        )
        from nbody_tpu.core import capacity as _cap

        keep = keep_groups or _cap.auto_keep(
            C_own, b, gstart.shape[0], _cap.budget_bytes()
        )
        keep = min(keep, gstart.shape[0])
        gstart, gcount, group_idx, group_valid, trimmed = compact_groups(
            gstart, gcount, group_idx, group_valid, keep
        )
        pg = jnp.concatenate(
            [
                jnp.transpose(myf[group_idx][:, :, :3], (0, 2, 1)),
                jnp.zeros((keep, 1, b), jnp.float32),
            ],
            axis=1,
        )

        ps_l = myf.T  # (4, C_own); pads carry gm = 0, finite coords
        use_halo = halo if halo is not None else (N >= HALO_THRESHOLD)
        halo_ovf = jnp.int32(0)
        if use_halo and n_dev > 1:
            from nbody_tpu.parallel import bh_halo

            h_cap = halo_cap or _round_up(max(256, C_own // 8), 128)
            aabbs = bh_halo.chip_aabbs(myf[:, :3], real, axis_name)
            span_all = tree.cnt[0]
            start_all = tree.start[0]
            flags = bh_halo.halo_flags(
                span_all, border.astype(jnp.float32), theta, leaf_cap,
                ld, aabbs,
            )
            plan = bh_halo.halo_plan(start_all, span_all, flags, C_own, h_cap)
            slots = plan["send_slots"](k)  # (P, H) global, dst-major
            okr = (
                jnp.arange(h_cap, dtype=jnp.int32)[None, :]
                < plan["counts"][:, k][:, None]
            )
            lsl = jnp.clip(slots - k * C_own, 0, C_own - 1)
            send = jnp.where(okr[:, None, :], ps_l[:, lsl].transpose(1, 0, 2), 0.0)
            if n_dev > 1:
                recv = lax.all_to_all(
                    send, axis_name, split_axis=0, concat_axis=0
                )
            else:
                recv = send
            ps = jnp.concatenate(
                [ps_l, recv.transpose(1, 0, 2).reshape(4, n_dev * h_cap)],
                axis=1,
            )
            new_start = bh_halo.rewrite_starts(
                start_all, span_all, flags, plan["packed"],
                plan["counts"], k, C_own, h_cap,
            )
            from nbody_tpu.ops.bh_fused import pack_it

            it = pack_it(tree._replace(start=new_start[None, :]), ld)
            halo_ovf = lax.pmax(jnp.maximum(plan["overflow"], 0), axis_name)
        else:
            ps = lax.all_gather(ps_l, axis_name, axis=1, tiled=True)

        lev = jnp.arange(16, dtype=jnp.float32)
        bsq = (border.astype(jnp.float32) / jnp.exp2(lev)) ** 2
        ooff = aux_octet_offsets()

        acc_g, kstats = fused_group_forces(
            gcount, pg, ft, it, ps, bsq, ooff,
            theta=theta, eps2=softening_sq, leaf_cap=leaf_cap, ld=ld,
            burst_rows=burst_rows, interpret=interpret,
            frontier_cap=frontier_cap or FRONTIER_CAP,
            groups_per_program=groups_per_program,
        )

        # Capacity contract: a mid-run bucket overflow (bodies drifted
        # across Morton ranges past CB) or a trimmed occupied group (drift
        # concentrated groups past `keep`, whose bodies would silently get
        # zero acceleration) must never be silent.  Raising is impossible
        # inside jit, so poison the output instead: NaN forces surface
        # immediately in positions, energy and --debug-nans.
        # check_sharded_fused remains the fail-fast probe at startup.
        acc_g = jnp.where(
            (bucket_overflow > 0) | (trimmed > 0) | (halo_ovf > 0),
            jnp.float32(jnp.nan),
            acc_g,
        )

        # 7. route accelerations back to the original sharding -----------
        dest = jnp.where(group_valid, group_idx, C_own)
        acc_own = (
            jnp.zeros((C_own, 3), jnp.float32)
            .at[dest.reshape(-1)]
            .set(jnp.transpose(acc_g, (0, 2, 1)).reshape(-1, 3), mode="drop")
        )
        acc_all = lax.all_gather(acc_own, axis_name, axis=0, tiled=True)
        orig_all = lax.all_gather(myo, axis_name, axis=0, tiled=True)
        rel = orig_all - k * C
        mine = (rel >= 0) & (rel < C)
        out = (
            jnp.zeros((C, 3), jnp.float32)
            .at[jnp.where(mine, rel, C)]
            .set(acc_all, mode="drop")
        )
        if otab is not None:
            # outlier sources: exact (C, K) rectangle on this chip's own
            # targets (original local order); displacement form
            # (bh_fused.outlier_rect docstring)
            from nbody_tpu.ops.bh_fused import outlier_rect

            out = out + outlier_rect(
                pos32_l, otab[:, :3], otab[:, 3], softening_sq, interpret
            )
        out = out.astype(dtype)
        if not return_stats:
            return out
        stats = {
            "bucket_overflow": lax.pmax(
                jnp.maximum(bucket_overflow, 0), axis_name
            ).reshape(()),
            "trimmed_groups": lax.psum(trimmed, axis_name).reshape(()),
            "frontier_overflow": lax.pmax(
                jnp.max(kstats[:, 3]), axis_name
            ).reshape(()),
            # f32 sum: the global total wraps i32 at 10M-scale clustered
            # inputs (reporting only, same note as bh_fused)
            "near_bodies": lax.psum(
                jnp.sum(kstats[:, 2].astype(jnp.float32)), axis_name
            ).reshape(()),
            "halo_overflow": halo_ovf.reshape(()),
        }
        return out, stats

    out_specs = (
        (P(axis_name, None), {k: P() for k in
                              ("bucket_overflow", "trimmed_groups",
                               "frontier_overflow", "near_bodies",
                               "halo_overflow")})
        if return_stats
        else P(axis_name, None)
    )
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name)),
            out_specs=out_specs,
            check_vma=False,  # pallas_call outputs carry no vma annotations
        )
    )


def check_sharded_fused(bodies, mesh=None, **kw):
    """Fail-fast startup probe for the sharded fused path (the sharded
    analog of bh_fused.check_fused): one force eval; raises CapacityError
    on bucket overflow, trimmed groups or DFS stack overflow."""
    from nbody_tpu.core import capacity as _cap

    mesh_r = mesh or make_mesh()
    n_dev = mesh_r.devices.size
    fn = fused_shard_force_fn(mesh=mesh_r, return_stats=True, **kw)
    _, stats = fn(bodies.pos, bodies.mass)

    # Reconstruct the capacities the traced fn derived, so each measured
    # overflow converts into the exact flag value that fits.
    n = bodies.pos.shape[0]
    C = n // n_dev
    b = min(kw.get("group_size", 1024), C)
    bucket_frac = kw.get("bucket_frac", 2.5)
    CB = _round_up(max(int(bucket_frac * C / n_dev), min(C, 256)), 128)
    C_own = n_dev * CB
    h_cap = kw.get("halo_cap", 0) or _round_up(max(256, C_own // 8), 128)

    fixes = []
    if int(stats["bucket_overflow"]) > 0:
        need_cb = CB + int(stats["bucket_overflow"])
        need_frac = math.ceil(need_cb * n_dev / max(C, 1) * 10 + 1) / 10
        fixes.append(
            f"the fullest Morton bucket needed {need_cb} slots (capacity "
            f"{CB}): pass --bucket-frac {need_frac}"
        )
    if int(stats["halo_overflow"]) > 0:
        need_h = _round_up(h_cap + int(stats["halo_overflow"]), 128)
        fixes.append(
            f"the worst chip pair's halo needed {h_cap + int(stats['halo_overflow'])} "
            f"slots (capacity {h_cap}): pass --halo-cap {need_h}"
        )
    if int(stats["trimmed_groups"]) > 0:
        keep = kw.get("keep_groups", 0) or _cap.auto_keep(
            C_own, b, 10**9, _cap.budget_bytes()
        )
        fixes.append(
            f"{int(stats['trimmed_groups'])} occupied groups trimmed: pass "
            f"--bh-keep-groups {keep + int(stats['trimmed_groups'])}"
        )
    if int(stats["frontier_overflow"]) > 0:
        fovf = int(stats["frontier_overflow"])
        base = kw.get("frontier_cap", 0) or FRONTIER_CAP
        need = -(-max(fovf + 1, base) // 128) * 128
        fixes.append(
            f"BFS frontier overflow (a level needed >= {fovf} octets): "
            f"pass --bh-frontier-cap {need}"
        )
    if fixes:
        raise CapacityError(
            "sharded fused Barnes-Hut capacity overflow: " + "; ".join(fixes)
        )
    return stats


# ---------------------------------------------------------------------------
# Sharded persistent Morton order: the redistribution pipeline above IS the
# resort.  Between resorts each chip integrates its own groups in the kernel's
# planar layout (ops/bh_persistent.py, single-chip analog); per step the only
# collectives are a psum of the dense grid's float fields (~5 MB at ld=6) and
# the near-field source exchange — the Morton-halo all_to_all (plan frozen
# per regroup; per-chip O(N/P + halo) memory) above HALO_THRESHOLD, the
# planar-slot all_gather below it.  Bodies may
# drift outside their chip's Morton range between resorts — ownership is by
# redistribution, not position, and the MAC staleness contract is identical
# to the single-chip persistent path.
# ---------------------------------------------------------------------------


def _shard_layout(n: int, n_dev: int, group_size: int, bucket_frac: float,
                  ld: int = 0):
    C = n // n_dev
    b = min(group_size, C)
    ld = int(ld) or auto_ld(n)
    sl = auto_split_level(n, b)
    CB = _round_up(max(int(bucket_frac * C / n_dev), min(C, 256)), 128)
    C_own = n_dev * CB
    keep_l = min(
        C_own // b + min(8**sl, C_own) + 1, 2 * (C_own // b) + 64
    )
    # keep_l * b must be a 128 multiple: local_force hands the kernel the
    # all_gathered (4, P * keep_l * b) planar slot array, and the
    # near-field streamer DMAs 128-aligned 128-wide windows from it — a
    # partial final window per chip segment would be out of bounds on
    # TPU.  Extra groups are inert (gcount 0, gm 0).
    mult = 128 // math.gcd(b, 128)
    keep_l = -(-keep_l // mult) * mult
    return C, b, ld, sl, CB, C_own, keep_l


def persistent_shard_fns(
    mesh=None,
    axis_name: str = BODY_AXIS,
    *,
    n: int,
    n_real: int | None = None,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    theta: float = constants.THETA,
    group_size: int = 1024,
    leaf_cap: int = 64,
    samples_per_chip: int = 32,
    bucket_frac: float = 2.5,
    migrant_frac: float = 0.125,
    robust_slots: int = 0,
    ld: int = 0,
    halo: bool | None = None,
    halo_cap: int = 0,
    halo_pad_frac: float = 0.5,
    groups_per_program: int = 8,
    interpret: bool | None = None,
):
    """Build (init_fn, resort_fn, prime_fn, steps_fn, emit_fn) for the
    sharded persistent integrator.  State is a dict pytree: per-chip
    group-layout leaves sharded on axis 0, tree tables replicated.

    `halo` selects the per-step near-field source exchange: False
    all_gathers the planar slots (per-chip O(N) memory), True runs the
    Morton-halo exchange (parallel/bh_halo.py) — and unlike the one-shot
    path the PLAN is computed once per regroup, not per step: the
    stageability flags test chip AABBs inflated by `halo_pad_frac`
    terminal cells (2x the default drift-guard bound, the same staleness
    contract the MAC already rides), so between resorts each step only
    ships current body rows through one fixed-index all_to_all.  The
    premise — every body stays inside its chip's padded regroup AABB
    (dst side) AND within halo_pad_frac/2 terminal cells of its regroup
    position (src side: bounds frozen-cell COM erosion, so unflagged
    cells provably stay far) — is re-checked in-graph each step and
    NaN-poisons the forces on violation — never silent.  None auto-enables above HALO_THRESHOLD
    bodies except in robust mode (an outlier target's chip AABB spans
    the whole system, so its halo degenerates to the full gather; a
    forced halo=True there stays sound but will demand an
    all_gather-scale --halo-cap).

    `robust_slots` (0 off, negative auto = max(128, n // 512)) runs the
    exact outlier hybrid on this layout: the frozen Morton frame is the
    CENTERED robust cube (state carries its center), outliers ride the
    layout zero-massed with their G*mass in a per-slot `sgm` sideband
    channel that follows every exchange (row width 10 -> 11), each
    regroup re-extracts the per-chip outlier slots (`oslots`), and
    local_force gathers the <=K current outlier rows into a replicated
    (K, 4) table and adds the exact per-chip rectangle.  A TREE body
    leaving the cube sets the oob flag exactly as before (stashed
    outliers are allowed outside); the rebalance re-selects outliers
    from scratch.  `ld` overrides the grid depth (robust default
    auto_ld + 2, max 8).

    Bodies with original index >= n_real (the CLI's inert zero-mass shard
    padding) are dropped at init: a pad clump shares one Morton key,
    which no sample-sort splitter can separate.

    Resorts exchange ONLY MIGRANTS: the initial full sample-sort
    redistribution sizes its buckets for bodies spread across all P key
    ranges (bucket_frac * C / P each), but at a resort nearly every body
    lands back in its own chip's range — full redistribution would need
    O(C)-sized buckets, an O(N) all_to_all per chip.  Instead the
    splitters and the Morton key space (root border) are FROZEN at init:
    stay bodies never leave the chip, and only splitter-crossers ride an
    all_to_all of small (migrant_frac * C) buckets.  When the frozen
    frame goes stale — a body exits the root cube ('oob'), migrant
    buckets overflow, or occupied groups trim — the state is flagged and
    the driver rebalances from scratch (emit -> init -> prime), which
    re-samples splitters and border."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    if n_real is None:
        n_real = n
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kq = (max(128, n // 512) if robust_slots < 0 else int(robust_slots))
    kq = min(kq, n - 1)
    robust = robust_slots != 0
    ld_over = int(ld) or (min(8, auto_ld(n) + 2) if robust else 0)
    C, b, ld, sl, CB, C_own, keep_l = _shard_layout(
        n, n_dev, group_size, bucket_frac, ld_over
    )
    k_terminal = 8**ld
    M_l = keep_l * b
    kq = min(kq, M_l)
    use_halo = (
        halo if halo is not None else (n >= HALO_THRESHOLD and not robust)
    ) and n_dev > 1
    h_cap = (
        (_round_up(int(halo_cap), 128) if halo_cap
         else _round_up(max(256, M_l // 8), 128))
        if use_halo else 0
    )
    CB_mig = _round_up(max(128, int(migrant_frac * C)), 128)
    NF = 11 if robust else 10  # float row [x y z gm vx vy vz ax ay az (sgm)]

    from nbody_tpu.ops.barneshut import compact_groups, group_bodies

    def _regroup(myk, myo, myf, border, spl, bucket_overflow, oob,
                 center=None):
        """Common tail: (M,) merged sorted candidates -> group state.
        myk sorted ascending with _SENT_KEY pads at the end; myf (M, NF)
        rows [x y z gm vx vy vz ax ay az (sgm)]; pads carry gm = 0,
        orig = n."""
        k = lax.axis_index(axis_name)
        m_in = myk.shape[0]
        Rk = jnp.sum((myk < _SENT_KEY).astype(jnp.int32))

        # groups_multiple keeps group_bodies' capacity >= the 128-slot
        # rounded keep_l (see _shard_layout) so compact_groups never
        # shrinks the static group count below it
        gstart, gcount, group_idx, group_valid = group_bodies(
            myk, m_in, _DEPTH, b, sl,
            groups_multiple=128 // math.gcd(b, 128),
        )
        gcount = jnp.minimum(gcount, jnp.clip(Rk - gstart, 0))
        slots2 = jnp.arange(b, dtype=jnp.int32)[None, :]
        group_valid = slots2 < gcount[:, None]
        # pads gather the group's LAST real slot so their nid continues
        # the group's final cell id — the flattened nid stays
        # non-decreasing (empties land at k_terminal after compaction),
        # the sortedness contract of local_ft's one-pass segment_sum.
        last = gstart + jnp.maximum(gcount - 1, 0)
        group_idx = jnp.clip(
            jnp.where(group_valid, gstart[:, None] + slots2, last[:, None]),
            0,
            m_in - 1,
        )
        gstart, gcount, group_idx, group_valid, trimmed = compact_groups(
            gstart, gcount, group_idx, group_valid, keep_l
        )
        trimmed = lax.psum(trimmed, axis_name)

        rows = myf[group_idx]  # (keep_l, b, 10)
        gm_slot = jnp.where(group_valid, rows[:, :, 3], 0.0)
        pg = jnp.concatenate(
            [jnp.transpose(rows[:, :, :3], (0, 2, 1)), gm_slot[:, None, :]],
            axis=1,
        )  # (keep_l, 4, b)
        vel_g = jnp.transpose(rows[:, :, 4:7], (0, 2, 1))
        acc_g = jnp.transpose(rows[:, :, 7:10], (0, 2, 1))
        orig_g = jnp.where(group_valid, myo[group_idx], n).astype(jnp.int32)
        nid_g = jnp.minimum(
            (myk[group_idx] >> (3 * (_DEPTH - ld))).astype(jnp.int32),
            k_terminal,
        )

        # static cell ranges in GLOBAL slot space (chip k at [k*M_l, ...));
        # pads excluded by masking VALUES (min/max/sum-neutral) since the
        # ids alone no longer identify them
        gslot = (k * M_l + jnp.arange(M_l, dtype=jnp.int32)).reshape(M_l)
        nid_f = nid_g.reshape(M_l)
        valid_f = group_valid.reshape(M_l)
        inf = jnp.int32(2**31 - 1)
        stp = jax.ops.segment_min(
            jnp.where(valid_f, gslot, inf), nid_f,
            num_segments=k_terminal + 1, indices_are_sorted=True,
        )[:k_terminal]
        enp = jax.ops.segment_max(
            jnp.where(valid_f, gslot + 1, -1), nid_f,
            num_segments=k_terminal + 1, indices_are_sorted=True,
        )[:k_terminal]
        cntp = jax.ops.segment_sum(
            valid_f.astype(jnp.int32), nid_f,
            num_segments=k_terminal + 1, indices_are_sorted=True,
        )[:k_terminal]
        st_g = lax.pmin(stp, axis_name)
        en_g = lax.pmax(enp, axis_name)
        cnt_g = lax.psum(cntp, axis_name)
        zero3 = jnp.zeros((k_terminal, 3), jnp.float32)
        tree = grid_from_terminal(
            zero3, jnp.zeros((k_terminal,), jnp.float32), cnt_g, st_g, en_g, ld
        )
        from nbody_tpu.ops.bh_fused import pack_it

        halo_extra = {}
        if use_halo:
            from nbody_tpu.parallel import bh_halo

            # plan ONCE PER REGROUP (the one-shot path plans per force
            # eval): flags are exact grid geometry vs the chip AABBs
            # inflated by halo_pad_frac terminal cells, covering the
            # drift-guard-bounded motion until the next resort.  AABBs
            # live in the tree's Morton frame (robust mode: centered).
            pos_flat = jnp.transpose(pg[:, :3, :], (0, 2, 1)).reshape(M_l, 3)
            if center is not None:
                pos_flat = pos_flat - center.reshape(1, 3).astype(jnp.float32)
            valid_flat = group_valid.reshape(M_l)
            aabbs = bh_halo.chip_aabbs(pos_flat, valid_flat, axis_name)
            cellw = border.astype(jnp.float32) / jnp.float32(1 << ld)
            pad = jnp.float32(halo_pad_frac) * cellw
            span_all = tree.cnt[0]
            start_all = tree.start[0]
            flags = bh_halo.halo_flags(
                span_all, border.astype(jnp.float32), theta, leaf_cap, ld,
                aabbs, pad=pad,
            )
            plan = bh_halo.halo_plan(start_all, span_all, flags, M_l, h_cap)
            slots_g = plan["send_slots"](k)  # (P, H) global, dst-major
            halo_extra = {
                "halo_lsl": jnp.clip(slots_g - k * M_l, 0, M_l - 1),
                "halo_cnt": plan["counts"][:, k].astype(jnp.int32),
                "halo_ovf": lax.pmax(
                    jnp.maximum(plan["overflow"], 0), axis_name
                ).reshape(()),
                # the planned premise box [lo - pad | hi + pad]: every
                # body must stay inside it until the next resort
                # (local_force re-checks and poisons on violation)
                "halo_box": jnp.concatenate(
                    [aabbs[k, 0:3] - pad, aabbs[k, 3:6] + pad]
                ).reshape(1, 6),
                # regroup-time positions: the SOURCE side of the premise.
                # The flags' far test is sound only while every body sits
                # within pad/2 of its regroup position (COM erosion on the
                # source cell + AABB erosion on the dst chip each consume
                # up to the displacement; their sum must stay <= pad) —
                # local_force re-checks the exact per-body displacement and
                # poisons past pad/2, closing the single-step gap the host
                # drift guard cannot bound (ADVICE r3 medium).
                "halo_p0": pg[:, :3, :],
            }
            new_start = bh_halo.rewrite_starts(
                start_all, span_all, flags, plan["packed"],
                plan["counts"], k, M_l, h_cap,
            )
            it = pack_it(tree._replace(start=new_start[None, :]), ld)
        else:
            it = pack_it(tree, ld)
        lev = jnp.arange(16, dtype=jnp.float32)
        bsq = (border.astype(jnp.float32) / jnp.exp2(lev)) ** 2
        st = {
            "pg": pg, "vel": vel_g, "acc": acc_g, "valid": group_valid,
            "gcount": gcount.astype(jnp.int32), "orig": orig_g, "nid": nid_g,
            "it": it, "bsq": bsq, "border": border.reshape(()),
            "spl": spl,
            "bucket_overflow": jnp.maximum(bucket_overflow, 0).reshape(()),
            "trimmed": trimmed.reshape(()),
            "oob": oob.astype(jnp.int32).reshape(()),
        }
        if robust:
            # per-slot stashed G*mass sideband + the (frozen until the
            # next regroup) per-chip outlier slot indices
            sgm_slot = jnp.where(group_valid, rows[:, :, 10], 0.0)
            st["sgm"] = sgm_slot
            st["oslots"] = lax.top_k(
                sgm_slot.reshape(M_l), kq
            )[1].astype(jnp.int32)
            st["center"] = center.reshape(3).astype(jnp.float32)
        st.update(halo_extra)
        return st

    import numpy as _np

    _gm_cols = _np.arange(NF) == 3
    if robust:
        _gm_cols = _gm_cols | (_np.arange(NF) == 10)  # sgm zeroed on pads too

    def full_redistribute(pos_f, vel_f, acc_f, gm_f, orig_f):
        """Per-chip: full sample-sort redistribution of (M_in,) candidate
        slots to fresh contiguous Morton ranges (fresh border + splitters).
        Pads (orig >= n_real at init, orig = n mid-run): gm = 0.
        Robust mode selects the outliers HERE (the only place full G*mass
        enters): threshold from the gathered per-chip top-(K+1) distance
        candidates, centered-frame keys, sgm sideband."""
        m_in = pos_f.shape[0]

        real_in = orig_f < n_real
        if robust:
            # center: median of chip medians, pads replaced by the chip's
            # masked mean (EXACTNESS does not depend on the center — any
            # choice yields a sound cube; it only tunes which K bodies
            # are stashed)
            cnt_r = jnp.maximum(jnp.sum(real_in.astype(jnp.int32)), 1)
            mean_l = (
                jnp.sum(jnp.where(real_in[:, None], pos_f, 0.0), axis=0)
                / cnt_r
            )
            med_l = jnp.median(
                jnp.where(real_in[:, None], pos_f, mean_l), axis=0
            )
            meds = lax.all_gather(med_l, axis_name, axis=0)
            center = jnp.median(meds, axis=0).astype(jnp.float32)
            d_in = jnp.where(
                real_in,
                jnp.max(jnp.abs(pos_f.astype(jnp.float32) - center), axis=1),
                -1.0,
            )
            v_l = lax.top_k(d_in, min(kq + 1, m_in))[0]
            v_all = lax.all_gather(v_l, axis_name, axis=0, tiled=True)
            thr = lax.top_k(v_all, min(kq + 1, v_all.shape[0]))[0][
                min(kq, v_all.shape[0] - 1)
            ]
            border = 2.0 * thr * 1.0001
            is_out = d_in > thr  # strict: ties stay in the tree
            sgm_f = jnp.where(is_out, gm_f, 0.0).astype(jnp.float32)
            gm_f = jnp.where(is_out, 0.0, gm_f)
            pos_enc = pos_f.astype(jnp.float32) - center
        else:
            center = None
            border = 2.0 * lax.pmax(
                jnp.max(jnp.where(real_in[:, None], jnp.abs(pos_f), 0.0)),
                axis_name,
            )
            pos_enc = pos_f
        keys = morton_encode(pos_enc, border, _DEPTH)
        keys = jnp.where(real_in, keys, _SENT_KEY)
        ordl = jnp.argsort(keys)
        keys_s = keys[ordl]
        cols = [pos_f[ordl], gm_f[ordl][:, None], vel_f[ordl], acc_f[ordl]]
        if robust:
            cols.append(sgm_f[ordl][:, None])
        fall = jnp.concatenate(cols, axis=1).astype(jnp.float32)
        # (M_in, NF) [x y z gm vx vy vz ax ay az (sgm)]
        iall = jnp.stack([keys_s, orig_f[ordl]], axis=1)
        R_l = jnp.sum(real_in.astype(jnp.int32))

        S = samples_per_chip
        samp = keys_s[jnp.clip((jnp.arange(S) * R_l) // S, 0, m_in - 1)]
        samp = jnp.where(R_l > 0, samp, 0)
        all_samp = lax.all_gather(samp, axis_name, axis=0, tiled=True)
        ss = jnp.sort(all_samp)
        spl = ss[jnp.arange(1, n_dev) * S]
        spl = spl & ~jnp.int32((1 << (3 * (_DEPTH - ld))) - 1)

        o = jnp.concatenate(
            [
                jnp.zeros((1,), jnp.int32),
                jnp.searchsorted(keys_s, spl, side="left").astype(jnp.int32),
                R_l.reshape(1),
            ]
        )
        cnt_b = o[1:] - o[:-1]
        bucket_overflow = lax.pmax(jnp.max(cnt_b - CB), axis_name)

        fpad = jnp.pad(fall, ((0, CB), (0, 0)))
        ipad = jnp.pad(iall, ((0, CB), (0, 0)))
        sf, si = [], []
        slot = jnp.arange(CB, dtype=jnp.int32)[:, None]
        for j in range(n_dev):
            valid = slot < cnt_b[j]
            fj = lax.dynamic_slice_in_dim(fpad, o[j], CB, axis=0)
            ij = lax.dynamic_slice_in_dim(ipad, o[j], CB, axis=0)
            fj = jnp.where(valid, fj, jnp.where(_gm_cols, 0.0, fj))
            ij = jnp.where(
                valid,
                ij,
                jnp.stack(
                    [jnp.broadcast_to(_SENT_KEY, (CB,)),
                     jnp.full((CB,), n, jnp.int32)], axis=1
                ),
            )
            sf.append(fj)
            si.append(ij)
        send_f = jnp.stack(sf)
        send_i = jnp.stack(si)
        if n_dev > 1:
            recv_f = lax.all_to_all(send_f, axis_name, split_axis=0, concat_axis=0)
            recv_i = lax.all_to_all(send_i, axis_name, split_axis=0, concat_axis=0)
        else:
            recv_f, recv_i = send_f, send_i

        rk = recv_i[:, :, 0].reshape(C_own)
        mo = jnp.argsort(rk)
        myk = rk[mo]
        myo = recv_i[:, :, 1].reshape(C_own)[mo]
        myf = recv_f.reshape(C_own, NF)[mo]
        return _regroup(
            myk, myo, myf, border, spl, bucket_overflow, jnp.int32(0),
            center=center,
        )

    def migrant_resort(st):
        """Per-chip: re-sort in the FROZEN key frame (state border and
        splitters), exchanging only splitter-crossers.  Sets the oob flag
        instead of moving anything when a body has left the root cube —
        the frozen frame can no longer represent it and the driver must
        rebalance."""
        k = lax.axis_index(axis_name)
        border = st["border"]
        spl = st["spl"]
        rows4 = jnp.transpose(st["pg"], (0, 2, 1)).reshape(M_l, 4)
        pos_f = rows4[:, :3]
        gm_f = jnp.where(st["valid"], st["pg"][:, 3, :], 0.0).reshape(M_l)
        vel_f = jnp.transpose(st["vel"], (0, 2, 1)).reshape(M_l, 3)
        acc_f = jnp.transpose(st["acc"], (0, 2, 1)).reshape(M_l, 3)
        orig_f = st["orig"].reshape(M_l)
        cols = [pos_f, gm_f[:, None], vel_f, acc_f]
        if robust:
            center = st["center"]
            sgm_f = jnp.where(st["valid"], st["sgm"], 0.0).reshape(M_l)
            cols.append(sgm_f[:, None])
            pos_enc = pos_f - center
        else:
            center = None
            sgm_f = None
            pos_enc = pos_f
        fall = jnp.concatenate(cols, axis=1).astype(jnp.float32)

        real = orig_f < n
        # oob: a TREE body leaving the frozen cube invalidates the frame;
        # stashed outliers (sgm > 0) are allowed outside by construction
        tree_b = real if not robust else (real & (sgm_f <= 0.0))
        maxc = lax.pmax(
            jnp.max(jnp.where(tree_b[:, None], jnp.abs(pos_enc), 0.0)),
            axis_name,
        )
        oob = (2.0 * maxc > border).astype(jnp.int32)

        keys = morton_encode(pos_enc, border, _DEPTH)
        keys = jnp.where(real, keys, _SENT_KEY)
        dst = jnp.searchsorted(spl, keys, side="right").astype(jnp.int32)
        stay = real & (dst == k)
        mig = real & ~stay

        # stays keep their slots; sentinel out everything else
        stay_k = jnp.where(stay, keys, _SENT_KEY)

        # migrants grouped by destination chip (stable order irrelevant:
        # the merge argsorts by key anyway)
        mkey = jnp.where(mig, dst, n_dev)
        mord = jnp.argsort(mkey)
        keys_m = keys[mord]
        orig_m = orig_f[mord]
        fall_m = fall[mord]
        cnt_m = jax.ops.segment_sum(
            mig.astype(jnp.int32), mkey, num_segments=n_dev + 1
        )[:n_dev]
        o_m = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt_m).astype(jnp.int32)]
        )
        bucket_overflow = lax.pmax(jnp.max(cnt_m - CB_mig), axis_name)

        fpad = jnp.pad(fall_m, ((0, CB_mig), (0, 0)))
        ipad = jnp.pad(
            jnp.stack([keys_m, orig_m], axis=1), ((0, CB_mig), (0, 0))
        )
        sf, si = [], []
        slot = jnp.arange(CB_mig, dtype=jnp.int32)[:, None]
        for j in range(n_dev):
            valid = slot < cnt_m[j]
            fj = lax.dynamic_slice_in_dim(fpad, o_m[j], CB_mig, axis=0)
            ij = lax.dynamic_slice_in_dim(ipad, o_m[j], CB_mig, axis=0)
            fj = jnp.where(valid, fj, jnp.where(_gm_cols, 0.0, fj))
            ij = jnp.where(
                valid,
                ij,
                jnp.stack(
                    [jnp.broadcast_to(_SENT_KEY, (CB_mig,)),
                     jnp.full((CB_mig,), n, jnp.int32)], axis=1
                ),
            )
            sf.append(fj)
            si.append(ij)
        send_f = jnp.stack(sf)
        send_i = jnp.stack(si)
        if n_dev > 1:
            recv_f = lax.all_to_all(send_f, axis_name, split_axis=0, concat_axis=0)
            recv_i = lax.all_to_all(send_i, axis_name, split_axis=0, concat_axis=0)
        else:
            recv_f, recv_i = send_f, send_i

        m_comb = M_l + n_dev * CB_mig
        comb_k = jnp.concatenate([stay_k, recv_i[:, :, 0].reshape(-1)])
        comb_o = jnp.concatenate(
            [jnp.where(stay, orig_f, n), recv_i[:, :, 1].reshape(-1)]
        )
        comb_f = jnp.concatenate(
            [jnp.where(stay[:, None], fall, jnp.where(_gm_cols, 0.0, fall)),
             recv_f.reshape(-1, NF)]
        )
        mo = jnp.argsort(comb_k)
        myk = comb_k[mo]
        myo = comb_o[mo]
        myf = comb_f[mo]
        assert myk.shape[0] == m_comb
        return _regroup(myk, myo, myf, border, spl, bucket_overflow, oob,
                        center=center)

    def local_ft(pg, nid):
        """psum'd per-step float-table rebuild over stale cells: one
        combined (M, 4) sorted segment_sum (see ops/bh_persistent.
        _ft_from_state — measured 2x the separate unsorted passes)."""
        gm_f = pg[:, 3, :].reshape(M_l)
        nid_f = nid.reshape(M_l)
        vals = jnp.stack(
            [
                gm_f * pg[:, 0, :].reshape(M_l),
                gm_f * pg[:, 1, :].reshape(M_l),
                gm_f * pg[:, 2, :].reshape(M_l),
                gm_f,
            ],
            axis=1,
        )
        s = jax.ops.segment_sum(
            vals, nid_f, num_segments=k_terminal + 1, indices_are_sorted=True
        )[:k_terminal]
        w = s[:, :3]
        gm = s[:, 3]
        w = lax.psum(w, axis_name)
        gm = lax.psum(gm, axis_name)
        ws, gms = [w], [gm]
        for _ in range(ld):
            ws.append(ws[-1].reshape(-1, 8, 3).sum(axis=1))
            gms.append(gms[-1].reshape(-1, 8).sum(axis=1))
        ws.reverse(), gms.reverse()
        w_all = jnp.concatenate(ws, axis=0)
        gm_all = jnp.concatenate(gms, axis=0)
        com = w_all / jnp.maximum(gm_all, 1e-30)[:, None]
        total = grid_offsets(ld)[ld + 1]
        from nbody_tpu.ops.bh_fused import pack_ft
        from typing import NamedTuple

        class _F(NamedTuple):
            cx: jax.Array
            cy: jax.Array
            cz: jax.Array
            gm: jax.Array

        return pack_ft(
            _F(
                com[:, 0].reshape(1, total), com[:, 1].reshape(1, total),
                com[:, 2].reshape(1, total),
                gm_all.astype(jnp.float32).reshape(1, total),
            ),
            ld,
        )

    def local_force(st):
        ft = local_ft(st["pg"], st["nid"])
        ps_l = jnp.transpose(st["pg"], (1, 0, 2)).reshape(4, M_l)
        halo_viol = jnp.int32(0)
        if use_halo:
            # frozen-plan exchange: ship CURRENT rows of the slots the
            # regroup-time plan selected (one fixed-index all_to_all,
            # O(M_l + P*H) per chip instead of the O(N) all_gather)
            okr = (
                jnp.arange(h_cap, dtype=jnp.int32)[None, :]
                < st["halo_cnt"][:, None]
            )
            send = jnp.where(
                okr[:, None, :],
                ps_l[:, st["halo_lsl"]].transpose(1, 0, 2),
                0.0,
            )  # (P, 4, H)
            recv = lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0)
            ps = jnp.concatenate(
                [ps_l, recv.transpose(1, 0, 2).reshape(4, n_dev * h_cap)],
                axis=1,
            )
            # premise check: the plan is provably sufficient only while
            # every body sits inside its chip's padded regroup AABB
            pos_cur = jnp.transpose(st["pg"][:, :3, :], (0, 2, 1)).reshape(
                M_l, 3
            )
            if robust:
                pos_cur = pos_cur - st["center"].reshape(1, 3)
            vflat = st["valid"].reshape(M_l)[:, None]
            big = jnp.float32(3e38)
            lo = jnp.min(jnp.where(vflat, pos_cur, big), axis=0)
            hi = jnp.max(jnp.where(vflat, pos_cur, -big), axis=0)
            box = st["halo_box"].reshape(6)
            # source side: exact max body displacement since regroup must
            # stay <= pad/2 (see the halo_p0 comment in _regroup); the box
            # containment alone lets dst motion consume the whole pad while
            # source-cell COM drift has no budget at all
            dd = st["pg"][:, :3, :] - st["halo_p0"]  # (keep_l, 3, b)
            disp2 = jnp.max(
                jnp.where(
                    st["valid"][:, None, :], dd * dd, 0.0
                ).sum(axis=1)
            )
            cellw_v = st["border"].astype(jnp.float32) / jnp.float32(1 << ld)
            half_pad = jnp.float32(0.5 * halo_pad_frac) * cellw_v
            halo_viol = lax.pmax(
                (
                    jnp.any(lo < box[0:3])
                    | jnp.any(hi > box[3:6])
                    | (disp2 > half_pad * half_pad)
                ).astype(jnp.int32),
                axis_name,
            )
        else:
            ps = lax.all_gather(ps_l, axis_name, axis=1, tiled=True)
        acc_g, kstats = fused_group_forces(
            st["gcount"], st["pg"], ft, st["it"], ps, st["bsq"],
            aux_octet_offsets(),
            theta=theta, eps2=softening_sq, leaf_cap=leaf_cap, ld=ld,
            interpret=interpret, groups_per_program=groups_per_program,
        )
        if robust:
            # outlier sources at their CURRENT positions: gather each
            # chip's (frozen-slot) outlier rows, all_gather + compact to
            # the replicated (K, 4) table, add the exact rectangle
            from nbody_tpu.ops.bh_fused import outlier_rect

            pg_flat = jnp.transpose(
                st["pg"][:, :3, :], (0, 2, 1)
            ).reshape(M_l, 3)
            sgm_f = jnp.where(st["valid"], st["sgm"], 0.0).reshape(M_l)
            osl = st["oslots"]
            rows_l = jnp.concatenate(
                [pg_flat[osl], sgm_f[osl][:, None]], axis=1
            )  # (kq, 4); non-outlier slots carry sgm = 0 (inert)
            rows_all = lax.all_gather(rows_l, axis_name, axis=0, tiled=True)
            sel = lax.top_k(rows_all[:, 3], min(kq, rows_all.shape[0]))[1]
            otab = rows_all[sel]  # <= kq real outliers globally
            side = outlier_rect(
                pg_flat, otab[:, :3], otab[:, 3], softening_sq, interpret
            )
            acc_g = acc_g + jnp.transpose(
                side.reshape(keep_l, b, 3), (0, 2, 1)
            ).astype(acc_g.dtype)
        ovf = lax.pmax(jnp.max(kstats[:, 3]), axis_name)
        if use_halo:
            # an overflowed plan must never produce forces (its packed
            # offsets alias other segments); the driver rebalances or
            # raises before stepping, this poison is the in-graph backstop
            halo_viol = halo_viol + (st["halo_ovf"] > 0).astype(jnp.int32)
        return jnp.where(
            (ovf > 0) | (halo_viol > 0), jnp.float32(jnp.nan), acc_g
        )

    state_specs = {
        "pg": P(axis_name, None, None), "vel": P(axis_name, None, None),
        "acc": P(axis_name, None, None), "valid": P(axis_name, None),
        "gcount": P(axis_name), "orig": P(axis_name, None),
        # with halo, the int octet table's starts are rewritten per chip
        # ([own | halo] layout) — sharded, not replicated
        "it": P(axis_name, None) if use_halo else P(),
        "nid": P(axis_name, None), "bsq": P(), "border": P(),
        "spl": P(), "bucket_overflow": P(), "trimmed": P(), "oob": P(),
    }
    if use_halo:
        state_specs.update({
            "halo_lsl": P(axis_name, None), "halo_cnt": P(axis_name),
            "halo_ovf": P(), "halo_box": P(axis_name, None),
            "halo_p0": P(axis_name, None, None),
        })
    if robust:
        state_specs.update({
            "center": P(), "sgm": P(axis_name, None),
            "oslots": P(axis_name),
        })

    def _smap(fn, in_specs, out_specs):
        return jax.jit(
            jax.shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        )

    def init_local(pos_l, vel_l, mass_l, acc_l):
        k = lax.axis_index(axis_name)
        gm = (jnp.asarray(G, jnp.float32) * mass_l).astype(jnp.float32)
        orig = (k * C + jnp.arange(C, dtype=jnp.int32)).astype(jnp.int32)
        return full_redistribute(
            pos_l.astype(jnp.float32), vel_l.astype(jnp.float32),
            acc_l.astype(jnp.float32), gm, orig,
        )

    init4 = _smap(
        init_local,
        (P(axis_name, None), P(axis_name, None), P(axis_name),
         P(axis_name, None)),
        state_specs,
    )

    def init_fn(pos, vel, mass, acc=None):
        if acc is None:
            acc = jnp.zeros(pos.shape, jnp.float32)
        return init4(pos, vel, mass, acc)

    resort_fn = _smap(migrant_resort, (state_specs,), state_specs)

    def prime_local(st):
        return {**st, "acc": local_force(st)}

    prime_fn = _smap(prime_local, (state_specs,), state_specs)

    def make_steps(n_steps: int, with_history: bool = False):
        def steps_local(st, dt):
            dt = jnp.asarray(dt, jnp.float32)
            half = dt * 0.5

            def step(carry, _):
                s = carry
                vel = s["vel"] + s["acc"] * half
                pg = s["pg"].at[:, :3, :].add(vel * dt)
                s = {**s, "pg": pg, "vel": vel}
                acc = local_force(s)
                s = {**s, "vel": s["vel"] + acc * half, "acc": acc}
                return s, (s["pg"][:, :3, :] if with_history else None)

            st, hist = lax.scan(step, st, None, length=n_steps)
            if with_history:
                return st, hist  # (T, keep_l, 3, b) per chip
            return st

        if with_history:
            return _smap(
                steps_local,
                (state_specs, P()),
                (state_specs, P(None, axis_name, None, None)),
            )
        return _smap(steps_local, (state_specs, P()), state_specs)

    def make_adaptive_steps(k_steps: int, with_history: bool = False):
        """Adaptive global dt on the sharded persistent layout (VERDICT
        r3 item 6): dt = sqrt(2 eta eps / |a|_max) with |a|_max the
        pmax-reduced global maximum over real slots — every chip computes
        the identical traced dt, so the lockstep KDK stays consistent
        with zero extra collectives beyond the one pmax scalar.  Same
        exact-landing / dt = 0 no-op contract as
        ops/bh_persistent.kdk_adaptive_steps."""

        def steps_local(st, t, t_end, two_eta_eps, dt_min, dt_max):
            def step(carry, _):
                s, t = carry
                valid = s["orig"] < n_real  # pads: orig >= n_real / = n
                a2 = jnp.sum(s["acc"] * s["acc"], axis=1)
                amax = lax.pmax(
                    jnp.sqrt(jnp.max(jnp.where(valid, a2, 0.0))), axis_name
                )
                dt = jnp.clip(
                    jnp.sqrt(two_eta_eps / jnp.maximum(amax, 1e-30)),
                    dt_min, dt_max,
                )
                rem = jnp.maximum(t_end - t, 0.0)
                dt = jnp.minimum(dt, rem)
                half = dt * 0.5
                vel = s["vel"] + s["acc"] * half
                pg = s["pg"].at[:, :3, :].add(vel * dt)
                s = {**s, "pg": pg, "vel": vel}
                acc = local_force(s)
                s = {**s, "vel": s["vel"] + acc * half, "acc": acc}
                # snap to t_end on the landing step: near arrival f32
                # rounding can make t + dt == t with dt > 0 (host driver
                # would spin on ghost steps — round-4 hang)
                t = jnp.where(dt >= rem, t_end, t + dt)
                out = (t, dt, s["pg"][:, :3, :] if with_history else None)
                return (s, t), out

            (st, t), (ts, dts, hist) = lax.scan(
                step, (st, jnp.asarray(t, jnp.float32)), None,
                length=k_steps,
            )
            if with_history:
                return st, t, ts, dts, hist
            return st, t, ts, dts

        in_specs = (state_specs, P(), P(), P(), P(), P())
        if with_history:
            return _smap(
                steps_local, in_specs,
                (state_specs, P(), P(), P(),
                 P(None, axis_name, None, None)),
            )
        return _smap(steps_local, in_specs, (state_specs, P(), P(), P()))

    def emit_local(st):
        pos_all = lax.all_gather(
            jnp.transpose(st["pg"][:, :3, :], (0, 2, 1)).reshape(M_l, 3),
            axis_name, axis=0, tiled=True,
        )
        vel_all = lax.all_gather(
            jnp.transpose(st["vel"], (0, 2, 1)).reshape(M_l, 3),
            axis_name, axis=0, tiled=True,
        )
        orig_all = lax.all_gather(
            st["orig"].reshape(M_l), axis_name, axis=0, tiled=True
        )
        k = lax.axis_index(axis_name)
        rel = orig_all - k * C
        mine = (rel >= 0) & (rel < C)
        dest = jnp.where(mine, rel, C)
        pos = jnp.zeros((C, 3), jnp.float32).at[dest].set(pos_all, mode="drop")
        vel = jnp.zeros((C, 3), jnp.float32).at[dest].set(vel_all, mode="drop")
        return pos, vel

    emit_fn = _smap(
        emit_local, (state_specs,),
        (P(axis_name, None), P(axis_name, None)),
    )
    # layout facts the chunked driver needs (drift guard cell size, host
    # frame routing) without re-deriving _shard_layout's defaults
    make_steps.ld = ld
    make_steps.M_l = M_l
    make_steps.use_halo = use_halo
    make_steps.halo_pad_frac = halo_pad_frac
    make_steps.adaptive = make_adaptive_steps
    return init_fn, resort_fn, prime_fn, make_steps, emit_fn


def simulate_persistent_sharded(
    bodies,
    n_steps: int,
    dt: float,
    *,
    mesh=None,
    n_real: int | None = None,
    resort_every: int = 8,
    max_drift_frac: float = 0.25,
    frame_writer=None,
    checkpoint_every: int = 0,
    checkpoint_fn=None,
    progress_every: int = 0,
    progress_fn=None,
    adaptive_eta: float = 0.0,
    t_start: float = 0.0,
    t_end: float = 0.0,
    dt_min: float = 0.0,
    **kw,
):
    """Sharded persistent-order run: (sharded Bodies, steps, dt) ->
    (pos, vel) sharded in the original order.  Raises CapacityError on
    bucket overflow or group trim at any resort (host-checked between
    chunks; kernel stack overflow NaN-poisons in-graph).

    Mirrors ops/bh_persistent.simulate_persistent's chunked driver:
    `frame_writer` receives the initial frame then one (T, N, 3)
    original-order chunk per scan chunk (history stays sharded on device,
    gathered and routed on the host through the resort-constant `orig`
    field); `checkpoint_fn(Bodies, step)` fires every `checkpoint_every`
    steps via emit; `progress_fn(done, note)` every `progress_every`
    steps after a device fence; the drift guard falls back to single-step
    chunks (resort-per-step) when the fastest body would cross more than
    `max_drift_frac` of a terminal cell per chunk (0 disables)."""
    import numpy as np

    mesh = mesh or make_mesh()
    n = bodies.n
    init_fn, resort_fn, prime_fn, make_steps, emit_fn = persistent_shard_fns(
        mesh=mesh, n=n, n_real=n_real, **kw
    )
    ld = make_steps.ld

    def check(st):
        bad = {
            name: int(st[name])
            for name in ("bucket_overflow", "trimmed", "halo_ovf")
            if name in st and int(st[name]) > 0
        }
        if bad:
            fixes = []
            if int(st["bucket_overflow"]) > 0:
                n_dev = mesh.devices.size
                C, _, _, _, CB, _, _ = _shard_layout(
                    n, n_dev, kw.get("group_size", 1024),
                    kw.get("bucket_frac", 2.5),
                )
                need_cb = CB + int(st["bucket_overflow"])
                need = math.ceil(need_cb * n_dev / max(C, 1) * 10 + 1) / 10
                fixes.append(f"pass --bucket-frac {need}")
            if int(st["trimmed"]) > 0:
                fixes.append(
                    "raise --bh-group-size (the persistent group capacity "
                    "is provably sized; trimming means pathological "
                    "clustering at this group size)"
                )
            if int(st.get("halo_ovf", 0)) > 0:
                n_dev = mesh.devices.size
                _, b_l, _, _, _, _, keep_l = _shard_layout(
                    n, n_dev, kw.get("group_size", 1024),
                    kw.get("bucket_frac", 2.5), kw.get("ld", 0),
                )
                # same rounding as persistent_shard_fns: the real capacity
                # is the 128-rounded cap, so the prescription must add the
                # overflow to THAT (a raw non-multiple cap would prescribe
                # up to 127 slots short)
                h_now = (
                    _round_up(int(kw["halo_cap"]), 128)
                    if kw.get("halo_cap", 0)
                    else _round_up(max(256, keep_l * b_l // 8), 128)
                )
                need_h = _round_up(h_now + int(st["halo_ovf"]), 128)
                fixes.append(
                    f"the worst chip pair's halo union needed "
                    f"{h_now + int(st['halo_ovf'])} slots (capacity "
                    f"{h_now}): pass --halo-cap {need_h}"
                )
            raise CapacityError(
                f"sharded persistent Barnes-Hut capacity overflow: {bad}; "
                + "; ".join(fixes)
            )

    def stale(st) -> bool:
        """Migrant resort invalidated: rebalance from scratch (fresh
        border + splitters) before any force is evaluated on it."""
        return (
            int(st["bucket_overflow"]) > 0
            or int(st["trimmed"]) > 0
            or int(st["oob"]) > 0
            # a halo plan that outgrew its capacity: the fresh init
            # recomputes AABBs/splitters and may fit again (check()
            # raises with the prescriptive --halo-cap if not)
            or int(st.get("halo_ovf", 0)) > 0
        )

    def rebalance(prev):
        """Full re-init from the last GOOD state (the migrant resort with
        overflowed buckets dropped bodies — never keep its output)."""
        p_r, v_r = emit_fn(prev)
        st = init_fn(p_r, v_r, bodies.mass)
        check(st)  # init overflow is not recoverable
        return prime_fn(st)

    def flush_frames(st, hist):
        h = np.asarray(hist)  # (T, P*keep_l, 3, b) gathered
        h = h.transpose(0, 1, 3, 2).reshape(h.shape[0], -1, 3)
        dest = np.asarray(st["orig"]).reshape(-1)
        keep = dest < n
        buf = np.zeros((h.shape[0], n, 3), np.float32)
        buf[:, dest[keep]] = h[:, keep]
        frame_writer(buf)

    def do_checkpoint(st, step):
        from nbody_tpu.core.types import Bodies

        p_c, v_c = emit_fn(st)
        checkpoint_fn(Bodies(p_c, v_c, bodies.mass), step)

    def check_halo_nan(state, done):
        if make_steps.use_halo and not np.isfinite(
            float(jnp.max(jnp.abs(state["acc"])))
        ):
            pad_f = make_steps.halo_pad_frac
            raise CapacityError(
                "sharded persistent Barnes-Hut: forces were NaN-poisoned "
                "in-graph at step %d — either the halo premise was "
                "violated (a body moved more than halo_pad_frac/2 = %.3g "
                "terminal cells since the last resort; raise "
                "--halo-pad-frac, lower --resort-every, or reduce dt) or "
                "the traversal stack overflowed" % (done, 0.5 * pad_f)
            )

    state = init_fn(bodies.pos, bodies.vel, bodies.mass)
    check(state)
    state = prime_fn(state)
    if frame_writer is not None:
        frame_writer(np.asarray(bodies.pos, np.float32)[None])

    if adaptive_eta > 0:
        # adaptive global dt (VERDICT r3 item 6): dt is the caller's
        # dt_max; the chunked resort/rebalance/guard machinery is shared
        # with the fixed-dt loop below, but chunks walk TIME to t_end
        sof = kw.get("softening_sq", constants.SOFTENING_SQ)
        if sof <= 0:
            raise ValueError(
                "adaptive dt needs softening_sq > 0 (the eps scale)"
            )
        if dt <= 0:
            raise ValueError("dt (= dt_max) must be > 0")
        two_eta_eps = 2.0 * adaptive_eta * math.sqrt(sof)
        t_cur = float(t_start)
        # f32-carry resolution (see bh_persistent driver)
        t_end_cmp = float(np.float32(t_end))
        taken = 0
        t_prev = float("-inf")
        steps_cache = {}
        while t_cur < t_end_cmp and taken < 10_000_000:
            # stagnation guard (see integrate/adaptive.simulate_adaptive)
            if t_cur <= t_prev:
                raise RuntimeError(
                    f"adaptive dt stagnated at t = {t_cur:g} (< t_end = "
                    f"{t_end:g}): dt_max {dt:g} is below the f32 time "
                    "resolution at this t — raise dt_max or rescale time"
                )
            t_prev = t_cur
            k = resort_every
            guarded = False
            if max_drift_frac > 0 and k > 1:
                # dt_max bounds every adaptive step, so it bounds drift
                v_max = float(jnp.max(jnp.abs(state["vel"])))
                cell = float(state["border"]) / (1 << ld)
                if v_max * dt * k > max_drift_frac * cell:
                    k = 1
                    guarded = True
            key = (k, frame_writer is not None)
            if key not in steps_cache:
                steps_cache[key] = make_steps.adaptive(
                    k, with_history=key[1]
                )
            if frame_writer is not None:
                state, t_dev, ts, dts, hist = steps_cache[key](
                    state, t_cur, t_end, two_eta_eps, dt_min, dt
                )
                real = np.asarray(dts) > 0
                if real.any():
                    flush_frames(state, np.asarray(hist)[real])
            else:
                state, t_dev, ts, dts = steps_cache[key](
                    state, t_cur, t_end, two_eta_eps, dt_min, dt
                )
                real = np.asarray(dts) > 0
            t_cur = float(t_dev)
            taken += int(real.sum())
            check_halo_nan(state, taken)
            if (
                checkpoint_every > 0
                and checkpoint_fn is not None
                and taken > 0
                and (taken % checkpoint_every) < k
            ):
                do_checkpoint(state, taken)
            if progress_every > 0 and progress_fn is not None and (
                taken % progress_every
            ) < k:
                np.asarray(state["border"])  # fence (real wall time)
                progress_fn(
                    taken,
                    "drift-guard: per-step resorts" if guarded else "",
                )
            if t_cur < t_end:
                prev = state
                state = resort_fn(state)
                if stale(state):
                    state = rebalance(prev)
        p_out, v_out = emit_fn(state)
        return p_out, v_out, taken

    done = 0
    steps_cache = {}
    while done < n_steps:
        t = min(resort_every, n_steps - done)
        guarded = False
        if max_drift_frac > 0 and t > 1 and dt != 0:
            v_max = float(jnp.max(jnp.abs(state["vel"])))
            cell = float(state["border"]) / (1 << ld)
            if v_max * abs(dt) * t > max_drift_frac * cell:
                t = 1
                guarded = True
        if checkpoint_every > 0:
            next_ckpt = ((done // checkpoint_every) + 1) * checkpoint_every
            t = min(t, next_ckpt - done)
        if progress_every > 0:
            next_prog = ((done // progress_every) + 1) * progress_every
            t = min(t, next_prog - done)
        key = (t, frame_writer is not None)
        if key not in steps_cache:
            steps_cache[key] = make_steps(t, with_history=key[1])
        if frame_writer is not None:
            state, hist = steps_cache[key](state, dt)
            flush_frames(state, hist)
        else:
            state = steps_cache[key](state, dt)
        done += t
        # the in-graph backstops NaN-poison rather than compute wrong
        # forces; translate to the prescriptive host error
        check_halo_nan(state, done)
        if (
            checkpoint_every > 0
            and checkpoint_fn is not None
            and done % checkpoint_every == 0
        ):
            do_checkpoint(state, done)
        if (
            progress_every > 0
            and progress_fn is not None
            and done % progress_every == 0
        ):
            np.asarray(state["border"])  # fence (real wall time)
            progress_fn(done, "drift-guard: per-step resorts" if guarded else "")
        if done < n_steps:
            prev = state
            state = resort_fn(state)
            if stale(state):
                state = rebalance(prev)
    return emit_fn(state)
