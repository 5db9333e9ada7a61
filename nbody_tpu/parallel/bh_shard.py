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
    interpret: bool | None = None,
    return_stats: bool = False,
):
    """Sharded Barnes-Hut ForceFn: (pos, mass) sharded on axis 0 -> acc.

    With return_stats=True returns (acc, stats) where stats is a dict of
    replicated scalars: bucket_overflow / trimmed_groups / stack_overflow
    must all be 0 for exact forces (see check_sharded_fused)."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def local(pos_l, mass_l):
        dtype = pos_l.dtype
        C = pos_l.shape[0]
        N = n_dev * C
        b = min(group_size, C)
        ld = auto_ld(N)
        sl = auto_split_level(N, b)
        k_terminal = 8**ld
        CB = _round_up(max(int(bucket_frac * C / n_dev), min(C, 256)), 128)
        C_own = n_dev * CB
        k = lax.axis_index(axis_name)

        # 1. global root cube --------------------------------------------
        border = 2.0 * lax.pmax(jnp.max(jnp.abs(pos_l)), axis_name)

        # 2. local Morton sort -------------------------------------------
        keys = morton_encode(pos_l, border, _DEPTH)
        ordl = jnp.argsort(keys)
        keys_s = keys[ordl]
        pos_s = pos_l[ordl].astype(jnp.float32)
        gm_s = (jnp.asarray(G, jnp.float32) * mass_l[ordl]).astype(jnp.float32)
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
        keep = min(gstart.shape[0], 3 * (C_own // b) + 256)
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
        ps = lax.all_gather(ps_l, axis_name, axis=1, tiled=True)

        lev = jnp.arange(16, dtype=jnp.float32)
        bsq = (border.astype(jnp.float32) / jnp.exp2(lev)) ** 2
        ooff = aux_octet_offsets()

        acc_g, kstats = fused_group_forces(
            gcount, pg, ft, it, ps, bsq, ooff,
            theta=theta, eps2=softening_sq, leaf_cap=leaf_cap, ld=ld,
            burst_rows=burst_rows, interpret=interpret,
        )

        # Capacity contract: a mid-run bucket overflow (bodies drifted
        # across Morton ranges past CB) or a trimmed occupied group (drift
        # concentrated groups past `keep`, whose bodies would silently get
        # zero acceleration) must never be silent.  Raising is impossible
        # inside jit, so poison the output instead: NaN forces surface
        # immediately in positions, energy and --debug-nans.
        # check_sharded_fused remains the fail-fast probe at startup.
        acc_g = jnp.where(
            (bucket_overflow > 0) | (trimmed > 0), jnp.float32(jnp.nan), acc_g
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
            .astype(dtype)
        )
        if not return_stats:
            return out
        stats = {
            "bucket_overflow": lax.pmax(
                jnp.maximum(bucket_overflow, 0), axis_name
            ).reshape(()),
            "trimmed_groups": lax.psum(trimmed, axis_name).reshape(()),
            "stack_overflow": lax.pmax(
                jnp.max(kstats[:, 3]), axis_name
            ).reshape(()),
            "near_bodies": lax.psum(
                jnp.sum(kstats[:, 2]), axis_name
            ).reshape(()),
        }
        return out, stats

    out_specs = (
        (P(axis_name, None), {k: P() for k in
                              ("bucket_overflow", "trimmed_groups",
                               "stack_overflow", "near_bodies")})
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
    fn = fused_shard_force_fn(mesh=mesh, return_stats=True, **kw)
    _, stats = fn(bodies.pos, bodies.mass)
    bad = {
        name: int(stats[name])
        for name in ("bucket_overflow", "trimmed_groups", "stack_overflow")
        if int(stats[name]) > 0
    }
    if bad:
        raise CapacityError(
            f"sharded fused Barnes-Hut capacity overflow: {bad}; rerun "
            "with a larger --bh-group-size or bucket_frac"
        )
    return stats


# ---------------------------------------------------------------------------
# Sharded persistent Morton order: the redistribution pipeline above IS the
# resort.  Between resorts each chip integrates its own groups in the kernel's
# planar layout (ops/bh_persistent.py, single-chip analog); per step the only
# collectives are a psum of the dense grid's float fields (~5 MB at ld=6) and
# the all_gather of the planar slot arrays for near-field DMA.  Bodies may
# drift outside their chip's Morton range between resorts — ownership is by
# redistribution, not position, and the MAC staleness contract is identical
# to the single-chip persistent path.
# ---------------------------------------------------------------------------


def _shard_layout(n: int, n_dev: int, group_size: int, bucket_frac: float):
    C = n // n_dev
    b = min(group_size, C)
    ld = auto_ld(n)
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
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    theta: float = constants.THETA,
    group_size: int = 1024,
    leaf_cap: int = 64,
    samples_per_chip: int = 32,
    bucket_frac: float = 2.5,
    interpret: bool | None = None,
):
    """Build (init_fn, resort_fn, prime_fn, steps_fn, emit_fn) for the
    sharded persistent integrator.  State is a dict pytree: per-chip
    group-layout leaves sharded on axis 0, tree tables replicated."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    C, b, ld, sl, CB, C_own, keep_l = _shard_layout(
        n, n_dev, group_size, bucket_frac
    )
    k_terminal = 8**ld
    M_l = keep_l * b

    from nbody_tpu.ops.barneshut import compact_groups, group_bodies

    def local_resort(pos_f, vel_f, acc_f, gm_f, orig_f):
        """Per-chip: redistribute (M_in,) candidate slots to contiguous
        Morton ranges and rebuild the group state.  Pads: orig = n,
        gm = 0."""
        m_in = pos_f.shape[0]
        k = lax.axis_index(axis_name)

        real_in = orig_f < n
        border = 2.0 * lax.pmax(
            jnp.max(jnp.where(real_in[:, None], jnp.abs(pos_f), 0.0)),
            axis_name,
        )
        keys = morton_encode(pos_f, border, _DEPTH)
        keys = jnp.where(real_in, keys, _SENT_KEY)
        ordl = jnp.argsort(keys)
        keys_s = keys[ordl]
        fall = jnp.concatenate(
            [pos_f[ordl], gm_f[ordl][:, None], vel_f[ordl], acc_f[ordl]],
            axis=1,
        ).astype(jnp.float32)  # (M_in, 10) [x y z gm vx vy vz ax ay az]
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
            fj = jnp.where(valid, fj, jnp.where(jnp.arange(10) == 3, 0.0, fj))
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
        myf = recv_f.reshape(C_own, 10)[mo]
        Rk = jnp.sum((myk < _SENT_KEY).astype(jnp.int32))

        # groups_multiple keeps group_bodies' capacity >= the 128-slot
        # rounded keep_l (see _shard_layout) so compact_groups never
        # shrinks the static group count below it
        gstart, gcount, group_idx, group_valid = group_bodies(
            myk, C_own, _DEPTH, b, sl,
            groups_multiple=128 // math.gcd(b, 128),
        )
        gcount = jnp.minimum(gcount, jnp.clip(Rk - gstart, 0))
        slots2 = jnp.arange(b, dtype=jnp.int32)[None, :]
        group_valid = slots2 < gcount[:, None]
        group_idx = jnp.clip(
            jnp.where(group_valid, gstart[:, None] + slots2, gstart[:, None]),
            0,
            C_own - 1,
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
        nid_g = jnp.where(
            group_valid,
            (myk[group_idx] >> (3 * (_DEPTH - ld))).astype(jnp.int32),
            k_terminal,
        )

        # static cell ranges in GLOBAL slot space (chip k at [k*M_l, ...))
        gslot = (k * M_l + jnp.arange(M_l, dtype=jnp.int32)).reshape(M_l)
        nid_f = nid_g.reshape(M_l)
        inf = jnp.int32(2**31 - 1)
        stp = jax.ops.segment_min(
            jnp.where(nid_f < k_terminal, gslot, inf), nid_f,
            num_segments=k_terminal + 1,
        )[:k_terminal]
        enp = jax.ops.segment_max(
            jnp.where(nid_f < k_terminal, gslot + 1, -1), nid_f,
            num_segments=k_terminal + 1,
        )[:k_terminal]
        cntp = jax.ops.segment_sum(
            (nid_f < k_terminal).astype(jnp.int32), nid_f,
            num_segments=k_terminal + 1,
        )[:k_terminal]
        st_g = lax.pmin(stp, axis_name)
        en_g = lax.pmax(enp, axis_name)
        cnt_g = lax.psum(cntp, axis_name)
        zero3 = jnp.zeros((k_terminal, 3), jnp.float32)
        tree = grid_from_terminal(
            zero3, jnp.zeros((k_terminal,), jnp.float32), cnt_g, st_g, en_g, ld
        )
        from nbody_tpu.ops.bh_fused import pack_it

        it = pack_it(tree, ld)
        lev = jnp.arange(16, dtype=jnp.float32)
        bsq = (border.astype(jnp.float32) / jnp.exp2(lev)) ** 2
        return {
            "pg": pg, "vel": vel_g, "acc": acc_g, "valid": group_valid,
            "gcount": gcount.astype(jnp.int32), "orig": orig_g, "nid": nid_g,
            "it": it, "bsq": bsq, "border": border.reshape(()),
            "bucket_overflow": jnp.maximum(bucket_overflow, 0).reshape(()),
            "trimmed": trimmed.reshape(()),
        }

    def local_ft(pg, nid):
        """psum'd per-step float-table rebuild over stale cells."""
        pos_f = jnp.transpose(pg[:, :3, :], (0, 2, 1)).reshape(M_l, 3)
        gm_f = pg[:, 3, :].reshape(M_l)
        nid_f = nid.reshape(M_l)
        w = jax.ops.segment_sum(
            gm_f[:, None] * pos_f, nid_f, num_segments=k_terminal + 1
        )[:k_terminal]
        gm = jax.ops.segment_sum(gm_f, nid_f, num_segments=k_terminal + 1)[
            :k_terminal
        ]
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
        ps = lax.all_gather(ps_l, axis_name, axis=1, tiled=True)
        acc_g, kstats = fused_group_forces(
            st["gcount"], st["pg"], ft, st["it"], ps, st["bsq"],
            aux_octet_offsets(),
            theta=theta, eps2=softening_sq, leaf_cap=leaf_cap, ld=ld,
            interpret=interpret,
        )
        ovf = lax.pmax(jnp.max(kstats[:, 3]), axis_name)
        return jnp.where(ovf > 0, jnp.float32(jnp.nan), acc_g)

    state_specs = {
        "pg": P(axis_name, None, None), "vel": P(axis_name, None, None),
        "acc": P(axis_name, None, None), "valid": P(axis_name, None),
        "gcount": P(axis_name), "orig": P(axis_name, None),
        "nid": P(axis_name, None), "it": P(), "bsq": P(), "border": P(),
        "bucket_overflow": P(), "trimmed": P(),
    }

    def _smap(fn, in_specs, out_specs):
        return jax.jit(
            jax.shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        )

    def init_local(pos_l, vel_l, mass_l):
        k = lax.axis_index(axis_name)
        gm = (jnp.asarray(G, jnp.float32) * mass_l).astype(jnp.float32)
        orig = (k * C + jnp.arange(C, dtype=jnp.int32)).astype(jnp.int32)
        return local_resort(
            pos_l.astype(jnp.float32), vel_l.astype(jnp.float32),
            jnp.zeros((C, 3), jnp.float32), gm, orig,
        )

    init_fn = _smap(
        init_local, (P(axis_name, None), P(axis_name, None), P(axis_name)),
        state_specs,
    )

    def resort_local(st):
        rows = jnp.transpose(st["pg"], (0, 2, 1)).reshape(M_l, 4)
        return local_resort(
            rows[:, :3],
            jnp.transpose(st["vel"], (0, 2, 1)).reshape(M_l, 3),
            jnp.transpose(st["acc"], (0, 2, 1)).reshape(M_l, 3),
            jnp.where(st["valid"], st["pg"][:, 3, :], 0.0).reshape(M_l),
            st["orig"].reshape(M_l),
        )

    resort_fn = _smap(resort_local, (state_specs,), state_specs)

    def prime_local(st):
        return {**st, "acc": local_force(st)}

    prime_fn = _smap(prime_local, (state_specs,), state_specs)

    def make_steps(n_steps: int):
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
                return s, None

            st, _ = lax.scan(step, st, None, length=n_steps)
            return st

        return _smap(steps_local, (state_specs, P()), state_specs)

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
    return init_fn, resort_fn, prime_fn, make_steps, emit_fn


def simulate_persistent_sharded(
    bodies,
    n_steps: int,
    dt: float,
    *,
    mesh=None,
    resort_every: int = 8,
    **kw,
):
    """Sharded persistent-order run: (sharded Bodies, steps, dt) ->
    (pos, vel) sharded in the original order.  Raises CapacityError on
    bucket overflow or group trim at any resort (host-checked between
    chunks; kernel stack overflow NaN-poisons in-graph)."""
    mesh = mesh or make_mesh()
    n = bodies.n
    init_fn, resort_fn, prime_fn, make_steps, emit_fn = persistent_shard_fns(
        mesh=mesh, n=n, **kw
    )

    def check(st):
        bad = {
            name: int(st[name])
            for name in ("bucket_overflow", "trimmed")
            if int(st[name]) > 0
        }
        if bad:
            raise CapacityError(
                f"sharded persistent Barnes-Hut capacity overflow: {bad}"
            )

    state = init_fn(bodies.pos, bodies.vel, bodies.mass)
    check(state)
    state = prime_fn(state)
    done = 0
    steps_cache = {}
    while done < n_steps:
        t = min(resort_every, n_steps - done)
        if t not in steps_cache:
            steps_cache[t] = make_steps(t)
        state = steps_cache[t](state, dt)
        done += t
        if done < n_steps:
            state = resort_fn(state)
            check(state)
    return emit_fn(state)
