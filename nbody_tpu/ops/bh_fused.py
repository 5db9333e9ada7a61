"""Fused Barnes-Hut traverse+evaluate Pallas kernel over the dense grid.

The XLA flat traversal (nbody_tpu.ops.bh_traverse_flat) materializes
per-group source lists in HBM through ~10-20M one-element gathers and
scatters per 1M-body force eval (~29 ns each on this stack — the measured
bottleneck, docs/PERFORMANCE.md).  This kernel removes the materialization
entirely: each grid program traverses the octree for ONE Morton body group
and evaluates accepted sources in 128-lane bursts while they are still in
VMEM.  It is the TPU answer to the CUDA warp traversal + shared-memory
interaction list (cuda/barnes-hut.cu:459-629), built from the addressing
rules pinned by tools/mb_probe.py and the stage costs from
tools/mb_kernel.py:

  * the octree is the DENSE grid of nbody_tpu.ops.bh_grid packed into two
    VMEM-resident tables addressed by octet (8 siblings): a float table
    [cx8|cy8|cz8|gm8] (4 octets/row) and an int table [start8|span8]
    (8 octets/row) — children of cell c are ALWAYS octet c of the next
    level, so the traversal stack holds bare (level, octet) ints in SMEM;
  * classification is 8-wide VPU work on one dynamically-rolled row; ONE
    vector->scalar reduction per pop returns all three masks as packed
    bits (the reduction is the measured 200 ns serial cost per pop —
    everything else rides in its shadow);
  * far-accepted COMs are staged into a (4, 128) accumulator with the
    repeat+lane-mask trick; near cells stage (start, count) the same way
    and are bulk-scalarized 128 at a time via a VMEM->SMEM DMA (per-
    sibling masked-reduce extraction measured 3.8x slower);
  * near ranges merge into maximal contiguous runs (Morton-sorted bodies
    make sibling leaf ranges adjacent) and stream from HBM as 128-aligned
    planar windows via async DMA;
  * every 128 staged sources become one row of a (RB, 4, 128) source
    buffer; full buffers evaluate against the group's (B, 4) body block
    as (B, 128) softened pair grids accumulated into (B, 128) lane
    accumulators (one cross-lane reduction per kernel, not per row —
    the per-row reductions were the measured eval bottleneck).  A
    body's own near-field entry contributes exactly zero force
    (dx = 0), preserving the reference's self-exclusion
    (serial/barnes-hut.c:411).

Unlike the list-based paths there are NO list capacities to overflow and
no terminal-COM residual: over-full terminal cells ship their bodies
exactly (the role of the reference's unbounded leaf split,
serial/barnes-hut.c:206-245), so clustered inputs get exact-at-theta
forces at a cost bounded by the cluster population.  The only capacity is
the 512-entry DFS stack (depth 6 needs < 50), runtime-checked via the
per-group stats output.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.core import constants
from nbody_tpu.ops.bh_grid import build_grid, grid_offsets
from nbody_tpu.ops.barneshut import compact_groups, group_bodies
from nbody_tpu.ops.morton import morton_sort

STACK_CAP = 512
_LV_SHIFT = 20  # stack entry = (parent_level << 20) | octet_id
_OT_MASK = (1 << _LV_SHIFT) - 1

# stats lanes (per group)
S_POPS, S_SRC, S_NEAR, S_OVF, S_ROWS = 0, 1, 2, 3, 4


def _octs(a, n_oct: int):
    """Children cells (levels 1..ld in grid order) as (n_oct, 8) octets."""
    return a[0, 1 : 1 + 8 * n_oct].reshape(n_oct, 8)


def pack_ft(tree, ld: int):
    """GridTree float half -> (RF, 128) f32 octet table.

    ft row ot>>2 holds 4 octets of [cx8|cy8|cz8|gm8].  Split from pack_it
    so the persistent-order path (ops/bh_persistent.py) can repack the
    per-step float fields without touching the static int ranges."""
    n_oct = grid_offsets(ld)[ld]  # octets with parent levels 0..ld-1
    p4 = -(-n_oct // 4) * 4
    f = jnp.stack(
        [_octs(tree.cx, n_oct), _octs(tree.cy, n_oct),
         _octs(tree.cz, n_oct), _octs(tree.gm, n_oct)], axis=1
    )  # (n_oct, 4, 8)
    f = jnp.pad(f, ((0, p4 - n_oct), (0, 0), (0, 0)))
    return f.reshape(p4 // 4, 128)


def pack_it(tree, ld: int):
    """GridTree int half -> (RI, 128) i32 octet table: row ot>>3 holds 8
    octets of [start8|span8]."""
    n_oct = grid_offsets(ld)[ld]
    p8 = -(-n_oct // 8) * 8
    i = jnp.stack(
        [_octs(tree.start, n_oct), _octs(tree.cnt, n_oct)], axis=1
    )  # (n_oct, 2, 8)
    i = jnp.pad(i, ((0, p8 - n_oct), (0, 0), (0, 0)))
    return i.reshape(p8 // 8, 128).astype(jnp.int32)


def pack_tables(tree, ld: int):
    """GridTree -> (ft (RF,128) f32, it (RI,128) i32) octet tables.

    Octet `ot` = OOFF[d] + c covers the 8 children (at level d+1) of cell
    c at level d, with OOFF[d] = (8^d - 1) // 7.
    """
    return pack_ft(tree, ld), pack_it(tree, ld)


def _fused_kernel(
    # inputs
    gcount_ref,  # SMEM (G,) i32 — bodies per group (full array)
    bsq_ref,  # SMEM (16,) f32 — (border / 2^l)^2 per level
    ooff_ref,  # SMEM (16,) i32 — octet offsets per parent level
    ft_ref,  # VMEM (RF, 128) f32 — octet field table
    it_ref,  # VMEM (RI, 128) i32 — octet start/count table
    pg_ref,  # VMEM (1, 4, B) f32 — group bodies, planar rows [x; y; z; gm].
    # Planar because XLA pads a pallas operand's minor dim to the 128-lane
    # tile: a (G, B, 4) layout costs 32x its logical size in HBM (14 GB at
    # 10M bodies).  (4, B) pads only 4 -> 8 sublanes; one in-kernel
    # transpose (probed: supported) restores the (B, 4) working view.
    ps_ref,  # ANY (4, NP) f32 — planar sorted sources [x; y; z; Gm]
    # outputs
    acc_ref,  # VMEM (1, 4, B) f32 — planar [ax; ay; az; 0] (same reason)
    stats_ref,  # VMEM (1, 1, 128) i32 block per program (lanes 0..4 = stats)
    # scratch
    st,  # SMEM (16,) i32 — kernel state
    stack,  # SMEM (STACK_CAP,) i32
    rowmeta,  # SMEM (RB, 4) i32 — [is_dma, mask_start, mask_end, _]
    rsm,  # SMEM (2, 128) i32 — bulk-scalarized ranges
    srcacc,  # VMEM (4, 128) f32 — COM staging accumulator
    rngs,  # VMEM (1, 128) i32 — near-range start staging
    rngc,  # VMEM (1, 128) i32 — near-range count staging
    src,  # VMEM (RB, 4, 128) f32 — staged source rows
    ax,  # VMEM (B, 128) f32 lane-accumulators (reduced once at the end)
    ay,  # VMEM (B, 128) f32
    az,  # VMEM (B, 128) f32
    sems,  # DMA sems (RB,)
    vsem,  # DMA sems (3,) — rng bulk x2, COM row flush
    *,
    theta_sq: float,
    eps2: float,
    leaf_cap: int,
    ld: int,
    rb: int,
    pb: int = 1,
    debug_mode: str = "full",
):
    # debug_mode bisects the kernel's serial cost centers on hardware
    # (tools/profile_fused_stages.py): "pops" = DFS+classify only,
    # "stage" = + staging/row machinery (no DMA, no eval), "dma" = + HBM
    # window DMAs (no eval), "full" = production.  Static: every
    # non-"full" branch traces away entirely in production.
    do_stage = debug_mode != "pops"
    do_dma = debug_mode in ("dma", "full")
    do_eval = debug_mode == "full"
    SP, NSRC, NRNG, ROWS, PEND_S, PEND_E, POPS, NNEAR, TSRC, OVF = range(10)
    g = pl.program_id(0)
    lanes = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    l8 = lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    for k in range(10):
        st[k] = 0
    ax[...] = jnp.zeros_like(ax)
    ay[...] = jnp.zeros_like(ay)
    az[...] = jnp.zeros_like(az)
    # fresh scratch can hold NaN bit patterns; a NaN coordinate row would
    # poison the whole accumulation through 0 * NaN — zero it all
    srcacc[...] = jnp.zeros_like(srcacc)
    rngc[...] = jnp.zeros_like(rngc)

    pgb = jnp.transpose(pg_ref[0])  # (4, B) -> (B, 4)
    xi, yi, zi = pgb[:, 0:1], pgb[:, 1:2], pgb[:, 2:3]

    # ---- burst: evaluate all staged source rows against the group -------
    def burst():
        nrows = st[ROWS]

        def brow(r, _):
            @pl.when(r < nrows)
            def _():
                if do_dma:
                    @pl.when(rowmeta[r, 0] == 1)
                    def _():
                        # wait the body-window DMA for this row (descriptor
                        # shape matches; offsets irrelevant for the wait)
                        pltpu.make_async_copy(
                            ps_ref.at[:, pl.ds(0, 128)],
                            src.at[r],
                            sems.at[r],
                        ).wait()
                if not do_eval:
                    return
                ms, me = rowmeta[r, 1], rowmeta[r, 2]
                sxr = src[r, 0:1, :]
                syr = src[r, 1:2, :]
                szr = src[r, 2:3, :]
                sgr = jnp.where(
                    (lanes >= ms) & (lanes < me), src[r, 3:4, :], 0.0
                )
                dx = sxr - xi  # (B, 128)
                dy = syr - yi
                dz = szr - zi
                r2 = dx * dx + dy * dy + dz * dz + eps2
                inv = lax.rsqrt(r2)
                w = sgr * (inv * inv * inv)
                # accumulate in (B, 128) and reduce ONCE at kernel end:
                # the three per-row cross-lane reductions were the
                # dominant eval cost (stage bisect: eval 274 ms of the
                # 648 ms 1M kernel; reductions, not flops)
                ax[...] += w * dx
                ay[...] += w * dy
                az[...] += w * dz

            return 0

        lax.fori_loop(0, rb, brow, 0)
        st[ROWS] = 0

    # ---- row allocation (bursts when the buffer is full) ----------------
    def alloc_row():
        @pl.when(st[ROWS] == rb)
        def _():
            burst()

        row = st[ROWS]
        st[ROWS] = row + 1
        return row

    def flush_com_row():
        row = alloc_row()
        cp = pltpu.make_async_copy(srcacc, src.at[row], vsem.at[2])
        cp.start()
        cp.wait()
        rowmeta[row, 0] = 0
        rowmeta[row, 1] = 0
        rowmeta[row, 2] = 128
        srcacc[3:4, :] = jnp.zeros((1, 128), jnp.float32)

    # ---- near-range plumbing ---------------------------------------------
    def flush_pending():
        s, e = st[PEND_S], st[PEND_E]
        st[NNEAR] = st[NNEAR] + (e - s)

        def wcond(w):
            return w < e

        def wbody(w):
            row = alloc_row()
            wa = pl.multiple_of(w, 128)
            if do_dma:
                pltpu.make_async_copy(
                    ps_ref.at[:, pl.ds(wa, 128)], src.at[row], sems.at[row]
                ).start()
            rowmeta[row, 0] = 1 if do_dma else 0
            rowmeta[row, 1] = jnp.maximum(s - w, 0)
            rowmeta[row, 2] = jnp.minimum(e - w, 128)
            return w + 128

        lax.while_loop(wcond, wbody, (s >> 7) << 7)

    def bulk_ranges():
        # scalarize 128 staged (start, count) pairs with one DMA pair
        c0 = pltpu.make_async_copy(rngs, rsm.at[0:1, :], vsem.at[0])
        c1 = pltpu.make_async_copy(rngc, rsm.at[1:2, :], vsem.at[1])
        c0.start()
        c1.start()
        c0.wait()
        c1.wait()

        def lane_k(k, _):
            c = rsm[1, k]

            @pl.when(c > 0)
            def _():
                s = rsm[0, k]
                pe = st[PEND_E]

                @pl.when(s == pe)  # contiguous: extend the pending run
                def _():
                    st[PEND_E] = pe + c

                @pl.when(s != pe)
                def _():
                    flush_pending()
                    st[PEND_S] = s
                    st[PEND_E] = s + c

            return 0

        lax.fori_loop(0, 128, lane_k, 0)
        rngc[...] = jnp.zeros_like(rngc)
        st[NRNG] = 0

    # ---- group bounding box (pad slots repeat body 0: box stays tight) --
    lox, hix = jnp.min(xi), jnp.max(xi)
    loy, hiy = jnp.min(yi), jnp.max(yi)
    loz, hiz = jnp.min(zi), jnp.max(zi)

    # ---- DFS over octets -------------------------------------------------
    # The stack pointer is the while CARRY, not SMEM state: a while_loop
    # condition must be pure in its carry (a Ref read in the condition is
    # hoisted by state discharge and the loop never terminates).
    stack[0] = 0  # (level 0) << 20 | octet 0 = the root's children

    def pop_cond(sp):
        return sp > 0

    n_oct = grid_offsets(ld)[ld]

    def pop_body(sp):
        # Batched pop: classify up to `pb` stack entries per iteration
        # BEFORE any of them stage or push.  At pb=1 each pop serializes
        # on its own vector->scalar mask reduction (~200 ns latency, the
        # measured floor: 320 ms of the 1M kernel); the batch's
        # independent classify chains and reductions pipeline instead.
        # All entries are consumed (read) in the classify phase, so the
        # push phase may safely overwrite the popped slots.
        take = jnp.minimum(sp, pb)
        sp = sp - take
        st[POPS] = st[POPS] + take

        slots = []
        for j in range(pb):
            # slot j >= take reads stale stack memory: clamp the decoded
            # level/octet into table range (garbage math, gated out below)
            e = stack[jnp.minimum(sp + j, STACK_CAP - 1)]
            d = jnp.clip(e >> _LV_SHIFT, 0, 14)
            ot = jnp.clip(e & _OT_MASK, 0, n_oct - 1)

            frow = ft_ref[pl.ds(ot >> 2, 1), :]
            fb = (ot & 3) * 32
            cx8 = pltpu.roll(frow, (128 - fb) & 127, axis=1)[:, 0:8]
            cy8 = pltpu.roll(frow, (120 - fb) & 127, axis=1)[:, 0:8]
            cz8 = pltpu.roll(frow, (112 - fb) & 127, axis=1)[:, 0:8]
            gm8 = pltpu.roll(frow, (104 - fb) & 127, axis=1)[:, 0:8]
            irow = it_ref[pl.ds(ot >> 3, 1), :]
            ib = (ot & 7) * 16
            st8 = pltpu.roll(irow, (128 - ib) & 127, axis=1)[:, 0:8]
            ct8 = pltpu.roll(irow, (120 - ib) & 127, axis=1)[:, 0:8]

            # MAC: distance from child COM to the group AABB vs child size
            ddx = cx8 - jnp.clip(cx8, lox, hix)
            ddy = cy8 - jnp.clip(cy8, loy, hiy)
            ddz = cz8 - jnp.clip(cz8, loz, hiz)
            d2 = ddx * ddx + ddy * ddy + ddz * ddz
            exists = ct8 > 0
            far8 = exists & (theta_sq * d2 > bsq_ref[d + 1])
            if ld > 1:
                terminal = d + 1 >= ld
            else:
                terminal = True
            near8 = exists & ~far8 & ((ct8 <= leaf_cap) | terminal)
            open8 = exists & ~far8 & ~near8
            # ONE vector->scalar reduction per slot: all three masks as bits
            bits = jnp.sum(
                jnp.where(far8, jnp.int32(1) << l8, 0)
                + jnp.where(open8, jnp.int32(1) << (l8 + 8), 0)
                + jnp.where(near8, jnp.int32(1) << (l8 + 16), 0)
            )
            slots.append((bits, cx8, cy8, cz8, gm8, st8, ct8, far8, near8, d, ot))

        sp2 = sp
        for j, (bits, cx8, cy8, cz8, gm8, st8_, ct8, far8, near8, d, ot) in enumerate(slots):
            valid = j < take

            @pl.when(valid & ((bits & 0xFF) > 0) & do_stage)  # -- far COMs --
            def _(cx8=cx8, cy8=cy8, cz8=cz8, gm8=gm8, far8=far8):
                nsrc = st[NSRC]
                m = (lanes >> 3) == ((nsrc >> 3) & 15)
                srcacc[0:1, :] = jnp.where(m, pltpu.repeat(cx8, 16, axis=1), srcacc[0:1, :])
                srcacc[1:2, :] = jnp.where(m, pltpu.repeat(cy8, 16, axis=1), srcacc[1:2, :])
                srcacc[2:3, :] = jnp.where(m, pltpu.repeat(cz8, 16, axis=1), srcacc[2:3, :])
                srcacc[3:4, :] = jnp.where(
                    m,
                    pltpu.repeat(jnp.where(far8, gm8, 0.0), 16, axis=1),
                    srcacc[3:4, :],
                )
                st[NSRC] = nsrc + 8
                st[TSRC] = st[TSRC] + 8

                @pl.when(((nsrc + 8) & 127) == 0)
                def _():
                    flush_com_row()

            @pl.when(valid & ((bits >> 16) > 0) & do_stage)  # -- near ranges --
            def _(st8_=st8_, ct8=ct8, near8=near8):
                nr = st[NRNG]
                m = (lanes >> 3) == ((nr >> 3) & 15)
                rngs[...] = jnp.where(m, pltpu.repeat(st8_, 16, axis=1), rngs[...])
                rngc[...] = jnp.where(
                    m, pltpu.repeat(jnp.where(near8, ct8, 0), 16, axis=1), rngc[...]
                )
                st[NRNG] = nr + 8

                @pl.when(((nr + 8) & 127) == 0)
                def _():
                    bulk_ranges()

            obits = jnp.where(valid, (bits >> 8) & 0xFF, 0)
            ob = ooff_ref[d + 1] + 8 * (ot - ooff_ref[d])
            entry = (d + 1) << _LV_SHIFT

            def push_k(k, sp2, obits=obits, ob=ob, entry=entry):
                # branchless push: unconditional store + conditional
                # advance — a skipped child's slot is overwritten by the
                # next push or never read (sp bounds reads).  Children go
                # on DESCENDING (7..0) so the LIFO pops them in ASCENDING
                # Morton order: near ranges from successive pops then
                # arrive in ascending body order and the contiguous-run
                # merge (flush_pending s == PEND_E) actually fires.
                c = 7 - k
                hit = ((obits >> c) & 1) > 0
                stack[jnp.minimum(sp2, STACK_CAP - 1)] = entry | (ob + c)
                return sp2 + jnp.where(hit, 1, 0)

            sp2 = lax.fori_loop(0, 8, push_k, sp2)

        # >= not >: push_k's unconditional store clamps to slot
        # STACK_CAP-1, so the first store made AT sp2 == STACK_CAP (even a
        # non-hit one) already clobbers the last valid entry — equality is
        # corruption, not fullness.
        @pl.when(sp2 >= STACK_CAP)
        def _():
            st[OVF] = 1

        return jnp.minimum(sp2, STACK_CAP)

    @pl.when(gcount_ref[g] > 0)
    def _():
        lax.while_loop(pop_cond, pop_body, 1)
        # drain: staged ranges -> pending -> windows; partial COM row; eval
        bulk_ranges()
        flush_pending()
        st[PEND_S] = 0
        st[PEND_E] = 0

        @pl.when((st[NSRC] & 127) != 0)
        def _():
            flush_com_row()  # unfilled lanes carry gm = 0

        burst()

    axs = jnp.sum(ax[...], axis=1, keepdims=True)
    ays = jnp.sum(ay[...], axis=1, keepdims=True)
    azs = jnp.sum(az[...], axis=1, keepdims=True)
    acc_ref[0] = jnp.transpose(
        jnp.concatenate([axs, ays, azs, jnp.zeros_like(axs)], axis=1)
    )
    # one vector write per program: SMEM stats arrays scale with the
    # group count and overflow the 1 MB SMEM budget at 10M+ bodies
    stats_ref[0] = (
        jnp.where(lanes == S_POPS, st[POPS], 0)
        + jnp.where(lanes == S_SRC, st[TSRC], 0)
        + jnp.where(lanes == S_NEAR, st[NNEAR], 0)
        + jnp.where(lanes == S_OVF, st[OVF], 0)
    )


def fused_group_forces(
    gcount,
    pg,
    ft,
    it,
    ps,
    bsq,
    ooff,
    *,
    theta: float,
    eps2: float,
    leaf_cap: int,
    ld: int,
    burst_rows: int = 16,
    pop_batch: int = 1,
    interpret: bool = False,
    debug_mode: str = "full",
):
    """Run the fused kernel on planar (G,4,B) groups: (G,3,B) planar
    accelerations + (G,8) stats.  debug_mode != "full" disables stages
    for hardware cost bisection (tools/profile_fused_stages.py) — the
    returned accelerations are then meaningless."""
    n_groups, _, b = pg.shape
    rb = burst_rows
    grid = (n_groups,)
    kern = functools.partial(
        _fused_kernel,
        theta_sq=float(theta) * float(theta),
        eps2=float(eps2),
        leaf_cap=int(leaf_cap),
        ld=int(ld),
        rb=rb,
        pb=int(pop_batch),
        debug_mode=debug_mode,
    )
    acc, stats = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, b), lambda g: (g, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, b), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, 4, b), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, 1, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((16,), jnp.int32),
            pltpu.SMEM((STACK_CAP,), jnp.int32),
            pltpu.SMEM((rb, 4), jnp.int32),
            pltpu.SMEM((2, 128), jnp.int32),
            pltpu.VMEM((4, 128), jnp.float32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.VMEM((rb, 4, 128), jnp.float32),
            pltpu.VMEM((b, 128), jnp.float32),
            pltpu.VMEM((b, 128), jnp.float32),
            pltpu.VMEM((b, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((rb,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(gcount, bsq, ooff, ft, it, pg, ps)
    return acc[:, :3, :], stats[:, 0, :8]


def aux_octet_offsets():
    """(16,) i32 octet offsets per parent level for the kernel's SMEM
    input: OOFF[d] = (8^d - 1) // 7.  Fixed at level 6 — the deepest the
    dense grid reaches (auto_ld cap; offsets beyond fit int32 only to
    level 7 anyway) — and zero-padded to 16 entries."""
    ooff = jnp.asarray(grid_offsets(6), jnp.int32)
    return jnp.pad(ooff, (0, 16 - ooff.shape[0]))


def auto_split_level(n: int, b: int) -> int:
    """Coarse-cell level for group chunking: cells hold ~2B bodies, so
    B-body chunks inside a cell stay mostly full.  Round to the NEAREST
    level: rounding up can land the cell count far above n/2B (e.g. 10M
    bodies, B=1024: ceil gives 32768 cells of 305 bodies — 4.3 groups'
    capacity per 1024 real bodies), exploding the static group capacity
    and the padded-slot volume."""
    return max(0, round(math.log(max(n / (2.0 * b), 1.0), 8)))


def auto_ld(n: int) -> int:
    """Dense-grid terminal level: ~16 bodies per terminal cell, clamped to
    [2, 6] (level 6 keeps the packed tables VMEM-resident: 4.8 + 2.4 MB)."""
    return min(6, max(2, math.ceil(math.log(max(n / 16.0, 1.0), 8))))


@functools.partial(
    jax.jit,
    static_argnames=(
        "G",
        "softening_sq",
        "theta",
        "ld",
        "leaf_cap",
        "group_size",
        "burst_rows",
        "interpret",
        "return_stats",
        "debug_mode",
    ),
)
def barneshut_fused(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    theta: float = constants.THETA,
    ld: int = 0,
    leaf_cap: int = 64,
    group_size: int = 1024,
    burst_rows: int = 16,
    interpret: bool = False,
    return_stats: bool = False,
    debug_mode: str = "full",
):
    """Barnes-Hut accelerations through the fused Pallas kernel (ForceFn
    signature).  f32 compute; exact (not COM-merged) forces for clusters
    denser than the grid's terminal resolution."""
    n = pos.shape[0]
    dtype = pos.dtype
    if ld == 0:
        ld = auto_ld(n)
    depth = 10
    b = group_size
    # split level so cells hold ~2B bodies: chunks of B inside a cell are
    # then mostly FULL (fuller blocks amortize the per-group traversal and
    # waste no eval lanes on padding), and the group count stays near
    # n / B + #occupied cells ~ 1.5 * n / B (bounds `keep` below).
    sl = auto_split_level(n, b)

    perm, keys, border = morton_sort(pos, depth)
    pos_s = pos[perm].astype(jnp.float32)
    gm_s = (jnp.asarray(G, jnp.float32) * mass[perm]).astype(jnp.float32)
    keys_s = keys[perm]

    tree = build_grid(pos_s, gm_s, keys_s, depth, ld)
    ft, it = pack_tables(tree, ld)

    gstart, gcount, group_idx, group_valid = group_bodies(
        keys_s, n, depth, b, sl
    )
    keep = min(gstart.shape[0], 3 * (n // b) + 256)
    gstart, gcount, group_idx, group_valid, trimmed = compact_groups(
        gstart, gcount, group_idx, group_valid, keep
    )
    pg = jnp.concatenate(
        [
            jnp.transpose(pos_s[group_idx], (0, 2, 1)),
            jnp.zeros((keep, 1, b), jnp.float32),
        ],
        axis=1,
    )

    np_pad = -(-n // 128) * 128
    ps = jnp.concatenate(
        [pos_s.T, gm_s[None, :]], axis=0
    )  # (4, N)
    ps = jnp.pad(ps, ((0, 0), (0, np_pad - n)))

    lev = jnp.arange(16, dtype=jnp.float32)
    bsq = (border.astype(jnp.float32) / jnp.exp2(lev)) ** 2
    ooff = aux_octet_offsets()

    acc_g, stats = fused_group_forces(
        gcount,
        pg,
        ft,
        it,
        ps,
        bsq,
        ooff,
        theta=theta,
        eps2=softening_sq,
        leaf_cap=leaf_cap,
        ld=ld,
        burst_rows=burst_rows,
        interpret=interpret,
        debug_mode=debug_mode,
    )

    dest = jnp.where(group_valid, group_idx, n)  # n -> dropped
    acc_s = (
        jnp.zeros((n, 3), jnp.float32)
        .at[dest.reshape(-1)]
        .set(jnp.transpose(acc_g, (0, 2, 1)).reshape(-1, 3), mode="drop")
    )
    acc = jnp.zeros((n, 3), jnp.float32).at[perm].set(acc_s).astype(dtype)

    if return_stats:
        return acc, {
            "pops": jnp.sum(stats[:, S_POPS]),
            "staged_sources": jnp.sum(stats[:, S_SRC]),
            "near_bodies": jnp.sum(stats[:, S_NEAR]),
            "stack_overflow": jnp.max(stats[:, S_OVF]),
            "trimmed_groups": trimmed,
        }
    return acc


def check_fused(pos, mass, **kw):
    """Fail-fast probe for the fused path (the analog of
    barneshut.check_capacities): one force eval, raising CapacityError if
    the DFS stack overflowed or occupied groups were trimmed — the only
    two static capacities this path has (there are no interaction lists).
    Returns the stats dict."""
    from nbody_tpu.ops.barneshut import CapacityError

    _, stats = barneshut_fused(pos, mass, return_stats=True, **kw)
    if int(stats["stack_overflow"]) > 0 or int(stats["trimmed_groups"]) > 0:
        raise CapacityError(
            "fused Barnes-Hut capacity overflow: "
            f"stack_overflow={int(stats['stack_overflow'])}, "
            f"trimmed_groups={int(stats['trimmed_groups'])}; rerun with a "
            "larger --bh-group-size or the flat traversal"
        )
    return stats
