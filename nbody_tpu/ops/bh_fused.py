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
    HBM tables addressed by octet (8 siblings): a float table
    [cx8|cy8|cz8|gm8] (4 octets/row) and an int table [start8|span8]
    (8 octets/row) — children of cell c are ALWAYS octet c of the next
    level, so a frontier entry is a bare octet int in SMEM;
  * the traversal is a LEVEL-SYNCHRONOUS BFS (round 3; the round-2
    per-octet DFS paid a vector->scalar sync and dynamic table rolls per
    pop): per 128-octet frontier chunk, the table rows ride bulk
    issue-early DMAs from HBM, classification is one batch of (128, 8)
    vector ops, and ONE bits-row DMA to SMEM crosses the vector->scalar
    boundary for the whole chunk;
  * one grid program processes `groups_per_program` groups: the pallas
    per-program block pipeline costs ~30+ us regardless of content, and
    keeping the 7 MB tables out of the block pipeline (HBM + row DMAs)
    stops it re-fetching them every program;
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
the per-level frontier (FRONTIER_CAP octets), runtime-checked via the
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
from nbody_tpu.ops.pallas_df import (
    _df_add,
    _df_lane_reduce,
    _df_mul,
    _df_rsqrt,
    _df_sqr,
)

FRONTIER_CAP = 2048  # octets per level per group (runtime overflow-checked)
EVAL_CHAINS = 4  # independent source rows evaluated per burst-loop iteration
# The df eval chain is ~290 flops of mostly independent work per row —
# it fills the VPU's ALUs on its own, and 4 chains of df temporaries
# blow the scoped-VMEM budget; 2 keeps a little ILP for the combine tree.
EVAL_CHAINS_DF = 2

# stats lanes (per group)
S_POPS, S_SRC, S_NEAR, S_OVF, S_ROWS, S_FAR = 0, 1, 2, 3, 4, 5


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
    ftl_ref,  # ANY — df mode: low-half octet field table (else 1-row dummy)
    it_ref,  # VMEM (RI, 128) i32 — octet start/count table
    pg_ref,  # VMEM (1, C, B) f32 — group bodies, planar rows [x; y; z; gm]
    # (C = 4), or df coordinate pairs [xh; xl; yh; yl; zh; zl; 0; 0]
    # (C = 8).  Planar because XLA pads a pallas operand's minor dim to
    # the 128-lane tile: a (G, B, 4) layout costs 32x its logical size in
    # HBM (14 GB at 10M bodies).  (C, B) pads only C -> 8 sublanes; one
    # in-kernel transpose (probed: supported) restores the (B, C) view.
    ps_ref,  # ANY (C, NP) f32 — planar sorted sources [x; y; z; Gm] (or
    # the 8 df channels [xh; xl; yh; yl; zh; zl; gmh; gml])
    # outputs
    acc_ref,  # VMEM (1, C, B) f32 — planar [ax; ay; az; 0] (df: hi rows
    # 0..2, lo rows 4..6)
    stats_ref,  # VMEM (1, 1, 128) i32 block per program (lanes 0..4 = stats)
    # scratch
    st,  # SMEM (32,) i32 — kernel state; slots 16+d = frontier count lvl d
    fr,  # SMEM ((ld+1)*FCH, 128) i32 — per-level octet frontiers
    bsm,  # SMEM (1, 128) i32 — bulk-scalarized classify bits
    rowmeta,  # SMEM (RB, 4) i32 — [is_dma, mask_start, mask_end, _]
    rsm,  # SMEM (2, 128) i32 — bulk-scalarized ranges
    srcacc,  # VMEM (C, 128) f32 — COM staging accumulator
    rngs,  # VMEM (1, 128) i32 — near-range start staging
    rngc,  # VMEM (1, 128) i32 — near-range count staging
    src,  # VMEM (RB, C, 128) f32 — staged source rows
    pk,  # VMEM (RB, C, 128) f32 — lane-packed eval rows (pack_row)
    ax,  # VMEM (B, 128) f32 lane-accumulators (reduced once at the end)
    ay,  # VMEM (B, 128) f32
    az,  # VMEM (B, 128) f32
    axl,  # VMEM (B, 128) f32 — df low-half accumulators (else dummies)
    ayl,  # VMEM (B, 128) f32
    azl,  # VMEM (B, 128) f32
    gft,  # VMEM (128, 128) f32 — gathered ft rows for one frontier chunk
    gftl,  # VMEM (128, 128) f32 — df: gathered ftl rows (else dummy)
    git,  # VMEM (128, 128) i32 — gathered it rows
    gcx,  # VMEM (128, 8) f32 — per-slot classify values for the stage loop
    gcy,  # VMEM (128, 8) f32
    gcz,  # VMEM (128, 8) f32
    gfgm,  # VMEM (128, 8) f32 — far-masked G*mass (0 for non-far children)
    gcxl,  # VMEM (128, 8) f32 — df low halves of the staged COM values
    gcyl,  # VMEM (128, 8) f32
    gczl,  # VMEM (128, 8) f32
    gfgml,  # VMEM (128, 8) f32
    gst,  # VMEM (128, 8) i32 — child body-range starts
    gnct,  # VMEM (128, 8) i32 — near-masked child body counts
    fidv,  # VMEM (1, 128) i32 — frontier ids (vector copy for q/e math)
    bvm,  # VMEM (1, 128) i32 — classify bits staging (DMA source)
    fvs,  # VMEM (8, C, 128) f32 — vectorized far-staging rows (child-
    # major compacted chunk: row j = child j of the chunk's far octets)
    gsemf,  # DMA sems (128,) — chunk ft-row gathers
    gsemf2,  # DMA sems (128,) — df ftl-row gathers
    gsemi,  # DMA sems (128,) — chunk it-row gathers
    sems,  # DMA sems (RB,)
    vsem,  # DMA sems (5,) — rng bulk x2, COM flush, bits, fids
    *,
    theta_sq: float,
    eps2: float,
    leaf_cap: int,
    ld: int,
    rb: int,
    fcap: int = FRONTIER_CAP,
    gpp: int = 8,
    chains: int = EVAL_CHAINS,
    df: bool = False,
    eps2_lo: float = 0.0,
    interpret_gather: bool = False,
    debug_mode: str = "full",
    far_vector: bool = True,
):
    # debug_mode bisects the kernel's serial cost centers on hardware
    # (tools/profile_fused_stages.py): "pops" = DFS+classify only,
    # "stage" = + staging/row machinery (no DMA, no eval), "stagefar" /
    # "stagenear" = just one staging branch (--split-stage prices the
    # far-COM and near-range scalar work separately), "dma" = + HBM
    # window DMAs (no eval), "full" = production.  Static: every
    # non-"full" branch traces away entirely in production.
    do_stage_far = debug_mode not in ("pops", "stagenear")
    do_stage_near = debug_mode not in ("pops", "stagefar")
    do_dma = debug_mode in ("dma", "full")
    do_eval = debug_mode == "full"
    (_SP, NSRC, NRNG, ROWS, PEND_S, PEND_E, POPS, NNEAR, TSRC, OVF,
     TROWS, AFAR, PKR, PKL) = range(14)
    FR0 = 16  # st[FR0 + d] = frontier count for level d
    fch = fcap // 128
    g = pl.program_id(0)
    b_sz = pg_ref.shape[2]
    lanes = lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    # Multiple groups per grid program: the pallas per-program pipeline
    # overhead measured ~150 us on this chip REGARDLESS of body content
    # (a zero-work kernel over 1720 programs costs 256 ms — the round-2
    # 'pop floor' was mostly this).  Amortize it by giving each program
    # gpp groups; scratch is reused, per-group state re-zeroed.
    for gg in range(gpp):
        if debug_mode == "none":
            # floor probe: only the block pipeline + a dummy write
            acc_ref[gg] = pg_ref[gg]
            stats_ref[gg] = jnp.zeros_like(stats_ref[gg])
            continue
        if True:
            for k in range(16 + ld + 2):
                st[k] = 0
            ax[...] = jnp.zeros_like(ax)
            ay[...] = jnp.zeros_like(ay)
            az[...] = jnp.zeros_like(az)
            if df:
                axl[...] = jnp.zeros_like(axl)
                ayl[...] = jnp.zeros_like(ayl)
                azl[...] = jnp.zeros_like(azl)
            # fresh scratch can hold NaN bit patterns; a NaN coordinate row would
            # poison the whole accumulation through 0 * NaN — zero it all
            srcacc[...] = jnp.zeros_like(srcacc)
            rngc[...] = jnp.zeros_like(rngc)

            pgb = jnp.transpose(pg_ref[gg])  # (C, B) -> (B, C)
            if df:
                # pre-negated df i-coordinates: the eval chain computes
                # dx = source + (-pos_i) with one _df_add
                nxh, nxl = -pgb[:, 0:1], -pgb[:, 1:2]
                nyh, nyl = -pgb[:, 2:3], -pgb[:, 3:4]
                nzh, nzl = -pgb[:, 4:5], -pgb[:, 5:6]
                # the MAC classifies against the f32 hi halves (the MAC is
                # a decision rule, not force arithmetic; the twin oracle
                # replicates the same f32 decision)
                xi, yi, zi = pgb[:, 0:1], pgb[:, 2:3], pgb[:, 4:5]
            else:
                xi, yi, zi = pgb[:, 0:1], pgb[:, 1:2], pgb[:, 2:3]

            # ---- eval: branch-free chained loop over PACKED source rows ---------
            def chain(r):
                sxr = pk[r, 0:1, :]
                syr = pk[r, 1:2, :]
                szr = pk[r, 2:3, :]
                sgr = pk[r, 3:4, :]
                dx = sxr - xi  # (B, 128)
                dy = syr - yi
                dz = szr - zi
                r2 = dx * dx + dy * dy + dz * dz + eps2
                inv = lax.rsqrt(r2)
                w = sgr * (inv * inv * inv)
                return w * dx, w * dy, w * dz

            def chain_df(r):
                # full compensated-f32x2 pair pipeline (ops/pallas_df.py
                # primitives) against one packed (8, 128) source row
                d_x = _df_add(pk[r, 0:1, :], pk[r, 1:2, :], nxh, nxl)
                d_y = _df_add(pk[r, 2:3, :], pk[r, 3:4, :], nyh, nyl)
                d_z = _df_add(pk[r, 4:5, :], pk[r, 5:6, :], nzh, nzl)
                r2 = _df_sqr(*d_x)
                r2 = _df_add(*r2, *_df_sqr(*d_y))
                r2 = _df_add(*r2, *_df_sqr(*d_z))
                r2 = _df_add(*r2, eps2, eps2_lo)
                y = _df_rsqrt(*r2)
                y3 = _df_mul(*_df_sqr(*y), *y)
                w = _df_mul(pk[r, 6:7, :], pk[r, 7:8, :], *y3)
                return _df_mul(*w, *d_x), _df_mul(*w, *d_y), _df_mul(*w, *d_z)

            def brow4(q, _):
                # `chains` independent rows per iteration: one row's
                # 17-op chain is serial, so a single-row loop can't fill
                # the VPU's parallel ALUs (round-4 A/B: 175 -> 129 ms at
                # 1M); independent chains give the scheduler ILP, and the
                # tree-sum cuts the (B, 128) accumulator read-modify-
                # writes by `chains` x.  (Full 16-row unroll measured
                # 1.5x SLOWER in round 3 — it blew the scoped-VMEM stack
                # and the schedule.)  Accumulate in (B, 128) and reduce
                # ONCE at kernel end: per-row cross-lane reductions were
                # the round-1 eval cost.
                r0 = q * chains
                if df:
                    parts = [chain_df(r0 + c) for c in range(chains)]
                    while len(parts) > 1:
                        nxt = [
                            tuple(
                                _df_add(*a[k], *b[k]) for k in range(3)
                            )
                            for a, b in zip(parts[0::2], parts[1::2])
                        ]
                        if len(parts) % 2:
                            nxt.append(parts[-1])
                        parts = nxt
                    fx, fy, fz = parts[0]
                    h, lo = _df_add(ax[...], axl[...], *fx)
                    ax[...], axl[...] = h, lo
                    h, lo = _df_add(ay[...], ayl[...], *fy)
                    ay[...], ayl[...] = h, lo
                    h, lo = _df_add(az[...], azl[...], *fz)
                    az[...], azl[...] = h, lo
                else:
                    xs, ys, zs = zip(*[chain(r0 + c) for c in range(chains)])
                    ax[...] += sum(xs[1:], xs[0])
                    ay[...] += sum(ys[1:], ys[0])
                    az[...] += sum(zs[1:], zs[0])
                return 0

            def ztail(r, _):
                # neutralize tail rows up to the chain multiple: gm = 0
                # kills finite contributions, coords at 1e20 make r2
                # overflow to inf so inv = 0 even at eps2 = 0 (no
                # 0 * inf = NaN path).  ALL coordinate rows must be
                # written — fresh scratch can hold NaN bit patterns and
                # one NaN coordinate poisons r2 through 0 * NaN.
                # df mode uses 1e16 instead: the Dekker split inside
                # _df_sqr/_df_mul multiplies by 4097, so r2 must stay
                # below ~8e34 to keep the split finite (1e16 -> r2 ~
                # 3e32; forces still vanish through gm = 0 exactly).
                zero = jnp.zeros((1, 128), jnp.float32)
                if df:
                    big = jnp.full((1, 128), 1e16, jnp.float32)
                    for c in (0, 2, 4):
                        pk[r, c : c + 1, :] = big
                    for c in (1, 3, 5, 6, 7):
                        pk[r, c : c + 1, :] = zero
                else:
                    big = jnp.full((1, 128), 1e20, jnp.float32)
                    pk[r, 0:1, :] = big
                    pk[r, 1:2, :] = big
                    pk[r, 2:3, :] = big
                    pk[r, 3:4, :] = zero
                return 0

            def eval_pk(k):
                """Evaluate the first k packed rows (k may be traced)."""
                st[TROWS] = st[TROWS] + k
                if do_eval:
                    nq = (k + chains - 1) // chains
                    lax.fori_loop(k, nq * chains, ztail, 0)
                    lax.fori_loop(0, nq, brow4, 0)

            # ---- burst: lane-pack staged rows into dense eval rows ---------------
            # Round-4 packing: the staged rows are only ~58% occupied at 1M
            # (near windows are 128-aligned slices of runs averaging ~1.5
            # windows, far slots ship 8-wide with gm = 0 fillers at ~83%
            # fill — measured via the S_ROWS/S_FAR receipts).  Eval cost is
            # per-ROW, so filler lanes cost real time.  Each staged row's
            # live segment [ms, me) is cyclically rolled so it lands at the
            # packed write cursor and accumulated into the dense pk buffer;
            # out-of-segment lanes are simply never written, which also
            # retires the per-row gm lane mask the eval used to pay.  Only
            # FULL 128-lane rows reach the eval loop (plus one partial at
            # group drain).
            def pack_row(r, _):
                if do_dma and not interpret_gather:
                    @pl.when(rowmeta[r, 0] == 1)
                    def _():
                        # wait the body-window DMA for this row (descriptor
                        # shape matches; offsets irrelevant for the wait)
                        pltpu.make_async_copy(
                            ps_ref.at[:, pl.ds(0, 128)],
                            src.at[r],
                            sems.at[r],
                        ).wait()
                ms, me = rowmeta[r, 1], rowmeta[r, 2]
                ln = me - ms
                plane = st[PKL]
                prow = st[PKR]
                end = plane + ln
                rolled = pltpu.roll(src[r], (plane - ms) & 127, axis=1)
                pk[prow] = jnp.where(
                    (lanes >= plane) & (lanes < end), rolled, pk[prow]
                )

                @pl.when(end >= 128)
                def _():
                    nx = prow + 1

                    @pl.when(nx == rb)
                    def _():
                        eval_pk(rb)

                    p2 = jnp.where(nx == rb, 0, nx)
                    st[PKR] = p2

                    @pl.when(end > 128)
                    def _():
                        # cyclic roll wraps the tail lanes to the row start
                        pk[p2] = jnp.where(lanes < end - 128, rolled, pk[p2])

                st[PKL] = end & 127
                return 0

            def burst():
                lax.fori_loop(0, st[ROWS], pack_row, 0)
                st[ROWS] = 0

            def drain_pk():
                plane = st[PKL]
                prow = st[PKR]

                @pl.when(plane > 0)
                def _():
                    # neutralize the partial row's unwritten tail lanes
                    # (stale scratch can hold NaNs — see ztail)
                    live = lanes < plane
                    zero = jnp.zeros((1, 128), jnp.float32)
                    if df:
                        big = jnp.full((1, 128), 1e16, jnp.float32)
                        for c in (0, 2, 4):
                            pk[prow, c : c + 1, :] = jnp.where(
                                live, pk[prow, c : c + 1, :], big
                            )
                        for c in (1, 3, 5, 6, 7):
                            pk[prow, c : c + 1, :] = jnp.where(
                                live, pk[prow, c : c + 1, :], zero
                            )
                    else:
                        big = jnp.full((1, 128), 1e20, jnp.float32)
                        pk[prow, 0:1, :] = jnp.where(
                            live, pk[prow, 0:1, :], big
                        )
                        pk[prow, 1:2, :] = jnp.where(
                            live, pk[prow, 1:2, :], big
                        )
                        pk[prow, 2:3, :] = jnp.where(
                            live, pk[prow, 2:3, :], big
                        )
                        pk[prow, 3:4, :] = jnp.where(
                            live, pk[prow, 3:4, :], zero
                        )

                eval_pk(prow + jnp.where(plane > 0, 1, 0))
                st[PKR] = 0
                st[PKL] = 0

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
                # interpret mode: every emulated DMA costs ~ms on the CPU
                # host (it spawns a copy thread); direct ref copies are the
                # same semantics there.  Applies to every small scratch
                # copy below.
                if interpret_gather:
                    src[row] = srcacc[...]
                else:
                    cp = pltpu.make_async_copy(srcacc, src.at[row], vsem.at[2])
                    cp.start()
                    cp.wait()
                rowmeta[row, 0] = 0
                rowmeta[row, 1] = 0
                # the drain-time partial COM row packs only its written
                # slots; staging-time flushes always carry a full 128
                # (st[NSRC] is a multiple of 128 there)
                rowmeta[row, 2] = ((st[NSRC] - 1) & 127) + 1
                # zero the G*mass staging rows so partially-staged slots
                # stay inert (stale coordinates are harmless at gm = 0)
                if df:
                    srcacc[6:8, :] = jnp.zeros((2, 128), jnp.float32)
                else:
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
                    if do_dma and interpret_gather:
                        src[row] = ps_ref[:, pl.ds(wa, 128)]
                    elif do_dma:
                        pltpu.make_async_copy(
                            ps_ref.at[:, pl.ds(wa, 128)], src.at[row], sems.at[row]
                        ).start()
                    rowmeta[row, 0] = 1 if (do_dma and not interpret_gather) else 0
                    rowmeta[row, 1] = jnp.maximum(s - w, 0)
                    rowmeta[row, 2] = jnp.minimum(e - w, 128)
                    return w + 128

                lax.while_loop(wcond, wbody, (s >> 7) << 7)

            def bulk_ranges():
                # scalarize 128 staged (start, count) pairs with one DMA pair
                if interpret_gather:
                    rsm[0:1, :] = rngs[...]
                    rsm[1:2, :] = rngc[...]
                else:
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

            # ---- BFS level-synchronous traversal over octets ---------------------
            # The round-2 DFS popped one octet at a time: each pop paid dynamic
            # table rolls, a vector->scalar mask reduction, and the serial
            # dependency through the stack pointer -- measured 1.6 us/pop, 320 ms
            # of the 485 ms 1M step; batching pops (pop_batch) bought only 10 ms
            # because the cost is scalar-issue volume, not reduction latency.
            # The BFS frontier restructures the traversal so the vector unit
            # classifies 128 octets per instruction and the vector->scalar
            # boundary is crossed ONCE PER 128-OCTET CHUNK (a bulk bits DMA to
            # SMEM), not once per octet:
            #
            #   per level d (static python loop, ld <= 6):
            #     per chunk of <=128 frontier octets (while_loop, pure carry):
            #       1. scalar gather: two dynamic-sublane vector loads per octet
            #          copy its ft/it table rows into (128, 128) chunk buffers;
            #       2. vector classify: extract each row's octet quarter with
            #          static lane slices selected by q = id & 3 / e = id & 7
            #          (the frontier-id row rides an SMEM->VMEM DMA), run the MAC
            #          on (128, 8) arrays, pack far|open|near masks into one
            #          (1, 128) bits row;
            #       3. ONE DMA scalarizes the bits row into SMEM;
            #       4. scalar stage/push: per octet, far COMs and near ranges go
            #          through the unchanged staging machinery (reading classify
            #          values back from (128, 8) VMEM scratch at dynamic sublane
            #          offsets) and open children append to the next level's
            #          frontier (branchless clamped stores).
            #
            # Per-level processing keeps pushes in ascending Morton order, so
            # near-range runs still merge within a level; runs no longer merge
            # ACROSS levels (the DFS did), costing a few extra partially-filled
            # near windows -- noise next to the removed per-pop syncs.
            @pl.when((gcount_ref[g * gpp + gg] > 0) & (debug_mode != "none"))
            def _():
                fr[0, 0] = 0  # the root's children octet
                st[FR0] = 1
                rowid8 = lax.broadcasted_iota(jnp.int32, (128, 8), 0)
                l8r = lax.broadcasted_iota(jnp.int32, (128, 8), 1)

                for d in range(ld):
                    cnt_d = st[FR0 + d]  # final: level-d pushes happened at d-1
                    terminal = d + 1 >= ld

                    def ch_body(c0, d=d, cnt_d=cnt_d, terminal=terminal):
                        base = d * fch + (c0 >> 7)
                        k_here = jnp.minimum(cnt_d - c0, 128)

                        # frontier ids to VMEM for the vector q/e selects
                        if interpret_gather:
                            fidv[...] = fr[pl.ds(base, 1), :]
                        else:
                            cpf = pltpu.make_async_copy(
                                fr.at[pl.ds(base, 1), :], fidv, vsem.at[4]
                            )
                            cpf.start()
                            cpf.wait()

                        # 1. gather table rows from HBM: issue all DMAs, then
                        # wait — issued-early DMAs hide the HBM latency.  Dynamic
                        # trip count: a fixed 128-iteration loop pays bookkeeping
                        # for the guarded-off tail, and most chunks are far from
                        # full.  Interpret mode reads the rows directly (each
                        # emulated DMA costs ~ms on the CPU host; the tables are
                        # plain arrays there).
                        if interpret_gather:
                            def gath(i, _):
                                ot = fr[base, i]
                                gft[pl.ds(i, 1), :] = ft_ref[pl.ds(ot >> 2, 1), :]
                                if df:
                                    gftl[pl.ds(i, 1), :] = ftl_ref[
                                        pl.ds(ot >> 2, 1), :
                                    ]
                                git[pl.ds(i, 1), :] = it_ref[pl.ds(ot >> 3, 1), :]
                                return 0

                            lax.fori_loop(0, k_here, gath, 0)
                        else:
                            def gath(i, _):
                                ot = fr[base, i]
                                pltpu.make_async_copy(
                                    ft_ref.at[pl.ds(ot >> 2, 1), :],
                                    gft.at[pl.ds(i, 1), :], gsemf.at[i]).start()
                                if df:
                                    pltpu.make_async_copy(
                                        ftl_ref.at[pl.ds(ot >> 2, 1), :],
                                        gftl.at[pl.ds(i, 1), :],
                                        gsemf2.at[i]).start()
                                pltpu.make_async_copy(
                                    it_ref.at[pl.ds(ot >> 3, 1), :],
                                    git.at[pl.ds(i, 1), :], gsemi.at[i]).start()
                                return 0

                            lax.fori_loop(0, k_here, gath, 0)

                            def gwait(i, _):
                                # descriptor shapes match the starts; offsets are
                                # irrelevant for a wait
                                pltpu.make_async_copy(
                                    ft_ref.at[pl.ds(0, 1), :],
                                    gft.at[pl.ds(i, 1), :], gsemf.at[i]).wait()
                                if df:
                                    pltpu.make_async_copy(
                                        ftl_ref.at[pl.ds(0, 1), :],
                                        gftl.at[pl.ds(i, 1), :],
                                        gsemf2.at[i]).wait()
                                pltpu.make_async_copy(
                                    it_ref.at[pl.ds(0, 1), :],
                                    git.at[pl.ds(i, 1), :], gsemi.at[i]).wait()
                                return 0

                            lax.fori_loop(0, k_here, gwait, 0)

                        # 2. vector classify on (128, 8)
                        fid = fidv[...]
                        q1 = jnp.transpose(fid & 3)  # (128, 1)
                        e1 = jnp.transpose(fid & 7)

                        def sel4(off):
                            r = gft[:, 96 + off : 104 + off]
                            for q in (2, 1, 0):
                                r = jnp.where(
                                    q1 == q, gft[:, 32 * q + off : 32 * q + off + 8], r
                                )
                            return r

                        cx8 = sel4(0)
                        cy8 = sel4(8)
                        cz8 = sel4(16)
                        gm8 = sel4(24)

                        def sel8(off):
                            r = git[:, 112 + off : 120 + off]
                            for e in (6, 5, 4, 3, 2, 1, 0):
                                r = jnp.where(
                                    e1 == e, git[:, 16 * e + off : 16 * e + off + 8], r
                                )
                            return r

                        st8 = sel8(0)
                        ct8 = sel8(8)

                        ddx = cx8 - jnp.clip(cx8, lox, hix)
                        ddy = cy8 - jnp.clip(cy8, loy, hiy)
                        ddz = cz8 - jnp.clip(cz8, loz, hiz)
                        d2 = ddx * ddx + ddy * ddy + ddz * ddz
                        valid = rowid8 < k_here
                        exists = (ct8 > 0) & valid
                        far8 = exists & (theta_sq * d2 > bsq_ref[d + 1])
                        near8 = exists & ~far8 & ((ct8 <= leaf_cap) | terminal)
                        open8 = exists & ~far8 & ~near8

                        # occupancy receipt: ACTUAL far children staged (the
                        # staging machinery ships whole 8-slots with gm = 0
                        # fillers; S_SRC - S_FAR is the filler volume).
                        # NOT a bare scalar jnp.sum: Mosaic lowers scalar
                        # reductions through a lower_fun proxy that
                        # re-traces jnp.sum under the AMBIENT config — in
                        # an x64 session (--dtype f64) the i32 sum then
                        # promotes to i64 and Mosaic raises "64-bit types
                        # are not supported".  Reduce to a non-scalar
                        # (1,) first (direct multi_reduction path), then
                        # squeeze (vector.ExtractOp) — the proxy's own
                        # recipe, but traced here under our x64-off scope.
                        st[AFAR] = st[AFAR] + jnp.squeeze(
                            jnp.sum(
                                far8.astype(jnp.int32)[jnp.newaxis, ...],
                                axis=(1, 2),
                            )
                        )
                        gm8f = jnp.where(far8, gm8, 0.0)
                        if df:
                            def sel4l(off):
                                r = gftl[:, 96 + off : 104 + off]
                                for q in (2, 1, 0):
                                    r = jnp.where(
                                        q1 == q,
                                        gftl[:, 32 * q + off : 32 * q + off + 8],
                                        r,
                                    )
                                return r

                            cxl8 = sel4l(0)
                            cyl8 = sel4l(8)
                            czl8 = sel4l(16)
                            gml8f = jnp.where(far8, sel4l(24), 0.0)
                        if not far_vector:
                            # scalar-staging path keeps the classify values
                            # in VMEM scratch for sp_loop's dynamic-sublane
                            # reads
                            gcx[...] = cx8
                            gcy[...] = cy8
                            gcz[...] = cz8
                            gfgm[...] = gm8f
                            if df:
                                gcxl[...] = cxl8
                                gcyl[...] = cyl8
                                gczl[...] = czl8
                                gfgml[...] = gml8f
                        gst[...] = st8
                        gnct[...] = jnp.where(near8, ct8, 0)

                        if far_vector and do_stage_far:
                            # ---- vectorized far staging (round 5) ----
                            # The round-4 split bisect priced the per-octet
                            # scalar far branch at ~34 ms of the 1M step —
                            # scalar-issue volume, not vector work (the
                            # round-3 pop-loop lesson).  Sources are an
                            # unordered bag, so compact the chunk's far
                            # octets with an MXU one-hot matmul instead:
                            #   dest[i] = (#far octets at or before i) - 1
                            #   W[s, i] = [dest[i] == s and octet i far]
                            #   comp    = W @ [cx8 | cy8 | cz8 | gm8f]
                            # Each comp row has exactly ONE contributing
                            # term, so even the 6-pass f32 matmul
                            # (Precision.HIGHEST) reproduces the f32 values
                            # exactly.  Transposing each (128, 8) channel
                            # block to (8, 128) turns child j of every far
                            # octet into lane s of row j — 8 source rows
                            # per chunk, each with live segment [0, kf),
                            # handed to the same pack machinery as near
                            # windows.  Scalar work drops from ~k_far
                            # branchy iterations to 8 row emissions.
                            fany = jnp.sum(
                                far8.astype(jnp.int32), axis=1, keepdims=True
                            ) > 0  # (128, 1) octet has >= 1 far child
                            faf = fany.astype(jnp.float32)
                            r128 = lax.broadcasted_iota(
                                jnp.int32, (128, 128), 0
                            )
                            c128 = lax.broadcasted_iota(
                                jnp.int32, (128, 128), 1
                            )
                            ltri = (c128 <= r128).astype(jnp.float32)
                            # inclusive cumsum over octets: counts <= 128
                            # are exact in any matmul precision
                            cum8 = lax.dot_general(
                                ltri, pltpu.repeat(faf, 8, axis=1),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # (128, 8), all columns equal
                            dest = jnp.transpose(cum8[:, 0:1]) - 1.0
                            W = (
                                (r128.astype(jnp.float32) == dest)
                                & (jnp.transpose(faf) > 0)
                            ).astype(jnp.float32)
                            # the contraction runs over ALL 128 columns:
                            # rows >= k_here hold stale (possibly NaN)
                            # gathered-scratch values, and 0 * NaN = NaN
                            # poisons every compacted row — zero them
                            # (the scalar path never read them; gm8f is
                            # already far8-masked)
                            if df:
                                chans8 = (cx8, cxl8, cy8, cyl8,
                                          cz8, czl8, gm8f, gml8f)
                            else:
                                chans8 = (cx8, cy8, cz8, gm8f)
                            chans8 = tuple(
                                jnp.where(valid, c, 0.0) for c in chans8
                            )
                            comp = lax.dot_general(
                                W, jnp.concatenate(chans8, axis=1),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST,
                            )  # (128, 8 * C)
                            tch = [
                                jnp.transpose(comp[:, 8 * c : 8 * c + 8])
                                for c in range(len(chans8))
                            ]  # C x (8, 128)
                            # Stage the 8 rows into scratch BEFORE any
                            # alloc_row/burst call site: the eval loop is
                            # instantiated inside burst(), and tracing it
                            # where the (128,128) matmul temps are live
                            # wrecked its schedule (+108 ms of eval at 1M
                            # with identical eval_rows receipts).  The
                            # stores end the temps' live ranges; emission
                            # below touches only the scratch ref + one
                            # scalar.
                            for j in range(8):
                                fvs[j] = jnp.concatenate(
                                    [t[j : j + 1, :] for t in tch], axis=0
                                )
                            kf = jnp.squeeze(
                                jnp.sum(
                                    fany.astype(jnp.int32)[jnp.newaxis, ...],
                                    axis=(1, 2),
                                )
                            )

                            @pl.when(kf > 0)
                            def _():
                                st[TSRC] = st[TSRC] + 8 * kf
                                # ONE burst call site, then bare row
                                # appends in a dynamic loop: a static
                                # 8-way alloc_row unroll instantiated
                                # the entire eval pipeline 8x in this
                                # trace (burst -> eval_pk -> chains) and
                                # cost +110 ms of eval at 1M with
                                # identical eval_rows
                                assert rb >= 8, "burst_rows must be >= 8"

                                @pl.when(st[ROWS] + 8 > rb)
                                def _():
                                    burst()

                                def emit(j, _):
                                    row = st[ROWS]
                                    st[ROWS] = row + 1
                                    src[row] = fvs[j]
                                    rowmeta[row, 0] = 0
                                    rowmeta[row, 1] = 0
                                    rowmeta[row, 2] = kf
                                    return 0

                                lax.fori_loop(0, 8, emit, 0)
                        bits128 = jnp.sum(
                            jnp.where(far8, jnp.int32(1) << l8r, 0)
                            + jnp.where(open8, jnp.int32(1) << (l8r + 8), 0)
                            + jnp.where(near8, jnp.int32(1) << (l8r + 16), 0),
                            axis=1,
                            keepdims=True,
                        )  # (128, 1)
                        bvm[...] = jnp.transpose(bits128)

                        # 3. one bulk scalarization per chunk
                        if interpret_gather:
                            bsm[...] = bvm[...]
                        else:
                            cpb = pltpu.make_async_copy(bvm, bsm, vsem.at[3])
                            cpb.start()
                            cpb.wait()
                        st[POPS] = st[POPS] + k_here

                        # 4. scalar stage/push
                        def sp_loop(i, _, d=d):
                            if True:  # dynamic trip count (see gather loop)
                                bits = bsm[0, i]

                                if not far_vector:
                                    @pl.when(((bits & 0xFF) > 0)
                                             & do_stage_far)
                                    def _():  # -- far COMs --
                                        nsrc = st[NSRC]
                                        m = (lanes >> 3) == ((nsrc >> 3) & 15)
                                        if df:
                                            chans = (
                                                gcx, gcxl, gcy, gcyl,
                                                gcz, gczl, gfgm, gfgml,
                                            )
                                        else:
                                            chans = (gcx, gcy, gcz, gfgm)
                                        for c, arr in enumerate(chans):
                                            srcacc[c : c + 1, :] = jnp.where(
                                                m,
                                                pltpu.repeat(
                                                    arr[pl.ds(i, 1), :],
                                                    16, axis=1,
                                                ),
                                                srcacc[c : c + 1, :],
                                            )
                                        st[NSRC] = nsrc + 8
                                        st[TSRC] = st[TSRC] + 8

                                        @pl.when(((nsrc + 8) & 127) == 0)
                                        def _():
                                            flush_com_row()

                                @pl.when(((bits >> 16) > 0) & do_stage_near)
                                def _():  # -- near ranges --
                                    nr = st[NRNG]
                                    m = (lanes >> 3) == ((nr >> 3) & 15)
                                    rngs[...] = jnp.where(
                                        m,
                                        pltpu.repeat(gst[pl.ds(i, 1), :], 16, axis=1),
                                        rngs[...],
                                    )
                                    rngc[...] = jnp.where(
                                        m,
                                        pltpu.repeat(gnct[pl.ds(i, 1), :], 16, axis=1),
                                        rngc[...],
                                    )
                                    st[NRNG] = nr + 8

                                    @pl.when(((nr + 8) & 127) == 0)
                                    def _():
                                        bulk_ranges()

                                @pl.when(((bits >> 8) & 0xFF) > 0)
                                def _():
                                    # pushes: branchless clamped stores -- a
                                    # non-hit store is overwritten or never read;
                                    # any store made at cnt >= fcap corrupts and
                                    # is flagged after the level loop.  Ascending
                                    # child order keeps near runs mergeable.
                                    ot = fr[base, i]
                                    ob = ooff_ref[d + 1] + 8 * (ot - ooff_ref[d])
                                    obits = (bits >> 8) & 0xFF
                                    cnt1 = st[FR0 + d + 1]
                                    for c in range(8):
                                        hit = (obits >> c) & 1
                                        fr[
                                            (d + 1) * fch
                                            + jnp.minimum(cnt1 >> 7, fch - 1),
                                            cnt1 & 127,
                                        ] = ob + c
                                        cnt1 = cnt1 + hit
                                    st[FR0 + d + 1] = cnt1

                            return 0

                        lax.fori_loop(0, k_here, sp_loop, 0)
                        return c0 + 128

                    lax.while_loop(lambda c0: c0 < cnt_d, ch_body, 0)

                for d in range(1, ld + 1):
                    # record the NEEDED frontier size, not a flag: the
                    # counter free-runs past fcap (stores are clamped), so
                    # the fail-fast probe can prescribe the exact
                    # --bh-frontier-cap that fits (lower bound once a
                    # level has corrupted, hence "at least" in messages)

                    @pl.when(st[FR0 + d] >= fcap)
                    def _():
                        st[OVF] = jnp.maximum(st[OVF], st[FR0 + d])

                # drain: staged ranges -> pending -> windows; partial COM row; eval
                bulk_ranges()
                flush_pending()
                st[PEND_S] = 0
                st[PEND_E] = 0

                if not far_vector:
                    @pl.when((st[NSRC] & 127) != 0)
                    def _():
                        flush_com_row()

                burst()
                drain_pk()

            if df:
                # compensated binary-halving lane reduction (a plain f32
                # hi-sum would cost the entire df gain — pallas_df's
                # measured 1.4e-7 lesson)
                xh, xl = _df_lane_reduce(ax[...], axl[...])
                yh, yl = _df_lane_reduce(ay[...], ayl[...])
                zh, zl = _df_lane_reduce(az[...], azl[...])
                zero = jnp.zeros_like(xh)
                acc_ref[gg] = jnp.transpose(
                    jnp.concatenate(
                        [xh, yh, zh, zero, xl, yl, zl, zero], axis=1
                    )
                )
            else:
                axs = jnp.sum(ax[...], axis=1, keepdims=True)
                ays = jnp.sum(ay[...], axis=1, keepdims=True)
                azs = jnp.sum(az[...], axis=1, keepdims=True)
                acc_ref[gg] = jnp.transpose(
                    jnp.concatenate(
                        [axs, ays, azs, jnp.zeros_like(axs)], axis=1
                    )
                )
            # one vector write per program: SMEM stats arrays scale with the
            # group count and overflow the 1 MB SMEM budget at 10M+ bodies
            stats_ref[gg] = (
                jnp.where(lanes == S_POPS, st[POPS], 0)
                + jnp.where(lanes == S_SRC, st[TSRC], 0)
                + jnp.where(lanes == S_NEAR, st[NNEAR], 0)
                + jnp.where(lanes == S_OVF, st[OVF], 0)
                + jnp.where(lanes == S_ROWS, st[TROWS], 0)
                + jnp.where(lanes == S_FAR, st[AFAR], 0)
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
    frontier_cap: int = FRONTIER_CAP,
    groups_per_program: int = 8,
    interpret: bool = False,
    debug_mode: str = "full",
    ftl=None,
    df: bool = False,
    far_vector: bool = True,
):
    """Run the fused kernel on planar (G,C,B) groups: planar
    accelerations + (G,8) stats.  C = 4 f32 rows [x; y; z; gm] by
    default; with `df` (and `ftl`, the low-half float table) the groups
    carry 8 df channels and the eval runs the compensated-f32x2
    pipeline — returns (G,8,B) with hi rows 0..2 / lo rows 4..6 (else
    (G,3,B)).  debug_mode != "full" disables stages for hardware cost
    bisection (tools/profile_fused_stages.py) — the returned
    accelerations are then meaningless."""
    n_groups, c_ch, b = pg.shape
    assert c_ch == (8 if df else 4), (c_ch, df)
    chains = EVAL_CHAINS_DF if df else EVAL_CHAINS
    # the eval loop consumes `chains` rows per iteration (ztail pads up
    # to the multiple), so the row buffer must be sized accordingly
    rb = -(-int(burst_rows) // chains) * chains
    fcap = -(-int(frontier_cap) // 128) * 128
    fch = fcap // 128
    # groups per program: the per-program pipeline overhead is ~150 us on
    # the tunneled v5e regardless of kernel content (measured, round 3),
    # so one program handles gpp groups and the fixed cost amortizes.
    gpp = max(1, min(int(groups_per_program), n_groups))
    g_pad = -(-n_groups // gpp) * gpp
    if g_pad != n_groups:
        pg = jnp.pad(pg, ((0, g_pad - n_groups), (0, 0), (0, 0)))
        gcount = jnp.pad(gcount, (0, g_pad - n_groups))
    grid = (g_pad // gpp,)
    import numpy as np

    eps2_hi = float(np.float32(eps2))
    eps2_lo = float(np.float32(float(eps2) - eps2_hi)) if df else 0.0
    if ftl is None:
        ftl = jnp.zeros((1, 128), jnp.float32)  # inert non-df placeholder
    kern = functools.partial(
        _fused_kernel,
        theta_sq=float(theta) * float(theta),
        eps2=eps2_hi if df else float(eps2),
        eps2_lo=eps2_lo,
        leaf_cap=int(leaf_cap),
        ld=int(ld),
        rb=rb,
        fcap=fcap,
        gpp=gpp,
        chains=chains,
        df=bool(df),
        interpret_gather=bool(interpret),
        debug_mode=debug_mode,
        far_vector=bool(far_vector),
    )
    # df-only scratch collapses to minimal tiles in f32 mode (unused refs
    # cost their allocation, nothing else)
    dfb = b if df else 8
    dfg = 128 if df else 8
    # The kernel body is written in i32-default arithmetic; under
    # jax_enable_x64 (the --dtype f64 sessions that reach the df mode)
    # every bare Python int literal would trace as i64 and Mosaic's
    # convert-to-i64 helper recurses to a RecursionError (measured on
    # chip, round 5).  All operands and outputs here are f32/i32, so
    # trace the pallas_call under x64-disabled promotion semantics.
    with jax.enable_x64(False):
        acc, stats = _fused_pallas_call(
            kern, grid, gpp, c_ch, b, g_pad, rb, fch, ld, dfb, dfg,
            interpret,
        )(gcount, bsq, ooff, ft, ftl, it, pg, ps)
    if df:
        return acc[:n_groups], stats[:n_groups, 0, :8]
    return acc[:n_groups, :3, :], stats[:n_groups, 0, :8]


def _fused_pallas_call(
    kern, grid, gpp, c_ch, b, g_pad, rb, fch, ld, dfb, dfg, interpret
):
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # ft/it stay in HBM (ANY): as VMEM pipeline operands they
            # were double-buffered (2 x 7.2 MB, VMEM OOM at ld=6 with
            # multi-group blocks) and re-fetched per grid step — measured
            # ~150 us/program of pure overhead (the round-2 "pop floor").
            # The BFS gather DMAs exactly the frontier's rows instead.
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((gpp, c_ch, b), lambda g: (g, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((gpp, c_ch, b), lambda g: (g, 0, 0)),
            pl.BlockSpec((gpp, 1, 128), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g_pad, c_ch, b), jnp.float32),
            jax.ShapeDtypeStruct((g_pad, 1, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((32,), jnp.int32),
            pltpu.SMEM(((int(ld) + 1) * fch, 128), jnp.int32),
            pltpu.SMEM((1, 128), jnp.int32),
            pltpu.SMEM((rb, 4), jnp.int32),
            pltpu.SMEM((2, 128), jnp.int32),
            pltpu.VMEM((c_ch, 128), jnp.float32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.VMEM((rb, c_ch, 128), jnp.float32),
            pltpu.VMEM((rb, c_ch, 128), jnp.float32),
            pltpu.VMEM((b, 128), jnp.float32),
            pltpu.VMEM((b, 128), jnp.float32),
            pltpu.VMEM((b, 128), jnp.float32),
            pltpu.VMEM((dfb, 128), jnp.float32),  # axl
            pltpu.VMEM((dfb, 128), jnp.float32),  # ayl
            pltpu.VMEM((dfb, 128), jnp.float32),  # azl
            pltpu.VMEM((128, 128), jnp.float32),
            pltpu.VMEM((dfg, 128), jnp.float32),  # gftl
            pltpu.VMEM((128, 128), jnp.int32),
            pltpu.VMEM((128, 8), jnp.float32),
            pltpu.VMEM((128, 8), jnp.float32),
            pltpu.VMEM((128, 8), jnp.float32),
            pltpu.VMEM((128, 8), jnp.float32),
            pltpu.VMEM((dfg, 8), jnp.float32),  # gcxl
            pltpu.VMEM((dfg, 8), jnp.float32),  # gcyl
            pltpu.VMEM((dfg, 8), jnp.float32),  # gczl
            pltpu.VMEM((dfg, 8), jnp.float32),  # gfgml
            pltpu.VMEM((128, 8), jnp.int32),
            pltpu.VMEM((128, 8), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.VMEM((8, c_ch, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((128,)),
            pltpu.SemaphoreType.DMA((128,)),
            pltpu.SemaphoreType.DMA((128,)),
            pltpu.SemaphoreType.DMA((rb,)),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # df mode: the compensated pair pipeline holds ~2x32 live
            # (B, 128) f32 temporaries across its two chains — the
            # scoped-VMEM stack needs 23.4 MB at B=1024 (measured on
            # chip) vs the 16 MB default limit.  v5e carries 128 MB of
            # VMEM; raise the cap for the df kernel only.
            vmem_limit_bytes=96 * 1024 * 1024 if c_ch == 8 else None,
        ),
        interpret=interpret,
    )


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
        "keep_groups",
        "frontier_cap",
        "interpret",
        "return_stats",
        "debug_mode",
        "far_vector",
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
    keep_groups: int = 0,
    frontier_cap: int = 0,
    interpret: bool = False,
    return_stats: bool = False,
    debug_mode: str = "full",
    far_vector: bool = True,
    border=None,
):
    """Barnes-Hut accelerations through the fused Pallas kernel (ForceFn
    signature).  f32 compute; exact (not COM-merged) forces for clusters
    denser than the grid's terminal resolution.

    `border` overrides the root-cube size (barneshut_fused_robust):
    out-of-cube bodies coarse-bin into edge cells — only sound if they
    carry zero mass (the robust wrapper's contract)."""
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

    perm, keys, border = morton_sort(pos, depth, border=border)
    pos_s = pos[perm].astype(jnp.float32)
    gm_s = (jnp.asarray(G, jnp.float32) * mass[perm]).astype(jnp.float32)
    keys_s = keys[perm]

    tree = build_grid(pos_s, gm_s, keys_s, depth, ld)
    ft, it = pack_tables(tree, ld)

    gstart, gcount, group_idx, group_valid = group_bodies(
        keys_s, n, depth, b, sl
    )
    # HBM-budget-aware group capacity + predictive fit check (the TPU
    # analog of the reference's free-VRAM pool sizing,
    # cuda/barnes-hut.cu:886-890 — see core/capacity.py for the contract)
    from nbody_tpu.core import capacity as _cap

    budget = _cap.budget_bytes()
    keep = keep_groups or _cap.auto_keep(n, b, gstart.shape[0], budget)
    keep = min(keep, gstart.shape[0])
    _cap.ensure_fits(
        _cap.estimate_fused_bytes(n, b, keep, ld),
        f"fused Barnes-Hut at n={n}",
        budget=budget,
    )
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
        frontier_cap=frontier_cap or FRONTIER_CAP,
        interpret=interpret,
        debug_mode=debug_mode,
        far_vector=far_vector,
    )

    # ONE composed scatter group-layout -> original order: the round-2
    # two-hop (scatter to sorted order, then scatter through perm) paid
    # two operand-proportional scatters (~155 ms at 1M, tools/profile_bh);
    # composing the permutations replaces one of them with a cheap 1-D
    # gather.  Valid slots have disjoint destinations (group ranges are
    # disjoint in sorted order, perm is a bijection).
    final_dest = jnp.where(
        group_valid, perm[jnp.clip(group_idx, 0, n - 1)], n
    )
    acc = (
        jnp.zeros((n, 3), jnp.float32)
        .at[final_dest.reshape(-1)]
        .set(jnp.transpose(acc_g, (0, 2, 1)).reshape(-1, 3), mode="drop")
        .astype(dtype)
    )

    if return_stats:
        return acc, {
            # volume diagnostics sum in f32: per-group counts fit i32, but
            # the totals pass 2^31 at 10M-scale clustered inputs (~0.01%
            # rounding is irrelevant for reporting; nothing consumes these
            # for capacity decisions)
            "pops": jnp.sum(stats[:, S_POPS].astype(jnp.float32)),
            "staged_sources": jnp.sum(stats[:, S_SRC].astype(jnp.float32)),
            "near_bodies": jnp.sum(stats[:, S_NEAR].astype(jnp.float32)),
            "frontier_overflow": jnp.max(stats[:, S_OVF]),
            "trimmed_groups": trimmed,
            # occupancy receipts (round 4): eval volume = rows * 128 lanes;
            # actual sources = far_children + near_bodies; the difference
            # is gm = 0 filler (8-slot far padding + window edges)
            "eval_rows": jnp.sum(stats[:, S_ROWS].astype(jnp.float32)),
            "far_children": jnp.sum(stats[:, S_FAR].astype(jnp.float32)),
        }
    return acc


def check_fused(pos, mass, robust: bool = False, **kw):
    """Fail-fast probe for the fused path (the analog of
    barneshut.check_capacities): one force eval, raising CapacityError if
    the BFS frontier overflowed or occupied groups were trimmed — the only
    two static capacities this path has (there are no interaction lists).
    The overflow stats carry the MEASURED requirement, so the message
    prescribes the exact flag value that fits (the TPU counterpart of the
    reference's free-VRAM pool sizing, cuda/barnes-hut.cu:886-890).
    `robust` probes through barneshut_fused_robust instead, so an
    outlier-heavy run is checked against the cube it will actually use.
    Returns the stats dict."""
    from nbody_tpu.core import capacity as _cap
    from nbody_tpu.ops.barneshut import CapacityError

    fn = barneshut_fused_robust if robust else barneshut_fused
    _, stats = fn(pos, mass, return_stats=True, **kw)
    fovf = int(stats["frontier_overflow"])
    trimmed = int(stats["trimmed_groups"])
    fixes = []
    if fovf > 0:
        need = -(-max(fovf + 1, FRONTIER_CAP) // 128) * 128
        fixes.append(
            f"frontier overflow (a level needed >= {fovf} octets): pass "
            f"--bh-frontier-cap {need}"
        )
    if trimmed > 0:
        b = kw.get("group_size", 1024)
        keep = kw.get("keep_groups", 0) or _cap.auto_keep(
            pos.shape[0], b, 10**9, _cap.budget_bytes()
        )
        fixes.append(
            f"{trimmed} occupied groups trimmed: pass "
            f"--bh-keep-groups {keep + trimmed}"
        )
    if fixes:
        raise CapacityError(
            "fused Barnes-Hut capacity overflow: " + "; ".join(fixes)
        )
    return stats


def outlier_rect(targets, src, gm, softening_sq: float, interpret: bool):
    """Exact (M, K) rectangle for the robust hybrid's outlier sources
    (G already folded into gm).  Both paths use the displacement form
    (cancellation-safe at outlier coordinates — the expanded-|r|^2 MXU
    formulation loses ~4 digits there, ops/exhaustive.py).  On TPU the
    Pallas j-streaming kernel wins 4x over the chunked jnp map at
    (1M, 2k) (measured: 46 -> 12 ms class); interpret mode keeps the
    jnp path, which the Pallas emulator cannot beat."""
    if interpret:
        from nbody_tpu.ops.exhaustive import rect_accelerations

        return rect_accelerations(
            targets, src, gm, G=1.0, softening_sq=softening_sq,
            mode="chunked",
        )
    from nbody_tpu.ops.pallas_exhaustive import pallas_rect_accelerations

    return pallas_rect_accelerations(
        targets, src, gm, G=1.0, softening_sq=softening_sq,
    )


def barneshut_fused_robust(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    outlier_slots: int = 0,
    return_stats: bool = False,
    **kw,
):
    """Outlier-robust fused Barnes-Hut: EXACT hybrid for huge-dynamic-
    range inputs (ForceFn signature).

    A fixed-depth grid dies on outliers: one escaper at r = 1000 in a
    1M-body Plummer sphere inflates the root cube until ONE terminal
    cell holds 99.4% of all bodies — the near-field degenerates to
    ~O(N^2) (981M near bodies, 3.3 s/eval; measured, and invariant to
    theta 0.5-1.0, ld 6-8, and group_size 256-1024 because the box, not
    the MAC, is the problem; docs/PERFORMANCE.md).  The reference's
    unbounded-depth insert pays the same box (serial/barnes-hut.c:
    326-344) via ever-deeper chains instead.

    The robust scheme keeps everything EXACT (no new approximation):

      1. the root cube is sized by the (K+1)-th largest L-inf distance
         from the coordinate-median center, so AT MOST K bodies fall
         outside — chosen statically (outlier_slots, default n/512), no
         data-dependent shapes;
      2. those top-K bodies ride the tree ZERO-MASSED (morton_encode
         clips them into edge cells; with no mass they perturb neither
         COMs nor cell bounds, so the MAC stays sound: every massive
         body lies inside its nominal cell).  As TARGETS they are still
         exact — their group AABBs use true positions and open
         everything they must;
      3. their contribution as SOURCES is added back with one exact
         (N, K) all-pairs rectangle (~N*K/1.7e11 s — 12 ms at 1M with
         K = 2048).

    Non-outlier bodies landing in the top-K (uniform inputs) are
    harmless: their mass simply moves from the tree to the exact
    rectangle.

    The grid also AUTO-DEEPENS (ld = auto_ld + 2, capped at 8 — tables
    live in HBM since round 3, so the old VMEM-residency cap does not
    bind): huge-dynamic-range inputs need the extra levels to resolve
    their cores even after the box fix.  Measured at 1M Plummer with an
    r=1000 escaper: plain 3311 ms/eval (981M near bodies) -> robust
    border alone 1533 ms (423M) -> robust + ld 8 = **413 ms (47M)**,
    within 1.4x of the uniform-cloud eval.
    """
    n = pos.shape[0]
    if kw.get("ld", 0) == 0:
        kw["ld"] = min(8, auto_ld(n) + 2)
    k = int(outlier_slots) or max(128, n // 512)
    k = min(k, n - 1)
    pos32 = pos.astype(jnp.float32)
    center = jnp.median(pos32, axis=0)
    rel = pos32 - center
    d = jnp.max(jnp.abs(rel), axis=1)
    vals, idx = lax.top_k(d, k + 1)
    out_idx = idx[:k]
    border = 2.0 * vals[k] * 1.0001
    mass_bh = mass.at[out_idx].set(0.0)
    res = barneshut_fused(
        rel, mass_bh, G=G, softening_sq=softening_sq, border=border,
        return_stats=return_stats, **kw,
    )
    acc = res[0] if return_stats else res
    side = outlier_rect(
        pos32, pos32[out_idx],
        jnp.asarray(G, jnp.float32) * mass[out_idx],
        softening_sq, bool(kw.get("interpret", False)),
    )
    acc = acc + side.astype(acc.dtype)
    if return_stats:
        return acc, res[1]
    return acc
