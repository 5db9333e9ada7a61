"""Persistent Morton order: integrate in group layout, resort every k steps.

The fused Barnes-Hut force eval (ops/bh_fused.py) spends ~40% of its
1M-body step outside the traversal kernel: Morton argsort ~52 ms, group
construction ~53 ms, and the group->original scatter ~155 ms per eval
(tools/profile_bh.py on a v5e).  None of that work changes meaningfully
between consecutive small-dt steps — bodies move a tiny fraction of a
cell per step.  This module keeps the INTEGRATOR STATE in the kernel's
own (G, B, 4) group layout across steps:

  * kick/drift are elementwise on the group arrays — the per-step sort,
    group build, and scatter all disappear;
  * the traversal kernel consumes the state directly (zero gathers) and
    its (G, B, 3) output feeds the next kick directly (zero scatters);
  * only the tree's FLOAT fields (COM, G*mass) are rebuilt each step,
    via segment sums over the stored (stale) terminal-cell ids; the int
    ranges (start/span per cell) are frozen between resorts;
  * every `resort_every` steps the state is re-sorted from scratch,
    reconciling cell membership with the drifted positions.

Approximation contract: between resorts the MAC compares CURRENT group
AABBs and CURRENT cell COMs against the STALE cell partition, so a cell's
nominal size (border / 2^level) under-reports its true spatial extent by
at most the drift distance since the last resort.  With v*k*dt far below
the terminal cell size this is negligible (tested: forces stay within
theta-level error of a per-step-resorted run); callers pick k
accordingly.  Tree codes call this "tree reuse" — the reference has no
analog (it rebuilds every step, serial/barnes-hut.c:496-500, a cost its
own profile shows dwarfed by traversal).

Pad slots in the group layout duplicate their group's FIRST body with
gm = 0: they move identically to the real twin under kick/drift (same
position => same acceleration), so group AABBs stay tight across steps
and padding inside near-field spans contributes exactly zero force.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.core import constants
from nbody_tpu.ops.bh_fused import (
    auto_ld,
    auto_split_level,
    aux_octet_offsets,
    fused_group_forces,
    pack_ft,
    pack_it,
)
from nbody_tpu.ops.bh_grid import grid_from_terminal, grid_offsets
from nbody_tpu.ops.morton import bounding_border, morton_encode

_DEPTH = 10
_SENT_KEY = jnp.int32(1 << 30)


class GroupState(NamedTuple):
    """Morton-persistent integrator state (all shapes static).

    pg:    (G, 4, B) f32 planar rows [x; y; z; gm]; pads duplicate the
           group's first body with gm = 0.  Planar (bodies on lanes)
           because pg feeds pallas_call directly and a (..., 4) minor dim
           is padded to the 128-lane tile (32x HBM blowup at scale).
    vel:   (G, 3, B) f32 planar
    valid: (G, B) bool
    gcount:(G,) i32
    orig:  (G, B) i32 original body index; pads -> N (scatter-dropped)
    nid:   (G, B) i32 stale terminal-cell id, NON-DECREASING over the
           flattened slot order (pads continue their group's last real
           cell id and contribute zero via gm = 0; fully-padded trailing
           groups carry 8^ld from the sentinel key) — the sortedness
           contract of _ft_from_state's one-pass segment_sum
    it:    (RI, 128) i32 static start/span octet table (slot-index space)
    bsq:   (16,) f32 (border / 2^level)^2
    border:() f32
    acc:   (G, 3, B) f32 planar force at current positions (KDK carry)
    """

    pg: jax.Array
    vel: jax.Array
    valid: jax.Array
    gcount: jax.Array
    orig: jax.Array
    nid: jax.Array
    it: jax.Array
    bsq: jax.Array
    border: jax.Array
    acc: jax.Array
    # outlier-robust mode (None when off): the K most-distant bodies
    # ride the layout with pg gm = 0; their true G*mass lives here and
    # state_forces adds their exact (M, K) rectangle per step
    out_slots: jax.Array | None = None
    out_gm: jax.Array | None = None


def _layout(n: int, group_size: int, ld: int | None = None):
    b = group_size
    if ld is None:
        ld = auto_ld(n)
    sl = auto_split_level(n, b)
    # exact static bound: every split-level cell adds at most one partial
    # chunk (group_bodies' own capacity) — no compaction, no trim risk
    g_cap = n // b + min(8**sl, n) + 1
    # Round the group count so the flattened slot count g_cap*b is a
    # multiple of 128: state_forces hands the kernel a planar (4, g_cap*b)
    # source array whose near-field streamer DMAs 128-aligned 128-wide
    # windows — a partial final window would read (on TPU: DMA) out of
    # bounds.  Extra groups are inert (gcount 0, gm 0).
    mult = 128 // math.gcd(b, 128)
    g_cap = -(-g_cap // mult) * mult
    return b, ld, sl, g_cap


def _ft_from_state(pg, nid, ld: int):
    """Per-step float-table rebuild: segment COM/G-mass over stale cells.

    One combined (M, 4) segment_sum of [gm*x, gm*y, gm*z, gm] with
    indices_are_sorted — _resort guarantees nid is non-decreasing over
    the flattened slot order (pads inherit their group's last real nid
    and contribute exactly zero through gm = 0).  Measured on the v5e at
    1M (tools/probe_ft_rebuild.py): one sorted (M,4) pass 20 ms vs the
    separate (M,3)+(M,) unsorted passes 29 ms; the (M,3) transpose of
    the planar layout this replaces cost another ~5 ms."""
    k_terminal = 8**ld
    m = pg.shape[0] * pg.shape[2]
    gm_f = pg[:, 3, :].reshape(m)
    nid_f = nid.reshape(m)
    if m > 20_000_000:
        # The combined (M, 4) operand materializes with the T(8,128)
        # tiled layout — minor dim 4 pads to 128 lanes, 32x the logical
        # bytes (68 GB at 100M slots: the round-5 OOM).  Four dense 1-D
        # passes cost ~1.5x the rebuild time (tools/probe_ft_rebuild.py)
        # but stay linear in M; at huge N the rebuild is noise next to
        # the multi-second chunked evals, so trade time for memory.
        chans = [
            gm_f * pg[:, 0, :].reshape(m),
            gm_f * pg[:, 1, :].reshape(m),
            gm_f * pg[:, 2, :].reshape(m),
            gm_f,
        ]
        outs = [
            jax.ops.segment_sum(
                ch, nid_f, num_segments=k_terminal + 1,
                indices_are_sorted=True,
            )[:k_terminal]
            for ch in chans
        ]
        w = jnp.stack(outs[:3], axis=1)
        gm = outs[3]
    else:
        vals = jnp.stack(
            [
                gm_f * pg[:, 0, :].reshape(m),
                gm_f * pg[:, 1, :].reshape(m),
                gm_f * pg[:, 2, :].reshape(m),
                gm_f,
            ],
            axis=1,
        )
        s = jax.ops.segment_sum(
            vals, nid_f, num_segments=k_terminal + 1,
            indices_are_sorted=True,
        )[:k_terminal]
        w = s[:, :3]
        gm = s[:, 3]
    ws, gms = [w], [gm]
    for _ in range(ld):
        ws.append(ws[-1].reshape(-1, 8, 3).sum(axis=1))
        gms.append(gms[-1].reshape(-1, 8).sum(axis=1))
    ws.reverse(), gms.reverse()
    w_all = jnp.concatenate(ws, axis=0)
    gm_all = jnp.concatenate(gms, axis=0)
    com = w_all / jnp.maximum(gm_all, 1e-30)[:, None]
    total = grid_offsets(ld)[ld + 1]

    class _F(NamedTuple):
        cx: jax.Array
        cy: jax.Array
        cz: jax.Array
        gm: jax.Array

    tree = _F(
        com[:, 0].reshape(1, total),
        com[:, 1].reshape(1, total),
        com[:, 2].reshape(1, total),
        gm_all.astype(jnp.float32).reshape(1, total),
    )
    return pack_ft(tree, ld)


@functools.partial(
    jax.jit,
    static_argnames=("n", "group_size", "robust_slots", "ld", "with_acc"),
)
def _resort(pos_f, vel_f, acc_f, gm_f, orig_f, n: int, group_size: int,
            robust_slots: int = 0, ld: int | None = None,
            with_acc: bool = True):
    """Full resort from flattened (M,)-shaped candidate arrays (pads carry
    gm = 0 and orig = n) into a fresh GroupState.  Used both for the
    initial build (M = N) and periodic resorts (M = G*B).  acc rides the
    same permutation: a resort is a pure relabeling, so the KDK carry
    stays valid and no extra force evaluation is needed afterwards.

    robust_slots > 0 switches on the outlier-robust scheme of
    bh_fused.barneshut_fused_robust on the persistent layout: the root
    cube is sized by the (K+1)-th largest distance from the median
    center, the K most-distant bodies ride the layout ZERO-MASSED (their
    true G*mass stashed in state.out_gm, restored at the next resort),
    and state_forces adds their source contribution back with one exact
    (M, K) rectangle per step.  Exact, static shapes, MAC-sound (every
    massive body lies inside its nominal cell).

    with_acc=False skips the acc chain entirely (acc_f is ignored; the
    output acc is zeros): the initial build has no KDK carry yet, and at
    100M bodies the all-zero (N, 3) array would otherwise ride the full
    sort + group gather as ~4 GB of pointless HBM transients — the
    margin between fitting and OOM on a 16 GB v5e."""
    from nbody_tpu.ops.barneshut import group_bodies

    b, ld, sl, g_cap = _layout(n, group_size, ld)
    m_in = pos_f.shape[0]
    k_terminal = 8**ld

    real_in = orig_f < n
    if robust_slots > 0:
        k_out = min(int(robust_slots), n - 1)
        center = jnp.median(pos_f.astype(jnp.float32), axis=0)
        d_in = jnp.where(
            real_in,
            jnp.max(jnp.abs(pos_f.astype(jnp.float32) - center), axis=1),
            -1.0,
        )
        vals = lax.top_k(d_in, k_out + 1)[0]
        border = (2.0 * vals[k_out] * 1.0001).astype(jnp.float32)
        # keys live in the CENTERED frame: the cube is sized by distances
        # from the median, so encoding absolute positions would put
        # massive bodies of an off-center cloud in the wrong cells (384
        # of 384 outside their nominal box at a (3,-1,2) offset; 14%
        # force error).  Only the keys shift; layout positions stay
        # absolute (forces are translation-invariant, cell COMs come
        # from body coordinates).
        pos_enc = pos_f - center
    else:
        center = None
        border = bounding_border(
            jnp.where(real_in[:, None], pos_f, 0.0)
        ).astype(jnp.float32)
        pos_enc = pos_f
    keys = morton_encode(pos_enc, border, _DEPTH)
    keys = jnp.where(real_in, keys, _SENT_KEY)
    order = jnp.argsort(keys)
    keys_s = keys[order]
    pos_s = pos_f[order]
    vel_s = vel_f[order]
    acc_s = acc_f[order] if with_acc else None
    gm_s = gm_f[order]
    orig_s = orig_f[order]
    # real bodies occupy [0, n) exactly: pads all carry the sentinel key

    # groups_multiple keeps group_bodies' static capacity >= the rounded
    # g_cap (its own bound is computed from m_in, which can be < g_cap
    # after the 128-slot rounding only through the rounding itself)
    gstart, gcount, group_idx, group_valid = group_bodies(
        keys_s, m_in, _DEPTH, b, sl,
        groups_multiple=128 // math.gcd(b, 128),
    )
    gcount = jnp.minimum(gcount, jnp.clip(n - gstart, 0))
    slots = jnp.arange(b, dtype=jnp.int32)[None, :]
    group_valid = slots < gcount[:, None]
    # pads gather the group's LAST real slot (not the first): their nid
    # then continues the group's final cell id, which keeps the flattened
    # nid non-decreasing end to end (Morton order + single-owner cells)
    # — the sortedness contract _ft_from_state's segment_sum relies on.
    # Pad values stay inert regardless (gm = 0, orig = n).
    last = gstart + jnp.maximum(gcount - 1, 0)
    group_idx = jnp.clip(
        jnp.where(group_valid, gstart[:, None] + slots, last[:, None]),
        0,
        m_in - 1,
    )
    gcount = gcount[:g_cap]
    group_valid = group_valid[:g_cap]
    group_idx = group_idx[:g_cap]

    pg = jnp.concatenate(
        [
            jnp.transpose(pos_s[group_idx].astype(jnp.float32), (0, 2, 1)),
            jnp.where(group_valid, gm_s[group_idx], 0.0)[:, None, :].astype(
                jnp.float32
            ),
        ],
        axis=1,
    )
    vel_g = jnp.transpose(vel_s[group_idx].astype(jnp.float32), (0, 2, 1))
    acc_g = (
        jnp.transpose(acc_s[group_idx].astype(jnp.float32), (0, 2, 1))
        if with_acc
        else jnp.zeros_like(vel_g)
    )
    orig_g = jnp.where(group_valid, orig_s[group_idx], n).astype(jnp.int32)
    # No pad sentinel: pads gather their group's last real slot, so their
    # nid continues that cell id and the flattened sequence stays
    # non-decreasing (the _ft_from_state sortedness contract).  Sentinel
    # keys of fully-padded trailing groups shift to >= k_terminal - 1,
    # preserving monotonicity; clip keeps ids in segment range.
    nid_g = jnp.minimum(
        (keys_s[group_idx] >> (3 * (_DEPTH - ld))).astype(jnp.int32),
        k_terminal,
    )

    # static int tables: start/end per terminal cell in SLOT-index space
    # (pads excluded by masking VALUES — min/max/sum-neutral — since the
    # ids alone no longer identify them)
    m = g_cap * b
    slot_idx = jnp.arange(m, dtype=jnp.int32)
    nid_f2 = nid_g.reshape(m)
    valid_f = group_valid.reshape(m)
    inf = jnp.int32(2**31 - 1)
    st = jax.ops.segment_min(
        jnp.where(valid_f, slot_idx, inf),
        nid_f2,
        num_segments=k_terminal + 1,
        indices_are_sorted=True,
    )[:k_terminal]
    en = jax.ops.segment_max(
        jnp.where(valid_f, slot_idx + 1, -1),
        nid_f2,
        num_segments=k_terminal + 1,
        indices_are_sorted=True,
    )[:k_terminal]
    cnt = jax.ops.segment_sum(
        valid_f.astype(jnp.int32),
        nid_f2,
        num_segments=k_terminal + 1,
        indices_are_sorted=True,
    )[:k_terminal]
    zero3 = jnp.zeros((k_terminal, 3), jnp.float32)
    tree = grid_from_terminal(
        zero3, jnp.zeros((k_terminal,), jnp.float32), cnt, st, en, ld
    )
    it = pack_it(tree, ld)

    lev = jnp.arange(16, dtype=jnp.float32)
    bsq = (border / jnp.exp2(lev)) ** 2

    out_slots = out_gm = None
    if robust_slots > 0:
        # slot-space twin of the input-space selection: the K most
        # distant VALID slots are exactly the K most distant real bodies
        # (pads are excluded by the -1 mask and carry gm = 0 already)
        pgq = jnp.transpose(pg[:, :3, :], (0, 2, 1)).reshape(g_cap * b, 3)
        d_slot = jnp.where(
            group_valid.reshape(g_cap * b),
            jnp.max(jnp.abs(pgq - center), axis=1),
            -1.0,
        )
        out_slots = lax.top_k(d_slot, k_out)[1].astype(jnp.int32)
        gm_flat = pg[:, 3, :].reshape(g_cap * b)
        out_gm = gm_flat[out_slots]
        gm_flat = gm_flat.at[out_slots].set(0.0)
        pg = pg.at[:, 3, :].set(gm_flat.reshape(g_cap, b))

    return GroupState(
        pg=pg,
        vel=vel_g,
        valid=group_valid,
        gcount=gcount.astype(jnp.int32),
        orig=orig_g,
        nid=nid_g,
        it=it,
        bsq=bsq,
        border=border,
        acc=acc_g,
        out_slots=out_slots,
        out_gm=out_gm,
    )


def init_state(
    pos,
    vel,
    mass,
    *,
    G: float = constants.BIG_G,
    group_size: int = 1024,
    robust_slots: int = 0,
    ld: int | None = None,
) -> GroupState:
    """Build the persistent state from (N, 3)/(N,) body arrays."""
    n = pos.shape[0]
    gm = (jnp.asarray(G, jnp.float32) * mass).astype(jnp.float32)
    orig = jnp.arange(n, dtype=jnp.int32)
    # with_acc=False: no KDK carry exists yet; skipping the acc chain
    # halves the init sort/gather transients (the 100M OOM margin)
    return _resort(
        pos.astype(jnp.float32), vel.astype(jnp.float32),
        jnp.zeros((1, 3), jnp.float32), gm, orig,
        n=n, group_size=group_size, robust_slots=robust_slots, ld=ld,
        with_acc=False,
    )


@functools.partial(
    jax.jit, static_argnames=("n", "group_size", "robust_slots", "ld")
)
def resort(state: GroupState, n: int, group_size: int,
           robust_slots: int = 0, ld: int | None = None) -> GroupState:
    """Periodic resort: flatten the group layout and rebuild."""
    g, _, b = state.pg.shape
    m = g * b
    # pads carry gm = 0 / orig = n already; resort keeps them inert
    gm_flat = jnp.where(state.valid, state.pg[:, 3, :], 0.0).reshape(m)
    if state.out_gm is not None:
        # restore the outliers' true G*mass before rebuilding — the
        # layout stores 0 for them (robust mode)
        gm_flat = gm_flat.at[state.out_slots].set(state.out_gm)
    return _resort(
        jnp.transpose(state.pg[:, :3, :], (0, 2, 1)).reshape(m, 3),
        jnp.transpose(state.vel, (0, 2, 1)).reshape(m, 3),
        jnp.transpose(state.acc, (0, 2, 1)).reshape(m, 3),
        gm_flat,
        state.orig.reshape(m),
        n=n, group_size=group_size, robust_slots=robust_slots, ld=ld,
    )


def state_forces(
    state: GroupState,
    *,
    theta: float,
    softening_sq: float,
    leaf_cap: int,
    ld: int,
    burst_rows: int = 16,
    interpret: bool = False,
):
    """(G, 3, B) planar accelerations at the state's current positions."""
    g, _, b = state.pg.shape
    ft = _ft_from_state(state.pg, state.nid, ld)
    # (G, 4, B) -> planar (4, G*B): slot s of group g at lane g*B + s
    ps = jnp.transpose(state.pg, (1, 0, 2)).reshape(4, g * b)
    acc_g, _stats = fused_group_forces(
        state.gcount, state.pg, ft, state.it, ps, state.bsq,
        aux_octet_offsets(),
        theta=theta, eps2=softening_sq, leaf_cap=leaf_cap, ld=ld,
        burst_rows=burst_rows, interpret=interpret,
    )
    if state.out_gm is not None:
        # robust mode: the K outliers ride the layout zero-massed; add
        # their source contribution with one exact (M, K) rectangle
        # (their CURRENT positions gathered from the layout).  G is
        # already folded into out_gm.
        from nbody_tpu.ops.bh_fused import outlier_rect

        m = g * b
        targets = jnp.transpose(state.pg[:, :3, :], (0, 2, 1)).reshape(m, 3)
        src = targets[state.out_slots]
        side = outlier_rect(
            targets, src, state.out_gm, softening_sq, interpret
        )
        acc_g = acc_g + jnp.transpose(
            side.reshape(g, b, 3), (0, 2, 1)
        ).astype(acc_g.dtype)
    return acc_g


def _kdk_steps(
    state: GroupState,
    n_steps: int,
    dt,
    *,
    theta: float,
    softening_sq: float,
    leaf_cap: int,
    ld: int,
    burst_rows: int = 16,
    interpret: bool = False,
    with_history: bool = False,
):
    """`n_steps` KDK steps entirely in group layout (no sort/scatter).

    state.acc must hold force(current positions) — init via prime().
    With with_history, also returns the (n_steps, G, B, 3) stack of
    post-drift positions (group layout; emit per frame through
    state.orig, which is constant within the scan)."""
    dt = jnp.asarray(dt, jnp.float32)
    half = dt * 0.5

    force = functools.partial(
        state_forces, theta=theta, softening_sq=softening_sq,
        leaf_cap=leaf_cap, ld=ld, burst_rows=burst_rows,
        interpret=interpret,
    )

    def step(carry, _):
        st = carry
        vel = st.vel + st.acc * half
        pg = st.pg.at[:, :3, :].add(vel * dt)
        st = st._replace(pg=pg, vel=vel)
        acc = force(st)
        st = st._replace(vel=st.vel + acc * half, acc=acc)
        return st, (st.pg[:, :3, :] if with_history else None)

    state, hist = lax.scan(step, state, None, length=n_steps)
    if with_history:
        return state, hist
    return state


_KDK_STATICS = (
    "n_steps", "theta", "softening_sq", "leaf_cap", "ld",
    "burst_rows", "interpret", "with_history",
)
kdk_steps = functools.partial(jax.jit, static_argnames=_KDK_STATICS)(
    _kdk_steps
)
# Donated twin: aliases the input state's buffers into the output.  At
# 100M bodies the GroupState is ~6.5 GB; without donation input + output
# live simultaneously (~13 GB) and the 16 GB v5e OOMs.  Callers must
# not touch the argument after the call — the undonated kdk_steps stays
# the default for A/B tools and tests that re-step the same state.
kdk_steps_donated = functools.partial(
    jax.jit, static_argnames=_KDK_STATICS, donate_argnums=(0,)
)(_kdk_steps)


@functools.partial(jax.jit, donate_argnums=(0,))
def _kick_drift(state: GroupState, dt):
    """First KDK half: vel += acc*dt/2; pos += vel*dt (donated)."""
    half = jnp.asarray(dt, jnp.float32) * 0.5
    vel = state.vel + state.acc * half
    pg = state.pg.at[:, :3, :].add(vel * jnp.asarray(dt, jnp.float32))
    return state._replace(pg=pg, vel=vel)


@functools.partial(jax.jit, static_argnames=("ld",))
def _ft_only(pg, nid, ld: int):
    """Per-step tree float tables, computed ONCE per step and shared by
    every force-slice dispatch.  The planar ps source is rebuilt inside
    each slice program instead: holding a (4, G*B) copy across the
    chunk loop costs 2.14 GB of residency at 100M (the OOM margin),
    while re-transposing per chunk is a ~ms-scale transient."""
    return _ft_from_state(pg, nid, ld)


@functools.partial(
    jax.jit,
    static_argnames=(
        "p", "theta", "softening_sq", "leaf_cap", "ld", "burst_rows",
        "interpret",
    ),
)
def _slice_forces(
    gcount, pg, it, bsq, ft, lo, *, p: int, theta, softening_sq,
    leaf_cap, ld, burst_rows=16, interpret=False,
):
    """Forces for the `p` contiguous groups starting at (clamped,
    traced) row `lo` — one bounded device program; sources full-layout."""
    g, _, b = pg.shape
    ps = jnp.transpose(pg, (1, 0, 2)).reshape(4, g * b)
    lo = lo.astype(jnp.int32)
    z = jnp.int32(0)
    pg_c = lax.dynamic_slice(pg, (lo, z, z), (p, 4, pg.shape[2]))
    gc_c = lax.dynamic_slice(gcount, (lo,), (p,))
    acc_c, _stats = fused_group_forces(
        gc_c, pg_c, ft, it, ps, bsq, aux_octet_offsets(),
        theta=theta, eps2=softening_sq, leaf_cap=leaf_cap, ld=ld,
        burst_rows=burst_rows, interpret=interpret,
    )
    return acc_c


@functools.partial(jax.jit, donate_argnums=(0,))
def _acc_update(acc_full, part, lo):
    z = jnp.int32(0)
    return lax.dynamic_update_slice(
        acc_full, part, (lo.astype(jnp.int32), z, z)
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _second_kick(state: GroupState, acc, dt):
    half = jnp.asarray(dt, jnp.float32) * 0.5
    return state._replace(vel=state.vel + acc * half, acc=acc)


def prime_chunked(
    state: GroupState,
    *,
    n_chunks: int,
    theta: float,
    softening_sq: float,
    leaf_cap: int,
    ld: int,
    burst_rows: int = 16,
    interpret: bool = False,
):
    """prime() in bounded slice programs (same compiled program as
    kdk_steps_chunked's force slices): at 100M a monolithic full eval
    is a ~206 s device program, watchdog roulette on the tunneled
    chip."""
    if state.out_gm is not None:
        raise ValueError("chunked priming does not support robust mode")
    g = state.pg.shape[0]
    p = min(g, -(-g // max(1, int(n_chunks))))
    fkw = dict(
        p=p, theta=theta, softening_sq=softening_sq, leaf_cap=leaf_cap,
        ld=ld, burst_rows=burst_rows, interpret=interpret,
    )
    ft = _ft_only(state.pg, state.nid, ld)
    acc = jnp.zeros_like(state.acc)
    lo = 0
    while lo < g:
        lo_c = jnp.int32(min(lo, g - p))
        part = _slice_forces(
            state.gcount, state.pg, state.it, state.bsq, ft, lo_c, **fkw
        )
        acc = _acc_update(acc, part, lo_c)
        lo += p
    return state._replace(acc=acc)


def kdk_steps_chunked(
    state: GroupState,
    n_steps: int,
    dt,
    *,
    n_chunks: int,
    theta: float,
    softening_sq: float,
    leaf_cap: int,
    ld: int,
    burst_rows: int = 16,
    interpret: bool = False,
):
    """Watchdog-safe KDK for huge N: the same math as kdk_steps, but
    each force eval runs as `n_chunks` separate device programs over
    contiguous group slices (the tunneled chip's execution watchdog
    kills single programs past ~90 s, and a 100M-body eval measured
    ~210 s in one program — CLAUDE.md).  Host loop per step; the
    ~27 ms/dispatch overhead is noise at multi-second chunk times.  One
    compiled slice program serves every chunk (traced `lo`,
    clamp-overlap assembly: the last slice may re-evaluate a few groups
    already written — dynamic_update_slice clamps identically, so the
    duplicates overwrite with equal values).  No history variant (a
    100M-body frame is ~1.2 GB); robust mode unsupported (the exact
    outlier rectangle is quadratic-in-K at this scale)."""
    if state.out_gm is not None:
        raise ValueError(
            "chunked stepping does not support robust mode (the outlier "
            "rectangle is already a full-layout term); run unchunked or "
            "without --bh-robust"
        )
    g = state.pg.shape[0]
    # ceil split; fused_group_forces pads any p to its gpp internally
    p = min(g, -(-g // max(1, int(n_chunks))))
    fkw = dict(
        p=p, theta=theta, softening_sq=softening_sq, leaf_cap=leaf_cap,
        ld=ld, burst_rows=burst_rows, interpret=interpret,
    )
    for _ in range(int(n_steps)):
        state = _kick_drift(state, dt)
        ft = _ft_only(state.pg, state.nid, ld)
        acc = jnp.zeros_like(state.acc)
        lo = 0
        while lo < g:
            lo_c = jnp.int32(min(lo, g - p))
            part = _slice_forces(
                state.gcount, state.pg, state.it, state.bsq, ft,
                lo_c, **fkw,
            )
            acc = _acc_update(acc, part, lo_c)
            lo += p
        state = _second_kick(state, acc, dt)
    return state


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_steps", "theta", "softening_sq", "leaf_cap", "ld",
        "burst_rows", "interpret", "with_history",
    ),
)
def kdk_adaptive_steps(
    state: GroupState,
    k_steps: int,
    t,
    t_end,
    *,
    eta: float,
    eps: float,
    dt_min: float,
    dt_max: float,
    theta: float,
    softening_sq: float,
    leaf_cap: int,
    ld: int,
    burst_rows: int = 16,
    interpret: bool = False,
    with_history: bool = False,
):
    """Adaptive-dt KDK on the persistent group layout (VERDICT r3
    item 6: the round-3 physics capabilities now compose with the scale
    paths).  Same criterion and shape discipline as
    integrate/adaptive.adaptive_steps — dt = sqrt(2 eta eps / |a|_max)
    clipped to [dt_min, dt_max] rides the lax.scan carry as a TRACED
    scalar (per-step adaptivity costs one masked max-reduction, no
    recompiles), the final step clamps to (t_end - t) for an exact
    landing, and post-arrival steps are dt = 0 identity KDK no-ops.

    Returns (state, t', (ts, dts)[, hist]): per-step end times, the dt
    each step took (0 for no-ops), and optionally the (K, G, 3, B)
    post-drift planar position history for frame emission."""
    force = functools.partial(
        state_forces, theta=theta, softening_sq=softening_sq,
        leaf_cap=leaf_cap, ld=ld, burst_rows=burst_rows,
        interpret=interpret,
    )
    two_eta_eps = jnp.float32(2.0 * eta * eps)
    t_end = jnp.asarray(t_end, jnp.float32)

    def step(carry, _):
        st, t = carry
        a2 = jnp.sum(st.acc * st.acc, axis=1)  # (G, B)
        amax = jnp.sqrt(jnp.max(jnp.where(st.valid, a2, 0.0)))
        dt = jnp.sqrt(two_eta_eps / jnp.maximum(amax, 1e-30))
        dt = jnp.clip(dt, dt_min, dt_max)
        rem = jnp.maximum(t_end - t, 0.0)
        dt = jnp.minimum(dt, rem)
        half = dt * 0.5
        vel = st.vel + st.acc * half
        pg = st.pg.at[:, :3, :].add(vel * dt)
        st = st._replace(pg=pg, vel=vel)
        acc = force(st)
        st = st._replace(vel=st.vel + acc * half, acc=acc)
        # exact landing: when the step consumes the remainder, SNAP t to
        # t_end instead of accumulating — near arrival f32 rounding can
        # make t + dt == t with dt > 0, which spins the host driver
        # forever on ~1e-9 ghost steps (round-4 hang)
        t = jnp.where(dt >= rem, t_end, t + dt)
        out = (t, dt, st.pg[:, :3, :] if with_history else None)
        return (st, t), out

    (state, t), (ts, dts, hist) = lax.scan(
        step, (state, jnp.asarray(t, jnp.float32)), None, length=k_steps
    )
    if with_history:
        return state, t, (ts, dts), hist
    return state, t, (ts, dts)


_state_forces_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "theta", "softening_sq", "leaf_cap", "ld", "burst_rows", "interpret"
    ),
)(state_forces)


def prime(state: GroupState, **force_kw) -> GroupState:
    """Fill state.acc with the force at current positions (the initial
    acceleration call of the reference, serial/exhaustive.c:206).
    Jitted as one graph: eager per-op dispatch through the tunneled PJRT
    costs ~27 ms/op, which made this single eval ~16 s at 1M ld=8."""
    return state._replace(acc=_state_forces_jit(state, **force_kw))


# ---------------------------------------------------------------------------
# Block (tiered) time steps — beyond the reference AND beyond global
# adaptive dt: per-GROUP step tiers on the persistent layout.
#
# Morton groups are spatially coherent, so a group's acceleration scale
# is coherent too: a tight cluster core needs dt/4 while the field is
# happy at dt.  Global adaptive dt (integrate/adaptive.py) makes EVERY
# body pay the core's step; block steps make only the core pay it.
#
# TPU shape discipline: the active set changes per sub-step, but the
# fused kernel already skips gcount = 0 groups almost for free (the
# traversal sits behind a pl.when and an empty group costs only its
# block-pipeline slot).  So "evaluate only the active tier" is ONE
# masked gcount — no dynamic shapes, no recompiles, and the inactive
# groups' acc rides the scan carry unchanged.
# ---------------------------------------------------------------------------


def assign_tiers(state: GroupState, dt, *, eta: float, eps: float,
                 n_tiers: int):
    """(G,) i32 tier per group: k such that dt / 2^k meets the
    sqrt(2 eta eps / |a|_max) criterion (integrate/adaptive.py), from
    the per-group acceleration scale in state.acc.  Tier 0 = full dt,
    tier n_tiers-1 = dt / 2^(n_tiers-1)."""
    a2 = jnp.sum(state.acc * state.acc, axis=1)  # (G, B)
    amax = jnp.sqrt(jnp.max(jnp.where(state.valid, a2, 0.0), axis=1))
    dt_req = jnp.sqrt(2.0 * eta * eps / jnp.maximum(amax, 1e-30))
    k = jnp.ceil(jnp.log2(jnp.maximum(dt / dt_req, 1e-30)))
    return jnp.clip(k, 0, n_tiers - 1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_macro", "n_tiers", "theta", "softening_sq", "leaf_cap", "ld",
        "burst_rows", "interpret", "with_history",
    ),
)
def kdk_block_steps(
    state: GroupState,
    tiers,
    n_macro: int,
    dt,
    *,
    n_tiers: int,
    theta: float,
    softening_sq: float,
    leaf_cap: int,
    ld: int,
    burst_rows: int = 16,
    interpret: bool = False,
    with_history: bool = False,
):
    """`n_macro` macro steps of dt with per-group tiers (synchronized
    block KDK, the standard hierarchical leapfrog):

      * every body DRIFTS every finest sub-step h = dt / 2^(n_tiers-1)
        with its current velocity (a tier-k body's velocity is constant
        between its own kicks, so its L·h of drifts compose to exactly
        its dt_k drift);
      * a tier-k group KICKS with dt_k/2 at the boundaries of its own
        L = 2^(n_tiers-1-k)-sub-step intervals, with a force evaluated
        exactly there — via the masked-gcount kernel call, which prices
        each sub-step at (active fraction) of a full eval plus the ft
        rebuild;
      * the float tree rebuilds every sub-step, so every force (even a
        coarse group's) sees sub-step-current source positions.

    state.acc must hold force(current positions) at a macro boundary
    (prime()).  With with_history, also returns the (n_macro, G, B, 3)
    post-drift positions at MACRO boundaries (the frame contract).
    """
    s_per = 1 << (n_tiers - 1)
    h = jnp.asarray(dt, jnp.float32) / s_per
    big_l = (s_per >> tiers).astype(jnp.int32)  # (G,) sub-steps per own step
    half_own = big_l.astype(jnp.float32)[:, None, None] * (h * 0.5)

    force = functools.partial(
        state_forces, theta=theta, softening_sq=softening_sq,
        leaf_cap=leaf_cap, ld=ld, burst_rows=burst_rows,
        interpret=interpret,
    )

    def sub(carry, s):
        st = carry
        opening = (s % big_l == 0)[:, None, None]
        vel = st.vel + st.acc * jnp.where(opening, half_own, 0.0)
        pg = st.pg.at[:, :3, :].add(vel * h)
        st = st._replace(pg=pg, vel=vel)

        closing = (s + 1) % big_l == 0  # (G,)
        acc_new = force(st._replace(
            gcount=jnp.where(closing, st.gcount, 0)
        ))
        cl3 = closing[:, None, None]
        acc = jnp.where(cl3, acc_new, st.acc)
        st = st._replace(
            vel=st.vel + acc * jnp.where(cl3, half_own, 0.0), acc=acc
        )
        emit = pg[:, :3, :] if with_history else None
        return st, emit

    state, hist = lax.scan(
        sub, state, jnp.arange(n_macro * s_per, dtype=jnp.int32)
    )
    if with_history:
        # macro-boundary frames only (the last sub-step of each macro)
        return state, hist[s_per - 1 :: s_per]
    return state


# ---------------------------------------------------------------------------
# Per-tier grid prefixes (round 4, VERDICT r3 item 7).
#
# kdk_block_steps evaluates EVERY sub-step over the full group grid with
# inactive groups' gcount masked to 0 — the kernel skips their traversal,
# but each still pays its block-pipeline slot: measured 1086 ms/macro vs
# the 822 ms active-fraction prediction on the stratified 1M fixture (a
# 32% floor, docs/PERFORMANCE.md).  The fused kernel is self-contained
# per target group (its AABB comes from its own body block and traversal
# starts at the root — group index never addresses a cell), so the
# target-group axis slices freely.  Sort groups by tier DESCENDING and
# the set closing at any sub-step is a PREFIX: sub-step s+1 with 2-adic
# valuation v closes exactly the tiers >= n_tiers-1-v, i.e. the first
# sizes[v] groups of the order.  Each distinct prefix size is its own
# static pallas grid (at most n_tiers distinct kernel shapes; sizes are
# quantized so retier histogram jitter does not recompile).
# ---------------------------------------------------------------------------


def _val2(x: int) -> int:
    """2-adic valuation of x > 0 (trailing zero bits)."""
    return (x & -x).bit_length() - 1


def tier_order_sizes(tiers, n_tiers: int, quant: int = 64):
    """Host-side prefix plan for kdk_block_prefix_steps.

    Returns (order, sizes): `order` is the (G,) i32 group permutation in
    descending-tier order (stable), so the groups closing at any
    sub-step form a prefix of it; `sizes[v]` (one per 2-adic valuation
    of the sub-step index) is the count of groups with
    tier >= n_tiers-1-v rounded UP to `quant` and capped at G, so the
    tuple — a static jit argument — changes (recompiles) only when the
    tier histogram moves by a whole quantum.  Prefix slots beyond the
    true closing count are evaluated and scatter-dropped (bounded
    waste); sizes[n_tiers-1] is exactly G (the macro-boundary full
    eval takes the ungathered fast path)."""
    import numpy as np

    t = np.asarray(tiers)
    g = t.shape[0]
    order = np.argsort(-t, kind="stable").astype(np.int32)
    counts = np.bincount(t, minlength=n_tiers)
    suffix = np.cumsum(counts[::-1])  # suffix[v] = #groups with tier >= T-1-v
    sizes = tuple(
        g if v == n_tiers - 1
        else int(min(g, -(-int(suffix[v]) // quant) * quant))
        for v in range(n_tiers)
    )
    return jnp.asarray(order), sizes


def subset_state_forces(
    state: GroupState,
    idx,
    *,
    theta: float,
    softening_sq: float,
    leaf_cap: int,
    ld: int,
    burst_rows: int = 16,
    interpret: bool = False,
):
    """(P, 3, B) planar accelerations for the target groups `idx` only.

    Sources stay FULL-layout (the float-table rebuild and the planar ps
    see every body); only the target side gathers to the (P, 4, B)
    subset — a contiguous-row gather, bandwidth-priced.  The robust
    sideband's rectangle likewise shrinks to the subset's targets (its
    outlier sources still gather from the full layout)."""
    g, _, b = state.pg.shape
    ft = _ft_from_state(state.pg, state.nid, ld)
    ps = jnp.transpose(state.pg, (1, 0, 2)).reshape(4, g * b)
    pg_s = state.pg[idx]
    acc_s, _stats = fused_group_forces(
        state.gcount[idx], pg_s, ft, state.it, ps, state.bsq,
        aux_octet_offsets(),
        theta=theta, eps2=softening_sq, leaf_cap=leaf_cap, ld=ld,
        burst_rows=burst_rows, interpret=interpret,
    )
    if state.out_gm is not None:
        from nbody_tpu.ops.bh_fused import outlier_rect

        p = idx.shape[0]
        full = jnp.transpose(state.pg[:, :3, :], (0, 2, 1)).reshape(g * b, 3)
        targets = jnp.transpose(pg_s[:, :3, :], (0, 2, 1)).reshape(p * b, 3)
        side = outlier_rect(
            targets, full[state.out_slots], state.out_gm, softening_sq,
            interpret,
        )
        acc_s = acc_s + jnp.transpose(
            side.reshape(p, b, 3), (0, 2, 1)
        ).astype(acc_s.dtype)
    return acc_s


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_macro", "n_tiers", "sizes", "theta", "softening_sq", "leaf_cap",
        "ld", "burst_rows", "interpret", "with_history",
    ),
)
def kdk_block_prefix_steps(
    state: GroupState,
    tiers,
    order,
    n_macro: int,
    dt,
    *,
    sizes: tuple,
    n_tiers: int,
    theta: float,
    softening_sq: float,
    leaf_cap: int,
    ld: int,
    burst_rows: int = 16,
    interpret: bool = False,
    with_history: bool = False,
):
    """kdk_block_steps with per-tier grid prefixes: identical physics
    (same synchronized block-KDK schedule, same forces), but sub-step s
    evaluates ONLY the prefix order[:sizes[v]] (v = val2(s+1)) instead
    of masking the full grid — inactive groups stop paying their
    pipeline slots.  The macro body statically unrolls the
    2^(n_tiers-1) sub-steps; the final one closes every tier and takes
    the ungathered full-grid path.  (order, sizes) come from
    tier_order_sizes; quantization extras in a prefix are evaluated and
    scatter-dropped, never kicked (their acc must stay at their own
    last closing boundary for KDK correctness)."""
    s_per = 1 << (n_tiers - 1)
    h = jnp.asarray(dt, jnp.float32) / s_per
    big_l = (s_per >> tiers).astype(jnp.int32)  # (G,) sub-steps per own step
    half_own = big_l.astype(jnp.float32)[:, None, None] * (h * 0.5)
    g = state.pg.shape[0]

    force_kw = dict(
        theta=theta, softening_sq=softening_sq, leaf_cap=leaf_cap, ld=ld,
        burst_rows=burst_rows, interpret=interpret,
    )

    def macro(carry, _):
        st = carry
        for s in range(s_per):
            opening = (s % big_l == 0)[:, None, None]
            vel = st.vel + st.acc * jnp.where(opening, half_own, 0.0)
            pg = st.pg.at[:, :3, :].add(vel * h)
            st = st._replace(pg=pg, vel=vel)

            if s == s_per - 1:
                # macro boundary: every tier closes — full grid, no gather
                acc = state_forces(st, **force_kw)
                st = st._replace(vel=st.vel + acc * half_own, acc=acc)
            else:
                v = min(_val2(s + 1), n_tiers - 1)
                idx = order[: sizes[v]]
                acc_new = subset_state_forces(st, idx, **force_kw)
                closing = (s + 1) % big_l == 0  # (G,)
                # scatter-drop: prefix slots past the true closing count
                # (quantization waste) park at index G and vanish
                dst = jnp.where(closing[idx], idx, g)
                acc = st.acc.at[dst].set(acc_new, mode="drop")
                cl3 = closing[:, None, None]
                st = st._replace(
                    vel=st.vel + acc * jnp.where(cl3, half_own, 0.0), acc=acc
                )
        return st, (st.pg[:, :3, :] if with_history else None)

    state, hist = lax.scan(macro, state, None, length=n_macro)
    if with_history:
        return state, hist
    return state


@functools.partial(jax.jit, static_argnames=("n",))
def emit(state: GroupState, n: int):
    """(pos, vel) back in the original body order (for output frames)."""
    g, _, b = state.pg.shape
    dest = state.orig.reshape(g * b)
    pos = (
        jnp.zeros((n, 3), jnp.float32)
        .at[dest]
        .set(
            jnp.transpose(state.pg[:, :3, :], (0, 2, 1)).reshape(g * b, 3),
            mode="drop",
        )
    )
    vel = (
        jnp.zeros((n, 3), jnp.float32)
        .at[dest]
        .set(
            jnp.transpose(state.vel, (0, 2, 1)).reshape(g * b, 3),
            mode="drop",
        )
    )
    return pos, vel


def simulate_persistent(
    pos,
    vel,
    mass,
    n_steps: int,
    dt: float,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    theta: float = constants.THETA,
    group_size: int = 1024,
    leaf_cap: int = 64,
    resort_every: int = 8,
    max_drift_frac: float = 0.25,
    interpret: bool = False,
    frame_writer=None,
    checkpoint_every: int = 0,
    checkpoint_fn=None,
    progress_every: int = 0,
    progress_fn=None,
    block_tiers: int = 1,
    block_eta: float = 0.025,
    block_prefix: bool = True,
    robust_slots: int = 0,
    ld: int = 0,
    merge_radius: float = 0.0,
    merge_every: int = 1,
    merge_chunk: int = 512,
    merge_report=None,
    mass_update=None,
    force_chunks="auto",
):
    """Run n_steps with periodic resorts; returns (pos, vel) in original
    order — (pos, vel, mass) when `merge_radius > 0` (merging changes
    masses).  `robust_slots > 0` enables the outlier-robust scheme on this
    layout (_resort docstring; the grid also deepens to auto_ld + 2,
    max 8, since the sane cube can afford the levels).  `ld` overrides
    the grid depth either way (the robust-mode depth tradeoff is
    data-dependent; --bh-ld help / docs/PERFORMANCE.md).

    `merge_radius > 0` composes inelastic merging (ops/collisions.py)
    with this layout: every `merge_every` steps the chunk loop lands on
    a boundary, emits the state to original order (an exact f32
    permutation), runs merge_pass there — identical index semantics to
    the unsharded path — and, iff bodies merged, rebuilds the layout
    from the merged arrays (init_state + prime: masses changed, so the
    Morton float tables and the KDK acc carry rebuild; absorbed bodies
    continue as gm = 0 ghosts, the layout's existing pad/outlier
    convention).  Merge-free boundaries cost one merge_pass and no
    rebuild, mirroring simulate_merging's nm > 0 force refresh.
    `merge_report` receives the total number of absorbed bodies at the
    end; `mass_update` (if given) receives the running mass array after
    each merging boundary, so frame writers track the mass column.  Reference analog: the reference is strictly collisionless;
    this matches the one-binary-does-everything ethos of
    serial/exhaustive.c (no mode exclusions).
    `block_tiers > 1` switches to tiered block time steps
    (kdk_block_steps): n_steps counts MACRO steps of dt, per-group tiers
    reassigned from the acceleration scale at every resort boundary.
    The chunked python loop mirrors integrate/leapfrog.simulate;
    resorts land on chunk boundaries.  `frame_writer` receives the
    initial frame then one (T, N, 3) original-order chunk per scan chunk
    (frames are routed through state.orig on the host — the device never
    pays the per-step scatter); `checkpoint_fn(Bodies, step)` fires every
    `checkpoint_every` steps.

    Drift guard: the stale-partition approximation assumes bodies move a
    small fraction of a terminal cell between resorts.  Before each
    chunk the loop reads v_max and, if a full `resort_every`-step chunk
    would move the fastest body more than `max_drift_frac` of the
    terminal cell size, falls back to single-step chunks (resort every
    step — the reference's own rebuild-per-step behavior) until the
    system calms down.  Only two scan lengths ever compile.  Set
    max_drift_frac=0 to disable."""
    import numpy as np

    n = pos.shape[0]
    ld_over = int(ld) or (
        min(8, auto_ld(n) + 2) if robust_slots > 0 else None
    )
    _, ld, _, _ = _layout(n, group_size, ld_over)
    fkw = dict(
        theta=theta, softening_sq=softening_sq, leaf_cap=leaf_cap,
        ld=ld, interpret=interpret,
    )
    block = block_tiers > 1
    if block and softening_sq <= 0:
        raise ValueError("block tiers need softening_sq > 0 (the eps scale)")
    # force_chunks="auto": above ~25M bodies a single-program step (or
    # prime) blows the device execution watchdog (~90 s; a 100M eval
    # measured ~210 s in one program) — switch to bounded slice
    # programs.  Frames need per-step history, which the chunked
    # stepper does not carry.
    if force_chunks == "auto":
        force_chunks = 1 if interpret else max(1, -(-n // 25_000_000))
    force_chunks = max(1, int(force_chunks))
    if force_chunks > 1:
        if frame_writer is not None:
            raise ValueError(
                "trajectory frames are unsupported at chunked-step scale "
                "(>25M bodies); rerun with --no-output or --write-every 0"
            )
        if robust_slots > 0:
            raise ValueError(
                "robust mode is unsupported at chunked-step scale: the "
                "exact outlier rectangle is already quadratic there"
            )
        if block:
            raise ValueError(
                "block tiers are unsupported at chunked-step scale"
            )
    state = init_state(pos, vel, mass, G=G, group_size=group_size,
                       robust_slots=robust_slots, ld=ld_over)
    if force_chunks > 1:
        state = prime_chunked(state, n_chunks=force_chunks, **fkw)
    else:
        state = prime(state, **fkw)
    merging = merge_radius > 0
    if merging and block:
        raise ValueError(
            "merging and block tiers cannot combine (a merge invalidates "
            "the tier assignment mid-macro-step); pick one"
        )
    mass_cur = jnp.asarray(mass, jnp.float32)
    merged_total = 0
    tiers = None
    order = sizes = None
    if block:
        tiers = assign_tiers(
            state, dt, eta=block_eta, eps=math.sqrt(softening_sq),
            n_tiers=block_tiers,
        )
        if block_prefix:
            order, sizes = tier_order_sizes(tiers, block_tiers)
    if frame_writer is not None:
        frame_writer(np.asarray(pos, np.float32)[None])

    def flush_frames(state, hist):
        h = np.asarray(hist)  # (T, G, 3, B) planar
        h = h.transpose(0, 1, 3, 2)  # -> (T, G, B, 3)
        dest = np.asarray(state.orig).reshape(-1)
        keep = dest < n
        buf = np.zeros((h.shape[0], n, 3), np.float32)
        buf[:, dest[keep]] = h.reshape(h.shape[0], -1, 3)[:, keep]
        frame_writer(buf)

    # donate the state on real hardware (the loop never reuses the old
    # one); interpret/CPU runs keep the plain path — XLA:CPU ignores
    # donation and some tools re-step the same state
    stepper = kdk_steps if interpret else kdk_steps_donated
    if force_chunks > 1:
        stepper = functools.partial(
            kdk_steps_chunked, n_chunks=force_chunks
        )
    done = 0
    while done < n_steps:
        t = min(resort_every, n_steps - done)
        guarded = False
        if max_drift_frac > 0 and t > 1 and dt != 0:
            v_max = float(jnp.max(jnp.abs(state.vel)))
            cell = float(state.border) / (1 << ld)
            if v_max * abs(dt) * t > max_drift_frac * cell:
                t = 1
                guarded = True
        if checkpoint_every > 0:
            next_ckpt = ((done // checkpoint_every) + 1) * checkpoint_every
            t = min(t, next_ckpt - done)
        if progress_every > 0:
            next_prog = ((done // progress_every) + 1) * progress_every
            t = min(t, next_prog - done)
        if merging:
            next_merge = ((done // merge_every) + 1) * merge_every
            t = min(t, next_merge - done)
        if block:
            if block_prefix:
                if frame_writer is not None:
                    state, hist = kdk_block_prefix_steps(
                        state, tiers, order, t, dt, sizes=sizes,
                        n_tiers=block_tiers, with_history=True, **fkw
                    )
                    flush_frames(state, hist)
                else:
                    state = kdk_block_prefix_steps(
                        state, tiers, order, t, dt, sizes=sizes,
                        n_tiers=block_tiers, **fkw
                    )
            elif frame_writer is not None:
                state, hist = kdk_block_steps(
                    state, tiers, t, dt, n_tiers=block_tiers,
                    with_history=True, **fkw
                )
                flush_frames(state, hist)
            else:
                state = kdk_block_steps(
                    state, tiers, t, dt, n_tiers=block_tiers, **fkw
                )
        elif frame_writer is not None:
            state, hist = stepper(
                state, t, dt, with_history=True, **fkw
            )
            flush_frames(state, hist)
        else:
            state = stepper(state, t, dt, **fkw)
        done += t
        rebuilt = False
        if merging and done % merge_every == 0:
            from nbody_tpu.ops.collisions import merge_pass

            p_o, v_o = emit(state, n)
            p_m, v_m, m_m, nm = merge_pass(
                p_o, v_o, mass_cur, merge_radius, chunk=merge_chunk
            )
            nm = int(nm)  # host sync, once per merge_every steps
            if nm > 0:
                merged_total += nm
                mass_cur = m_m
                state = init_state(
                    p_m, v_m, m_m, G=G, group_size=group_size,
                    robust_slots=robust_slots, ld=ld_over,
                )
                state = prime(state, **fkw)
                rebuilt = True
                if mass_update is not None:
                    mass_update(np.asarray(mass_cur))
        if (
            checkpoint_every > 0
            and checkpoint_fn is not None
            and done % checkpoint_every == 0
        ):
            from nbody_tpu.core.types import Bodies

            p_c, v_c = emit(state, n)
            checkpoint_fn(Bodies(p_c, v_c, mass_cur), done)
        if (
            progress_every > 0
            and progress_fn is not None
            and done % progress_every == 0
        ):
            np.asarray(state.pg[:1, :1, :1])  # fence (real wall time)
            progress_fn(done, "drift-guard: per-step resorts" if guarded else "")
        if done < n_steps and not rebuilt:
            # pure relabeling: acc rides the permutation, no re-prime
            # (a merge rebuild just laid the layout out fresh — skip)
            state = resort(state, n, group_size,
                           robust_slots=robust_slots, ld=ld_over)
            if block:
                tiers = assign_tiers(
                    state, dt, eta=block_eta, eps=math.sqrt(softening_sq),
                    n_tiers=block_tiers,
                )
                if block_prefix:
                    order, sizes = tier_order_sizes(tiers, block_tiers)
    p_out, v_out = emit(state, n)
    np.asarray(p_out[:1])  # device fence (see integrate/leapfrog.simulate)
    if merging:
        if merge_report is not None:
            merge_report(merged_total)
        return p_out, v_out, mass_cur
    return p_out, v_out


def simulate_persistent_adaptive(
    pos,
    vel,
    mass,
    t_start: float,
    t_end: float,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    theta: float = constants.THETA,
    eta: float = 0.025,
    dt_min: float = 0.0,
    dt_max: float,
    group_size: int = 1024,
    leaf_cap: int = 64,
    resort_every: int = 8,
    max_drift_frac: float = 0.25,
    interpret: bool = False,
    frame_writer=None,
    checkpoint_every: int = 0,
    checkpoint_fn=None,
    progress_every: int = 0,
    progress_fn=None,
    robust_slots: int = 0,
    ld: int = 0,
    max_steps: int = 10_000_000,
):
    """Adaptive global dt on the persistent Morton layout: integrate
    from t_start to t_end with dt = sqrt(2 eta eps / |a|_max) per step
    (integrate/adaptive.py criterion) while keeping the resort-amortized
    group layout — the flagship-scale path no longer forces fixed dt
    (VERDICT r3 item 6).  Returns (pos, vel, steps_taken) in original
    order.

    Composition rules:
      * chunks are `resort_every` device steps; resorts land on chunk
        boundaries exactly as in simulate_persistent;
      * the drift guard bounds the fastest body's motion per chunk with
        dt_max (the adaptive dt can only be smaller), falling back to
        single-step chunks while hot;
      * checkpoint/progress fire on REAL step counts (post-arrival
        dt = 0 no-ops only occur in the final chunk);
      * frames: initial frame, then post-drift rows for real steps only
        (the dts > 0 mask), same contract as simulate_adaptive."""
    import numpy as np

    if softening_sq <= 0:
        raise ValueError("adaptive dt needs softening_sq > 0 (the eps scale)")
    if dt_max <= 0:
        raise ValueError("dt_max must be > 0")
    eps = math.sqrt(softening_sq)
    n = pos.shape[0]
    ld_over = int(ld) or (
        min(8, auto_ld(n) + 2) if robust_slots > 0 else None
    )
    _, ld, _, _ = _layout(n, group_size, ld_over)
    fkw = dict(
        theta=theta, softening_sq=softening_sq, leaf_cap=leaf_cap,
        ld=ld, interpret=interpret,
    )
    state = init_state(pos, vel, mass, G=G, group_size=group_size,
                       robust_slots=robust_slots, ld=ld_over)
    state = prime(state, **fkw)
    if frame_writer is not None:
        frame_writer(np.asarray(pos, np.float32)[None])

    def flush_frames(state, hist, real):
        h = np.asarray(hist)[real]  # (T_real, G, 3, B) planar
        if h.shape[0] == 0:
            return
        h = h.transpose(0, 1, 3, 2)  # -> (T, G, B, 3)
        dest = np.asarray(state.orig).reshape(-1)
        keep = dest < n
        buf = np.zeros((h.shape[0], n, 3), np.float32)
        buf[:, dest[keep]] = h.reshape(h.shape[0], -1, 3)[:, keep]
        frame_writer(buf)

    t = float(t_start)
    # f32-carry resolution: the scan snaps t to f32(t_end) on arrival;
    # comparing against the f64 t_end would re-enter forever
    t_end_cmp = float(np.float32(t_end))
    taken = 0
    t_prev = float("-inf")
    while t < t_end_cmp and taken < max_steps:
        # stagnation guard (see integrate/adaptive.simulate_adaptive)
        if t <= t_prev:
            raise RuntimeError(
                f"adaptive dt stagnated at t = {t:g} (< t_end = "
                f"{t_end:g}): dt_max {dt_max:g} is below the f32 time "
                "resolution at this t — raise dt_max or rescale time"
            )
        t_prev = t
        k = resort_every
        guarded = False
        if max_drift_frac > 0 and k > 1:
            v_max = float(jnp.max(jnp.abs(state.vel)))
            cell = float(state.border) / (1 << ld)
            if v_max * dt_max * k > max_drift_frac * cell:
                k = 1
                guarded = True
        if frame_writer is not None:
            state, t_dev, (ts, dts), hist = kdk_adaptive_steps(
                state, k, t, t_end, eta=eta, eps=eps,
                dt_min=dt_min, dt_max=dt_max, with_history=True, **fkw
            )
            real = np.asarray(dts) > 0
            flush_frames(state, hist, real)
        else:
            state, t_dev, (ts, dts) = kdk_adaptive_steps(
                state, k, t, t_end, eta=eta, eps=eps,
                dt_min=dt_min, dt_max=dt_max, **fkw
            )
            real = np.asarray(dts) > 0
        t = float(t_dev)
        taken += int(real.sum())
        if (
            checkpoint_every > 0
            and checkpoint_fn is not None
            and taken > 0
            and (taken % checkpoint_every) < k
        ):
            from nbody_tpu.core.types import Bodies

            p_c, v_c = emit(state, n)
            checkpoint_fn(Bodies(p_c, v_c, mass), taken)
        if progress_every > 0 and progress_fn is not None and (
            taken % progress_every
        ) < k:
            np.asarray(state.pg[:1, :1, :1])  # fence (real wall time)
            progress_fn(
                taken,
                "drift-guard: per-step resorts" if guarded else "",
            )
        if t < t_end:
            state = resort(state, n, group_size,
                           robust_slots=robust_slots, ld=ld_over)
    p_out, v_out = emit(state, n)
    np.asarray(p_out[:1])  # device fence (see integrate/leapfrog.simulate)
    return p_out, v_out, taken
