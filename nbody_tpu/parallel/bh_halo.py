"""Morton-halo near-field exchange: per-chip O(N/P + halo) memory.

The Morton-range-sharded Barnes-Hut paths (parallel/bh_shard.py) feed the
fused kernel a planar source array for near-field DMA.  Through round 2
that array was the all_gather of every chip's slots — O(N) per chip, the
last O(N) term in the multichip memory budget (VERDICT r2 item 4).  This
module replaces it with a provably-sufficient halo exchange:

1. **Stageability flags** (`halo_flags`): a cell can contribute a
   near-field range to some group on chip k only if it fails the far
   test against that group's AABB.  Every group AABB is contained in the
   chip's body AABB, and a cell's COM lies inside the cell's box, so
     d(COM, group-AABB) >= d(cell-box, chip-AABB)
   — if the cell box clears the MAC against the whole chip AABB, no
   group of that chip can ever near-stage (or open toward) it.  The
   flags are exact grid geometry versus the all_gathered (P, 6) chip
   AABBs: O(8^ld * P) vector work, no body traffic.
2. **Laminar interval union** (`halo_plan`): the slot ranges of flagged
   cells form a laminar family (tree ranges are nested or disjoint, and
   Morton splitters keep every cell single-owner).  Their union is
   packed in ascending global-slot order, which keeps every flagged
   ancestor's range CONTIGUOUS in the packed layout — including interior
   padding gaps, because the ancestor's own [start, end) interval enters
   the union directly.  Both sender and receiver compute the identical
   plan from replicated inputs (tree tables + AABBs), so no index
   exchange is needed.
3. **Exchange + it-rewrite**: each chip packs its owned slots of every
   other chip's union into a fixed-capacity (P, H_cap) buffer (ONE
   all_to_all), and rewrites its OWN copy of the int octet table so
   flagged cells' starts point into [own slots | halo segments].  The
   fused kernel is unchanged — it just sees a (4, M_l + P*H_cap) source
   array instead of (4, N).

Capacity contract: a union larger than H_cap sets `halo_overflow`
(pmax'd), which the callers poison/raise on — never silent, like every
other capacity in the framework (ops/barneshut.py check_capacities).

The reference has no distributed memory story at all (single device,
SURVEY.md §2.5); the CUDA analog of what the halo bounds is the
shared-memory j-tile window of cuda/barnes-hut.cu:538-629, lifted from
threadblock scale to mesh scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.ops.bh_grid import grid_offsets

_IMAX = jnp.int32(2**31 - 1)


def _compact3(v: jax.Array) -> jax.Array:
    """Inverse of morton._spread3: gather every 3rd bit (uint32)."""
    v = v & jnp.uint32(0x09249249)
    v = (v | (v >> 2)) & jnp.uint32(0x030C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0300F00F)
    v = (v | (v >> 8)) & jnp.uint32(0x030000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def chip_aabbs(pos, valid, axis_name):
    """(P, 6) [lox loy loz hix hiy hiz] of every chip's real bodies.
    `valid` masks pad slots (their coordinates are arbitrary)."""
    big = jnp.float32(3e38)
    lo = jnp.min(jnp.where(valid[:, None], pos, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], pos, -big), axis=0)
    mine = jnp.concatenate([lo, hi]).astype(jnp.float32)
    return lax.all_gather(mine, axis_name, axis=0)  # (P, 6)


def halo_flags(span, border, theta, leaf_cap, ld, aabbs, pad=0.0):
    """(T, P) bool: cell c might be near-STAGED by some group of chip p.

    `span` is the (T,) it-table span per cell (levels 0..ld concatenated)
    — the SAME value the kernel's classify uses as a conservative count,
    so the leaf test here matches the kernel exactly.  `pad` inflates the
    AABBs (persistent path: bodies drift between resorts; the drift guard
    bounds the motion, see bh_shard)."""
    off = grid_offsets(ld)
    n_chips = aabbs.shape[0]
    theta_sq = jnp.float32(theta) * jnp.float32(theta)
    alo = aabbs[:, 0:3] - pad  # (P, 3)
    ahi = aabbs[:, 3:6] + pad
    out = [jnp.zeros((1, n_chips), bool)]  # root: never staged
    for d in range(1, ld + 1):
        ids = jnp.arange(8**d, dtype=jnp.uint32)
        ci = jnp.stack(
            [_compact3(ids), _compact3(ids >> 1), _compact3(ids >> 2)],
            axis=1,
        ).astype(jnp.float32)  # (C, 3) integer cell coords
        cell = border / jnp.float32(2**d)
        lo = ci * cell - border * 0.5  # (C, 3)
        hi = lo + cell
        # per-axis box-to-AABB separation, (C, P)
        gap = jnp.maximum(
            alo[None, :, :] - hi[:, None, :], lo[:, None, :] - ahi[None, :, :]
        )
        gap = jnp.maximum(gap, 0.0)
        d2 = jnp.sum(gap * gap, axis=-1)  # (C, P)
        sp_d = span[off[d] : off[d + 1]]
        exists = sp_d > 0
        leafish = (sp_d <= leaf_cap) | (d == ld)
        not_far = ~(theta_sq * d2 > cell * cell)
        out.append(not_far & (exists & leafish)[:, None])
    return jnp.concatenate(out, axis=0)  # (T, P)


def halo_plan(start, span, flags, m_l: int, h_cap: int):
    """Pack plans for every destination chip, from replicated inputs.

    start/span: (T,) global it-table cell ranges (levels concatenated).
    flags: (T, P) stageability.  Returns a dict of traced arrays:

      counts   (P_dst, P_src) i32 — union measure per (dst, src) segment
      send_slot(P_dst, H)     i32 — global slots THIS chip's segment must
                                    ship to each dst (call-site slices to
                                    its own segment via `counts`)
      packed   (T, P_dst)     i32 — packed offset of each flagged cell
                                    within its (src-segment, dst) union
      overflow ()             i32 — max over pairs of (measure - H)

    Every chip computes the identical plan; the caller uses its own row
    of `send_slot` (dst-major) to build the all_to_all send buffer and
    its own column of `packed` to rewrite its it table.
    """
    t_all = start.shape[0]
    n_dst = flags.shape[1]
    owner = jnp.where(span > 0, start // m_l, _IMAX)
    en = start + span

    sel = flags & (span > 0)[:, None]  # (T, P_dst)
    sts = jnp.where(sel, start[:, None], _IMAX).T  # (P_dst, T)
    ens = jnp.where(sel, en[:, None], 0).T

    order = jnp.argsort(sts, axis=1)  # (P_dst, T)
    st_s = jnp.take_along_axis(sts, order, axis=1)
    en_s = jnp.take_along_axis(ens, order, axis=1)
    # exclusive running coverage end (laminar family: coverage up to here
    # is the max earlier interval end, gap-free within any ancestor)
    cme = jnp.concatenate(
        [
            jnp.zeros((n_dst, 1), jnp.int32),
            lax.associative_scan(jnp.maximum, en_s, axis=1)[:, :-1],
        ],
        axis=1,
    )
    start_eff = jnp.maximum(st_s, cme)
    len_eff = jnp.maximum(
        jnp.where(st_s < _IMAX, en_s - start_eff, 0), 0
    )
    coff = jnp.cumsum(len_eff, axis=1) - len_eff  # exclusive
    total = coff[:, -1] + len_eff[:, -1]

    # packed offset per flagged cell within the FULL (cross-segment)
    # union: coff at its sort slot, minus the already-counted coverage
    # beyond its own start (nesting correction; exact for laminar sets)
    inv = (
        jnp.zeros((n_dst, t_all), jnp.int32)
        .at[jnp.arange(n_dst)[:, None], order]
        .set(jnp.broadcast_to(jnp.arange(t_all, dtype=jnp.int32), (n_dst, t_all)))
    )
    coff_c = jnp.take_along_axis(coff, inv, axis=1)  # (P_dst, T)
    cme_c = jnp.take_along_axis(cme, inv, axis=1)
    packed_full = coff_c - jnp.maximum(cme_c - start[None, :], 0)

    # union measure before each segment boundary -> per-(dst, src) counts
    bounds = (jnp.arange(n_dst + 1, dtype=jnp.int32) * m_l)  # (P+1,)
    bpos = jax.vmap(lambda a: jnp.searchsorted(a, bounds, side="left"))(
        st_s
    )  # (P_dst, P+1)
    coff_ext = jnp.concatenate([coff, total[:, None]], axis=1)
    m_before = jnp.take_along_axis(
        coff_ext, jnp.minimum(bpos, t_all), axis=1
    )  # (P_dst, P+1)
    counts = m_before[:, 1:] - m_before[:, :-1]  # (P_dst, P_src)

    # packed offset within the cell's own (src, dst) segment
    mb_cell = jnp.take_along_axis(
        m_before,
        jnp.clip(owner[None, :], 0, n_dst).astype(jnp.int32),
        axis=1,
    )
    packed = (packed_full - mb_cell).T  # (T, P_dst)

    # expansion: slot r of U_q = start_eff[i] + (r - coff[i]) with i the
    # effective interval containing r.  The caller is src chip k: for dst
    # q it ships U_q's slots [m_before[q, k], m_before[q, k] + counts[q, k])
    # in ascending order (entries past the count are garbage; the caller
    # masks them).
    def send_slots(k):
        r0 = jnp.take_along_axis(
            m_before, jnp.broadcast_to(k, (n_dst, 1)), axis=1
        )  # (P_dst, 1)

        def expand(q_coff, q_start_eff, q_len, q_r0):
            rr = q_r0 + jnp.arange(h_cap, dtype=jnp.int32)
            cs = q_coff + q_len  # cumulative inclusive ends
            i = jnp.minimum(
                jnp.searchsorted(cs, rr, side="right"), t_all - 1
            )
            return q_start_eff[i] + (rr - q_coff[i])

        return jax.vmap(expand)(
            coff, start_eff, len_eff, r0[:, 0]
        )  # (P_dst, H)

    ovf = jnp.max(counts - h_cap)
    return {
        "counts": counts,
        "send_slots": send_slots,
        "packed": packed,
        "overflow": ovf,
    }


def rewrite_starts(start, span, flags, packed, counts, k, m_l: int, h_cap: int):
    """Per-chip it-table start rewrite for the [own | halo] layout.

    Own cells keep their in-segment offset; remote flagged cells point at
    M_l + src*H_cap + packed; everything else (never near-staged on this
    chip, guaranteed by the flags' conservative MAC) parks at 0."""
    owner = jnp.where(span > 0, start // m_l, -1)
    own = owner == k
    pk = jnp.take_along_axis(
        packed, jnp.broadcast_to(k, (packed.shape[0], 1)), axis=1
    )[:, 0]
    fl = jnp.take_along_axis(
        flags, jnp.broadcast_to(k, (flags.shape[0], 1)), axis=1
    )[:, 0]
    remote = fl & (span > 0) & ~own
    new = jnp.where(own, start - k * m_l, 0)
    new = jnp.where(remote, m_l + owner * h_cap + pk, new)
    return new.astype(jnp.int32)
