"""Dense-grid octree build vs the compacted level tree (oracle)."""

import jax.numpy as jnp
import numpy as np

from nbody_tpu.ops.bh_grid import build_deep_subset, build_grid, grid_offsets
from nbody_tpu.ops.bh_tree import build_tree
from nbody_tpu.ops.morton import morton_sort


def _sorted_cloud(n, depth, seed=0, clustered=False):
    rng = np.random.default_rng(seed)
    if clustered:
        half = n // 2
        pos = np.concatenate(
            [
                rng.normal([-1.0, 0, 0], 0.02, size=(half, 3)),
                rng.uniform(-2.0, 2.0, size=(n - half, 3)),
            ]
        )
    else:
        pos = rng.uniform(-2.0, 2.0, size=(n, 3))
    mass = rng.uniform(0.04, 1.0, size=(n,))
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    perm, keys, border = morton_sort(pos, depth)
    return pos[perm], mass[perm], keys[perm], border


def test_grid_matches_compacted_tree():
    depth, ld = 6, 4
    pos_s, mass_s, keys_s, _ = _sorted_cloud(5000, depth, seed=3)
    grid = build_grid(pos_s, mass_s, keys_s, depth, ld)
    levels = build_tree(pos_s, mass_s, keys_s, depth)
    off = grid_offsets(ld)

    for d in range(ld + 1):
        k = 8**d
        cnt_d = np.asarray(grid.cnt[0, off[d] : off[d] + k])
        gm_d = np.asarray(grid.gm[0, off[d] : off[d] + k])
        com_d = np.stack(
            [
                np.asarray(grid.cx[0, off[d] : off[d] + k]),
                np.asarray(grid.cy[0, off[d] : off[d] + k]),
                np.asarray(grid.cz[0, off[d] : off[d] + k]),
            ],
            axis=1,
        )
        start_d = np.asarray(grid.start[0, off[d] : off[d] + k])

        lvl = levels[d]
        occ = np.flatnonzero(cnt_d > 0)
        n_occ = len(occ)
        # occupied dense cells in Morton order == compacted nodes in order
        np.testing.assert_array_equal(cnt_d[occ], np.asarray(lvl.count)[:n_occ])
        # upward reshape-reduction sums in a different order than the
        # direct per-level segment_sum: f32 noise only
        np.testing.assert_allclose(
            gm_d[occ], np.asarray(lvl.mass)[:n_occ], rtol=1e-5
        )
        np.testing.assert_allclose(
            com_d[occ], np.asarray(lvl.com)[:n_occ], rtol=2e-5, atol=2e-5
        )
        np.testing.assert_array_equal(start_d[occ], np.asarray(lvl.start)[:n_occ])
        assert int(np.asarray(lvl.count)[n_occ:].max(initial=0)) == 0


def test_deep_subset_matches_compacted_tree():
    depth, ld, leaf_cap, cap = 6, 2, 8, 4096
    pos_s, mass_s, keys_s, _ = _sorted_cloud(3000, depth, seed=7, clustered=True)
    grid = build_grid(pos_s, mass_s, keys_s, depth, ld)
    deep = build_deep_subset(pos_s, mass_s, keys_s, depth, ld, leaf_cap, cap)
    levels = build_tree(pos_s, mass_s, keys_s, depth)
    off = grid_offsets(ld)

    cnt_t = np.asarray(grid.cnt[0, off[ld] : off[ld] + 8**ld])
    assert int(deep.n_subset) == int(cnt_t[cnt_t > leaf_cap].sum())
    assert int(deep.n_subset) > 0  # the fixture must actually exercise this

    # Every over-full terminal cell bridges to level-(ld+1) subset children
    # whose aggregates match the full compacted tree's nodes.
    keys_np = np.asarray(keys_s)
    nid_t = keys_np >> (3 * (depth - ld))
    sub_lvl = deep.levels[0]  # level ld+1 (subset)
    full_lvl = levels[ld + 1]  # level ld+1 (all bodies, compacted)

    bs = np.asarray(deep.child_start[0])
    bc = np.asarray(deep.child_count[0])
    for c in np.flatnonzero(cnt_t > leaf_cap):
        body_sel = nid_t == c
        prefixes = np.unique(
            keys_np[body_sel] >> (3 * (depth - (ld + 1)))
        )
        assert bc[c] == len(prefixes)
        for j in range(bc[c]):
            s_idx = bs[c] + j
            # find matching full-tree node by (start, count) identity
            s_start = int(np.asarray(sub_lvl.start)[s_idx])
            s_cnt = int(np.asarray(sub_lvl.count)[s_idx])
            f_starts = np.asarray(full_lvl.start)
            f_cnts = np.asarray(full_lvl.count)
            match = np.flatnonzero((f_starts == s_start) & (f_cnts == s_cnt))
            assert len(match) >= 1
            np.testing.assert_allclose(
                np.asarray(sub_lvl.com)[s_idx],
                np.asarray(full_lvl.com)[match[0]],
                rtol=2e-5,
                atol=2e-5,
            )


def test_grid_start_is_body_offset():
    depth, ld = 5, 3
    pos_s, mass_s, keys_s, _ = _sorted_cloud(1000, depth, seed=11)
    grid = build_grid(pos_s, mass_s, keys_s, depth, ld)
    off = grid_offsets(ld)
    k = 8**ld
    cnt = np.asarray(grid.cnt[0, off[ld] : off[ld] + k])
    start = np.asarray(grid.start[0, off[ld] : off[ld] + k])
    np.testing.assert_array_equal(start, np.cumsum(cnt) - cnt)
