"""Dense-grid octree build vs the compacted level tree (oracle)."""

import jax.numpy as jnp
import numpy as np

from nbody_tpu.ops.bh_grid import build_grid, grid_offsets
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


def test_grid_start_is_body_offset():
    depth, ld = 5, 3
    pos_s, mass_s, keys_s, _ = _sorted_cloud(1000, depth, seed=11)
    grid = build_grid(pos_s, mass_s, keys_s, depth, ld)
    off = grid_offsets(ld)
    k = 8**ld
    cnt = np.asarray(grid.cnt[0, off[ld] : off[ld] + k])
    start = np.asarray(grid.start[0, off[ld] : off[ld] + k])
    np.testing.assert_array_equal(start, np.cumsum(cnt) - cnt)
