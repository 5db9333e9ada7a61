import jax.numpy as jnp

from conftest import random_cloud
from nbody_tpu.diag.treedump import level_summary, print_tree_indented
from nbody_tpu.ops.bh_tree import build_tree
from nbody_tpu.ops.morton import morton_sort


def _tree(n=300, depth=4):
    arr = random_cloud(n, seed=61)
    pos = jnp.asarray(arr[:, :3], jnp.float64)
    mass = jnp.asarray(arr[:, 6], jnp.float64)
    perm, keys, border = morton_sort(pos, depth)
    return build_tree(pos[perm], mass[perm], keys[perm], depth)


def test_level_summary():
    levels = _tree()
    s = level_summary(levels)
    lines = s.splitlines()
    assert len(lines) == 5  # depth 4 -> levels 0..4
    assert "level 0: 1 nodes" in lines[0]
    assert "bodies 300" in lines[0]  # every level covers all bodies


def test_print_tree_indented():
    levels = _tree()
    s = print_tree_indented(levels, max_depth=2)
    assert s.startswith("[0:0] n=300")
    assert "[1:" in s and "[2:" in s
