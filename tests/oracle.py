"""Independent NumPy oracles for parity testing.

These are straight-line float64 NumPy ports of the reference *semantics*
(not its code): the all-pairs force (serial/exhaustive.c:155-181), the KDK
propagation loop (serial/exhaustive.c:192-255), the recursive Barnes-Hut
octree (serial/barnes-hut.c:101-434), and the energy invariant
(common/get_energy.c:7-47).  The JAX implementations in nbody_tpu are
tested against these, and these in turn are pinned against golden outputs
produced by compiling and running the reference binaries
(tests/data/golden_*.csv).
"""

from __future__ import annotations

import numpy as np

BIG_G = 1.0
THETA = 0.5
EPS2 = 0.01


def accel_exhaustive(pos: np.ndarray, mass: np.ndarray, G: float = BIG_G) -> np.ndarray:
    d = pos[None, :, :] - pos[:, None, :]
    r2 = (d * d).sum(-1) + EPS2
    w = G * mass[None, :] * r2 ** -1.5
    return np.einsum("ij,ijk->ik", w, d)


def accel_exhaustive_f64(pos, mass, G: float = BIG_G) -> np.ndarray:
    """accel_exhaustive with inputs promoted to float64 — the common
    parity oracle for f32 device paths (shared by the fused/persistent/
    sharded kernel tests; one definition so the softening/G conventions
    cannot drift between files)."""
    return accel_exhaustive(
        np.asarray(pos, np.float64), np.asarray(mass, np.float64), G=G
    )


def propagate(
    pos: np.ndarray,
    vel: np.ndarray,
    mass: np.ndarray,
    n_steps: int,
    dt: float,
    accel_fn=accel_exhaustive,
):
    """KDK loop in the reference's exact order; returns the final state and
    the (n_steps+1, N, 3) frame history (initial state + one per step)."""
    pos, vel = pos.copy(), vel.copy()
    hist = [pos.copy()]
    acc = accel_fn(pos, mass)
    for _ in range(n_steps):
        vel += acc * (dt / 2.0)
        pos += vel * dt
        hist.append(pos.copy())
        acc = accel_fn(pos, mass)
        vel += acc * (dt / 2.0)
    return pos, vel, np.stack(hist)


def energy(pos: np.ndarray, vel: np.ndarray, mass: np.ndarray, G: float = BIG_G):
    """(KE, PE) with the reference conventions (common/get_energy.c:7-47)."""
    ke = 0.5 * float((mass * (vel * vel).sum(-1)).sum())
    n = len(mass)
    pe = 0.0
    d = pos[None, :, :] - pos[:, None, :]
    r = np.sqrt((d * d).sum(-1))
    iu = np.triu_indices(n, k=0)
    rr = r[iu]
    inv = np.where(rr > 0, 1.0 / np.where(rr > 0, rr, 1.0), 0.0)
    pe = float((-(mass[:, None] * mass[None, :])[iu] * inv).sum()) * G
    return ke, pe


# ---------------------------------------------------------------------------
# Recursive Barnes-Hut oracle (matches serial/barnes-hut.c semantics).
# ---------------------------------------------------------------------------


class _Leaf:
    __slots__ = ("body",)

    def __init__(self, body: int):
        self.body = body


class _Internal:
    __slots__ = ("children", "ents", "center", "mass")

    def __init__(self):
        self.children: list = [None] * 8
        self.ents = 0
        self.center = np.zeros(3)
        self.mass = 0.0


def _octant(p, center, border):
    """Octant index z*4 + y*2 + x; child center shifts by border/4 and the
    border halves (serial/barnes-hut.c:114-133).  Returns (k, center', border')."""
    x = int(p[0] >= center[0])
    y = int(p[1] >= center[1])
    z = int(p[2] >= center[2])
    q = border / 4.0
    nc = center + np.array([q if x else -q, q if y else -q, q if z else -q])
    return z * 4 + y * 2 + x, nc, border / 2.0


def bh_build(pos: np.ndarray, mass: np.ndarray):
    """Octree build: root cube centered at the origin with border
    2*max|coord| (serial/barnes-hut.c:326-344); insert descends creating a
    chain of internal nodes when two bodies share an octant (:169-270);
    post-order mass-weighted COM accumulation (:285-317)."""
    border0 = 2.0 * float(np.abs(pos).max())
    root = _Internal()

    for i in range(len(mass)):
        node, center, border = root, np.zeros(3), border0
        while True:
            k, center, border = _octant(pos[i], center, border)
            child = node.children[k]
            if child is None:
                node.children[k] = _Leaf(i)
                node.ents += 1
                break
            if isinstance(child, _Leaf):
                # Collision: replace the leaf with a chain of internal nodes
                # until the two bodies land in different octants (the
                # reference's split loop, serial/barnes-hut.c:206-245).
                j = child.body
                node.ents += 1
                parent, slot = node, k
                ic, ib = center, border          # body i's cube coords
                jc, jb = center.copy(), border   # body j's cube coords
                while True:
                    branch = _Internal()
                    branch.ents = 2
                    parent.children[slot] = branch
                    ki, ic, ib = _octant(pos[i], ic, ib)
                    kj, jc, jb = _octant(pos[j], jc, jb)
                    if ki != kj:
                        branch.children[ki] = _Leaf(i)
                        branch.children[kj] = _Leaf(j)
                        break
                    parent, slot = branch, ki
                break
            # Internal: descend.
            node.ents += 1
            node = child

    _com(root, pos, mass)
    return root, border0


def _com(node, pos, mass):
    """Post-order center-of-mass (serial/barnes-hut.c:285-317)."""
    if isinstance(node, _Leaf):
        return pos[node.body], float(mass[node.body])
    node.mass = 0.0
    node.center = np.zeros(3)
    for ch in node.children:
        if ch is None:
            continue
        c_center, c_mass = _com(ch, pos, mass)
        new_mass = node.mass + c_mass
        node.center = c_center * (c_mass / new_mass) + node.center * (
            node.mass / new_mass
        )
        node.mass = new_mass
    return node.center, node.mass


def accel_bh(
    pos: np.ndarray,
    mass: np.ndarray,
    G: float = BIG_G,
    theta: float = THETA,
) -> np.ndarray:
    """Theta-gated traversal (serial/barnes-hut.c:389-441): accept a node
    when border/dist < theta or it is a leaf; the body's own leaf is skipped
    during descent (:411, `indx != id`)."""
    root, border0 = bh_build(pos, mass)
    acc = np.zeros_like(pos)

    def node_com(node):
        if isinstance(node, _Leaf):
            return pos[node.body], float(mass[node.body])
        return node.center, node.mass

    def walk(node, border, i, out):
        com, m = node_com(node)
        d = com - pos[i]
        dist = float(np.sqrt((d * d).sum()))
        is_leaf = isinstance(node, _Leaf) or node.ents == 1
        if (dist > 0 and border / dist < theta) or is_leaf:
            r2 = float((d * d).sum()) + EPS2
            out += G * d * (r2 ** -1.5) * m
            return
        for ch in node.children:
            if ch is None:
                continue
            if isinstance(ch, _Leaf) and ch.body == i:
                continue  # self-skip
            walk(ch, border / 2.0, i, out)

    for i in range(len(mass)):
        walk(root, border0, i, acc[i])
    return acc
