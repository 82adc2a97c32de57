"""LBVH structural invariants + traversal equivalence (SURVEY §4: exact
structural tests for LBVH; traversal-vs-brute-force equality)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.accel.lbvh import build_lbvh
from pathtracer_tpu.ops import intersect, traversal
from pathtracer_tpu.scene.scene import SceneBuilder
from pathtracer_tpu.scene.worlds import get_world


def _small_world(n=40, seed=7):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    for i in range(n):
        c = rng.normal(0, 3, 3)
        if i % 2 == 0:
            b.add_sphere(c, 0.3 + 0.2 * rng.random(), m)
        else:
            b.add_triangle(c, c + rng.normal(0, 1, 3), c + rng.normal(0, 1, 3), m)
    return b.build()


def _check_invariants(scene, bvh):
    n = scene.num_prims
    num_nodes = 2 * n - 1
    left, right, parent = map(np.asarray, (bvh.left, bvh.right, bvh.parent))
    obj = np.asarray(bvh.obj_id)
    # layout: internal [0, n-2], leaves [n-1, 2n-2] (bvh.h:76-85)
    assert (obj[:n - 1] == -1).all()
    assert sorted(obj[n - 1:]) == list(range(n)), "leaves cover all prims"
    # single-parent, consistent child links
    child_count = np.zeros(num_nodes, int)
    for i in range(n - 1):
        for c in (left[i], right[i]):
            assert 0 <= c < num_nodes
            child_count[c] += 1
            assert parent[c] == i
    assert child_count[0] == 0 and (child_count[1:] == 1).all()
    # boxes contain children (fixes growBBox defects, bvh.h:117-130)
    bmin, bmax = np.asarray(bvh.box_min), np.asarray(bvh.box_max)
    for i in range(n - 1):
        for c in (left[i], right[i]):
            assert (bmin[i] <= bmin[c] + 1e-5).all()
            assert (bmax[i] >= bmax[c] - 1e-5).all()
    # internal boxes are NOT inflated to contain the origin (quirk table)
    # escape links: DFS using (left, escape) visits every node exactly once
    esc = np.asarray(bvh.escape)
    seen = []
    ptr = 0
    for _ in range(2 * num_nodes):
        if ptr == num_nodes:
            break
        seen.append(ptr)
        ptr = left[ptr] if obj[ptr] == -1 else esc[ptr]
        if obj[seen[-1]] == -1:
            pass
    # a full DFS by threading: internal -> left, leaf -> escape gives the
    # preorder only when boxes always hit; instead verify escape = next
    # subtree root in preorder:
    order = []
    stack = [0]
    while stack:
        x = stack.pop()
        order.append(x)
        if obj[x] == -1:
            stack.append(right[x])
            stack.append(left[x])
    pos = {x: k for k, x in enumerate(order)}
    sub_size = np.ones(num_nodes, int)
    for x in reversed(order):
        if obj[x] == -1:
            sub_size[x] += sub_size[left[x]] + sub_size[right[x]]
    for x in range(num_nodes):
        k = pos[x] + sub_size[x]
        expect = order[k] if k < len(order) else num_nodes
        assert esc[x] == expect, f"escape mismatch at node {x}"


@pytest.mark.parametrize("maker", [
    lambda: _small_world(3), lambda: _small_world(40),
    lambda: get_world("test")[0]])
def test_lbvh_invariants(maker):
    scene = maker()
    bvh = build_lbvh(scene)
    _check_invariants(scene, bvh)


def test_lbvh_single_prim():
    b = SceneBuilder()
    m = b.add_lambertian((1, 1, 1))
    b.add_sphere((0, 0, 0), 1.0, m)
    scene = b.build()
    bvh = build_lbvh(scene)
    assert bvh.num_nodes == 1
    assert int(bvh.obj_id[0]) == 0
    # root-is-leaf traversal (render_manager.h:92-98 special case)
    nodes = traversal.pack_fat_nodes(scene, bvh)
    o = jnp.array([[0.0, 0.0, 5.0]]); d = jnp.array([[0.0, 0.0, -1.0]])
    idx, _, valid = traversal.traverse(nodes, o, d, 1e-3, intersect.BIG_T)
    assert bool(valid[0]) and int(idx[0]) == 0


def test_lbvh_duplicate_centers():
    """Duplicate morton codes are tie-broken by object id
    (morton_code.h:11-17: id in the low 32 bits of the sort key)."""
    b = SceneBuilder()
    m = b.add_lambertian((1, 1, 1))
    for _ in range(8):
        b.add_sphere((0, 0, 0), 1.0, m)  # identical boxes -> equal codes
    scene = b.build()
    bvh = build_lbvh(scene)
    _check_invariants(scene, bvh)


def test_traversal_matches_brute_force(rng):
    scene = _small_world(64)
    bvh = build_lbvh(scene)
    nodes = traversal.pack_fat_nodes(scene, bvh)
    R = 512
    o = jnp.asarray(rng.normal(0, 5, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    idx_t, _, val_t = traversal.traverse(nodes, o, d, 1e-3, intersect.BIG_T)
    idx_b, _, val_b = intersect.brute_force_closest(scene, o, d, 1e-3,
                                                    intersect.BIG_T)
    np.testing.assert_array_equal(np.asarray(val_t), np.asarray(val_b))
    np.testing.assert_array_equal(np.asarray(idx_t)[np.asarray(val_b)],
                                  np.asarray(idx_b)[np.asarray(val_b)])


def test_build_deterministic():
    """Same scene -> bit-identical BVH (races designed out, SURVEY §5)."""
    scene = _small_world(32)
    a = build_lbvh(scene)
    b = build_lbvh(jax.tree_util.tree_map(jnp.copy, scene))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
