"""Spanning-tree invariants after random graph growth: cached/incremental
queries must match from-scratch BFS (SURVEY.md §5, "Spanning-tree
invariants")."""

import random
from collections import deque

from srba_tpu.graph.spantree import KeyframeGraph


def brute_force_dist(edges, num_kfs, root, max_depth):
    adj = [[] for _ in range(num_kfs)]
    for eid, (a, b) in enumerate(edges):
        adj[a].append((b, eid))
        adj[b].append((a, eid))
    dist = {root: 0}
    q = deque([root])
    while q:
        n = q.popleft()
        if dist[n] >= max_depth:
            continue
        for nb, _ in adj[n]:
            if nb not in dist:
                dist[nb] = dist[n] + 1
                q.append(nb)
    return dist


def test_chain_paths():
    g = KeyframeGraph(max_tree_depth=3)
    for _ in range(6):
        g.add_keyframe()
    for i in range(5):
        g.add_edge(i + 1, i)  # edge (new, old): pose of old in new frame
    # Path 3 -> 1 walks edges (3,2) then (2,1), both direct (+1).
    assert g.path(3, 1) == [(2, 1), (1, 1)]
    # Path 1 -> 3 is the reverse with flipped signs.
    assert g.path(1, 3) == [(1, -1), (2, -1)]
    # Depth bound respected: 0 -> 5 is 5 hops > 3.
    assert g.path(0, 5) is None
    assert g.path(0, 3) == [(0, -1), (1, -1), (2, -1)]
    assert g.path(2, 2) == []


def test_loop_shortens_path():
    g = KeyframeGraph(max_tree_depth=4)
    for _ in range(8):
        g.add_keyframe()
    for i in range(7):
        g.add_edge(i + 1, i)
    assert g.distance(0, 7) is None  # 7 hops, beyond depth 4
    g.add_edge(7, 0)  # loop closure
    assert g.distance(0, 7) == 1
    assert g.path(0, 7) == [(7, -1)]
    # Path 1 -> 6 now goes around the loop: 1-0-7-6 (3 hops vs 5).
    assert g.distance(1, 6) == 3


def test_random_growth_matches_bruteforce():
    rng = random.Random(42)
    g = KeyframeGraph(max_tree_depth=3)
    edges = []
    g.add_keyframe()
    for step in range(60):
        kf = g.add_keyframe()
        # Always connect to previous KF plus occasional random extra edge.
        g.add_edge(kf, kf - 1)
        edges.append((kf, kf - 1))
        if step % 7 == 3 and kf > 3:
            other = rng.randrange(0, kf - 1)
            g.add_edge(kf, other)
            edges.append((kf, other))
        # Interleave queries to exercise cache invalidation.
        if step % 5 == 0:
            for root in rng.sample(range(g.num_kfs), min(4, g.num_kfs)):
                got, _ = g.bfs_tree(root)
                want = brute_force_dist(edges, g.num_kfs, root, 3)
                assert got == want, f"root {root} step {step}"
    # Final full check over every root.
    for root in range(g.num_kfs):
        got, _ = g.bfs_tree(root)
        want = brute_force_dist(edges, g.num_kfs, root, 3)
        assert got == want


def test_path_is_consistent_with_parent_tree():
    rng = random.Random(1)
    g = KeyframeGraph(max_tree_depth=4)
    g.add_keyframe()
    for _ in range(40):
        kf = g.add_keyframe()
        g.add_edge(kf, kf - 1)
        if rng.random() < 0.3 and kf > 2:
            g.add_edge(kf, rng.randrange(0, kf - 1))
    for _ in range(50):
        src = rng.randrange(g.num_kfs)
        dst = rng.randrange(g.num_kfs)
        p = g.path(src, dst)
        d = g.distance(src, dst)
        if d is None:
            assert p is None
        else:
            assert p is not None and len(p) == d
            # Walk the path and check endpoint connectivity.
            cur = src
            for eid, sign in p:
                a, b = g.edges[eid]
                cur = b if sign == 1 else a
                assert (a if sign == 1 else b) != cur
            assert cur == dst


def test_complete_spanning_tree_reaches_component():
    g = KeyframeGraph(max_tree_depth=2)
    for _ in range(10):
        g.add_keyframe()
    for i in range(9):
        g.add_edge(i + 1, i)
    dist, parent = g.complete_spanning_tree(0)
    assert set(dist) == set(range(10))
    assert dist[9] == 9
    assert len(parent) == 9
