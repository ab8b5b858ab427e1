"""Chordal initialization (solver/chordal.py): rotation averaging + linear
translation recovery ahead of the LM-PCG global optimizer.

The acceptance stress: a loop trajectory whose odometry-only initial guess
has MULTIPLE REVOLUTIONS of accumulated yaw drift — plain LM-PCG is local
and traps there; with chordal_init=True it must converge to a small ATE.
"""

import numpy as np
import pytest

from srba_tpu.ops.np_lie import NpSE2, NpSE3
from srba_tpu.solver.global_graphslam import (PGOConfig,
                                              optimize_global_pose_graph)


def _ate(G, gt, d):
    return float(np.sqrt(np.mean(np.sum((G[:, :d] - gt[:, :d]) ** 2,
                                        axis=-1))))


def _se3_circle(K, radius):
    th = 2 * np.pi * np.arange(K) / K
    return np.stack([NpSE3.pexp(np.asarray(
        [radius * np.cos(t), radius * np.sin(t), 0, 0, 0, t + np.pi / 2],
        np.float32)) for t in th])


def _drifted_problem(group, gt, yaw_revolutions, closures, seed=0):
    """Edges: near-exact consecutive relative poses + exact loop closures.
    Nodes: dead-reckoned from edges with a per-step yaw bias accumulating
    ``yaw_revolutions`` full turns over the trajectory — the regime where
    a local optimizer cannot unwind the orientation error."""
    np_g = NpSE2 if group == "SE2" else NpSE3
    K = len(gt)
    rng = np.random.default_rng(seed)
    dof = 3 if group == "SE2" else 6
    sig = 0.005

    def rel(i, j):
        return np_g.compose(np_g.inverse(gt[i]), gt[j]).astype(np.float32)

    edges = [{"from": k - 1, "to": k, "rel_pose": np_g.retract(
        rel(k - 1, k), (rng.normal(0, sig, dof)).astype(np.float32))}
        for k in range(1, K)]
    for i, j in closures:
        edges.append({"from": i, "to": j, "rel_pose": rel(i, j)})

    # Dead-reckon with a constant yaw-rate bias.
    bias = np.zeros(dof, np.float32)
    bias[-1] = 2 * np.pi * yaw_revolutions / (K - 1)   # yaw slot in both
    nodes = np.zeros_like(gt)
    nodes[0] = gt[0]
    for k in range(1, K):
        step = np_g.retract(edges[k - 1]["rel_pose"], bias)
        nodes[k] = np_g.compose(nodes[k - 1], step)
    return {"group": group, "nodes": nodes.astype(np.float32),
            "edges": edges}


class TestChordalSE3:
    def test_four_revolutions_yaw_drift_converges(self):
        radius = 10.0
        gt = _se3_circle(120, radius)
        closures = [(i, (i + 60) % 120) for i in range(0, 120, 10)] \
            + [(0, 119)]
        prob = _drifted_problem("SE3", gt, yaw_revolutions=4.0,
                                closures=closures)
        # Sanity: the initial guess really is catastrophically wrong.
        assert _ate(prob["nodes"], gt, 3) > radius

        # Plain LM-PCG traps (documents the basin problem it owns).
        G_plain, _ = optimize_global_pose_graph(
            prob, PGOConfig(group="SE3", max_outer=40, cg_iters=100))
        ate_plain = _ate(G_plain, gt, 3)

        G, info = optimize_global_pose_graph(
            prob, PGOConfig(group="SE3", max_outer=40, cg_iters=100,
                            chordal_init=True, chordal_cg_iters=400))
        ate = _ate(G, gt, 3)
        assert ate < 0.1 * radius, (ate, ate_plain)
        assert ate < 0.1, (ate, ate_plain)   # in practice it nails it
        assert ate < ate_plain / 10 or ate_plain < 0.1

    def test_chordal_not_worse_on_easy_problem(self):
        """On a mild problem chordal init must reach the same optimum as the
        plain solver (the noise floor, not zero, bounds the ATE here)."""
        gt = _se3_circle(60, 6.0)
        prob = _drifted_problem("SE3", gt, yaw_revolutions=0.02,
                                closures=[(0, 59), (10, 40)])
        cfg = dict(group="SE3", max_outer=30, cg_iters=80)
        G_plain, i_plain = optimize_global_pose_graph(
            prob, PGOConfig(**cfg))
        G, info = optimize_global_pose_graph(
            prob, PGOConfig(chordal_init=True, **cfg))
        assert info["err_final"] == pytest.approx(
            i_plain["err_final"], rel=0.05, abs=1e-6)
        assert _ate(G, gt, 3) <= _ate(G_plain, gt, 3) * 1.2 + 0.01
        # Chordal also hands LM a far better starting point.
        assert info["err_init"] < i_plain["err_init"] / 10

    def test_untouched_nodes_keep_input(self):
        gt = _se3_circle(20, 5.0)
        prob = _drifted_problem("SE3", gt, yaw_revolutions=0.0,
                                closures=[(0, 19)])
        # Append two disconnected nodes with sentinel values.
        sentinel = np.tile(NpSE3.pexp(
            np.asarray([9, 9, 9, 0.3, 0.2, 0.1], np.float32)), (2, 1))
        prob["nodes"] = np.concatenate([prob["nodes"], sentinel])
        G, _ = optimize_global_pose_graph(
            prob, PGOConfig(group="SE3", max_outer=10, cg_iters=50,
                            chordal_init=True))
        np.testing.assert_allclose(G[-2:], sentinel, atol=1e-3)


class TestChordalSE2:
    def test_three_revolutions_yaw_drift_converges(self):
        radius = 8.0
        K = 100
        th = 2 * np.pi * np.arange(K) / K
        gt = np.stack([np.asarray(
            [radius * np.cos(t), radius * np.sin(t), t + np.pi / 2],
            np.float32) for t in th])
        gt[:, 2] = np.arctan2(np.sin(gt[:, 2]), np.cos(gt[:, 2]))
        closures = [(i, (i + 50) % K) for i in range(0, K, 10)] + [(0, K - 1)]
        prob = _drifted_problem("SE2", gt, yaw_revolutions=3.0,
                                closures=closures)
        assert _ate(prob["nodes"], gt, 2) > radius
        G, _ = optimize_global_pose_graph(
            prob, PGOConfig(group="SE2", max_outer=40, cg_iters=100,
                            chordal_init=True, chordal_cg_iters=400))
        assert _ate(G, gt, 2) < 0.1 * radius
        assert _ate(G, gt, 2) < 0.1


@pytest.mark.slow
def test_chordal_spmd_matches_single_device():
    """The chordal stages run inside the edge-sharded SPMD PGO program; the
    mesh path must match the single-device result."""
    from srba_tpu.parallel.sharding import make_mesh

    gt = _se3_circle(80, 8.0)
    closures = [(i, (i + 40) % 80) for i in range(0, 80, 8)]
    prob = _drifted_problem("SE3", gt, yaw_revolutions=2.0,
                            closures=closures)
    cfg = PGOConfig(group="SE3", max_outer=25, cg_iters=80,
                    chordal_init=True, chordal_cg_iters=300)
    G1, _ = optimize_global_pose_graph(prob, cfg)
    G8, _ = optimize_global_pose_graph(prob, cfg, mesh=make_mesh(8))
    assert _ate(G8, gt, 3) < 0.8
    np.testing.assert_allclose(
        _ate(G1, gt, 3), _ate(G8, gt, 3), atol=5e-2)
