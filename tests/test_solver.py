"""Solver-level tests: window building, Jacobian structure, LM convergence on
tiny hand-built problems (reference analog: the Jacobian debug cross-check and
unit solver tests; SURVEY.md §5)."""

import numpy as np
import pytest

from srba_tpu.engine.state import ProblemState
from srba_tpu.graph.spantree import KeyframeGraph
from srba_tpu.ops.np_lie import NpSE2
from srba_tpu.solver.lm import SolverConfig, WindowBatch, get_solver
from srba_tpu.solver.window import build_window, write_back


def _two_kf_problem(noise=0.0, edge_guess=None, seed=0):
    """KF0 at origin, KF1 translated (1, 0.2, 0.1rad); 6 landmarks observed
    from both via Cartesian2D (identity h keeps the math transparent)."""
    rng = np.random.default_rng(seed)
    gt_pose1 = np.asarray([1.0, 0.2, 0.1], np.float32)  # T_world<-kf1
    lms_world = rng.uniform(-2, 4, (6, 2)).astype(np.float32)

    state = ProblemState(pose_dim=3, lm_dim=2, z_dim=2)
    graph = KeyframeGraph(max_tree_depth=3)
    state.add_keyframe(); graph.add_keyframe()
    state.add_keyframe(); graph.add_keyframe()
    # Edge (1, 0): T_1<-0 = inv(gt_pose1) (KF0 == world frame).
    gt_edge = NpSE2.inverse(gt_pose1).astype(np.float32)
    init = gt_edge if edge_guess is None else np.asarray(edge_guess, np.float32)
    state.add_edge(1, 0, init)
    graph.add_edge(1, 0)

    for m, lw in enumerate(lms_world):
        z0 = lw + rng.normal(0, noise, 2).astype(np.float32)
        state.add_landmark(0, z0)  # base KF0, init from first obs
        state.add_observation(0, m, z0)
        z1 = NpSE2.apply(NpSE2.inverse(gt_pose1), lw) \
            + rng.normal(0, noise, 2).astype(np.float32)
        state.add_observation(1, m, z1.astype(np.float32))
    return state, graph, gt_edge, lms_world


def _make_batch(arrays, calib=None):
    import jax.numpy as jnp
    return WindowBatch(
        edge_pose=jnp.asarray(arrays.edge_pose),
        edge_opt=jnp.asarray(arrays.edge_opt),
        lm_state=jnp.asarray(arrays.lm_state),
        lm_opt=jnp.asarray(arrays.lm_opt),
        obs_z=jnp.asarray(arrays.obs_z),
        obs_lm=jnp.asarray(arrays.obs_lm),
        path_edge=jnp.asarray(arrays.path_edge),
        path_sign=jnp.asarray(arrays.path_sign),
        obs_valid=jnp.asarray(arrays.obs_valid),
        whitener=jnp.eye(2, dtype=jnp.float32),
        sensor_pose_inv=jnp.zeros(3, jnp.float32),
        calib=calib,
    )


CFG = SolverConfig(obs_model="Cartesian2D", pose_group="SE2",
                   lm_type="Euclidean2D", max_depth=3, max_iters=15)


class TestWindowBuild:
    def test_shapes_and_masks(self):
        state, graph, _, _ = _two_kf_problem()
        arrays, plan = build_window(state, graph, 1, 3, 3)
        E, L, N = plan.shape_key
        assert arrays.edge_pose.shape == (E, 3)
        assert arrays.obs_valid.sum() == 12  # 6 lms x 2 KFs
        assert arrays.edge_opt[0] == 1.0
        assert plan.num_obs == 12
        # Obs from KF0 (the base) have all-zero path signs.
        kf0_rows = [i for i in range(12) if arrays.path_sign[i].sum() == 0]
        assert len(kf0_rows) == 6

    def test_empty_window(self):
        state = ProblemState(pose_dim=3, lm_dim=2, z_dim=2)
        graph = KeyframeGraph(3)
        state.add_keyframe(); graph.add_keyframe()
        assert build_window(state, graph, 0, 3, 3) is None


class TestLMConvergence:
    def test_recovers_exact_edge_from_bad_guess(self):
        state, graph, gt_edge, _ = _two_kf_problem(
            noise=0.0, edge_guess=[0.0, 0.0, 0.0])
        arrays, plan = build_window(state, graph, 1, 3, 3)
        solve, _ = get_solver(CFG)
        edge_pose, lm_state, info = solve(_make_batch(arrays))
        edge_pose = np.asarray(edge_pose)
        assert float(info["err_final"]) < 1e-8
        np.testing.assert_allclose(edge_pose[0], gt_edge, atol=1e-3)

    def test_recovers_landmarks(self):
        state, graph, gt_edge, lms_world = _two_kf_problem(
            noise=0.0, edge_guess=[-0.8, -0.1, 0.0])
        arrays, plan = build_window(state, graph, 1, 3, 3)
        # Perturb landmark inits too.
        arrays.lm_state[: len(lms_world)] += 0.1
        solve, _ = get_solver(CFG)
        edge_pose, lm_state, info = solve(_make_batch(arrays))
        # KF0 is the base: landmarks are in world frame here.
        np.testing.assert_allclose(
            np.asarray(lm_state)[: len(lms_world)], lms_world, atol=1e-3)

    def test_noisy_converges_near_gt(self):
        state, graph, gt_edge, _ = _two_kf_problem(
            noise=0.01, edge_guess=[-0.9, -0.3, 0.05])
        arrays, plan = build_window(state, graph, 1, 3, 3)
        solve, _ = get_solver(CFG)
        edge_pose, lm_state, info = solve(_make_batch(arrays))
        assert float(info["err_final"]) < float(info["err_init"])
        np.testing.assert_allclose(np.asarray(edge_pose)[0], gt_edge,
                                   atol=5e-2)

    def test_fixed_landmarks_stay_fixed(self):
        state, graph, gt_edge, lms = _two_kf_problem(
            noise=0.0, edge_guess=[0.0, 0.0, 0.0])
        state.lm_fixed[:2] = True
        arrays, plan = build_window(state, graph, 1, 3, 3)
        before = arrays.lm_state.copy()
        solve, _ = get_solver(CFG)
        edge_pose, lm_state, info = solve(_make_batch(arrays))
        np.testing.assert_allclose(np.asarray(lm_state)[:2], before[:2],
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(edge_pose)[0], gt_edge,
                                   atol=1e-3)

    def test_write_back_respects_masks(self):
        state, graph, _, _ = _two_kf_problem(edge_guess=[0.0, 0.0, 0.0])
        state.lm_fixed[0] = True
        arrays, plan = build_window(state, graph, 1, 3, 3)
        new_edges = arrays.edge_pose + 1.0
        new_lms = arrays.lm_state + 1.0
        lm0_before = state.lm_state[0].copy()
        write_back(state, plan, new_edges, new_lms)
        np.testing.assert_allclose(state.lm_state[0], lm0_before)
        assert np.allclose(state.k2k_pose[0], new_edges[0])


def test_jacobian_matches_finite_difference():
    """AD path-chain Jacobian vs central differences on the full residual
    (the reference's debug-mode numeric cross-check)."""
    import jax
    import jax.numpy as jnp
    from srba_tpu.solver.lm import _make_per_obs_residual

    state, graph, _, _ = _two_kf_problem(edge_guess=[-0.9, -0.15, 0.08])
    arrays, _ = build_window(state, graph, 1, 3, 3)
    per_obs, eps_dim = _make_per_obs_residual(CFG)

    edge_pose = jnp.asarray(arrays.edge_pose)
    lm_state = jnp.asarray(arrays.lm_state)
    W = jnp.eye(2, dtype=jnp.float32)
    sp = jnp.zeros(3, jnp.float32)

    n = int(np.nonzero(arrays.obs_valid)[0][-1])  # a KF1 observation
    args = (edge_pose, lm_state, jnp.asarray(arrays.obs_z[n]),
            int(arrays.obs_lm[n]), jnp.asarray(arrays.path_edge[n]),
            jnp.asarray(arrays.path_sign[n]), W, sp, None)

    J_ad = jax.jacfwd(lambda e: per_obs(e, *args))(jnp.zeros(eps_dim))
    eps = 1e-3
    J_fd = np.zeros((2, eps_dim))
    for j in range(eps_dim):
        d = np.zeros(eps_dim, np.float32); d[j] = eps
        rp = per_obs(jnp.asarray(d), *args)
        rm = per_obs(jnp.asarray(-d), *args)
        J_fd[:, j] = (np.asarray(rp) - np.asarray(rm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(J_ad), J_fd, atol=2e-2, rtol=2e-2)
