"""End-to-end smoke: 2D range-bearing SE(2) SLAM on a synthetic loop —
BASELINE config #1, M1 acceptance (SURVEY.md §8).  The reference analog is
the tutorial datasets run through ``srba-slam`` with a GT error check."""

import numpy as np
import pytest

from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.models.noise import NoiseIdentity
from srba_tpu.ops.np_lie import NpSE2
from srba_tpu.utils.datasets import (ate_rmse, make_world_loop_2d, observe)


def _run(world, ds, params=None):
    # Whiten by the true observation noise: with edge priors in the window
    # cost, the RELATIVE information of observations vs odometry matters,
    # so the noise model must be calibrated (representative usage).
    eng = SrbaEngine(
        "RangeBearing2D", noise=NoiseIdentity(0.005),
        params=params or SrbaParams(max_tree_depth=3, max_optimize_depth=3))
    for k, frame in enumerate(ds.frames):
        obs = [Observation(lm_id=m, z=z) for m, z in frame]
        edge_init = {k - 1: ds.odometry[k - 1]} if k > 0 else None
        eng.define_new_keyframe(obs, edge_init=edge_init)
    return eng


@pytest.fixture(scope="module")
def small_loop():
    world = make_world_loop_2d(num_kfs=25, radius=6.0, num_landmarks=60,
                               seed=7)
    return world


def test_zero_noise_exact(small_loop):
    world = small_loop
    ds = observe(world, "RangeBearing2D", noise_std=0.0, sensor_range=5.0,
                 odo_noise_std=0.0, seed=7)
    eng = _run(world, ds)
    assert eng.num_keyframes == 25
    assert eng.eval_overall_squared_error() < 1e-4
    G, _ = eng.create_complete_spanning_tree(0)
    assert ate_rmse(G[:, :2], world.gt_poses[:, :2]) < 1e-3


def test_noisy_beats_raw_edges(small_loop):
    """With noisy odometry init + precise observations, optimized edges must
    be closer to GT relative poses than the odometry they started from."""
    world = small_loop
    ds = observe(world, "RangeBearing2D", noise_std=0.005, sensor_range=5.0,
                 odo_noise_std=0.03, seed=7)
    eng = _run(world, ds)
    st = eng.get_rba_state()  # syncs the host mirror from the device master
    err_opt, err_odo = [], []
    for e in range(st.num_edges):
        f, t = int(st.k2k_from[e]), int(st.k2k_to[e])
        gt_rel = NpSE2.compose(NpSE2.inverse(world.gt_poses[f]),
                               world.gt_poses[t])
        err_opt.append(np.linalg.norm(
            NpSE2.plog(NpSE2.compose(NpSE2.inverse(gt_rel),
                                     st.k2k_pose[e]))))
        err_odo.append(np.linalg.norm(
            NpSE2.plog(NpSE2.compose(NpSE2.inverse(gt_rel),
                                     ds.odometry[f - 1]))))
    assert np.mean(err_opt) < 0.6 * np.mean(err_odo)
    # And the composed trajectory is sane.
    G, _ = eng.create_complete_spanning_tree(0)
    assert ate_rmse(G[:, :2], world.gt_poses[:, :2]) < 0.5


def test_landmark_estimates_near_gt(small_loop):
    world = small_loop
    ds = observe(world, "RangeBearing2D", noise_std=0.005, sensor_range=5.0,
                 odo_noise_std=0.02, seed=7)
    eng = _run(world, ds)
    st = eng.get_rba_state()
    errs = []
    for ext, internal in eng._lm_id_map.items():
        base = int(st.lm_base[internal])
        gt_in_base = NpSE2.apply(NpSE2.inverse(world.gt_poses[base]),
                                 world.landmarks[ext])
        errs.append(np.linalg.norm(st.lm_state[internal] - gt_in_base))
    assert np.mean(errs) < 0.05


def test_no_local_opt_flag():
    world = make_world_loop_2d(num_kfs=6, radius=6.0, num_landmarks=30,
                               seed=1)
    ds = observe(world, "RangeBearing2D", noise_std=0.0, sensor_range=5.0,
                 seed=1)
    eng = SrbaEngine("RangeBearing2D")
    for k, frame in enumerate(ds.frames):
        obs = [Observation(lm_id=m, z=z) for m, z in frame]
        info = eng.define_new_keyframe(
            obs, run_local_optimization=False,
            edge_init={k - 1: ds.odometry[k - 1]} if k > 0 else None)
        assert info.optimize_results == {}
    # Manual optimize afterwards still works.
    out = eng.optimize_local_area(5, 3)
    assert "err_final" in out


def test_profiler_collects_stages(small_loop):
    world = small_loop
    ds = observe(world, "RangeBearing2D", noise_std=0.0, sensor_range=5.0,
                 seed=7)
    eng = _run(world, ds)
    rep = eng.profiler.report()
    assert "define_new_keyframe" in rep
    assert "device_step" in rep or "device_solve" in rep
