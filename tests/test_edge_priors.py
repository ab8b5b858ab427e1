"""Edge measurement priors (state.k2k_prior) — the guard against visually
degenerate local windows.

Regression background (round 3): at map revisits most visible landmarks are
based beyond the spanning-tree depth and drop out of the window; the few
in-window landmarks (recently initialized, long-range) can leave the pose
system with a near-null space that a reprojection-only LM slides along by
METERS while residuals stay sub-pixel (measured on the stereo 60-KF loop:
1-step edge error 0.016 m without local opt -> 2.9 m max WITH it).  The
creation-time odometry measurement, kept as a weak permanent prior factor,
fills exactly that null space."""

import numpy as np
import pytest

from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.ecps import ClassicLinearRBA
from srba_tpu.models.observations import StereoCalib
from srba_tpu.models.sensor_pose import SensorPoseSE3
from srba_tpu.ops.np_lie import CAMERA_SENSOR_POSE_SE3, NpSE3
from srba_tpu.utils.datasets import ate_rmse, make_world_loop_3d, observe


def _stereo_loop_run(edge_prior_sigma):
    K = 40
    world = make_world_loop_3d(num_kfs=K, radius=6.0, num_landmarks=250,
                               height_amp=0.4, seed=3)
    calib = StereoCalib.make(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                             baseline=0.12)
    ds = observe(world, "StereoCamera", calib=calib, noise_std=0.3,
                 sensor_range=8.0, odo_noise_std=0.01, seed=3)
    eng = SrbaEngine(
        "StereoCamera", calib=calib,
        sensor_pose=SensorPoseSE3(CAMERA_SENSOR_POSE_SE3),
        ecp=ClassicLinearRBA(),
        params=SrbaParams(max_tree_depth=3, max_optimize_depth=3,
                          edge_prior_sigma=edge_prior_sigma))
    for k, frame in enumerate(ds.frames):
        obs = [Observation(lm_id=m, z=z) for m, z in frame]
        eng.define_new_keyframe(
            obs, edge_init={k - 1: ds.odometry[k - 1]} if k else None)
    eng.fence()
    eng.sync()
    st = eng.state
    errs = []
    for e in range(st.num_edges):
        a, b = int(st.k2k_from[e]), int(st.k2k_to[e])
        gt_rel = NpSE3.compose(NpSE3.inverse(world.gt_poses[a]),
                               world.gt_poses[b])
        d = NpSE3.plog(NpSE3.compose(NpSE3.inverse(st.k2k_pose[e]),
                                     gt_rel.astype(np.float32)))
        errs.append(float(np.linalg.norm(d[:3])))
    G, _ = eng.create_complete_spanning_tree(0)
    ate = float(ate_rmse(np.asarray(G)[:, :3], world.gt_poses[:, :3]))
    return np.asarray(errs), ate


class TestEdgePriorsGuardDegenerateWindows:
    def test_stereo_loop_edges_stay_odometry_grade(self):
        """With priors, no local solve may degrade a 1-step edge beyond a
        few times the odometry noise (without them, revisit windows blast
        edges to decimeters/meters — see module docstring)."""
        errs, ate = _stereo_loop_run(edge_prior_sigma=0.05)
        assert errs.max() < 0.08, errs.max()
        assert ate < 0.15, ate

    def test_priors_are_stored_and_weighted(self):
        eng = SrbaEngine("RangeBearing2D",
                         params=SrbaParams(max_tree_depth=3,
                                           max_optimize_depth=3))
        eng.define_new_keyframe([Observation(lm_id=0, z=[1.0, 0.1])])
        odo = np.asarray([0.5, 0.0, 0.02], np.float32)
        eng.define_new_keyframe([Observation(lm_id=0, z=[0.9, 0.2])],
                                edge_init={0: odo})
        st = eng.state
        assert st.num_edges == 1
        np.testing.assert_allclose(st.k2k_prior[0], odo)
        sig = eng.parameters.edge_prior_sigma
        assert st.k2k_prior_w[0] == pytest.approx(1.0 / sig ** 2)

    def test_prior_disabled_gives_zero_weight(self):
        eng = SrbaEngine("RangeBearing2D",
                         params=SrbaParams(max_tree_depth=3,
                                           max_optimize_depth=3,
                                           edge_prior_sigma=None))
        eng.define_new_keyframe([Observation(lm_id=0, z=[1.0, 0.1])])
        eng.define_new_keyframe(
            [Observation(lm_id=0, z=[0.9, 0.2])],
            edge_init={0: np.asarray([0.5, 0.0, 0.02], np.float32)})
        assert eng.state.k2k_prior_w[0] == 0.0

    def test_graph_slam_mode_has_no_priors(self):
        """Pose-landmark observations measure edges directly; a prior would
        double-count and outvote loop-closure observations."""
        eng = SrbaEngine("RelativePoses2D",
                         params=SrbaParams(max_tree_depth=3,
                                           max_optimize_depth=3))
        eng.define_new_keyframe([])
        eng.define_new_keyframe(
            [Observation(lm_id=0, z=[1.0, 0.0, 0.05])],
            edge_init={0: np.asarray([1.0, 0.0, 0.05], np.float32)})
        assert eng.state.num_edges == 1
        assert eng.state.k2k_prior_w[0] == 0.0
