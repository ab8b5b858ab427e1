"""End-to-end runs over the full model matrix — BASELINE configs #2 (3D
range-bearing / Cartesian), #3 (stereo SE3), #4 (relative-pose graph-SLAM)
plus monocular; mirrors the reference tutorials' per-problem-type programs
(SURVEY.md §5, Appendix C)."""

import numpy as np
import pytest

from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.models.observations import CameraCalib, StereoCalib
from srba_tpu.models.sensor_pose import SensorPoseSE3
from srba_tpu.ops.np_lie import (CAMERA_SENSOR_POSE_SE3, NpSE2, NpSE3)
from srba_tpu.utils.datasets import (ate_rmse, make_graph_slam_dataset,
                                     make_world_loop_2d, make_world_loop_3d,
                                     observe)

PARAMS = SrbaParams(max_tree_depth=3, max_optimize_depth=3)


def _drive(eng, ds, use_init=True, lm_init_fn=None):
    for k, frame in enumerate(ds.frames):
        obs = []
        for m, z in frame:
            init = lm_init_fn(k, m) if lm_init_fn is not None else None
            obs.append(Observation(lm_id=m, z=z, init_rel_pos=init))
        edge_init = ({k - 1: ds.odometry[k - 1]}
                     if (use_init and k > 0) else None)
        eng.define_new_keyframe(obs, edge_init=edge_init)
    return eng


def _np_group(eng):
    return eng.np_group


def _ate(eng, world):
    G, _ = eng.create_complete_spanning_tree(0)
    d = 2 if world.group_name == "SE2" else 3
    return ate_rmse(np.asarray(G)[:, :d], world.gt_poses[:, :d])


class TestRangeBearing3D:
    def test_zero_noise(self):
        world = make_world_loop_3d(num_kfs=20, radius=6.0, num_landmarks=80,
                                   seed=2)
        ds = observe(world, "RangeBearing3D", noise_std=0.0,
                     sensor_range=5.0, seed=2)
        eng = SrbaEngine("RangeBearing3D", params=PARAMS)
        _drive(eng, ds)
        assert eng.eval_overall_squared_error() < 1e-3
        assert _ate(eng, world) < 5e-3

    def test_noisy(self):
        world = make_world_loop_3d(num_kfs=20, radius=6.0, num_landmarks=80,
                                   seed=2)
        ds = observe(world, "RangeBearing3D", noise_std=0.005,
                     sensor_range=5.0, odo_noise_std=0.02, seed=2)
        eng = SrbaEngine("RangeBearing3D", params=PARAMS)
        _drive(eng, ds)
        assert _ate(eng, world) < 0.5


class TestCartesian3D:
    def test_zero_noise(self):
        world = make_world_loop_3d(num_kfs=15, radius=6.0, num_landmarks=60,
                                   seed=5)
        ds = observe(world, "Cartesian3D", noise_std=0.0, sensor_range=5.0,
                     seed=5)
        eng = SrbaEngine("Cartesian3D", params=PARAMS)
        _drive(eng, ds)
        assert eng.eval_overall_squared_error() < 1e-3
        assert _ate(eng, world) < 5e-3


class TestCartesian2D:
    def test_noisy(self):
        world = make_world_loop_2d(num_kfs=15, radius=6.0, num_landmarks=50,
                                   seed=6)
        ds = observe(world, "Cartesian2D", noise_std=0.01, sensor_range=5.0,
                     odo_noise_std=0.02, seed=6)
        eng = SrbaEngine("Cartesian2D", params=PARAMS)
        _drive(eng, ds)
        assert _ate(eng, world) < 0.3


class TestStereo:
    """Config #3: SE3 + Euclidean3D + StereoCamera with the camera mounted
    through a sensor pose (sensor-on-robot SE3 option)."""

    def _make(self, noise=0.0, odo_noise=0.0, n=15, num_landmarks=150):
        world = make_world_loop_3d(num_kfs=n, radius=6.0,
                                   num_landmarks=num_landmarks,
                                   height_amp=0.5, seed=8)
        calib = StereoCalib.make(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                                 baseline=0.12)
        ds = observe(world, "StereoCamera", calib=calib, noise_std=noise,
                     sensor_range=8.0, odo_noise_std=odo_noise, seed=8)
        eng = SrbaEngine(
            "StereoCamera", calib=calib,
            sensor_pose=SensorPoseSE3(CAMERA_SENSOR_POSE_SE3),
            params=PARAMS)
        return world, ds, eng

    def test_dataset_has_observations(self):
        world, ds, eng = self._make()
        assert sum(len(f) for f in ds.frames) > 30

    def test_zero_noise(self):
        world, ds, eng = self._make()
        _drive(eng, ds)
        assert eng.eval_overall_squared_error() < 1e-1  # pixel units
        assert _ate(eng, world) < 1e-2

    def test_noisy(self):
        # Realistic stereo density: ~1m keyframe spacing, many shared
        # features per frame pair (sparse far stereo points alone cannot
        # beat odometry — depth sigma at 6m with this rig is ~0.45m).
        world, ds, eng = self._make(noise=0.3, odo_noise=0.02, n=40,
                                    num_landmarks=400)
        _drive(eng, ds)
        assert _ate(eng, world) < 0.5


class TestRGBD:
    """RGB-D camera (beyond the reference's model set; BASELINE.json north
    star): pixel + metric depth, exact inverse sensor model, camera mounted
    through the SE(3) sensor pose."""

    def _make(self, noise=0.0, odo_noise=0.0, n=15):
        world = make_world_loop_3d(num_kfs=n, radius=6.0, num_landmarks=150,
                                   height_amp=0.5, seed=12)
        calib = CameraCalib.make()
        ds = observe(world, "RGBDCamera", calib=calib, noise_std=noise,
                     sensor_range=8.0, odo_noise_std=odo_noise, seed=12)
        eng = SrbaEngine(
            "RGBDCamera", calib=calib,
            sensor_pose=SensorPoseSE3(CAMERA_SENSOR_POSE_SE3),
            params=PARAMS)
        return world, ds, eng

    def test_zero_noise(self):
        world, ds, eng = self._make()
        _drive(eng, ds)
        assert _ate(eng, world) < 1e-2

    def test_noisy(self):
        world, ds, eng = self._make(noise=0.15, odo_noise=0.01)
        _drive(eng, ds)
        assert _ate(eng, world) < 0.25


class TestMonocular:
    def test_with_provided_inits(self):
        world = make_world_loop_3d(num_kfs=12, radius=6.0, num_landmarks=150,
                                   height_amp=0.5, seed=9)
        calib = CameraCalib.make()
        ds = observe(world, "MonocularCamera", calib=calib, noise_std=0.2,
                     sensor_range=8.0, odo_noise_std=0.01, seed=9)
        rng = np.random.default_rng(0)
        S = CAMERA_SENSOR_POSE_SE3

        def lm_init(k, m):
            # Perturbed GT init in the observing KF's (robot) frame — the
            # stand-in for an external triangulation front-end.
            pt = NpSE3.apply(NpSE3.inverse(world.gt_poses[k]),
                             world.landmarks[m])
            return pt + rng.normal(0, 0.1, 3)

        eng = SrbaEngine("MonocularCamera", calib=calib,
                         sensor_pose=SensorPoseSE3(S), params=PARAMS)
        _drive(eng, ds, lm_init_fn=lm_init)
        assert _ate(eng, world) < 0.5

    def test_raises_without_init_when_frontend_disabled(self):
        """With the deferred-triangulation front-end disabled
        (``mono_min_parallax_deg=None``) the engine keeps the reference's
        must-supply-init contract: a new mono landmark without an init is an
        error."""
        calib = CameraCalib.make()
        eng = SrbaEngine("MonocularCamera", calib=calib,
                         params=SrbaParams(mono_min_parallax_deg=None))
        with pytest.raises(ValueError, match="inverse sensor model"):
            eng.define_new_keyframe(
                [Observation(lm_id=0, z=np.asarray([160.0, 120.0]))])

    def test_deferred_init_defers_then_materializes(self):
        """Default front-end: an initless mono landmark is held pending
        (``add_observation`` returns the -1 sentinel, nothing allocated)
        until a sighting with enough parallax triangulates it, at which point
        every buffered observation is replayed into the problem."""
        calib = CameraCalib.make()
        eng = SrbaEngine("MonocularCamera", calib=calib)
        # KF 0 observes an unknown landmark ~4 m ahead (optical axis = +x
        # robot with the identity mounting: z straight down the pixel
        # center).  No init: must defer.
        eng.define_new_keyframe(
            [Observation(lm_id=7, z=np.asarray([160.0, 120.0]))])
        assert eng.num_landmarks == 0
        assert eng.num_pending_landmarks == 1
        # KF 1 moves 1 m sideways (+x in camera coords): the re-sighting
        # carries several degrees of parallax for a point at depth ~4.
        pt_cam0 = np.asarray([0.0, 0.0, 4.0], np.float32)
        pt_cam1 = pt_cam0 - np.asarray([1.0, 0.0, 0.0], np.float32)
        z1 = np.asarray([
            calib.fx * pt_cam1[0] / pt_cam1[2] + calib.cx,
            calib.fy * pt_cam1[1] / pt_cam1[2] + calib.cy], np.float32)
        odo = np.zeros(7, np.float32)
        odo[3] = 1.0                       # identity rotation (w-first quat)
        odo[0] = -1.0                      # T_new<-old: old origin at -1 x
        eng.define_new_keyframe([Observation(lm_id=7, z=z1)],
                                edge_init={0: odo})
        assert eng.num_landmarks == 1      # materialized
        assert eng.num_pending_landmarks == 0
        assert eng.state.num_obs == 2      # both sightings replayed


class TestGraphSlam:
    """Config #4: relative-pose graph-SLAM mode — pose-landmarks are fixed
    identities at their own keyframes, so observations constrain the kf2kf
    edge chain, and observing an unreachable KF creates a loop-closure
    edge."""

    def test_se2_zero_noise(self):
        world = make_world_loop_2d(num_kfs=20, radius=5.0, num_landmarks=1,
                                   seed=3)
        ds = make_graph_slam_dataset(world, noise_std=0.0,
                                     loop_closure_range=2.5, seed=3)
        eng = SrbaEngine("RelativePoses2D", params=PARAMS)
        _drive(eng, ds, use_init=False)  # identity edge inits: obs must fix
        assert _ate(eng, world) < 1e-2

    def test_se2_noisy_odometry_corrected_by_observations(self):
        """Noisy odometry inits + accurate relative-pose observations: the
        optimizer must pull edges to the observations, beating dead
        reckoning."""
        world = make_world_loop_2d(num_kfs=25, radius=5.0, num_landmarks=1,
                                   seed=4)
        ds = make_graph_slam_dataset(world, noise_std=0.005,
                                     odo_noise_std=0.05,
                                     loop_closure_range=3.0, seed=4)
        n_closures = sum(len(f) - 1 for f in ds.frames if f)
        assert n_closures > 0, "dataset should contain loop closures"
        eng = SrbaEngine("RelativePoses2D", params=PARAMS)
        _drive(eng, ds)
        ate = _ate(eng, world)
        # Dead reckoning on the noisy odometry.
        D = np.zeros((len(ds.frames), 3), np.float32)
        for k in range(1, len(ds.frames)):
            D[k] = NpSE2.compose(D[k - 1], NpSE2.inverse(ds.odometry[k - 1]))
        from srba_tpu.utils.datasets import ate_rmse as _ar
        ate_dr = _ar(D[:, :2], world.gt_poses[:, :2])
        assert ate < 0.5 * ate_dr, (ate, ate_dr)

    def test_loop_closure_creates_edges(self):
        world = make_world_loop_2d(num_kfs=25, radius=5.0, num_landmarks=1,
                                   seed=4)
        ds = make_graph_slam_dataset(world, noise_std=0.005,
                                     loop_closure_range=3.0, seed=4)
        eng = SrbaEngine("RelativePoses2D", params=PARAMS)
        _drive(eng, ds)
        # More edges than the chain alone => loop-closure edges created.
        assert eng.state.num_edges > eng.num_keyframes - 1
        # All pose-landmarks are fixed identities at their own base.
        st = eng.state
        assert st.lm_fixed[: st.num_lms].all()
        for ext, internal in eng._lm_id_map.items():
            assert int(st.lm_base[internal]) == ext

    def test_se3_zero_noise(self):
        world = make_world_loop_3d(num_kfs=15, radius=5.0, num_landmarks=1,
                                   seed=5)
        ds = make_graph_slam_dataset(world, noise_std=0.0,
                                     loop_closure_range=2.5, seed=5)
        eng = SrbaEngine("RelativePoses3D", params=PARAMS)
        _drive(eng, ds, use_init=False)
        assert _ate(eng, world) < 1e-2
