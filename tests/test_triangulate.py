"""Monocular two-view triangulation front-end (engine/triangulate.py).

The reference requires every monocular landmark to arrive with an explicit
``unknown_rel_pos_init`` (``observations::MonocularCamera`` has no inverse
sensor model; public MRPT/srba layout).  Here the engine supplies those
inits itself from buffered sightings — these tests pin down the geometry
and the end-to-end no-external-init mono pipeline.
"""

import numpy as np

from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.engine.triangulate import MonoTriangulator, _ray_midpoint
from srba_tpu.models.observations import CameraCalib, MonocularCamera
from srba_tpu.models.sensor_pose import SensorPoseSE3
from srba_tpu.ops.np_lie import CAMERA_SENSOR_POSE_SE3, NpSE3
from srba_tpu.utils.datasets import ate_rmse, make_world_loop_3d, observe


class TestRayMidpoint:
    def test_exact_intersection(self):
        p = np.array([1.0, 2.0, 5.0])
        o1 = np.zeros(3)
        o2 = np.array([2.0, 0.0, 0.0])
        hit, parallax = _ray_midpoint(o1, p - o1, o2, p - o2)
        np.testing.assert_allclose(hit, p, atol=1e-9)
        assert parallax > np.deg2rad(5)

    def test_skew_rays_midpoint(self):
        # Two skew rays: the midpoint is halfway between the closest points
        # (p1 = (0,0,1) on ray 1, p2 = (1,0,1) on ray 2, both at positive
        # ray parameters).
        o1, r1 = np.zeros(3), np.array([0.0, 0.0, 1.0])
        o2, r2 = np.array([1.0, -1.0, 0.0]), np.array([0.0, 1.0, 1.0])
        hit, _ = _ray_midpoint(o1, r1, o2, r2)
        assert hit is not None
        np.testing.assert_allclose(hit, [0.5, 0.0, 1.0], atol=1e-9)

    def test_parallel_rays_rejected(self):
        o1, r = np.zeros(3), np.array([0.0, 0.0, 1.0])
        hit, parallax = _ray_midpoint(o1, r, np.array([1.0, 0, 0]), r)
        assert hit is None and parallax < 1e-6

    def test_behind_camera_rejected(self):
        p = np.array([0.0, 0.0, -3.0])   # behind both
        o1, o2 = np.zeros(3), np.array([1.0, 0.0, 0.0])
        hit, _ = _ray_midpoint(o1, -p, o2, -(p - o2))
        assert hit is None


class TestTriangulatorUnit:
    def _engine(self):
        return SrbaEngine(
            "MonocularCamera", calib=CameraCalib.make(),
            sensor_pose=SensorPoseSE3(CAMERA_SENSOR_POSE_SE3),
            device_master=False)

    def test_two_view_recovers_point(self):
        """Ground-truth camera motion + exact pixels -> exact landmark."""
        eng = self._engine()
        g = NpSE3
        # Two keyframe poses with ~0.5 m baseline.
        G0 = g.identity().astype(np.float64)
        G1 = g.pexp(np.asarray([0.5, 0.05, 0.0, 0.0, 0.0, 0.05]))
        eng._G_dr = [G0, G1]
        lm_world = np.array([1.0, 2.5, 0.4])     # robot/world frame
        S = np.asarray(CAMERA_SENSOR_POSE_SE3, np.float64)
        calib = CameraCalib.make()

        def pixel(G):
            p_robot = g.apply(g.inverse(G), lm_world)
            p_cam = g.apply(g.inverse(S), p_robot)
            return np.asarray(MonocularCamera.h(
                p_cam.astype(np.float32), calib))

        tri = MonoTriangulator(eng, min_parallax_deg=0.5)
        tri.hold(7, 0, pixel(G0))
        assert tri.try_init(7) is None            # single view: pending
        tri.hold(7, 1, pixel(G1))
        hit = tri.try_init(7)
        assert hit is not None
        base_kf, pt, buffered = hit
        assert base_kf == 0 and len(buffered) == 2
        np.testing.assert_allclose(pt, lm_world, atol=1e-3)
        assert tri.num_pending == 0

    def test_low_parallax_stays_pending(self):
        eng = self._engine()
        g = NpSE3
        eng._G_dr = [g.identity(), g.pexp(np.asarray([1e-4, 0, 0, 0, 0, 0]))]
        tri = MonoTriangulator(eng, min_parallax_deg=1.0)
        z = np.array([160.0, 120.0])
        tri.hold(3, 0, z)
        tri.hold(3, 1, z)
        assert tri.try_init(3) is None
        assert tri.num_pending == 1


class TestEngineMonoNoExternalInit:
    def test_e2e_mono_maps_without_inits(self):
        """Full mono run with NO init_rel_pos anywhere: landmarks
        materialize via deferred triangulation and the map is sane."""
        K = 60
        world = make_world_loop_3d(num_kfs=K, radius=6.0, num_landmarks=150,
                                   height_amp=0.3, seed=9)
        calib = CameraCalib.make()
        ds = observe(world, "MonocularCamera", calib=calib, noise_std=0.2,
                     sensor_range=7.0, odo_noise_std=0.005, seed=9)
        eng = SrbaEngine(
            "MonocularCamera", calib=calib,
            sensor_pose=SensorPoseSE3(CAMERA_SENSOR_POSE_SE3),
            params=SrbaParams(max_tree_depth=4, max_optimize_depth=3,
                              use_robust_kernel=True))
        for k, frame in enumerate(ds.frames):
            eng.define_new_keyframe(
                [Observation(lm_id=m, z=z) for m, z in frame],
                edge_init={k - 1: ds.odometry[k - 1]} if k else None)
        assert eng.num_landmarks > 30, eng.num_landmarks
        G, _ = eng.create_complete_spanning_tree(0)
        n = min(len(G), len(world.gt_poses))
        ate = float(ate_rmse(np.asarray(G)[:n, :3], world.gt_poses[:n, :3]))
        assert ate < 0.35, ate

    def test_disabled_front_end_raises(self):
        eng = SrbaEngine(
            "MonocularCamera", calib=CameraCalib.make(),
            sensor_pose=SensorPoseSE3(CAMERA_SENSOR_POSE_SE3),
            params=SrbaParams(mono_min_parallax_deg=None),
            device_master=False)
        import pytest
        with pytest.raises(ValueError):
            eng.define_new_keyframe(
                [Observation(lm_id=0, z=np.array([160.0, 120.0]))])
