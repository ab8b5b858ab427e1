"""INI sensor-config parsing (CConfigFile analog) and the four-visitor
bfs_visitor."""

import numpy as np

from srba_tpu import Observation, SrbaEngine
from srba_tpu.io.config_ini import load_sensor_ini

INI = """
; srba-slam style sensor configuration
[CAMERA_STEREO]
fx = 210.0
fy = 205.0
cx = 161.0
cy = 121.0
baseline = 0.15

[CAMERA]
fx = 300.0
fy = 295.0
cx = 80.0
cy = 60.0

[SENSOR_POSE]
x = 0.1
y = -0.2
z = 0.3
yaw = 0.5
"""


def test_load_sensor_ini(tmp_path):
    p = tmp_path / "sensor.ini"
    p.write_text(INI)
    calib, pose = load_sensor_ini(str(p), "StereoCamera")
    assert float(calib.fx) == 210.0
    assert abs(float(calib.baseline) - 0.15) < 1e-6
    assert pose is not None and not pose.is_identity
    mono_calib, _ = load_sensor_ini(str(p), "MonocularCamera")
    assert float(mono_calib.fx) == 300.0


def test_load_sensor_ini_missing_sections(tmp_path):
    p = tmp_path / "empty.ini"
    p.write_text("[OTHER]\nfoo = 1\n")
    calib, pose = load_sensor_ini(str(p), "StereoCamera")
    assert calib is None and pose is None


def test_bfs_visitor_four_callbacks():
    eng = SrbaEngine("RangeBearing2D")
    # 3-KF chain, each observing two landmarks.
    for k in range(3):
        obs = [Observation(lm_id=2 * k, z=[1.0, 0.2]),
               Observation(lm_id=2 * k + 1, z=[1.5, -0.1])]
        eng.define_new_keyframe(
            obs, edge_init={k - 1: [0.5, 0.0, 0.0]} if k > 0 else None,
            run_local_optimization=False)

    kfs, edges, lms, k2fs = [], [], [], []
    eng.bfs_visitor(
        0, 5,
        kf_visitor=lambda kf, d: kfs.append((kf, d)),
        k2k_visitor=lambda eid, p, c: edges.append((eid, p, c)),
        lm_visitor=lambda lm, base, d: lms.append((lm, base, d)),
        k2f_visitor=lambda o, kf, lm: k2fs.append((o, kf, lm)))
    assert kfs == [(0, 0), (1, 1), (2, 2)]
    assert len(edges) == 2
    assert sorted(l for l, _, _ in lms) == list(range(6))
    # Each landmark's base matches the creating keyframe.
    for lm, base, d in lms:
        assert base == lm // 2 and d == lm // 2
    assert len(k2fs) == 6
