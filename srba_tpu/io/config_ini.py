"""INI sensor-configuration parsing — analog of the reference's MRPT
``CConfigFile`` sensor-calibration input used by ``srba-slam`` (the
``--sensor-params-cfg-file`` flow; public MRPT/srba layout,
``apps/srba-slam``).

Supported sections (MRPT-style key names where they exist):

```
[CAMERA]            ; monocular pinhole
fx = 200.0
fy = 200.0
cx = 160.0
cy = 120.0

[CAMERA_STEREO]     ; adds the baseline
fx = ...
baseline = 0.12

[SENSOR_POSE]       ; SE(3) sensor mounting on the robot
x = 0.0
y = 0.0
z = 0.0
yaw = 0.0           ; radians
pitch = 0.0
roll = 0.0
```
"""

from __future__ import annotations

import configparser
from typing import Any, Optional, Tuple


def load_sensor_ini(path: str, obs_model: str
                    ) -> Tuple[Optional[Any], Optional[Any]]:
    """Returns ``(calib, sensor_pose)`` for the given observation model
    (either may be None when its section is absent)."""
    import numpy as np

    from srba_tpu.models.observations import CameraCalib, StereoCalib
    from srba_tpu.models.sensor_pose import SensorPoseSE3
    from srba_tpu.ops.lie import SE3

    cp = configparser.ConfigParser(inline_comment_prefixes=(";", "#"))
    with open(path) as f:
        cp.read_file(f)

    calib = None
    if obs_model == "MonocularCamera" and cp.has_section("CAMERA"):
        s = cp["CAMERA"]
        calib = CameraCalib.make(
            fx=s.getfloat("fx"), fy=s.getfloat("fy"),
            cx=s.getfloat("cx"), cy=s.getfloat("cy"))
    elif obs_model == "StereoCamera" and cp.has_section("CAMERA_STEREO"):
        s = cp["CAMERA_STEREO"]
        calib = StereoCalib.make(
            fx=s.getfloat("fx"), fy=s.getfloat("fy"),
            cx=s.getfloat("cx"), cy=s.getfloat("cy"),
            baseline=s.getfloat("baseline"))

    sensor_pose = None
    if cp.has_section("SENSOR_POSE"):
        s = cp["SENSOR_POSE"]
        pose = np.asarray(SE3.from_xyz_ypr(
            s.getfloat("x", 0.0), s.getfloat("y", 0.0), s.getfloat("z", 0.0),
            s.getfloat("yaw", 0.0), s.getfloat("pitch", 0.0),
            s.getfloat("roll", 0.0)), np.float32)
        sensor_pose = SensorPoseSE3(pose)
    return calib, sensor_pose
