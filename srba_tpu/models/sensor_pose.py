"""Sensor-mounting options — analog of the reference's
``options::sensor_pose_on_robot_none`` / ``sensor_pose_on_robot_se3``
(public MRPT/srba layout: ``include/srba/options/sensor_pose_on_robot_*.h``;
SURVEY.md §3).

The sensor pose is a *static* transform folded into the residual function at
trace time; with ``none`` the compose step disappears entirely from the
compiled XLA program (the analog of the reference's empty-policy template
specialization compiling to nothing).
"""

from __future__ import annotations

import jax.numpy as jnp

from srba_tpu.ops.lie import SE2, SE3


class SensorPoseNone:
    """Sensor frame coincides with the robot/keyframe frame."""

    name = "none"
    is_identity = True

    def pose_for(self, group):
        return group.identity()


class SensorPoseSE3:
    """Fixed SE(3) sensor offset on the robot (``sensor_pose_on_robot_se3``).
    For SE(2) problems the offset is interpreted as (x, y, yaw)."""

    name = "se3"
    is_identity = False

    def __init__(self, pose):
        """``pose``: length-3 (x, y, yaw) for SE2 problems or length-7
        (tx, ty, tz, qw, qx, qy, qz) for SE3 problems."""
        self._pose = jnp.asarray(pose, dtype=jnp.float32)

    def pose_for(self, group):
        if group is SE2:
            assert self._pose.shape == (3,), "SE2 sensor pose must be (x,y,yaw)"
        else:
            assert group is SE3 and self._pose.shape == (7,), (
                "SE3 sensor pose must be a 7-vector (t, quat)")
        return self._pose
