"""Landmark parameterizations — analog of the reference's
``landmarks::{Euclidean2D, Euclidean3D, RelativePoses2D, RelativePoses3D}``
(public MRPT/srba layout: ``include/srba/models/landmarks.h``; SURVEY.md §3).

A landmark lives in the local frame of its *base keyframe* (the first KF that
observed it).  ``Euclidean*`` landmarks are points; ``RelativePoses*`` are
whole poses (graph-SLAM mode, where "landmarks" are other keyframes and the
problem degenerates to a relative pose-graph).

``dim``: state storage width per landmark (columns of the landmark SoA table).
``dof``: tangent width used by the optimizer.
``retract``: how an optimizer increment is applied.
"""

from __future__ import annotations

import jax.numpy as jnp

from srba_tpu.ops.lie import SE2, SE3


class Euclidean2D:
    name = "Euclidean2D"
    dim = 2
    dof = 2
    is_pose = False

    @staticmethod
    def retract(pos, delta):
        return pos + delta


class Euclidean3D:
    name = "Euclidean3D"
    dim = 3
    dof = 3
    is_pose = False

    @staticmethod
    def retract(pos, delta):
        return pos + delta


class RelativePoses2DLandmark:
    """Graph-SLAM 'fake landmark': an SE(2) pose relative to the base KF."""

    name = "RelativePoses2D"
    dim = 3
    dof = 3
    is_pose = True
    group = SE2

    @staticmethod
    def retract(pose, delta):
        return SE2.retract(pose, delta)


class RelativePoses3DLandmark:
    """Graph-SLAM 'fake landmark': an SE(3) pose relative to the base KF."""

    name = "RelativePoses3D"
    dim = 7
    dof = 6
    is_pose = True
    group = SE3

    @staticmethod
    def retract(pose, delta):
        return SE3.retract(pose, delta)


LANDMARK_TYPES = {
    m.name: m
    for m in [Euclidean2D, Euclidean3D,
              RelativePoses2DLandmark, RelativePoses3DLandmark]
}


def identity_state(lm_type, dtype=jnp.float32):
    """Initial landmark state (identity pose for pose-landmarks, origin point
    otherwise)."""
    if lm_type.is_pose:
        return lm_type.group.identity(dtype)
    return jnp.zeros((lm_type.dim,), dtype=dtype)
