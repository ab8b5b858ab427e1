from srba_tpu.models.kf2kf_poses import KF2KF_POSE_TYPES  # noqa: F401
from srba_tpu.models.landmarks import LANDMARK_TYPES  # noqa: F401
from srba_tpu.models.observations import (  # noqa: F401
    OBSERVATION_MODELS,
    CameraCalib,
    Cartesian2D,
    Cartesian3D,
    MonocularCamera,
    RangeBearing2D,
    RangeBearing3D,
    RelativePoses2D,
    RelativePoses3D,
    StereoCalib,
    StereoCamera,
)
from srba_tpu.models.noise import NoiseConstantMatrix, NoiseIdentity  # noqa: F401
from srba_tpu.models.sensor_pose import SensorPoseNone, SensorPoseSE3  # noqa: F401
