"""Checkpoint / resume — a capability the reference LACKS entirely
(``TRBA_Problem_state`` has no serialization; recovery = re-run the dataset;
SURVEY.md §6).  First-class here: the full engine state (SoA tables, graph
topology, landmark id map, parameters, AND the model configuration —
calibration, noise model, sensor mounting pose, edge-creation policy)
round-trips through one ``.npz`` file, so a mapping session can resume
mid-sequence after preemption with zero caller-side reconstruction.
"""

from __future__ import annotations

import json
from dataclasses import asdict

import numpy as np


CHECKPOINT_VERSION = 5   # v5 adds per-edge fit information (k2k_info)
# and stateful-ECP state; v4 added per-edge measured sigma (k2k_sigma);
# v3 added edge measurement priors (k2k_prior/_w)


def _encode_calib(calib):
    if calib is None:
        return None
    import dataclasses

    import jax
    kind = type(calib).__name__
    vals = {f.name: np.asarray(jax.device_get(getattr(calib, f.name))).tolist()
            for f in dataclasses.fields(calib)}
    return {"kind": kind, "values": vals}


def _decode_calib(enc):
    if enc is None:
        return None
    from srba_tpu.models.observations import CameraCalib, StereoCalib
    kinds = {"CameraCalib": CameraCalib, "StereoCalib": StereoCalib}
    cls = kinds.get(enc["kind"])
    if cls is None:
        raise ValueError(
            f"checkpoint has unknown calibration kind {enc['kind']!r}; "
            "pass calib= explicitly to load_checkpoint")
    # Numpy leaves on purpose (see CameraCalib docstring).
    return cls(**{k: np.asarray(v, np.float32)
                  for k, v in enc["values"].items()})


def _encode_noise(noise):
    if noise.name == "identity":
        return {"name": "identity", "std": float(noise.std)}
    if noise.name == "constant_matrix":
        return {"name": "constant_matrix", "cov": noise.cov.tolist()}
    raise ValueError(
        f"cannot serialize custom noise model {type(noise).__name__}; "
        "pass noise= explicitly on resume")


def _decode_noise(enc):
    from srba_tpu.models.noise import NoiseConstantMatrix, NoiseIdentity
    if enc["name"] == "identity":
        return NoiseIdentity(enc["std"])
    return NoiseConstantMatrix(np.asarray(enc["cov"], np.float64))


def _encode_sensor_pose(sp, group):
    if sp.is_identity:
        return {"name": "none"}
    import jax
    return {"name": "se3",
            "pose": np.asarray(jax.device_get(sp.pose_for(group))).tolist()}


def _decode_sensor_pose(enc):
    from srba_tpu.models.sensor_pose import SensorPoseNone, SensorPoseSE3
    if enc["name"] == "none":
        return SensorPoseNone()
    return SensorPoseSE3(np.asarray(enc["pose"], np.float32))


def _encode_ecp(ecp):
    from srba_tpu.ecps import ECPS
    name = getattr(ecp, "name", None)
    if name not in ECPS:
        raise ValueError(
            f"cannot serialize custom edge-creation policy "
            f"{type(ecp).__name__}; pass ecp= explicitly on resume")
    out = {"name": name}
    for k in ("submap_size", "min_obs_count_loop_closure", "min_obs_to_join"):
        if hasattr(ecp, k):
            out[k] = int(getattr(ecp, k))
    if hasattr(ecp, "get_state"):   # stateful policy (LocalAreasVar1)
        out["state"] = ecp.get_state()
    return out


def _decode_ecp(enc):
    from srba_tpu.ecps import ECPS
    kw = {k: v for k, v in enc.items() if k not in ("name", "state")}
    ecp = ECPS[enc["name"]](**kw)
    if "state" in enc and hasattr(ecp, "set_state"):
        ecp.set_state(enc["state"])
    return ecp


def save_checkpoint(engine, path: str) -> None:
    engine.sync()  # device master is authoritative between keyframes
    st = engine.state
    meta = {
        "version": CHECKPOINT_VERSION,
        "obs_model": engine.model.name,
        "lm_type": engine.lm_type.name,
        "params": asdict(engine.parameters),
        "calib": _encode_calib(engine.calib),
        "noise": _encode_noise(engine.noise),
        "sensor_pose": _encode_sensor_pose(engine.sensor_pose, engine.group),
        "ecp": _encode_ecp(engine.ecp),
        "lm_id_map": {str(k): v for k, v in engine._lm_id_map.items()},
        "counts": {
            "num_kfs": st.num_kfs, "num_edges": st.num_edges,
            "num_lms": st.num_lms, "num_obs": st.num_obs,
        },
    }
    np.savez_compressed(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        k2k_from=st.k2k_from[: st.num_edges],
        k2k_to=st.k2k_to[: st.num_edges],
        k2k_pose=st.k2k_pose[: st.num_edges],
        k2k_prior=st.k2k_prior[: st.num_edges],
        k2k_prior_w=st.k2k_prior_w[: st.num_edges],
        k2k_sigma=st.k2k_sigma[: st.num_edges],
        k2k_info=st.k2k_info[: st.num_edges],
        lm_base=st.lm_base[: st.num_lms],
        lm_state=st.lm_state[: st.num_lms],
        lm_fixed=st.lm_fixed[: st.num_lms],
        obs_kf=st.obs_kf[: st.num_obs],
        obs_lm=st.obs_lm[: st.num_obs],
        obs_z=st.obs_z[: st.num_obs],
    )


def load_checkpoint(path: str, calib=None, noise=None, sensor_pose=None,
                    ecp=None):
    """Rebuild a fully-functional engine from a checkpoint.  All model
    configuration (calibration pytree, noise model, sensor pose, ECP) is
    restored from the checkpoint itself; the keyword arguments override it
    (needed only for custom user classes the checkpoint cannot encode)."""
    from srba_tpu.engine.engine import SrbaEngine, SrbaParams

    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["meta"]).decode())
    assert meta["version"] in (2, 3, 4, CHECKPOINT_VERSION), (
        f"unsupported checkpoint version {meta['version']}")
    has_priors = meta["version"] >= 3

    if calib is None:
        calib = _decode_calib(meta["calib"])
    if noise is None:
        noise = _decode_noise(meta["noise"])
    if sensor_pose is None:
        sensor_pose = _decode_sensor_pose(meta["sensor_pose"])
    if ecp is None:
        ecp = _decode_ecp(meta["ecp"])

    eng = SrbaEngine(
        meta["obs_model"], lm_type=meta["lm_type"], calib=calib, noise=noise,
        sensor_pose=sensor_pose, ecp=ecp,
        params=SrbaParams(**meta["params"]))

    c = meta["counts"]
    st = eng.state
    for _ in range(c["num_kfs"]):
        st.add_keyframe()
        eng.graph.add_keyframe()
    for e in range(c["num_edges"]):
        a, b = int(data["k2k_from"][e]), int(data["k2k_to"][e])
        st.add_edge(a, b, data["k2k_pose"][e],
                    prior_w=(float(data["k2k_prior_w"][e])
                             if has_priors else 0.0),
                    sigma=(float(data["k2k_sigma"][e])
                           if meta["version"] >= 4 else 0.0),
                    info=(data["k2k_info"][e]
                          if meta["version"] >= 5 else None))
        if has_priors:
            st.k2k_prior[e] = data["k2k_prior"][e]
        eng.graph.add_edge(a, b)
    for l in range(c["num_lms"]):
        st.add_landmark(int(data["lm_base"][l]), data["lm_state"][l],
                        fixed=bool(data["lm_fixed"][l]))
    for o in range(c["num_obs"]):
        st.add_observation(int(data["obs_kf"][o]), int(data["obs_lm"][o]),
                           data["obs_z"][o])
    eng._lm_id_map = {int(k): v for k, v in meta["lm_id_map"].items()}
    if eng.native is not None:
        # Replay the symbolic structure into the C++ host graph service.
        for _ in range(c["num_kfs"]):
            eng.native.add_keyframe()
        for e in range(c["num_edges"]):
            eng.native.add_edge(int(data["k2k_from"][e]),
                                int(data["k2k_to"][e]))
        for l in range(c["num_lms"]):
            eng.native.add_landmark(int(data["lm_base"][l]),
                                    bool(data["lm_fixed"][l]))
        for o in range(c["num_obs"]):
            eng.native.add_observation(int(data["obs_kf"][o]),
                                       int(data["obs_lm"][o]))
    if eng.device_master is not None:
        # The loop above wrote the host tables directly; replace the device
        # masters wholesale (one upload).
        eng.device_master.upload_from_host(
            st.k2k_pose, st.lm_state, st.num_edges, st.num_lms,
            k2k_prior=st.k2k_prior, k2k_prior_w=st.k2k_prior_w)
    # Rebuild the dead-reckoned trajectory from the (optimized) loaded poses.
    if c["num_kfs"]:
        G, dist = eng.create_complete_spanning_tree(0)
        ident = np.asarray(eng.np_group.identity(), np.float32)
        eng._G_dr = [np.asarray(G[k], np.float32) if k in dist else ident
                     for k in range(c["num_kfs"])]
    return eng
