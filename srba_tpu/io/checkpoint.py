"""Checkpoint / resume — a capability the reference LACKS entirely
(``TRBA_Problem_state`` has no serialization; recovery = re-run the dataset;
SURVEY.md §6).  First-class here: the full engine state (SoA tables, graph
topology, landmark id map, parameters) round-trips through one ``.npz`` file,
so a mapping session can resume mid-sequence after preemption.
"""

from __future__ import annotations

import json
from dataclasses import asdict

import numpy as np


CHECKPOINT_VERSION = 1


def save_checkpoint(engine, path: str) -> None:
    engine.sync()  # device master is authoritative between keyframes
    st = engine.state
    meta = {
        "version": CHECKPOINT_VERSION,
        "obs_model": engine.model.name,
        "lm_type": engine.lm_type.name,
        "params": asdict(engine.parameters),
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
        lm_base=st.lm_base[: st.num_lms],
        lm_state=st.lm_state[: st.num_lms],
        lm_fixed=st.lm_fixed[: st.num_lms],
        obs_kf=st.obs_kf[: st.num_obs],
        obs_lm=st.obs_lm[: st.num_obs],
        obs_z=st.obs_z[: st.num_obs],
    )


def load_checkpoint(path: str, calib=None, noise=None, sensor_pose=None,
                    ecp=None):
    """Rebuild a fully-functional engine from a checkpoint.  Non-serializable
    configuration (calibration pytree, noise model, sensor pose, ECP) is
    re-supplied by the caller exactly as at construction time."""
    from srba_tpu.engine.engine import SrbaEngine, SrbaParams

    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["meta"]).decode())
    assert meta["version"] == CHECKPOINT_VERSION, (
        f"unsupported checkpoint version {meta['version']}")

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
        st.add_edge(a, b, data["k2k_pose"][e])
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
            st.k2k_pose, st.lm_state, st.num_edges, st.num_lms)
    # Rebuild the dead-reckoned trajectory from the (optimized) loaded poses.
    if c["num_kfs"]:
        G, dist = eng.create_complete_spanning_tree(0)
        ident = np.asarray(eng.np_group.identity(), np.float32)
        eng._G_dr = [np.asarray(G[k], np.float32) if k in dist else ident
                     for k in range(c["num_kfs"])]
    return eng
