"""Loop-closure edge bootstrap — measurement-based initialization of
closure edges.

The drift problem: a loop-closure edge connects the new keyframe to an area
center last seen a full loop ago.  Every available *estimate* of that
relative pose (dead reckoning, the incrementally optimized spanning tree)
carries the loop's accumulated drift — after thousands of keyframes the
seed can be off by many meters / tens of degrees, far outside the basin of
the local reprojection LM, and an unconverged closure edge poisons every
spanning-tree path routed through it (measured: the 5k-KF monocular run
exploded at the first revisit).

The fix is what a SLAM front-end does: estimate the closure transform from
the *re-observed landmarks themselves*, which is drift-free:

* Models WITH a single-view inverse sensor model (range-bearing 2D/3D,
  cartesian, stereo): invert the new keyframe's observations into 3D/2D
  points in the new frame and rigidly align them (Kabsch/Umeyama, closed
  form) to the landmarks' known positions composed into the center frame.
* Monocular (bearings only): multi-start damped Gauss-Newton PnP over the
  known-3D voter landmarks — a yaw grid of starts around the drifted seed
  kills the rotation basin problem, and a pixel-RMS gate rejects fits that
  failed (the engine then DEFERS the closure; the ECP re-votes on later
  frames).

Host-side numpy by design: a closure fires ~once per submap revisit with a
handful of correspondences — tiny, latency-sensitive work that would waste
a tunnel round-trip on device dispatch.

The reference has no analog (its ECPs create closure edges initialized
from ``inverse pose composition`` of the current estimates —
``ecps::local_areas_fixed_grid`` semantics, public MRPT/srba layout); this
module is what makes those semantics survive real drift at scale.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from srba_tpu.ops.np_lie import compose_path


def _kabsch(P: np.ndarray, Q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Rigid fit Q ~= R P + t (rows are points, any dim)."""
    mu_p, mu_q = P.mean(0), Q.mean(0)
    H = (P - mu_p).T @ (Q - mu_q)
    U, _, Vt = np.linalg.svd(H)
    d = P.shape[1]
    S = np.eye(d)
    if np.linalg.det(Vt.T @ U.T) < 0:
        S[-1, -1] = -1.0
    R = Vt.T @ S @ U.T
    return R, mu_q - R @ mu_p


def _se2_from_rt(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    return np.asarray([t[0], t[1], np.arctan2(R[1, 0], R[0, 0])], np.float32)


def _se3_from_rt(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Rotation matrix + translation -> (t, quat w-first) 7-vector."""
    from srba_tpu.ops.np_lie import quat_from_matrix
    return np.concatenate([t, quat_from_matrix(R)]).astype(np.float32)


def _voter_points_in_center(engine, center: int,
                            voters: List[Tuple[int, np.ndarray]]
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Voter landmark positions composed into the CENTER keyframe's frame
    (current estimates; host mirror must be fresh)."""
    st = engine.state
    g = engine.np_group
    depth = engine.parameters.max_tree_depth
    pts, zs = [], []
    for lm, z in voters:
        base = int(st.lm_base[lm])
        if base == center:
            T_cb = None
        else:
            path = engine.graph.path(center, base, depth)
            if path is None:
                continue
            T_cb = compose_path(g, st.k2k_pose, path)
        p = st.lm_state[lm]
        if T_cb is not None:
            p = g.apply(T_cb, p)
        pts.append(np.asarray(p, np.float64))
        zs.append(np.asarray(z, np.float64))
    if not pts:
        return np.zeros((0, st.lm_dim)), np.zeros((0, st.z_dim))
    return np.stack(pts), np.stack(zs)


def _obs_residual_fn(engine, P: np.ndarray, Z: np.ndarray):
    """Observation-space residual of the closure transform: maps
    center-frame voter points P through T (=T_new<-center) and the sensor
    mounting pose, predicts with the model's ``h``, subtracts Z.

    This is the statistically correct fit metric: a 3D point-distance fit
    (Kabsch) weights the stereo/mono DEPTH direction — whose error grows as
    z^2 — equally with the pixel-accurate bearing directions, and a handful
    of long-range voters then yields transforms tens of degrees off
    (measured: 2.8 m / 35 deg at the first stereo revisit).  Minimizing in
    observation space recovers bearing-grade accuracy."""
    model, g = engine.model, engine.np_group
    calib = engine._calib_np
    spinv = engine._sensor_pose_inv.astype(np.float64)
    use_sp = engine._use_sensor_pose
    is_cam = calib is not None

    def residual(T):
        q = g.apply(T, P)                        # new-KF robot frame
        s = g.apply(spinv, q) if use_sp else q   # sensor frame
        pred = np.asarray(model.h(s, calib), np.float64)
        r = pred - Z
        if is_cam:
            # Points behind the camera: saturate (keeps FD finite, repels
            # fits that tunnel through the image plane).
            r[s[..., 2] <= 1e-3] = 1e3
        return r.reshape(-1)

    return residual


def _gn_solve(g, residual, T0, dof: int, iters: int = 25
              ) -> Tuple[np.ndarray, float, np.ndarray]:
    """Damped Gauss-Newton on a numpy residual with finite-difference
    Jacobian over the ``dof``-dim tangent (voter counts are tiny; host
    numpy is the right venue — engine/closure.py module docstring).
    Returns ``(T, rms, JtJ)`` with JtJ from the final linearization (the
    observability/covariance estimate used for gating)."""
    T = np.asarray(T0, np.float64)
    lam = 1e-2
    r = residual(T)
    err = float(r @ r)
    J = np.zeros((r.size, dof))
    for _ in range(iters):
        eps = 1e-5
        for d in range(dof):
            dv = np.zeros(dof)
            dv[d] = eps
            J[:, d] = (residual(g.retract(T, dv)) - r) / eps
        H = J.T @ J + lam * np.eye(dof)
        try:
            delta = -np.linalg.solve(H, J.T @ r)
        except np.linalg.LinAlgError:
            break
        T_new = g.retract(T, delta)
        r_new = residual(T_new)
        err_new = float(r_new @ r_new)
        if err_new < err:
            T, r, err = T_new, r_new, err_new
            lam = max(lam * 0.3, 1e-8)
            if err / max(r.size, 1) < 1e-8:
                break
        else:
            lam = min(lam * 10.0, 1e6)
    return T, float(np.sqrt(err / max(r.size, 1))), J.T @ J


def _mono_pnp(engine, P: np.ndarray, Z: np.ndarray, T_seed: np.ndarray
              ) -> Tuple[Optional[np.ndarray], float, Optional[np.ndarray]]:
    """Multi-start damped Gauss-Newton PnP: returns
    ``(T_new<-center, rms_px, JtJ)``.  Starts = seed composed with a yaw
    grid (drift is predominantly yaw)."""
    g = engine.np_group
    residual = _obs_residual_fn(engine, P, Z)

    best = (None, np.inf, None)
    yaws = np.deg2rad([0, 15, -15, 30, -30, 45, -45, 60, -60, 90, -90, 180])
    for y in yaws:
        dv = np.zeros(6)
        dv[5] = y                       # yaw slot of the SE3 pseudo-log
        T0 = g.retract(np.asarray(T_seed, np.float64), dv)
        T, rms, JtJ = _gn_solve(g, residual, T0, 6)
        if rms < best[1]:
            best = (T, rms, JtJ)
        if best[1] < 1.0:               # sub-pixel: no better basin exists
            break
    return best


def _fit_sigma(rms: float, JtJ: np.ndarray, obs_sigma: float = 1.0) -> float:
    """Predicted worst-direction pose sigma of a closure fit: residual
    scale over the square root of JtJ's smallest eigenvalue.  Large either
    when the fit is bad (rms) or when the voter geometry leaves the pose
    underdetermined (clustered voters -> near-singular JtJ) — both cases
    must DEFER the closure rather than insert a poisoned edge."""
    w = np.linalg.eigvalsh(JtJ)
    lam_min = max(float(w[0]), 1e-12)
    return max(rms, obs_sigma) / np.sqrt(lam_min)


def bootstrap_closure_edge(engine, center: int,
                           voters: List[Tuple[int, np.ndarray]],
                           seed: np.ndarray
                           ) -> Tuple[str, Optional[np.ndarray], float]:
    """Estimate the closure edge ``T_new<-center`` from the re-observed
    landmarks.  Returns ``(status, T, gate_ratio)`` with status:

    * ``"ok"``     — measurement-based estimate in ``T``;
    * ``"reject"`` — the fit failed its gate; DEFER this closure;
    * ``"n/a"``    — not applicable (too few usable correspondences /
      pose-landmark mode); caller falls back to estimate-based seeding.

    ``gate_ratio`` is the fit's worst gate value over its threshold
    (<= 1 means every gate passed): the engine's staleness policy
    re-verifies NEAR-threshold fits (ratio <= ~2) against a fresh mirror
    while rejecting far fits cheaply (engine.py closure branch).
    """
    model = engine.model
    if getattr(model, "is_pose_landmark", False):
        return "n/a", None, np.inf
    P, Z = _voter_points_in_center(engine, center, voters)
    d = engine.lm_type.dim
    dof = engine.group.dof
    max_sigma = engine.parameters.closure_max_sigma

    if model.has_inverse_model:
        if P.shape[0] < (2 if d == 2 else 3):
            return "n/a", None, np.inf
        # Measured points in the NEW keyframe's robot frame.
        pts_new = np.asarray(model.inverse(Z.astype(np.float32),
                                           engine._calib_np), np.float64)
        if engine._use_sensor_pose:
            pts_new = engine.np_group.apply(
                engine._sensor_pose.astype(np.float64), pts_new)
        # Collinearity guard: Kabsch needs spatial extent.
        if np.linalg.matrix_rank(P - P.mean(0), tol=1e-6) < min(d, 2):
            return "n/a", None, np.inf
        R, t = _kabsch(P, pts_new)      # p_new ~= R p_center + t = T (+) p
        T = _se2_from_rt(R, t) if d == 2 else _se3_from_rt(R, t)
        # Kabsch is only the INITIAL BASIN: polish in observation space
        # (where the noise actually lives), then gate on the fit's
        # predicted pose sigma — bad fits / underdetermined voter geometry
        # are deferred (the ECP re-votes on later, closer frames).
        residual = _obs_residual_fn(engine, P.astype(np.float64),
                                    Z.astype(np.float64))
        T, rms, JtJ = _gn_solve(engine.np_group, residual,
                                np.asarray(T, np.float64), dof)
        ratio = (_fit_sigma(rms, JtJ) / max_sigma
                 if max_sigma is not None else 0.0)
        if ratio > 1.0:
            return "reject", None, ratio
        return "ok", T.astype(np.float32), ratio

    if model.name == "MonocularCamera":
        if P.shape[0] < 4:
            return "n/a", None, np.inf
        T, rms, JtJ = _mono_pnp(engine, P, Z, seed)
        if T is None:
            return "reject", None, np.inf
        ratio = rms / engine.parameters.closure_gate_px
        if max_sigma is not None:
            ratio = max(ratio, _fit_sigma(rms, JtJ) / max_sigma)
        if ratio > 1.0:
            return "reject", None, ratio
        return "ok", T.astype(np.float32), ratio

    return "n/a", None, np.inf
