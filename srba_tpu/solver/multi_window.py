"""Map-parallel refinement: many local windows optimized in ONE device
dispatch (vmapped), optionally sharded over a device mesh.

The reference's only global-refinement story is exporting to an external
optimizer; its local optimizer touches one window per keyframe
(``impl/optimize_local_area.h``, public MRPT/srba layout).  Here the
bounded-window property is exploited for PARALLELISM: windows around many
roots are solved simultaneously as a block-coordinate Levenberg-Marquardt
sweep over the whole map —

* **ownership masking** makes the sweep principled: every unknown (edge /
  landmark) is optimized by exactly ONE window per sweep (first claim);
  other windows that see it treat it as fixed context.  Writes are disjoint
  ⇒ the combined scatter-add is deterministic and the sweep is exact block-
  coordinate descent on the global objective.
* windows are padded to a COMMON bucket shape and stacked on a leading
  ``W`` axis; the whole sweep is one ``vmap``-ped LM+Schur program (device
  dispatch count independent of map size).
* on a mesh, the ``W`` axis is sharded (``shard_map``): each device solves
  its windows against replicated masters and the masked deltas are
  ``psum``-combined — the "keyframe/block sharding" axis of SURVEY.md §3.1.

Repeated sweeps converge like Gauss-Seidel over areas; pair with the global
PGO (:mod:`srba_tpu.solver.global_graphslam`) for long-range error.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

from srba_tpu.solver.lm import SolverConfig, WindowBatch, make_solver_impl

SWEEP_AXIS = "win"


def _make_solve_windows(cfg: SolverConfig):
    import jax
    import jax.numpy as jnp

    solve_impl, _ = make_solver_impl(cfg)
    D = cfg.max_depth

    def solve_windows(pose_master, prior_master, lm_master, ints, obs_z,
                      whitener, sensor_pose_inv, calib, E, L, N):
        """[W] windows -> (edge_ids [W,E], dp, lm_ids [W,L], dl, info)."""

        def one(ints_w, obs_z_w):
            o = 0

            def take(n):
                nonlocal o
                s = ints_w[o: o + n]
                o += n
                return s

            edge_ids = take(E)
            edge_opt = take(E).astype(jnp.float32)
            lm_ids = take(L)
            lm_opt = take(L).astype(jnp.float32)
            obs_lm = take(N)
            obs_valid = take(N).astype(jnp.float32)
            path_edge = take(N * D).reshape(N, D)
            path_sign = take(N * D).reshape(N, D).astype(jnp.float32)
            prior_rows = prior_master[edge_ids]
            pose_dim = pose_master.shape[1]
            batch = WindowBatch(
                edge_pose=pose_master[edge_ids], edge_opt=edge_opt,
                lm_state=lm_master[lm_ids], lm_opt=lm_opt,
                obs_z=obs_z_w, obs_lm=obs_lm,
                path_edge=path_edge, path_sign=path_sign,
                obs_valid=obs_valid,
                whitener=whitener, sensor_pose_inv=sensor_pose_inv,
                calib=calib,
                edge_prior=prior_rows[:, :pose_dim],
                edge_prior_w=prior_rows[:, pose_dim])
            new_edge, new_lm, info = solve_impl(batch)
            dp = (new_edge - batch.edge_pose) * edge_opt[:, None]
            dl = (new_lm - batch.lm_state) * lm_opt[:, None]
            return edge_ids, dp, lm_ids, dl, info

        return jax.vmap(one)(ints, obs_z)

    return solve_windows


def _agg_info(info):
    import jax.numpy as jnp
    return {
        "err_init": jnp.sum(info["err_init"]),
        "err_final": jnp.sum(info["err_final"]),
        "iters": jnp.max(info["iters"]),
        "lam": jnp.max(info["lam"]),
        "num_obs": jnp.sum(info["num_obs"]),
    }


@functools.lru_cache(maxsize=None)
def make_sweep_step(cfg: SolverConfig):
    """Single-device sweep: ``step(pose_master, lm_master, ints [W,T],
    obs_z [W,N,zd], whitener, spinv, calib, E, L, N)`` (donated masters)."""
    import jax

    solve_windows = _make_solve_windows(cfg)

    @functools.partial(jax.jit, static_argnums=(8, 9, 10),
                       donate_argnums=(0, 2))
    def step(pose_master, prior_master, lm_master, ints, obs_z,
             whitener, sensor_pose_inv, calib, E, L, N):
        edge_ids, dp, lm_ids, dl, info = solve_windows(
            pose_master, prior_master, lm_master, ints, obs_z,
            whitener, sensor_pose_inv, calib, E, L, N)
        # Ownership is disjoint across windows => flat scatter-add is
        # deterministic (pad/unowned slots contribute exact zeros).
        pose_master = pose_master.at[edge_ids.reshape(-1)].add(
            dp.reshape(-1, pose_master.shape[1]))
        lm_master = lm_master.at[lm_ids.reshape(-1)].add(
            dl.reshape(-1, lm_master.shape[1]))
        return pose_master, lm_master, _agg_info(info)

    return step


def make_sweep_step_mesh(cfg: SolverConfig, mesh):
    """Mesh-sharded sweep: the ``W`` axis is split over ``mesh``'s single
    axis; masters are replicated and each shard's masked delta field is
    psum-combined.  ``W`` must be a multiple of the mesh size."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    solve_windows = _make_solve_windows(cfg)
    (axis,) = mesh.axis_names

    def build(E, L, N):
        def shard_fn(pose_master, prior_master, lm_master, ints, obs_z,
                     whitener, sensor_pose_inv, calib):
            edge_ids, dp, lm_ids, dl, info = solve_windows(
                pose_master, prior_master, lm_master, ints, obs_z,
                whitener, sensor_pose_inv, calib, E, L, N)
            dpose = jnp.zeros_like(pose_master).at[
                edge_ids.reshape(-1)].add(
                    dp.reshape(-1, pose_master.shape[1]))
            dlm = jnp.zeros_like(lm_master).at[lm_ids.reshape(-1)].add(
                dl.reshape(-1, lm_master.shape[1]))
            dpose = jax.lax.psum(dpose, axis)
            dlm = jax.lax.psum(dlm, axis)
            agg = _agg_info(info)
            # Cross-device combine mirrors the per-window aggregation:
            # sums stay sums, maxima stay maxima.
            info = {k: (jax.lax.pmax(v, axis) if k in ("iters", "lam")
                        else jax.lax.psum(v, axis))
                    for k, v in agg.items()}
            return pose_master + dpose, lm_master + dlm, info

        repl = P()
        info_specs = {k: repl for k in
                      ("err_init", "err_final", "iters", "lam", "num_obs")}
        return jax.jit(jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(repl, repl, repl, P(axis), P(axis), repl, repl, repl),
            out_specs=(repl, repl, info_specs),
            check_vma=False))

    cache = {}

    def step(pose_master, prior_master, lm_master, ints, obs_z,
             whitener, sensor_pose_inv, calib, E, L, N):
        key = (E, L, N)
        if key not in cache:
            cache[key] = build(E, L, N)
        return cache[key](pose_master, prior_master, lm_master, ints, obs_z,
                          whitener, sensor_pose_inv, calib)

    return step


def plan_sweep_roots(engine, stride: Optional[int] = None,
                     offset: int = 0) -> List[int]:
    """Sweep roots covering the map: every ``stride`` keyframes (default:
    the ECP submap size, else max_optimize_depth).  ``offset`` staggers the
    root lattice between sweeps so window boundaries move (alternating
    sweeps relax the unknowns a fixed boundary would freeze)."""
    if stride is None:
        stride = getattr(engine.ecp, "submap_size", None) \
            or engine.parameters.max_optimize_depth
    stride = max(1, int(stride))
    start = int(offset) % stride
    roots = list(range(start, engine.num_keyframes, stride))
    if start != 0:
        roots = [0] + roots   # keep the map origin covered
    return roots
