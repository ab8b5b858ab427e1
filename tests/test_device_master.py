"""Device-resident master-state path (M3): parity with the host-window path,
lazy info semantics, capacity growth, checkpoint round-trip."""

import numpy as np
import pytest

from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.engine.device_master import DeviceMaster, LazyInfo
from srba_tpu.utils.datasets import ate_rmse, make_world_loop_2d, observe


def _run(device_master: bool, num_kfs=25, seed=3):
    world = make_world_loop_2d(num_kfs=num_kfs, radius=8.0,
                               num_landmarks=60, seed=seed)
    ds = observe(world, "RangeBearing2D", noise_std=0.005, sensor_range=6.0,
                 odo_noise_std=0.01, seed=seed)
    eng = SrbaEngine(
        "RangeBearing2D",
        params=SrbaParams(max_tree_depth=4, max_optimize_depth=4),
        device_master=device_master)
    for k, frame in enumerate(ds.frames):
        obs = [Observation(lm_id=m, z=z) for m, z in frame]
        edge_init = {k - 1: ds.odometry[k - 1]} if k > 0 else None
        eng.define_new_keyframe(obs, edge_init=edge_init)
    return eng, world


class TestParity:
    def test_master_matches_host_path(self):
        eng_m, world = _run(True)
        eng_h, _ = _run(False)
        err_m = eng_m.eval_overall_squared_error()
        err_h = eng_h.eval_overall_squared_error()
        assert err_m == pytest.approx(err_h, rel=2e-3, abs=1e-6)
        Gm, _ = eng_m.create_complete_spanning_tree(0)
        Gh, _ = eng_h.create_complete_spanning_tree(0)
        ate_m = ate_rmse(np.asarray(Gm)[:, :2], world.gt_poses[:, :2])
        ate_h = ate_rmse(np.asarray(Gh)[:, :2], world.gt_poses[:, :2])
        assert ate_m == pytest.approx(ate_h, rel=1e-2, abs=1e-4)

    def test_sync_idempotent(self):
        eng, _ = _run(True)
        eng.sync()
        before = eng.state.k2k_pose[: eng.state.num_edges].copy()
        eng.sync()  # clean: must be a no-op
        np.testing.assert_array_equal(
            before, eng.state.k2k_pose[: eng.state.num_edges])


class TestLazyInfo:
    def test_values_fetch_on_access(self):
        eng, _ = _run(True, num_kfs=6)
        info = eng.define_new_keyframe(
            [], run_local_optimization=False)
        assert info.optimize_results == {}
        out = eng.optimize_local_area(5, 3)
        assert isinstance(out, LazyInfo)
        assert "err_final" in out          # no fetch needed for membership
        assert float(out["err_final"]) <= float(out["err_init"]) + 1e-12
        assert set(out.keys()) >= {"err_init", "err_final", "iters"}

    def test_skipped_returns_plain_dict(self):
        eng = SrbaEngine("RangeBearing2D", device_master=True)
        eng.define_new_keyframe([Observation(lm_id=0, z=[1.0, 0.1])])
        # Root with no optimizable window.
        out = eng.optimize_local_area(0, 2)
        assert out.get("skipped") == 1.0


class TestCapacityGrowth:
    def test_master_grows_past_initial_capacity(self):
        dm = DeviceMaster(3, 2)
        dm.INIT_EDGE_CAP  # noqa: B018 — document the default exists
        # Force growth: stage more rows than the initial capacity.
        n = dm.pose.shape[0] + 5
        for i in range(n):
            dm.stage_edge(np.asarray([i, 0.0, 0.0], np.float32))
        dm.flush_append()
        assert dm.num_edges == n
        assert dm.pose.shape[0] >= n
        host_pose = np.zeros((n, 3), np.float32)
        host_lm = np.zeros((0, 2), np.float32)
        dm.dirty = True
        dm.sync_to_host(host_pose, host_lm)
        np.testing.assert_allclose(host_pose[:, 0], np.arange(n))


class TestCheckpointRoundTrip:
    def test_checkpoint_preserves_device_state(self, tmp_path):
        from srba_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        eng, _ = _run(True, num_kfs=12)
        p = str(tmp_path / "ck.npz")
        save_checkpoint(eng, p)
        eng2 = load_checkpoint(p)
        assert eng2.device_master is not None
        assert eng2.device_master.num_edges == eng.state.num_edges
        err1 = eng.eval_overall_squared_error()
        err2 = eng2.eval_overall_squared_error()
        assert err1 == pytest.approx(err2, rel=1e-5, abs=1e-9)
        # Resumed engine keeps working (device masters functional).
        eng2.define_new_keyframe(
            [Observation(lm_id=999, z=[1.0, 0.0])],
            edge_init={eng2.num_keyframes - 1: [0.1, 0.0, 0.0]})
