"""Edge-creation policies (ECPs) — which kf2kf edges a new keyframe gets,
including loop closures.

Reference analog (public MRPT/srba layout: ``include/srba/ecps/*.h``;
SURVEY.md §3): ``ecps::classic_linear_rba``, ``ecps::local_areas_fixed_grid``,
``ecps::local_areas_var1``.  Pure host-side integer policy — topology
decisions gate the device work but never run on device.

Policy contract: ``edges_for_new_kf(state, graph, new_kf, obs_lm_ids)``
returns ``(primary_targets, closure_targets)`` — existing-KF ids the new
keyframe should be linked to (edges are created as ``(new_kf, target)``,
pose unknown ``T_new<-target``).  ``primary`` links are topologically local
(previous KF / own area center: the engine seeds their initial pose from the
dead-reckoned trajectory, no device sync); ``closure`` links are re-visits of
distant map areas (seeded from the optimized spanning tree).  ``obs_lm_ids``
are the landmark ids observed by the new KF that already exist in the map
(the loop-closure evidence).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from typing import List

from srba_tpu.engine.state import ProblemState
from srba_tpu.graph.spantree import KeyframeGraph


@dataclass
class ClassicLinearRBA:
    """Chain topology: every new KF links to the previous KF (odometry-like).
    Reference: ``ecps::classic_linear_rba``."""

    name: str = "classic_linear_rba"

    def edges_for_new_kf(self, state: ProblemState, graph: KeyframeGraph,
                         new_kf: int, obs_lm_ids: List[int]):
        return ([new_kf - 1] if new_kf > 0 else []), []


@dataclass
class LocalAreasFixedGrid:
    """Submap topology: KFs are grouped into fixed-size areas; each area's
    first KF is its *center*.  A new KF links to its own area center, a new
    center links to the previous center, and **loop closures** add edges to
    other areas' centers when the new KF re-observes enough landmarks based
    in those areas.  Reference: ``ecps::local_areas_fixed_grid`` with
    ``submap_size`` / ``min_obs_count_to_consider_loop_closure``.
    """

    submap_size: int = 10
    min_obs_count_loop_closure: int = 4
    name: str = "local_areas_fixed_grid"

    def center_of(self, kf: int) -> int:
        return (kf // self.submap_size) * self.submap_size

    def edges_for_new_kf(self, state: ProblemState, graph: KeyframeGraph,
                         new_kf: int, obs_lm_ids: List[int]):
        if new_kf == 0:
            return [], []
        my_center = self.center_of(new_kf)
        primary: List[int] = []
        if new_kf == my_center:
            # New area center: chain to the previous area's center.
            primary.append(self.center_of(new_kf - 1))
        else:
            primary.append(my_center)

        # Loop closures: count re-observed landmarks per foreign area center.
        votes: Counter = Counter()
        for lm in obs_lm_ids:
            base = int(state.lm_base[lm])
            c = self.center_of(base)
            if c != my_center:
                votes[c] += 1
        closures: List[int] = []
        for center, count in sorted(votes.items()):
            if count >= self.min_obs_count_loop_closure \
                    and center not in primary and center != new_kf \
                    and _needs_closure(graph, primary[0], center):
                closures.append(center)
        return primary, closures


def _needs_closure(graph: KeyframeGraph, anchor: int, center: int) -> bool:
    """A loop-closure edge is only structurally useful when the re-visited
    area is NOT already reachable within the spanning-tree depth (through
    the primary link's neighborhood).  Without this check every keyframe in
    a re-visited region re-votes an edge to the same center: the graph
    densifies into a small world and depth-bounded windows balloon to the
    whole map (measured: E=1024-edge windows, 390 of 900 keyframes, per-KF
    cost x100).  One closure edge per re-entered area keeps windows
    bounded — the SRBA O(1) property."""
    return graph.distance(anchor, center,
                          max(1, graph.max_tree_depth - 1)) is None


@dataclass
class LocalAreasVar1:
    """Variant of the local-areas policy (reference ``ecps::local_areas_var1``):
    links to the *nearest existing area center by spanning-tree distance* when
    available (keeping optimization windows tight), with the same
    landmark-vote loop closures."""

    submap_size: int = 10
    min_obs_count_loop_closure: int = 4
    name: str = "local_areas_var1"

    def center_of(self, kf: int) -> int:
        return (kf // self.submap_size) * self.submap_size

    def edges_for_new_kf(self, state: ProblemState, graph: KeyframeGraph,
                         new_kf: int, obs_lm_ids: List[int]):
        if new_kf == 0:
            return [], []
        primary = [new_kf - 1]  # always keep local chain connectivity
        votes: Counter = Counter()
        for lm in obs_lm_ids:
            c = self.center_of(int(state.lm_base[lm]))
            votes[c] += 1
        my_center = self.center_of(new_kf)
        closures: List[int] = []
        for center, count in sorted(votes.items()):
            if center == my_center or center in primary or center == new_kf:
                continue
            if count >= self.min_obs_count_loop_closure \
                    and _needs_closure(graph, primary[0], center):
                closures.append(center)
        return primary, closures


ECPS = {
    "classic_linear_rba": ClassicLinearRBA,
    "local_areas_fixed_grid": LocalAreasFixedGrid,
    "local_areas_var1": LocalAreasVar1,
}
