"""Facade fast-scoring path (config.debug.fast_scoring): the fused Pallas
scorer behind the ReactivePlanner API.

Runs the full ZAM_Over replanning loop with fast scoring (interpret mode on
CPU) and checks it against the XLA conformance path: goal reached, matching
selected trajectories, and exact rejection counters.  The per-constraint
reason dict is documented as lost on this path (the reference's
multiprocessing mode loses it the same way, reactive_planner.py:962-967).
"""

import logging

import numpy as np
import pytest

from commonroad_rp_tpu.models.planner import ReactivePlanner
from commonroad_rp_tpu.utils.config import ReactivePlannerConfiguration
from commonroad_rp_tpu.utils.route import RoutePlanner

logging.getLogger("RP_LOGGER").setLevel(logging.CRITICAL)


def _make_config(repo_root, fast):
    config = ReactivePlannerConfiguration.load(
        repo_root / "configurations" / "ZAM_Over-1_1.yaml", "ZAM_Over-1_1.xml")
    config.general.path_scenarios = str(repo_root / "example_scenarios") + "/"
    config.general.set_path_scenario("ZAM_Over-1_1.xml")
    config.update()
    config.debug.fast_scoring = fast
    # fast path runs float32; compare against the float32 XLA path so any
    # difference is the scoring backend, not the dtype
    config.debug.kernel_dtype = "float32"
    return config


def _plan_once(repo_root, fast):
    config = _make_config(repo_root, fast)
    route = RoutePlanner(config.scenario,
                         config.planning_problem).plan_routes() \
        .retrieve_first_route()
    planner = ReactivePlanner(config)
    planner.set_reference_path(route.reference_path)
    planner.set_desired_velocity(current_speed=planner.x_0.velocity)
    result = planner.plan()
    return planner, result


@pytest.fixture(scope="module")
def both_paths(repo_root):
    return _plan_once(repo_root, fast=False), _plan_once(repo_root, fast=True)


def test_fast_scoring_selects_same_trajectory(both_paths):
    (_, want), (_, got) = both_paths
    assert want is not None and got is not None
    want_cart, got_cart = want[0], got[0]
    assert len(want_cart.state_list) == len(got_cart.state_list)
    for a, b in zip(want_cart.state_list, got_cart.state_list):
        np.testing.assert_allclose(b.position, a.position, atol=1e-4)
        np.testing.assert_allclose(b.velocity, a.velocity, atol=1e-4)


def test_fast_scoring_counters_match(both_paths):
    (ref_planner, _), (fast_planner, _) = both_paths
    assert fast_planner.infeasible_count_kinematics == \
        ref_planner.infeasible_count_kinematics
    assert fast_planner.infeasible_count_collision == \
        ref_planner.infeasible_count_collision
    assert fast_planner.optimal_cost == pytest.approx(
        ref_planner.optimal_cost, rel=1e-5)


def test_fast_scoring_reason_dict_lost(both_paths):
    """Documented trade: per-constraint reasons unavailable (all zero),
    mirroring the reference's multiproc statistics loss."""
    _, (fast_planner, _) = both_paths
    assert all(v == 0 for v in fast_planner.infeasible_reason_dict.values())


def test_fast_scoring_full_loop_reaches_goal(repo_root):
    from tests.test_planner_e2e import _run_loop

    config = _make_config(repo_root, fast=True)
    planner = _run_loop(config)
    assert planner.goal_reached()
    assert len(planner.record_state_list) < 60


@pytest.mark.parametrize("scenario,max_len", [
    ("ZAM-Ramp-1_1-T-1", 60),          # standstill start, low-velocity mode
    ("ZAM_Tjunction-1_42_T-1", 160),   # 10 dynamic obstacles, yield phase
])
def test_fast_scoring_hard_scenarios_reach_goal(repo_root, scenario, max_len):
    """The fast path drives the standstill-fallback and dense-traffic
    scenarios end to end with the same step counts as the XLA path."""
    from tests.test_planner_e2e import _run_loop

    config = ReactivePlannerConfiguration.load(
        repo_root / "configurations" / f"{scenario}.yaml", f"{scenario}.xml")
    config.general.path_scenarios = str(repo_root / "example_scenarios") + "/"
    config.general.set_path_scenario(f"{scenario}.xml")
    config.update()
    config.debug.fast_scoring = True
    config.debug.kernel_dtype = "float32"
    planner = _run_loop(config, max_steps=max_len)
    assert planner.goal_reached()


def test_fast_scoring_dynamic_obstacles(repo_root):
    """Dynamic-obstacle scenario (DEU_Test, 2 moving vehicles): the fast
    path must agree with the XLA path on selection and counters when the
    obstacle occupancy window is time-variant."""
    def plan(fast):
        config = ReactivePlannerConfiguration.load(
            repo_root / "configurations" / "DEU_Test-1_1_T-1.yaml",
            "DEU_Test-1_1_T-1.xml")
        config.general.path_scenarios = str(repo_root / "example_scenarios") + "/"
        config.general.set_path_scenario("DEU_Test-1_1_T-1.xml")
        config.update()
        config.debug.fast_scoring = fast
        config.debug.kernel_dtype = "float32"
        route = RoutePlanner(config.scenario,
                             config.planning_problem).plan_routes() \
            .retrieve_first_route()
        planner = ReactivePlanner(config)
        planner.set_reference_path(route.reference_path)
        planner.set_desired_velocity(current_speed=planner.x_0.velocity)
        return planner, planner.plan()

    ref_planner, want = plan(False)
    fast_planner, got = plan(True)
    assert want is not None and got is not None
    for a, b in zip(want[0].state_list, got[0].state_list):
        np.testing.assert_allclose(b.position, a.position, atol=1e-4)
    assert fast_planner.infeasible_count_kinematics == \
        ref_planner.infeasible_count_kinematics
    assert fast_planner.infeasible_count_collision == \
        ref_planner.infeasible_count_collision


def test_fast_scoring_no_feasible_candidates_returns_none(repo_root):
    """When every candidate is rejected (drivable band squeezed to a
    sliver), the fast path must return None from the level evaluation and
    plan() must degrade exactly like the XLA path (standstill fallback only
    at v~0, else None + warning)."""
    import jax.numpy as jnp

    from commonroad_rp_tpu.ops.collision import CorridorArrays

    config = _make_config(repo_root, fast=True)
    route = RoutePlanner(config.scenario,
                         config.planning_problem).plan_routes() \
        .retrieve_first_route()
    planner = ReactivePlanner(config)
    planner.set_reference_path(route.reference_path)
    planner.set_desired_velocity(current_speed=planner.x_0.velocity)
    # squeeze the cached corridor band to an impossible sliver
    corr = planner.collision_checker.corridor_for(planner.coordinate_system)
    planner.collision_checker._corridor_cache[planner.coordinate_system] = \
        CorridorArrays(d_lo=jnp.full_like(corr.d_lo, 0.001),
                       d_hi=jnp.full_like(corr.d_hi, 0.002))
    result = planner.plan()
    assert result is None
    assert planner.infeasible_count_collision > 0
