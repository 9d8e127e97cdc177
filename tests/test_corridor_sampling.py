"""CorridorSampling (adaptive sampling inside driving corridors) and other
facade-level capability switches: fail-safe cost function, continuous
collision checking.
"""

import logging

import numpy as np
import pytest

from commonroad_rp_tpu.models.cost_functions import DefaultCostFunctionFailSafe
from commonroad_rp_tpu.models.planner import ReactivePlanner
from commonroad_rp_tpu.models.sampling import (CorridorSampling,
                                               DrivingCorridor,
                                               sampling_space_factory)
from commonroad_rp_tpu.utils.config import ReactivePlannerConfiguration
from commonroad_rp_tpu.utils.route import RoutePlanner

logging.getLogger("RP_LOGGER").setLevel(logging.CRITICAL)


def _corridor_for(x0_s: float, v0: float, dt: float = 0.1, steps: int = 40,
                  d_band: float = 2.0):
    """Synthetic corridor: widening velocity window, fixed lateral band."""
    vel = {}
    lat = {}
    for step in range(steps):
        vel[step] = (max(0.0, v0 - 5.0), v0 + 5.0)
        lat[step] = [(x0_s - 10.0, x0_s + v0 * dt * steps + 50.0,
                      -d_band, d_band)]
    return DrivingCorridor(first_step=0, velocity_intervals=vel,
                           lateral_interval_map=lat)


def _base_planner(repo_root, sampling_method=1):
    config = ReactivePlannerConfiguration.load(
        repo_root / "configurations" / "ZAM_Over-1_1.yaml", "ZAM_Over-1_1.xml")
    config.general.path_scenarios = str(repo_root / "example_scenarios") + "/"
    config.general.set_path_scenario("ZAM_Over-1_1.xml")
    config.update()
    config.sampling.sampling_method = sampling_method
    route = RoutePlanner(config.scenario,
                         config.planning_problem).plan_routes().retrieve_first_route()
    planner = ReactivePlanner(config)
    planner.set_reference_path(route.reference_path)
    planner.x_0_cl = planner._compute_initial_states(planner.x_0)
    return planner


def test_factory_selects_corridor_sampling(repo_root):
    config = ReactivePlannerConfiguration()
    config.sampling.sampling_method = 2
    assert isinstance(sampling_space_factory(config), CorridorSampling)


def test_corridor_sampling_generates_candidates(repo_root):
    planner = _base_planner(repo_root, sampling_method=2)
    x0_lon, x0_lat = planner.x_0_cl
    planner.sampling_space.driving_corridor = _corridor_for(x0_lon[0],
                                                           planner.x_0.velocity)
    batch = planner.sampling_space.generate_trajectories_at_level(
        1, np.asarray(x0_lon), np.asarray(x0_lat), "velocity_keeping", False)
    assert batch.size > 20
    # all sampled lateral targets within the corridor band
    assert np.all(batch.d_sample >= -2.0) and np.all(batch.d_sample <= 2.0)
    # velocity samples within the corridor velocity window
    assert np.all(batch.lon_sample >= planner.x_0.velocity - 5.0 - 1e-9)
    assert np.all(batch.lon_sample <= planner.x_0.velocity + 5.0 + 1e-9)


def test_corridor_sampling_plan_cycle(repo_root):
    planner = _base_planner(repo_root, sampling_method=2)
    x0_lon, _ = planner.x_0_cl
    # the overtake needs |d| >= ~2.6 to clear the obstacle: a corridor from
    # reachability analysis would provide that room
    planner.sampling_space.driving_corridor = _corridor_for(
        x0_lon[0], planner.x_0.velocity, d_band=3.5)
    planner.set_desired_velocity(current_speed=planner.x_0.velocity)
    result = planner.plan()
    assert result is not None
    # selected candidate stays inside the corridor's lateral band
    _, _, lon_list, lat_list = result
    assert all(abs(lat[0]) <= 4.0 for lat in lat_list)


def test_fail_safe_cost_function(repo_root):
    planner = _base_planner(repo_root)
    planner.set_cost_function(DefaultCostFunctionFailSafe())
    planner.set_desired_velocity(current_speed=planner.x_0.velocity)
    result = planner.plan()
    assert result is not None
    # fail-safe cost has no velocity tracking: the planner still returns a
    # feasible trajectory, selected purely on comfort/lateral terms
    assert planner.optimal_cost >= 0.0


def test_continuous_collision_flag(repo_root):
    planner = _base_planner(repo_root)
    planner.config.planning.continuous_collision_check = True
    planner.set_desired_velocity(current_speed=planner.x_0.velocity)
    result = planner.plan()
    assert result is not None
