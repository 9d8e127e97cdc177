"""Measured validation of doc/conformance.md divergence 7.

Claim under test: the 27/146 input-reconstruction failures on the
T-junction are forced by the replanning driver's segment stitching (3-step
replans joining different candidates with acceleration jumps), not by this
implementation's states — any driver of the reference algorithm family
produces the same failures.

The actual TUM reference cannot be executed in this image (its dependency
wheels — commonroad-io, commonroad-drivability-checker — are not installed
and installation is disallowed), so the claim is validated by measurement
on the failure mechanism itself:

1. Drive ZAM_Tjunction to the goal with the replanning loop and run the
   KS input-reconstruction harness (utils/evaluation.py, the reference's
   evaluation.py:117-135 semantics) on the stitched solution.
2. For every failing transition, record its position relative to the
   replan boundaries and the acceleration jump |da| across it.
3. For every failing transition, EXHAUSTIVELY search the bounded input box
   (steering rate x acceleration, dense grid + local refinement) for the
   minimum achievable position/orientation error: if no bounded input
   reproduces the transition within tolerance, the state pair itself is
   KS-infeasible — no optimizer or implementation detail can pass it.

Run:  python scripts/divergence7_check.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def min_error_over_input_box(dynamics, x0, x1, dt, n=41):
    """Dense bounded-input sweep + refinement: the floor of the position
    error any reconstruction could reach (optimizer-independent)."""
    import numpy as np

    from commonroad_rp_tpu.utils.evaluation import _angle_diff

    p = dynamics.params

    def err(u):
        sim = dynamics.forward_simulation(x0, u, dt, throw=False)
        return float(np.hypot(sim[0] - x1[0], sim[1] - x1[1])), \
            abs(_angle_diff(sim[4], x1[4]))

    best = (np.inf, np.inf, None)
    lo = np.array([p.v_delta_min, -p.a_max])
    hi = np.array([p.v_delta_max, p.a_max])
    for _ in range(3):                       # 3 refinement passes
        vd_grid = np.linspace(lo[0], hi[0], n)
        a_grid = np.linspace(lo[1], hi[1], n)
        for vd in vd_grid:
            for a in a_grid:
                pe, oe = err(np.array([vd, a]))
                if pe < best[0]:
                    best = (pe, oe, (vd, a))
        vd0, a0 = best[2]
        span_vd = (hi[0] - lo[0]) / (n - 1) * 2
        span_a = (hi[1] - lo[1]) / (n - 1) * 2
        lo = np.array([max(p.v_delta_min, vd0 - span_vd),
                       max(-p.a_max, a0 - span_a)])
        hi = np.array([min(p.v_delta_max, vd0 + span_vd),
                       min(p.a_max, a0 + span_a)])
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None)
    parser.add_argument("--scenario", default="ZAM_Tjunction-1_42_T-1")
    parser.add_argument("--max-steps", type=int, default=200)
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from commonroad_rp_tpu.models.planner import ReactivePlanner
    from commonroad_rp_tpu.utils import evaluation as ev
    from commonroad_rp_tpu.utils.config import ReactivePlannerConfiguration
    from commonroad_rp_tpu.utils.route import RoutePlanner

    config = ReactivePlannerConfiguration.load(
        f"configurations/{args.scenario}.yaml", f"{args.scenario}.xml")
    config.update()
    config.debug.kernel_dtype = "float32"
    config.debug.fast_scoring = True
    freq = config.planning.replanning_frequency

    route = RoutePlanner(config.scenario,
                         config.planning_problem).plan_routes() \
        .retrieve_first_route()
    planner = ReactivePlanner(config)
    planner.set_reference_path(route.reference_path)
    planner.record_state_and_input(planner.x_0)
    optimal = None
    while not planner.goal_reached() and \
            len(planner.record_state_list) <= args.max_steps:
        count = len(planner.record_state_list) - 1
        if count % freq == 0:
            planner.set_desired_velocity(current_speed=planner.x_0.velocity)
            optimal = planner.plan()
            if not optimal:
                break
            offset = 1
        else:
            offset = 1 + count % freq
        planner.record_state_and_input(optimal[0].state_list[offset])
        planner.reset(initial_state_cart=planner.record_state_list[-1],
                      initial_state_curv=(optimal[2][offset],
                                          optimal[3][offset]),
                      collision_checker=planner.collision_checker,
                      coordinate_system=planner.coordinate_system)
    states = planner.record_state_list
    print(f"# loop: goal={planner.goal_reached()} steps={len(states) - 1}")

    trajectory = ev.create_full_solution_trajectory(config, states)
    solution = ev.create_planning_problem_solution(
        config, trajectory, config.scenario, config.planning_problem)
    pps = solution.planning_problem_solutions[0]
    feasible, _ = ev.reconstruct_inputs(config, pps)
    fails = [i for i, f in enumerate(feasible) if not f]
    print(f"# reconstruction: {len(feasible) - len(fails)}/{len(feasible)} "
          f"transitions pass; failures at {fails}")

    dynamics = ev.VehicleDynamicsKS.from_vehicle_type(
        config.vehicle.id_type_vehicle)
    sol_states = pps.trajectory.state_list
    accel = [s.acceleration for s in states]
    rows = []
    for i in fails:
        x0, _ = dynamics.state_to_array(sol_states[i])
        x1, _ = dynamics.state_to_array(sol_states[i + 1])
        pe, oe, u = min_error_over_input_box(dynamics, x0, x1,
                                             config.planning.dt)
        da = abs(accel[i + 1] - accel[i])
        rows.append(dict(
            transition=i,
            at_replan_boundary=bool(i % freq == 0),
            accel_jump=round(float(da), 3),
            min_pos_err_any_bounded_input=round(pe, 5),
            min_orient_err=round(oe, 6),
            fails_for_any_input=bool(pe > 2e-2 or oe > 3e-2)))
    forced = sum(r["fails_for_any_input"] for r in rows)
    at_boundary = sum(r["at_replan_boundary"] for r in rows)
    for r in rows:
        print(json.dumps(r))
    print(json.dumps({
        "scenario": args.scenario,
        "transitions": len(feasible),
        "failures": len(fails),
        "failures_at_replan_boundary": at_boundary,
        "failures_forced_for_any_bounded_input": forced,
        "median_accel_jump_at_failures": round(float(np.median(
            [r["accel_jump"] for r in rows])), 3) if rows else None,
    }))


if __name__ == "__main__":
    main()
