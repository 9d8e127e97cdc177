"""Fleet-scale throughput demo: many planning problems, one device program.

Measures problem-cycles/sec and candidate-evals/sec for a large fleet
(`--fleet-size` copies of the bundled scenarios) running the full replanning
scan in a single jit call.  The production deployment shape (SURVEY.md
section 2.3: scenario-axis data parallelism).

    python scripts/fleet_scale_demo.py [--fleet-size 128] [--cycles 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None)
    parser.add_argument("--fleet-size", type=int, default=128)
    parser.add_argument("--cycles", type=int, default=20)
    parser.add_argument("--level", type=int, default=3)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--pallas", action="store_true",
                        help="use the fused Pallas fleet scoring kernel "
                             "(parallel.pallas_fleet.make_pallas_fleet_scan)")
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from commonroad_rp_tpu.ops import grid as grid_ops
    from commonroad_rp_tpu.ops import kinematics as kin_ops
    from commonroad_rp_tpu.parallel import fleet as fleet_ops
    from commonroad_rp_tpu.parallel.mesh import make_fleet_mesh
    from commonroad_rp_tpu.utils.config import VehicleConfiguration
    from commonroad_rp_tpu.utils.general import load_scenario_and_planning_problem
    from commonroad_rp_tpu.utils.route import RoutePlanner

    dtype = jnp.float32
    n_steps, dt = 20, 0.1
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    base_problems = []
    for name in ["ZAM_Over-1_1", "DEU_Test-1_1_T-1", "ZAM-Ramp-1_1-T-1"]:
        scenario, pp, _ = load_scenario_and_planning_problem(
            os.path.join(root, "example_scenarios", f"{name}.xml"))
        route = RoutePlanner(scenario, pp).plan_routes().retrieve_first_route()
        base_problems.append(fleet_ops.problem_from_planner_setup(
            scenario, pp, route.reference_path, n_steps=n_steps,
            horizon_pad=args.cycles * 3 + 10, dtype=dtype))

    problems = [base_problems[i % len(base_problems)]
                for i in range(args.fleet_size)]
    scene, carry = fleet_ops.build_fleet_scene(problems, n_steps, dtype=dtype)

    veh_cfg = VehicleConfiguration()
    veh = kin_ops.VehicleArrays(*[np.float32(x) for x in [
        veh_cfg.wheelbase, veh_cfg.wb_rear_axle, veh_cfg.a_max,
        veh_cfg.v_switch, np.tan(veh_cfg.delta_max) / veh_cfg.wheelbase,
        veh_cfg.v_delta_max, veh_cfg.length / 2, veh_cfg.width / 2]])
    static_grid = grid_ops.make_static_grid(args.level, 0.4, n_steps * dt, dt,
                                            -3.0, 3.0, 4)
    K = static_grid.size

    if args.pallas:
        from commonroad_rp_tpu.parallel import pallas_fleet
        run_scan = pallas_fleet.make_pallas_fleet_scan(
            scene, static_grid, dt, n_steps, replan_offset=3,
            low_vel_threshold=4.0, horizon=n_steps * dt, n_cycles=args.cycles,
            interpret=jax.default_backend() == "cpu")
        run = lambda c, _s: run_scan(c)
    else:
        run = fleet_ops.make_fleet_rollout(
            make_fleet_mesh(), veh, static_grid, dt, n_steps, replan_offset=3,
            low_vel_threshold=4.0, horizon=n_steps * dt, n_cycles=args.cycles)

    t0 = time.time()
    out = run(carry, scene)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(args.repeats):
        out = run(carry, scene)
    jax.block_until_ready(out)
    elapsed = (time.time() - t0) / args.repeats

    final_carry, metrics = out
    success = (np.asarray(metrics[4]) if args.pallas
               else np.asarray(metrics.fleet_success))
    problem_cycles = args.fleet_size * args.cycles
    print(json.dumps({
        "fleet_size": args.fleet_size,
        "cycles": args.cycles,
        "candidates_per_cycle": K,
        "wall_s_per_scan": round(elapsed, 4),
        "problem_cycles_per_sec": round(problem_cycles / elapsed, 1),
        "candidate_evals_per_sec": round(problem_cycles * K / elapsed, 1),
        "cycle_latency_ms_amortized": round(elapsed / args.cycles * 1e3, 2),
        "success_first_cycle": int(success[0]),
        "success_last_cycle": int(success[-1]),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "path": "pallas" if args.pallas else "xla",
    }))


if __name__ == "__main__":
    main()
