"""T=61 (reference default horizon) through the FLEET path + overhead pieces.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/t61_fleet_probe.py
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--n-steps", type=int, default=60)
    parser.add_argument("--fleet", type=int, default=32)
    parser.add_argument("--cycles", type=int, default=10)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache/tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices())

    import jax.numpy as jnp

    from commonroad_rp_tpu.ops import grid as grid_ops
    from commonroad_rp_tpu.parallel import fleet as fleet_ops
    from commonroad_rp_tpu.parallel import pallas_fleet
    from commonroad_rp_tpu.utils.general import load_scenario_and_planning_problem
    from commonroad_rp_tpu.utils.route import RoutePlanner

    dtype = jnp.float32
    n_steps, dt = args.n_steps, 0.1
    scenario, pp, _ = load_scenario_and_planning_problem(
        "example_scenarios/ZAM_Over-1_1.xml")
    route = RoutePlanner(scenario, pp).plan_routes().retrieve_first_route()
    problem = fleet_ops.problem_from_planner_setup(
        scenario, pp, route.reference_path, n_steps=n_steps, horizon_pad=60,
        dtype=dtype)
    grid = grid_ops.make_static_grid(3, 0.4, n_steps * dt, dt, -3.0, 3.0, 4)
    K = grid.size
    print(f"K={K} T={n_steps + 1} F={args.fleet} cycles={args.cycles}")

    scene, carry = fleet_ops.build_fleet_scene([problem] * args.fleet, n_steps,
                                               dtype=dtype)
    run = pallas_fleet.make_pallas_fleet_scan(
        scene, grid, dt, n_steps, replan_offset=3, low_vel_threshold=4.0,
        horizon=n_steps * dt, n_cycles=args.cycles)
    out = run(carry)
    jax.block_until_ready(out)
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        out = run(carry)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    per_call = min(times)
    evals = args.fleet * K * args.cycles
    print(f"fleet T61: {per_call * 1e3:.2f} ms/call "
          f"{evals / per_call / 1e6:.2f} M cands/s "
          f"({per_call / args.cycles / args.fleet * 1e6:.1f} us per "
          f"problem-cycle)")


if __name__ == "__main__":
    main()
