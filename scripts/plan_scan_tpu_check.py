"""Hardware validation of ReactivePlanner.plan_scan (device-resident loop).

Drives ZAM_Over-1_1 to the goal with the one-dispatch replanning scan on the
real TPU, measures warm ms/planning-cycle, and cross-checks the recorded
trajectory against the per-cycle plan() host loop on the same backend.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/plan_scan_tpu_check.py
"""

import argparse
import time

import numpy as np


def build_planner(fast=True, n_steps=None):
    from commonroad_rp_tpu.models.planner import ReactivePlanner
    from commonroad_rp_tpu.utils.config import ReactivePlannerConfiguration
    from commonroad_rp_tpu.utils.route import RoutePlanner

    config = ReactivePlannerConfiguration.load(
        "configurations/ZAM_Over-1_1.yaml", "ZAM_Over-1_1.xml")
    if n_steps is not None:
        # e.g. 60 = the reference default 6 s horizon (T = 61): exercises
        # the scorer's per-step table windows in the facade scan
        config.planning.time_steps_computation = n_steps
    config.update()
    config.debug.kernel_dtype = "float32"
    config.debug.fast_scoring = fast
    route = RoutePlanner(config.scenario,
                         config.planning_problem).plan_routes() \
        .retrieve_first_route()
    planner = ReactivePlanner(config)
    planner.set_reference_path(route.reference_path)
    planner.set_desired_velocity(current_speed=planner.x_0.velocity)
    return planner


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cycles", type=int, default=12)
    parser.add_argument("--n-steps", type=int, default=None)
    parser.add_argument("--skip-host-loop", action="store_true")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache/tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices())

    # cold run (compile)
    planner = build_planner(n_steps=args.n_steps)
    planner.record_state_and_input(planner.x_0)
    t0 = time.perf_counter()
    info = planner.plan_scan(args.cycles)
    t_cold = time.perf_counter() - t0
    print(f"plan_scan compile+run: {t_cold:.1f}s, goal={info['goal_reached']}, "
          f"cycles={info['cycles_run']}, steps={info['steps']}")
    scan_states = [s for s in planner.record_state_list]

    # warm runs: same planner, cached scan + executable (record=False keeps
    # the initial state, so every call replans the identical problem)
    p = build_planner(n_steps=args.n_steps)
    p.plan_scan(args.cycles, record=False)        # build + compile once
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        info = p.plan_scan(args.cycles, record=False)
        times.append(time.perf_counter() - t0)
    warm = float(np.median(times))
    per_cycle = warm / args.cycles
    print(f"plan_scan warm: {warm*1e3:.1f} ms / {args.cycles} cycles "
          f"= {per_cycle*1e3:.2f} ms/cycle (incl. host unpack)")
    # device-only: time the cached scan function directly
    import jax as _jax
    from commonroad_rp_tpu.parallel.pallas_fleet import FacadeScanCarry
    import jax.numpy as jnp
    # LRU cache (round 4): most recently built scan is the last entry
    # (value = (run, corridor_pin))
    run = next(reversed(p._plan_scan_cache.values()))[0]
    x0_lon, x0_lat = p.x_0_cl
    carry = FacadeScanCarry(
        x0_lon=jnp.asarray(np.asarray(x0_lon), jnp.float32),
        x0_lat=jnp.asarray(np.asarray(x0_lat), jnp.float32),
        orientation=jnp.asarray(p.x_0.orientation, jnp.float32),
        velocity=jnp.asarray(p.x_0.velocity, jnp.float32),
        time_step=jnp.asarray(p.x_0.time_step, jnp.int32),
        alive=jnp.asarray(True),
        kappa=jnp.asarray(np.tan(p.x_0.steering_angle) /
                          p.vehicle_params.wheelbase, jnp.float32),
        px=jnp.asarray(p.x_0.position[0], jnp.float32),
        py=jnp.asarray(p.x_0.position[1], jnp.float32))
    _jax.block_until_ready(run(carry))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        _jax.block_until_ready(run(carry))
        times.append(time.perf_counter() - t0)
    dev = float(np.median(times))
    print(f"scan device-only: {dev*1e3:.1f} ms / {args.cycles} cycles "
          f"= {dev/args.cycles*1e3:.2f} ms/cycle")

    if args.skip_host_loop:
        return

    # host per-cycle loop on the same backend for comparison
    host = build_planner(n_steps=args.n_steps)
    host.record_state_and_input(host.x_0)
    cycle_times = []
    optimal = None
    while not host.goal_reached() and len(host.record_state_list) <= 60:
        count = len(host.record_state_list) - 1
        freq = host.config.planning.replanning_frequency
        if count % freq == 0:
            host.set_desired_velocity(current_speed=host.x_0.velocity)
            t0 = time.perf_counter()
            optimal = host.plan()
            cycle_times.append(time.perf_counter() - t0)
            if not optimal:
                break
            offset = 1
        else:
            offset = 1 + count % freq
        host.record_state_and_input(optimal[0].state_list[offset])
        host.reset(initial_state_cart=host.record_state_list[-1],
                   initial_state_curv=(optimal[2][offset], optimal[3][offset]),
                   collision_checker=host.collision_checker,
                   coordinate_system=host.coordinate_system)
    p50 = float(np.median(cycle_times[1:])) if len(cycle_times) > 1 else float("nan")
    print(f"host loop: goal={host.goal_reached()}, "
          f"steps={len(host.record_state_list) - 1}, "
          f"plan() p50={p50*1e3:.1f} ms (n={len(cycle_times)})")

    n = min(len(scan_states), len(host.record_state_list))
    err = max(float(np.linalg.norm(a.position - b.position))
              for a, b in zip(scan_states[:n], host.record_state_list[:n]))
    same_steps = len(scan_states) == len(host.record_state_list)
    print(f"trajectory agreement: same step count={same_steps}, "
          f"max position delta={err:.2e} m over {n} states")
    print(f"speedup per planning cycle: {p50 / per_cycle:.0f}x")


if __name__ == "__main__":
    main()
