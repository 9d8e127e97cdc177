"""Hardware timing ablation of the fused scoring kernel at a given horizon.

Times ``_score_candidates_pallas`` with each ``pallas_cycle._ABLATE``
section disabled in turn — the drop vs the full kernel attributes device
time to that section.  ABLATED RESULTS ARE WRONG; this is instrumentation
only (the module hook must be poked explicitly, there is no env hook).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/t61_ablation.py \
        --n-steps 60 --n-scan 150
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-scan", type=int, default=150)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--n-steps", type=int, default=60)
    parser.add_argument("--sections", default="gather,probes,constraints,"
                        "obb,hold,enlarge,gather+probes,ALL")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache/tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices())

    import jax.numpy as jnp

    from commonroad_rp_tpu.ops import collision as collision_ops
    from commonroad_rp_tpu.ops import grid as grid_ops
    from commonroad_rp_tpu.ops import kinematics as kin_ops
    from commonroad_rp_tpu.ops import pallas_cycle
    from commonroad_rp_tpu.parallel import fleet as fleet_ops
    from commonroad_rp_tpu.utils.config import VehicleConfiguration
    from commonroad_rp_tpu.utils.general import load_scenario_and_planning_problem
    from commonroad_rp_tpu.utils.route import RoutePlanner

    dtype = jnp.float32
    n_steps, dt = args.n_steps, 0.1
    scenario, pp, _ = load_scenario_and_planning_problem(
        "example_scenarios/ZAM_Over-1_1.xml")
    route = RoutePlanner(scenario, pp).plan_routes().retrieve_first_route()
    problem = fleet_ops.problem_from_planner_setup(
        scenario, pp, route.reference_path, n_steps=n_steps, horizon_pad=30,
        dtype=dtype)
    scene, carry = fleet_ops.build_fleet_scene([problem], n_steps, dtype=dtype)

    veh_cfg = VehicleConfiguration()
    veh = kin_ops.VehicleArrays(
        wheelbase=jnp.asarray(veh_cfg.wheelbase, dtype),
        wb_rear_axle=jnp.asarray(veh_cfg.wb_rear_axle, dtype),
        a_max=jnp.asarray(veh_cfg.a_max, dtype),
        v_switch=jnp.asarray(veh_cfg.v_switch, dtype),
        kappa_max=jnp.asarray(np.tan(veh_cfg.delta_max) / veh_cfg.wheelbase,
                              dtype),
        v_delta_max=jnp.asarray(veh_cfg.v_delta_max, dtype),
        half_length=jnp.asarray(0.5 * veh_cfg.length, dtype),
        half_width=jnp.asarray(0.5 * veh_cfg.width, dtype))
    grid = grid_ops.make_static_grid(3, 0.4, n_steps * dt, dt, -3.0, 3.0, 4)
    K = grid.size
    print(f"K={K} T={n_steps + 1} n_scan={args.n_scan}")

    take1 = lambda tree: type(tree)(*[leaf[0] for leaf in tree])
    ref1 = take1(scene.ref)
    corridor1 = collision_ops.CorridorArrays(
        d_lo=scene.corridor_lo[0], d_hi=scene.corridor_hi[0])
    packed = pallas_cycle.pack_ref_tables(ref1, corridor1)
    pre = pallas_cycle.precompute_scorer_tables(packed)
    ref_s_last = pallas_cycle.true_path_length(ref1)
    obstacles1 = collision_ops.ObstacleArrays(
        pose=scene.obs_pose[0, :, :n_steps + 1], half_ext=scene.obs_half[0],
        valid=scene.obs_valid[0, :, :n_steps + 1])
    cl1, ca1, tl1 = grid_ops.velocity_keeping_candidates(
        carry.x0_lon[0], carry.x0_lat[0], jnp.asarray(18.0, dtype),
        jnp.asarray(25.0, dtype), jnp.asarray(False), grid)
    gv = jnp.ones(K, dtype=bool)

    configs = [("full", frozenset())]
    all_sections = ("gather", "probes", "constraints", "obb", "hold",
                    "enlarge")
    for name in args.sections.split(","):
        if name == "ALL":
            configs.append(("ALL", frozenset(all_sections)))
        else:
            configs.append((name, frozenset(name.split("+"))))

    baseline = None
    for name, ablate in configs:
        pallas_cycle._ABLATE = ablate
        # _ABLATE is read at trace time and is NOT part of the jit cache key
        # — without this, every config after the first reuses the first
        # compiled executable and the sweep measures nothing
        pallas_cycle._score_candidates_pallas.clear_cache()

        def body(v, _):
            span = grid_ops.candidate_lon_span(
                carry.x0_lon[0], jnp.asarray(18.0, dtype),
                jnp.asarray(25.0, dtype), grid, 0.1, n_steps)
            span_steps = grid_ops.candidate_lon_span_steps(
                carry.x0_lon[0], jnp.asarray(18.0, dtype),
                jnp.asarray(25.0, dtype), grid, 0.1, n_steps)
            costs, kin, reason = pallas_cycle._score_candidates_pallas(
                cl1, ca1, tl1, gv, packed, obstacles1, veh,
                carry.orientation[0], dtype(0.1), jnp.asarray(False), v,
                dtype(0.0), dtype(5.0), ref_s_last, span=span,
                span_steps=span_steps, pre=pre,
                n_steps=n_steps)
            return v + dtype(0.001), (jnp.min(costs), jnp.sum(reason))

        raw = jax.jit(lambda v0, body=body: jax.lax.scan(
            body, v0, None, length=args.n_scan))
        try:
            with jax.enable_x64(False):
                out = raw(dtype(20.0))
                jax.block_until_ready(out)
                times = []
                for _ in range(args.reps):
                    t0 = time.time()
                    out = raw(dtype(20.0))
                    jax.block_until_ready(out)
                    times.append(time.time() - t0)
        except Exception as exc:                              # noqa: BLE001
            print(f"{name:16s}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:160]}")
            continue
        per_launch = min(times) / args.n_scan
        if baseline is None:
            baseline = per_launch
        print(f"{name:16s}: {per_launch * 1e6:8.1f} us/launch "
              f"{K / per_launch / 1e6:7.2f} M evals/s   "
              f"delta vs full: {(baseline - per_launch) * 1e6:+8.1f} us "
              f"({(baseline - per_launch) / baseline * 100:+5.1f}%)")
    pallas_cycle._ABLATE = frozenset()


if __name__ == "__main__":
    main()
