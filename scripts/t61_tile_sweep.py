"""Hardware sweep of the scoring-kernel candidate tile at the default 6 s
horizon (N=60, T=61) — the VMEM footprint triples vs the 2 s benchmark
config, so the T=21-optimal tile (256) needs re-validation.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/t61_tile_sweep.py
"""

import time

import numpy as np


def main():
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
    n_steps, dt = 60, 0.1
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
    grid61 = grid_ops.make_static_grid(3, 0.4, n_steps * dt, dt, -3.0, 3.0, 4)
    K = grid61.size

    take1 = lambda tree: type(tree)(*[leaf[0] for leaf in tree])
    ref1 = take1(scene.ref)
    corridor1 = collision_ops.CorridorArrays(
        d_lo=scene.corridor_lo[0], d_hi=scene.corridor_hi[0])
    packed = pallas_cycle.pack_ref_tables(ref1, corridor1)
    ref_s_last = pallas_cycle.true_path_length(ref1)
    obstacles1 = collision_ops.ObstacleArrays(
        pose=scene.obs_pose[0, :, :n_steps + 1], half_ext=scene.obs_half[0],
        valid=scene.obs_valid[0, :, :n_steps + 1])
    cl1, ca1, tl1 = grid_ops.velocity_keeping_candidates(
        carry.x0_lon[0], carry.x0_lat[0], jnp.asarray(18.0, dtype),
        jnp.asarray(25.0, dtype), jnp.asarray(False), grid61)
    gv = jnp.ones(K, dtype=bool)
    pre = pallas_cycle.precompute_scorer_tables(packed)
    n_scan = 50

    for tile in (128, 256, 512):
        def body(v, _, tile=tile):
            span = grid_ops.candidate_lon_span(
                carry.x0_lon[0], jnp.asarray(18.0, dtype),
                jnp.asarray(25.0, dtype), grid61, 0.1, n_steps)
            span_steps = grid_ops.candidate_lon_span_steps(
                carry.x0_lon[0], jnp.asarray(18.0, dtype),
                jnp.asarray(25.0, dtype), grid61, 0.1, n_steps)
            costs, _, _ = pallas_cycle._score_candidates_pallas(
                cl1, ca1, tl1, gv, packed, obstacles1, veh,
                carry.orientation[0], dtype(0.1), jnp.asarray(False), v,
                dtype(0.0), dtype(5.0), ref_s_last, span=span,
                span_steps=span_steps, pre=pre, n_steps=n_steps,
                tile_k=tile)
            return v + dtype(0.001), jnp.min(costs)

        raw = jax.jit(lambda v0, body=body: jax.lax.scan(body, v0, None,
                                                         length=n_scan))
        try:
            with jax.enable_x64(False):
                t0 = time.perf_counter()
                out = raw(dtype(20.0))
                jax.block_until_ready(out)
                t_compile = time.perf_counter() - t0
                times = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    jax.block_until_ready(raw(dtype(20.0)))
                    times.append(time.perf_counter() - t0)
            t_run = float(np.median(times)) / n_scan
            print(f"tile {tile:4d}: {t_run*1e3:7.2f} ms/launch "
                  f"({K/t_run/1e6:6.2f}M cand/s, compile {t_compile:.0f}s)")
        except Exception as exc:                             # noqa: BLE001
            print(f"tile {tile:4d}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:140]}")


if __name__ == "__main__":
    main()
