"""Hardware micro-benchmark for the fused Pallas scoring kernel.

Times ``_score_candidates_pallas`` at the benchmark config (T=21, K=2754,
ZAM_Over scene) with a long on-device ``lax.scan`` (default 200 launches per
dispatch) so the tunnel round-trip amortizes out and the number reflects
device time — use this when iterating on the kernel, the ``bench.py``
probes keep the driver-reproducible (shorter-scan) configuration.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/scorer_variant_bench.py
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-scan", type=int, default=200)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--n-steps", type=int, default=20)
    parser.add_argument("--tiles", default="128,256")
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

    checks = None
    for tile in (int(t) for t in args.tiles.split(",")):
        def body(v, _, tile=tile):
            # per-cycle lattice span like the production scan paths
            span = grid_ops.candidate_lon_span(
                carry.x0_lon[0], jnp.asarray(18.0, dtype),
                jnp.asarray(25.0, dtype), grid, 0.1, n_steps)
            costs, kin, reason = pallas_cycle._score_candidates_pallas(
                cl1, ca1, tl1, gv, packed, obstacles1, veh,
                carry.orientation[0], dtype(0.1), jnp.asarray(False), v,
                dtype(0.0), dtype(5.0), ref_s_last, span=span, pre=pre,
                n_steps=n_steps, tile_k=tile)
            return v + dtype(0.001), (jnp.min(costs), jnp.argmin(costs),
                                      jnp.sum(jnp.isfinite(kin)),
                                      jnp.sum(reason))
        raw = jax.jit(lambda v0, body=body: jax.lax.scan(body, v0, None,
                                                         length=args.n_scan))
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
            print(f"tile {tile}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}")
            continue
        per_launch = min(times) / args.n_scan
        chk = tuple(np.asarray(leaf[0]).item() for leaf in out[1])
        if checks is None:
            checks = chk
        print(f"tile {tile:4d}: {per_launch * 1e6:8.1f} us/launch "
              f"{K / per_launch / 1e6:7.2f} M evals/s   "
              f"check={chk}  match={chk == checks}")


if __name__ == "__main__":
    main()
