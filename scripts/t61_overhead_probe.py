"""Isolate the per-launch overhead of the single-problem T=61 scorer.

Pieces measured in one process (one attach):
  A. full scorer (windowed, lax.cond)          — the production path
  B. scorer with _WINDOW_ROWS huge             — full-table path, NO cond
  C. XLA window prelude only (no pallas_call)  — bounds math + slice cost
  D. pallas_call with a trivial kernel         — same BlockSpecs, no compute
  E. full scorer with tile_k=512 / 1024        — fewer grid steps per launch

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/t61_overhead_probe.py
"""

import argparse
import functools
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-scan", type=int, default=150)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--n-steps", type=int, default=60)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache/tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices())

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    T = n_steps + 1
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
    print(f"K={K} T={T} n_scan={args.n_scan}")

    take1 = lambda tree: type(tree)(*[leaf[0] for leaf in tree])
    ref1 = take1(scene.ref)
    corridor1 = collision_ops.CorridorArrays(
        d_lo=scene.corridor_lo[0], d_hi=scene.corridor_hi[0])
    packed = pallas_cycle.pack_ref_tables(ref1, corridor1)
    ref_s_last = pallas_cycle.true_path_length(ref1)
    obstacles1 = collision_ops.ObstacleArrays(
        pose=scene.obs_pose[0, :, :T], half_ext=scene.obs_half[0],
        valid=scene.obs_valid[0, :, :T])
    cl1, ca1, tl1 = grid_ops.velocity_keeping_candidates(
        carry.x0_lon[0], carry.x0_lat[0], jnp.asarray(18.0, dtype),
        jnp.asarray(25.0, dtype), jnp.asarray(False), grid)
    gv = jnp.ones(K, dtype=bool)

    def timed(name, make_body):
        raw = jax.jit(lambda v0: jax.lax.scan(make_body(), v0, None,
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
            print(f"{name:28s}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:160]}")
            return
        per_launch = min(times) / args.n_scan
        print(f"{name:28s}: {per_launch * 1e6:8.1f} us/launch "
              f"{K / per_launch / 1e6:7.2f} M cands/s")

    # A. production scorer
    def body_full():
        def body(v, _):
            costs, _, _ = pallas_cycle._score_candidates_pallas(
                cl1, ca1, tl1, gv, packed, obstacles1, veh,
                carry.orientation[0], dtype(0.1), jnp.asarray(False), v,
                dtype(0.0), dtype(5.0), ref_s_last, n_steps=n_steps)
            return v + dtype(0.001), jnp.min(costs)
        return body
    timed("A full (windowed+cond)", body_full)

    # B. full-table, no cond
    saved = pallas_cycle._WINDOW_ROWS
    pallas_cycle._WINDOW_ROWS = 10 ** 9

    def body_fulltab():
        def body(v, _):
            costs, _, _ = pallas_cycle._score_candidates_pallas(
                cl1, ca1, tl1, gv, packed, obstacles1, veh,
                carry.orientation[0], dtype(0.1), jnp.asarray(False), v,
                dtype(0.0), dtype(5.0), ref_s_last, n_steps=n_steps,
                tile_k=257)  # distinct static arg -> fresh trace
            return v + dtype(0.001), jnp.min(costs)
        return body
    # tile_k=257 is not lane-aligned; use 256 but force retrace via interpret
    # key instead: simplest is a wrapper with tile_k=256 (jit caches on static
    # args + shapes; _WINDOW_ROWS is read at trace time and the cache key does
    # not include it, so pass a fresh tile_k value that equals 256 semantics)
    def body_fulltab2():
        def body(v, _):
            costs, _, _ = pallas_cycle._score_candidates_pallas(
                cl1, ca1, tl1, gv, packed, obstacles1, veh,
                carry.orientation[0], dtype(0.1), jnp.asarray(False), v,
                dtype(0.0), dtype(5.0), ref_s_last, n_steps=n_steps,
                tile_k=512)
            return v + dtype(0.001), jnp.min(costs)
        return body
    timed("B fulltable tile 512", body_fulltab2)
    pallas_cycle._WINDOW_ROWS = saved

    # E. windowed at other tiles
    for tile in (512, 1024):
        def body_tile(tile=tile):
            def body(v, _):
                costs, _, _ = pallas_cycle._score_candidates_pallas(
                    cl1, ca1, tl1, gv, packed, obstacles1, veh,
                    carry.orientation[0], dtype(0.1), jnp.asarray(False), v,
                    dtype(0.0), dtype(5.0), ref_s_last, n_steps=n_steps,
                    tile_k=tile)
                return v + dtype(0.001), jnp.min(costs)
            return body
        timed(f"E windowed tile {tile}", body_tile)

    # C. XLA prelude only: window bounds + slices + a cheap consumer
    P = packed.shape[0]
    W = 256

    def body_prelude():
        table = packed.astype(dtype)

        def body(v, _):
            c = cl1.astype(dtype)
            tq = (jnp.arange(T, dtype=dtype) * dtype(dt))[None, :]
            s_all = (((((c[:, 5:6] * tq + c[:, 4:5]) * tq + c[:, 3:4]) * tq
                       + c[:, 2:3]) * tq + c[:, 1:2]) * tq + c[:, 0:1]) + v
            lens = tl1.astype(jnp.int32)
            act = jnp.arange(T, dtype=jnp.int32)[None, :] < lens[:, None]
            s_min = jnp.min(jnp.where(act, s_all, jnp.inf))
            s_max = jnp.max(jnp.where(act, s_all, -jnp.inf))
            s_col = table[:, 0]
            i0 = jnp.clip(jnp.sum(s_col <= s_min).astype(jnp.int32) - 1,
                          0, P - W)
            window = jax.lax.dynamic_slice_in_dim(table, i0, W, axis=0)
            win_next = jnp.concatenate([window[1:], window[:1]], axis=0)
            pair_T = jnp.concatenate([window.T, win_next[:, :4].T], axis=0)
            pair_stack = jnp.concatenate(
                pallas_cycle.split3_bf16(pair_T), axis=0)
            band = pallas_cycle.band_delta_tab(window[:, 4], window[:, 5])
            probe = (jnp.sum(pair_stack.astype(jnp.float32))
                     + jnp.sum(band.astype(jnp.float32)) + s_max)
            return v + dtype(0.001), probe
        return body
    timed("C XLA prelude only", body_prelude)

    # D. trivial kernel, same blockspec family (windowed shapes)
    tile = 256
    K_pad = ((K + tile - 1) // tile) * tile
    cl_p = jnp.pad(cl1.T.astype(dtype), ((0, 0), (0, K_pad - K)))
    tab_w = packed[:W].astype(dtype)
    pair_w = jnp.concatenate(pallas_cycle.split3_bf16(
        jnp.concatenate([tab_w.T, tab_w.T[:4]], axis=0)), axis=0)
    band_w = pallas_cycle.band_delta_tab(tab_w[:, 4], tab_w[:, 5])
    obs_w = jnp.zeros((1, T, 7), dtype)

    def trivial_kernel(cl_ref, tab_ref, pair_ref, band_ref, obs_ref, out_ref):
        out_ref[:] = (cl_ref[0:1, :] + tab_ref[0, 0] + pair_ref[0, 0]
                      .astype(jnp.float32) + band_ref[0, 0]
                      .astype(jnp.float32) + obs_ref[0, 0, 0])

    def body_trivial():
        def body(v, _):
            out = pl.pallas_call(
                trivial_kernel,
                out_shape=jax.ShapeDtypeStruct((1, K_pad), dtype),
                grid=(K_pad // tile,),
                in_specs=[
                    pl.BlockSpec((6, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((W, 12), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((48, W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((6, W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, T, 7), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
            )(cl_p + v, tab_w, pair_w, band_w, obs_w)
            return v + dtype(0.001), jnp.sum(out)
        return body
    timed("D trivial kernel", body_trivial)


if __name__ == "__main__":
    main()
