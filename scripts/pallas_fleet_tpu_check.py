"""Hardware validation of the fleet-batched Pallas scorer.

Compiles score_fleet_pallas on the real TPU (Mosaic), checks bit-level
agreement with per-problem score_candidates_pallas calls, and measures the
fleet-scan throughput.  Run manually after kernel changes:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_fleet_tpu_check.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from commonroad_rp_tpu.ops import grid as grid_ops
from commonroad_rp_tpu.ops import kinematics as kin_ops
from commonroad_rp_tpu.ops import pallas_cycle
from commonroad_rp_tpu.ops.collision import CorridorArrays, ObstacleArrays
from commonroad_rp_tpu.parallel import fleet as fleet_ops
from commonroad_rp_tpu.parallel import pallas_fleet
from commonroad_rp_tpu.utils.general import load_scenario_and_planning_problem
from commonroad_rp_tpu.utils.route import RoutePlanner


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fleet-size", type=int, default=8)
    parser.add_argument("--level", type=int, default=2)
    parser.add_argument("--cycles", type=int, default=20)
    parser.add_argument("--skip-parity", action="store_true")
    args = parser.parse_args()

    print("devices:", jax.devices())
    dtype = jnp.float32
    n_steps, dt = 20, 0.1
    F = args.fleet_size

    scenario, pp, _ = load_scenario_and_planning_problem(
        "example_scenarios/ZAM_Over-1_1.xml")
    route = RoutePlanner(scenario, pp).plan_routes().retrieve_first_route()
    base = fleet_ops.problem_from_planner_setup(
        scenario, pp, route.reference_path, n_steps=n_steps, horizon_pad=60,
        dtype=dtype)
    problems = []
    for f in range(F):
        p = dict(base)
        scale = 0.7 + 0.3 * (f % 8) / 8.0
        p["velocity"] = float(base["velocity"]) * scale
        x0 = np.asarray(base["x0_lon"], np.float64).copy()
        x0[1] *= scale
        p["x0_lon"] = x0
        problems.append(p)

    static_grid = grid_ops.make_static_grid(args.level, 0.4, n_steps * dt, dt,
                                            -3.0, 3.0, 4)
    scene, carry = fleet_ops.build_fleet_scene(problems, n_steps, dtype=dtype)
    n_cycles = args.cycles

    run = pallas_fleet.make_pallas_fleet_scan(
        scene, static_grid, dt, n_steps, replan_offset=3,
        low_vel_threshold=4.0, horizon=n_steps * dt, n_cycles=n_cycles)

    t0 = time.perf_counter()
    final, metrics = jax.block_until_ready(run(carry))
    t_compile = time.perf_counter() - t0
    print(f"compile+first run: {t_compile:.1f}s")
    found = np.asarray(metrics[0])
    print(f"found: {found.sum()}/{found.size}")
    assert found.all(), "fleet members failed to plan on hardware"

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        final, metrics = jax.block_until_ready(run(carry))
    dt_run = (time.perf_counter() - t0) / reps
    K = int(static_grid.n_t * static_grid.n_v * static_grid.n_d) \
        if hasattr(static_grid, "n_t") else 0
    # derive K from a single grid generation
    cl, _, _ = grid_ops.velocity_keeping_candidates(
        jnp.asarray(base["x0_lon"], dtype), jnp.asarray(base["x0_lat"], dtype),
        jnp.float32(5.0), jnp.float32(15.0), jnp.asarray(False), static_grid)
    K = cl.shape[0]
    cand = F * K * n_cycles
    print(f"fleet scan: {dt_run*1e3:.1f} ms / {n_cycles} cycles x {F} problems"
          f" ({dt_run/n_cycles*1e3:.2f} ms/cycle, K={K},"
          f" {cand/dt_run/1e6:.2f}M cand/s)")

    if args.skip_parity:
        return

    # bitwise parity of one fleet launch vs per-problem launches
    corr = CorridorArrays(d_lo=scene.corridor_lo, d_hi=scene.corridor_hi)
    with jax.enable_x64(False):
        packed = jax.vmap(pallas_cycle.pack_ref_tables)(scene.ref, corr)
        s = scene.ref.s
        ref_s_last = jnp.max(jnp.where(s < s[:, :1] + 5e5, s, -jnp.inf),
                             axis=1).astype(dtype)
        veh_stack = pallas_cycle.pack_veh_stack(scene.veh)
    T = n_steps + 1
    cls, cas, tls = [], [], []
    for f in range(F):
        cl, ca, tl = grid_ops.velocity_keeping_candidates(
            jnp.asarray(problems[f]["x0_lon"], dtype),
            jnp.asarray(problems[f]["x0_lat"], dtype),
            jnp.float32(4.0), jnp.float32(14.0), jnp.asarray(False),
            static_grid)
        cls.append(cl), cas.append(ca), tls.append(tl)
    cl = jnp.stack(cls)
    ca = jnp.stack(cas)
    tl = jnp.stack(tls)
    K = cl.shape[1]

    got = np.stack([np.asarray(row) for row in pallas_cycle.score_fleet_pallas(
        cl, ca, tl, jnp.ones((F, K), dtype=bool), packed,
        scene.obs_pose[:, :, :T], scene.obs_half,
        scene.obs_valid[:, :, :T], veh_stack,
        carry.orientation.astype(dtype), dt,
        jnp.zeros(F, dtype), scene.desired_speed.astype(dtype),
        jnp.zeros(F, dtype), jnp.full(F, 5.0, dtype), ref_s_last,
        n_steps=n_steps)], axis=1)   # [F, 3, K]: masked + kin + reason rows

    mismatches = 0
    for f in range(F):
        veh_f = kin_ops.VehicleArrays(
            *[leaf[f] for leaf in scene.veh])
        obs_f = ObstacleArrays(pose=scene.obs_pose[f, :, :T],
                               half_ext=scene.obs_half[f],
                               valid=scene.obs_valid[f, :, :T])
        want = np.stack([np.asarray(row) for row in
                         pallas_cycle.score_candidates_pallas(
            cl[f], ca[f], tl[f], jnp.ones(K, dtype=bool), packed[f], obs_f,
            veh_f, carry.orientation[f].astype(dtype), dt,
            jnp.asarray(False), scene.desired_speed[f].astype(dtype),
            jnp.float32(0.0), jnp.float32(5.0), ref_s_last[f],
            n_steps=n_steps)])          # [3, K]
        if not np.array_equal(got[f], want, equal_nan=True):
            # NaN == NaN counts as agreement; report (row, candidate) pairs
            diff = (got[f] != want) & ~(np.isnan(got[f]) & np.isnan(want))
            rows, cands = np.nonzero(diff)
            print(f"problem {f}: {cands.size} mismatched entries "
                  f"(rows {sorted(set(rows.tolist()))}, "
                  f"first candidates {cands[:5].tolist()})")
            mismatches += cands.size
    print("parity:", "BIT-IDENTICAL" if mismatches == 0
          else f"{mismatches} mismatches")
    assert mismatches == 0


if __name__ == "__main__":
    main()
