"""Hardware ablation of the XLA fleet fallback (VERDICT r4 weak #5 / next #8).

Measures where the XLA fleet scan's time goes relative to the Pallas fleet
scan (15x gap in BENCH_r04) by re-tracing the same `make_fleet_rollout`
program with individual stages stubbed out:

  full        — the production XLA fleet scan
  no_gather   — frenet table interpolation (searchsorted + take gathers)
                replaced by constant rows (same shapes, bogus values)
  no_collision— obstacle/corridor collision masks forced to False
  no_both     — both stubs

The difference full - no_gather is the table-gather share: the cost the
Pallas kernel removes with its windowed one-hot MXU gathers.  Stubs break
correctness (values are wrong); only the timings are meaningful.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/xla_fleet_ablation.py
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fleet-size", type=int, default=16)
    parser.add_argument("--cycles", type=int, default=10)
    parser.add_argument("--reps", type=int, default=5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices())

    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    from commonroad_rp_tpu.ops import collision as collision_ops
    from commonroad_rp_tpu.ops import frenet as frenet_ops
    from commonroad_rp_tpu.ops import grid as grid_ops
    from commonroad_rp_tpu.ops import kinematics as kin_ops
    from commonroad_rp_tpu.parallel import fleet as fleet_ops
    from commonroad_rp_tpu.parallel.mesh import make_fleet_mesh
    from commonroad_rp_tpu.utils.config import VehicleConfiguration

    dtype = jnp.float32
    n_steps = 20
    problem = graft._build_problem(dtype, n_steps)
    scene, carry = fleet_ops.build_fleet_scene(
        [problem] * args.fleet_size, n_steps, dtype=dtype)
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
    static_grid = grid_ops.make_static_grid(
        level=3, t_min=0.4, horizon=n_steps * 0.1, dt=0.1,
        d_min=-3.0, d_max=3.0, num_levels=4)
    K = static_grid.size
    mesh = make_fleet_mesh()

    orig_lookup = frenet_ops.lookup_interp_values
    orig_index = frenet_ops.interp_index
    orig_cart = frenet_ops.to_cartesian
    orig_check = collision_ops.check_collisions
    orig_corridor = collision_ops.check_corridor

    def stub_lookup(ref, idx):
        one = jnp.ones(idx.shape, dtype=ref.s.dtype)
        return frenet_ops.InterpValues(
            s_lo=0.0 * one, s_hi=one, theta_lo=0.0 * one, theta_hi=0.01 * one,
            curv_lo=0.0 * one, curv_hi=0.001 * one, curv_d_lo=0.0 * one,
            curv_d_hi=0.0 * one)

    def stub_index(ref, s):
        return jnp.zeros(s.shape, jnp.int32)

    def stub_cart(ref, s, d, *a, **k):
        return s + 1.0, d + 1.0, jnp.ones(s.shape, dtype=bool)

    def stub_check(x, y, theta, obstacles, boundary, hl, hw, wb):
        return jnp.zeros((x.shape[0],), dtype=bool)

    def stub_corridor(s, d, theta_cl, ref_s, corridor, hl, hw, wb,
                      active=None):
        return jnp.zeros((s.shape[0],), dtype=bool)

    def measure(label):
        run = fleet_ops.make_fleet_rollout(
            mesh, veh, static_grid, 0.1, n_steps, replan_offset=3,
            low_vel_threshold=4.0, horizon=n_steps * 0.1,
            n_cycles=args.cycles)
        t0 = time.time()
        out = run(carry, scene)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            out = run(carry, scene)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        med = float(np.median(times))
        evals = args.fleet_size * K * args.cycles
        print(f"{label:13s} {med * 1e3:8.2f} ms/run  "
              f"{evals / med / 1e6:7.2f}M evals/s  (compile {compile_s:.1f}s)")
        return med

    try:
        full = measure("full")
        frenet_ops.lookup_interp_values = stub_lookup
        frenet_ops.interp_index = stub_index
        frenet_ops.to_cartesian = stub_cart
        no_gather = measure("no_gather")
        frenet_ops.lookup_interp_values = orig_lookup
        frenet_ops.interp_index = orig_index
        frenet_ops.to_cartesian = orig_cart
        collision_ops.check_collisions = stub_check
        collision_ops.check_corridor = stub_corridor
        no_collision = measure("no_collision")
        frenet_ops.lookup_interp_values = stub_lookup
        frenet_ops.interp_index = stub_index
        frenet_ops.to_cartesian = stub_cart
        no_both = measure("no_both")
    finally:
        frenet_ops.lookup_interp_values = orig_lookup
        frenet_ops.interp_index = orig_index
        frenet_ops.to_cartesian = orig_cart
        collision_ops.check_collisions = orig_check
        collision_ops.check_corridor = orig_corridor

    print(f"gather share:    {(full - no_gather) / full * 100:5.1f}%")
    print(f"collision share: {(full - no_collision) / full * 100:5.1f}%")
    print(f"residual (physics/argmin/scan): "
          f"{no_both / full * 100:5.1f}% of full")


if __name__ == "__main__":
    main()
