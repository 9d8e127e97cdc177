"""Hardware BIT-parity of the per-step-window gather scheme at T = 61.

Scores the default-horizon candidate set twice on the real chip — once with
per-step table windows (span_steps; the production long-horizon path,
including the one-compare step-difference interval one-hot) and once on the
cycle-window path (span only) — and compares all three output rows
bitwise.  The mandatory hardware gate for any change to the per-step window
machinery (verify skill: interpret mode accepts things Mosaic lowers
differently; the round-3 windowing draft was interpret-clean and wrong on
chip).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/t61_parity_check.py
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-steps", type=int, default=60)
    parser.add_argument("--configs", default="18,25;8,15;2,8",
                        help="semicolon list of v_min,v_max windows")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices())

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    import jax.numpy as jnp

    from commonroad_rp_tpu.ops import collision as collision_ops
    from commonroad_rp_tpu.ops import grid as grid_ops
    from commonroad_rp_tpu.ops import kinematics as kin_ops
    from commonroad_rp_tpu.ops import pallas_cycle
    from commonroad_rp_tpu.parallel import fleet as fleet_ops
    from commonroad_rp_tpu.utils.config import VehicleConfiguration

    dtype = jnp.float32
    n61 = args.n_steps
    dt = 0.1
    problem = graft._build_problem(dtype, n61)
    scene, carry = fleet_ops.build_fleet_scene([problem], n61, dtype=dtype)
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
    grid61 = grid_ops.make_static_grid(
        level=3, t_min=0.4, horizon=n61 * dt, dt=dt, d_min=-3.0, d_max=3.0,
        num_levels=4)
    K61 = grid61.size
    take1 = lambda tree: type(tree)(*[leaf[0] for leaf in tree])
    ref1 = take1(scene.ref)
    corridor1 = collision_ops.CorridorArrays(
        d_lo=scene.corridor_lo[0], d_hi=scene.corridor_hi[0])
    packed = pallas_cycle.pack_ref_tables(ref1, corridor1)
    pre = pallas_cycle.precompute_scorer_tables(packed)
    ref_s_last = pallas_cycle.true_path_length(ref1)
    obstacles1 = collision_ops.ObstacleArrays(
        pose=scene.obs_pose[0, :, :n61 + 1],
        half_ext=scene.obs_half[0],
        valid=scene.obs_valid[0, :, :n61 + 1])

    ok = True
    for spec_str in args.configs.split(";"):
        v_min, v_max = (float(x) for x in spec_str.split(","))
        low_vel = v_max < 4.0
        cl1, ca1, tl1 = grid_ops.velocity_keeping_candidates(
            carry.x0_lon[0], carry.x0_lat[0], jnp.asarray(v_min, dtype),
            jnp.asarray(v_max, dtype), jnp.asarray(low_vel), grid61)
        gv = jnp.ones(K61, dtype=bool)
        span = grid_ops.candidate_lon_span(
            carry.x0_lon[0], jnp.asarray(v_min, dtype),
            jnp.asarray(v_max, dtype), grid61, dt, n61)
        span_steps = grid_ops.candidate_lon_span_steps(
            carry.x0_lon[0], jnp.asarray(v_min, dtype),
            jnp.asarray(v_max, dtype), grid61, dt, n61)

        def score(ss):
            out = pallas_cycle.score_candidates_pallas(
                cl1, ca1, tl1, gv, packed, obstacles1, veh,
                carry.orientation[0], dtype(dt), jnp.asarray(low_vel),
                jnp.asarray(20.0, dtype), dtype(0.0), dtype(5.0),
                ref_s_last, span=span, span_steps=ss, pre=pre, n_steps=n61)
            return [np.asarray(x) for x in out]

        ps = score(span_steps)
        base = score(None)
        same = all((a == b).all() | (np.isnan(a) & np.isnan(b)).all()
                   for a, b in zip(ps, base))
        n_finite = int(np.isfinite(ps[0]).sum())
        print(f"v=[{v_min},{v_max}] finite={n_finite}/{K61} "
              f"parity: {'BIT-IDENTICAL' if same else 'MISMATCH'}")
        if not same:
            for i, (a, b) in enumerate(zip(ps, base)):
                bad = np.flatnonzero(a != b)
                print(f"  row {i}: {len(bad)} mismatches, first {bad[:5]}")
            ok = False
    print("OVERALL:", "BIT-IDENTICAL" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
