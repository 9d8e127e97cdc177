"""Hardware validation of the POLYGON obstacle block in the Pallas scorer.

The fleet parity gate (pallas_fleet_tpu_check.py) runs rectangle scenes, so
its compiled kernel contains no polygon code (n_polys is static).  This
compiles the scorer WITH a polygon group on the real TPU and checks the
masked-cost row against the XLA path (same f32 inputs).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/poly_kernel_tpu_check.py
"""

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache/tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices())

    import jax.numpy as jnp

    from commonroad_rp_tpu.ops import collision as co
    from commonroad_rp_tpu.ops import cycle as cycle_ops
    from commonroad_rp_tpu.ops import frenet as frenet_ops
    from commonroad_rp_tpu.ops import kinematics as kin_ops
    from commonroad_rp_tpu.ops.polynomial import quartic_coeffs, quintic_coeffs

    with jax.enable_x64(False):
        dtype = jnp.float32
        n = 256
        s_ref = np.linspace(0.0, 120.0, n)
        ref = frenet_ops.RefPathTables(
            points=jnp.asarray(np.stack([s_ref, np.zeros(n)], 1), dtype),
            s=jnp.asarray(s_ref, dtype), theta=jnp.zeros(n, dtype),
            curv=jnp.zeros(n, dtype), curv_d=jnp.zeros(n, dtype),
            curv_dd=jnp.zeros(n, dtype),
            tangent=jnp.asarray(np.tile([1.0, 0.0], (n, 1)), dtype),
            normal=jnp.asarray(np.tile([0.0, 1.0], (n, 1)), dtype))
        veh = kin_ops.VehicleArrays(
            wheelbase=dtype(2.5), wb_rear_axle=dtype(1.4), a_max=dtype(8.0),
            v_switch=dtype(7.3), kappa_max=dtype(0.2), v_delta_max=dtype(0.4),
            half_length=dtype(2.2), half_width=dtype(0.9))

        n_steps, dt = 20, 0.1
        horizon = n_steps * dt
        d_ends = np.linspace(-4.0, 4.0, 513)
        K = len(d_ends)
        c_lon = np.tile(np.asarray(
            quartic_coeffs(jnp.asarray([[0.0, 10.0, 0.0]]),
                           jnp.asarray([10.0]), jnp.asarray([horizon]))),
            (K, 1))
        xd_lat = np.stack([d_ends, np.zeros(K), np.zeros(K)], axis=1)
        c_lat = np.asarray(quintic_coeffs(
            jnp.asarray(np.zeros((K, 3))), jnp.asarray(xd_lat),
            jnp.full(K, horizon)))
        traj_len = jnp.full((K,), n_steps + 1, jnp.int32)

        # triangle + one disc + one box: all three shape groups in one kernel
        T = n_steps + 1
        tri = np.asarray([[16.0, -0.5], [20.0, -0.5], [18.0, 1.5]])
        padded = np.concatenate([tri, np.repeat(tri[-1:], 2, axis=0)])
        obstacles = co.ObstacleArrays(
            pose=jnp.asarray(np.stack(
                [np.tile([12.0, -3.6, 0.1], (T, 1)),
                 np.tile([15.0, 2.8, 0.0], (T, 1))]), dtype),
            half_ext=jnp.asarray([[1.5, 0.8], [0.0, 0.0]], dtype),
            valid=jnp.ones((2, T), dtype=bool),
            radius=jnp.asarray([0.0, 1.0], dtype),
            poly_verts=jnp.asarray(np.tile(padded[None, None], (1, T, 1, 1)),
                                   dtype),
            poly_valid=jnp.ones((1, T), dtype=bool))
        corridor = co.CorridorArrays(d_lo=jnp.full((n,), -1e9, dtype),
                                     d_hi=jnp.full((n,), 1e9, dtype))
        cost_params = cycle_ops.CostParams(
            w_a=dtype(5.0), desired_d=dtype(0.0), desired_speed=dtype(10.0),
            desired_s=dtype(0.0))
        kwargs = dict(dt=dt, n_steps=n_steps, low_vel_mode=False,
                      cost_structure=("default", True, False),
                      constraint_flags=(True,) * 5)

        fast = cycle_ops.evaluate_level_fast(
            jnp.asarray(c_lon, dtype), jnp.asarray(c_lat, dtype), traj_len,
            jnp.ones(K, dtype=bool), ref, veh, obstacles, corridor,
            dtype(0.0), cost_params, **kwargs)
        xla = cycle_ops.evaluate_level(
            jnp.asarray(c_lon, dtype), jnp.asarray(c_lat, dtype), traj_len,
            jnp.ones(K, dtype=bool), ref, veh, obstacles, None, corridor,
            dtype(0.0), cost_params, boundary_mode="corridor", **kwargs)

        fast_masked = np.asarray(fast.costs)
        masks = np.asarray(xla.masks)
        ok_xla = masks[0].astype(bool) & ~masks[1].astype(bool)
        n_coll = int(masks[1].sum())
        print(f"colliding candidates: {n_coll}/{K} "
              f"(feasible+free: {int(ok_xla.sum())})")
        assert 0 < n_coll < K, "scene must split the fan"
        mism = int((np.isinf(fast_masked) != ~ok_xla).sum())
        print("mask parity:", "IDENTICAL" if mism == 0
              else f"{mism} mismatches")
        assert mism == 0
        sel_same = int(np.asarray(xla.scalars)[0]) == \
            int(np.asarray(fast.scalars)[0])
        print("winner parity:", "IDENTICAL" if sel_same else "MISMATCH")
        assert sel_same

        # ---- fleet kernel with a live polygon table (F = 2) ---------------
        from commonroad_rp_tpu.ops import pallas_cycle

        F = 2
        rep = lambda a: jnp.broadcast_to(a[None], (F,) + a.shape)
        packed1 = pallas_cycle.pack_ref_tables(ref, corridor)
        Mp, Vp = 1, 5
        poly_tab = jnp.concatenate(
            [obstacles.poly_verts.reshape(Mp, T, 2 * Vp),
             obstacles.poly_valid.astype(dtype)[..., None]],
            axis=-1)                                       # [Mp, T, 2V+1]
        veh_stack = pallas_cycle.pack_veh_stack(
            jax.tree.map(lambda a: jnp.broadcast_to(a, (F,)), veh))
        fleet_rows = pallas_cycle.score_fleet_pallas(
            rep(jnp.asarray(c_lon, dtype)), rep(jnp.asarray(c_lat, dtype)),
            rep(traj_len), jnp.ones((F, K), dtype=bool), rep(packed1),
            rep(obstacles.pose), rep(obstacles.half_ext),
            rep(obstacles.valid), veh_stack,
            jnp.zeros(F, dtype), dt, jnp.zeros(F, dtype),
            jnp.full(F, 10.0, dtype), jnp.zeros(F, dtype),
            jnp.full(F, 5.0, dtype),
            jnp.full(F, pallas_cycle.true_path_length(ref), dtype),
            obs_radius=rep(obstacles.radius), poly_table=rep(poly_tab),
            n_steps=n_steps)
        single_rows = pallas_cycle.score_candidates_pallas(
            jnp.asarray(c_lon, dtype), jnp.asarray(c_lat, dtype), traj_len,
            jnp.ones(K, dtype=bool), packed1, obstacles, veh,
            dtype(0.0), dt, jnp.asarray(False), dtype(10.0), dtype(0.0),
            dtype(5.0), pallas_cycle.true_path_length(ref), n_steps=n_steps)
        mism_f = 0
        for f in range(F):
            got_f = np.stack([np.asarray(r[f]) for r in fleet_rows])
            want_f = np.stack([np.asarray(r) for r in single_rows])
            diff = (got_f != want_f) & ~(np.isnan(got_f) & np.isnan(want_f))
            mism_f += int(diff.sum())
        print("fleet-poly parity:", "BIT-IDENTICAL" if mism_f == 0
              else f"{mism_f} mismatches")
        assert mism_f == 0


if __name__ == "__main__":
    main()
