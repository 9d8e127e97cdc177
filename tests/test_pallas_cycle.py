"""Fused Pallas scoring kernel vs. the XLA evaluation pipeline.

The kernel must reproduce the XLA path's masked candidate costs (rollout +
cost + corridor + obstacle collision, +inf where infeasible/colliding) —
interpret mode on the CPU mesh; the compiled path runs on real TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from commonroad_rp_tpu.ops import collision as collision_ops
from commonroad_rp_tpu.ops import cost as cost_ops
from commonroad_rp_tpu.ops import frenet as frenet_ops
from commonroad_rp_tpu.ops import grid as grid_ops
from commonroad_rp_tpu.ops import kinematics as kin_ops
from commonroad_rp_tpu.ops import pallas_cycle


def _setup(level=1, v0=15.0, low_vel=False, with_obstacle=True):
    dtype = jnp.float32
    n_steps, dt = 20, 0.1
    xs = np.linspace(0.0, 200.0, 400)
    ys = 6.0 * np.sin(xs / 70.0)
    ref = frenet_ops.from_polyline(np.stack([xs, ys], axis=1), dtype=dtype)
    P = ref.s.shape[0]
    corridor = collision_ops.CorridorArrays(
        d_lo=jnp.full(P, -4.0, dtype), d_hi=jnp.full(P, 4.0, dtype))

    from commonroad_rp_tpu.utils.config import VehicleConfiguration
    vc = VehicleConfiguration()
    veh = kin_ops.VehicleArrays(*[jnp.asarray(x, dtype) for x in [
        vc.wheelbase, vc.wb_rear_axle, vc.a_max, vc.v_switch,
        np.tan(vc.delta_max) / vc.wheelbase, vc.v_delta_max,
        vc.length / 2, vc.width / 2]])

    static_grid = grid_ops.make_static_grid(level, 0.4, n_steps * dt, dt,
                                            -3.0, 3.0, 4)
    x0_lon = jnp.asarray([40.0, v0, 0.2], dtype)
    x0_lat = jnp.asarray([0.4, 0.05, 0.0], dtype)
    cl, ca, tl = grid_ops.velocity_keeping_candidates(
        x0_lon, x0_lat, jnp.asarray(max(0.0, v0 - 4.0), dtype),
        jnp.asarray(v0 + 4.0, dtype), jnp.asarray(low_vel), static_grid)

    T = n_steps + 1
    if with_obstacle:
        pose = np.zeros((1, T, 3), np.float32)
        pose[0, :, 0] = 70.0
        pose[0, :, 1] = 4.5
        obstacles = collision_ops.ObstacleArrays(
            pose=jnp.asarray(pose),
            half_ext=jnp.asarray([[2.5, 1.0]], dtype),
            valid=jnp.ones((1, T), dtype=bool))
    else:
        obstacles = collision_ops.ObstacleArrays(
            pose=jnp.zeros((0, T, 3), dtype),
            half_ext=jnp.zeros((0, 2), dtype),
            valid=jnp.zeros((0, T), dtype=bool))

    return dict(ref=ref, corridor=corridor, veh=veh, cl=cl, ca=ca, tl=tl,
                obstacles=obstacles, dt=dt, n_steps=n_steps,
                x0_theta=jnp.asarray(0.08, dtype), low_vel=low_vel,
                desired_v=jnp.asarray(v0, dtype))


def _xla_masked_costs(cfg):
    rollout = kin_ops.rollout(cfg["cl"], cfg["ca"], cfg["tl"], cfg["ref"],
                              cfg["veh"], cfg["x0_theta"], cfg["dt"],
                              cfg["n_steps"], cfg["low_vel"])
    costs = cost_ops.default_cost(rollout, w_a=jnp.float32(5.0),
                                  desired_d=jnp.float32(0.0),
                                  desired_speed=cfg["desired_v"])
    collides = collision_ops.check_collisions(
        rollout.x, rollout.y, rollout.theta_gl, cfg["obstacles"], None,
        cfg["veh"].half_length, cfg["veh"].half_width, cfg["veh"].wb_rear_axle)
    collides = collides | collision_ops.check_corridor(
        rollout.s, rollout.d, rollout.theta_cl, cfg["ref"].s, cfg["corridor"],
        cfg["veh"].half_length, cfg["veh"].half_width, cfg["veh"].wb_rear_axle)
    ok = rollout.feasible & ~collides
    return np.where(np.asarray(ok), np.asarray(costs), np.inf)


def _pallas_masked_costs(cfg):
    packed = pallas_cycle.pack_ref_tables(cfg["ref"], cfg["corridor"])
    masked, kin, reasons = pallas_cycle.score_candidates_pallas(
        cfg["cl"], cfg["ca"], cfg["tl"],
        jnp.ones(cfg["cl"].shape[0], dtype=bool), packed, cfg["obstacles"],
        cfg["veh"], cfg["x0_theta"], cfg["dt"], cfg["low_vel"],
        cfg["desired_v"], jnp.float32(0.0), jnp.float32(5.0),
        n_steps=cfg["n_steps"], interpret=True)
    return np.asarray(masked), np.asarray(kin)


@pytest.mark.parametrize("v0,low_vel", [(15.0, False), (2.5, True)])
def test_pallas_scoring_matches_xla(v0, low_vel):
    cfg = _setup(v0=v0, low_vel=low_vel)
    want = _xla_masked_costs(cfg)
    got, kin = _pallas_masked_costs(cfg)

    # statistics row: finite exactly where the XLA rollout is kinematically
    # feasible (collision not yet applied)
    rollout = kin_ops.rollout(cfg["cl"], cfg["ca"], cfg["tl"], cfg["ref"],
                              cfg["veh"], cfg["x0_theta"], cfg["dt"],
                              cfg["n_steps"], cfg["low_vel"])
    np.testing.assert_array_equal(np.isfinite(kin),
                                  np.asarray(rollout.feasible))

    finite_want = np.isfinite(want)
    finite_got = np.isfinite(got)
    np.testing.assert_array_equal(finite_got, finite_want)
    assert finite_want.sum() > 0, "degenerate: no feasible candidates"
    np.testing.assert_allclose(got[finite_want], want[finite_want],
                               rtol=2e-4, atol=1e-2)
    # selection agreement
    assert int(np.argmin(got)) == int(np.argmin(want))


def test_pallas_scoring_no_obstacles():
    cfg = _setup(with_obstacle=False)
    want = _xla_masked_costs(cfg)
    got, _ = _pallas_masked_costs(cfg)
    np.testing.assert_array_equal(np.isfinite(got), np.isfinite(want))
    assert int(np.argmin(got)) == int(np.argmin(want))


def test_pallas_scoring_stopping_mode():
    """Stopping mode: quintic longitudinal candidates toward stop positions
    with the desired_s cost term and goal-behind filtering."""
    cfg = _setup(v0=8.0, with_obstacle=False)
    stop_s = 48.0
    static_grid = grid_ops.make_static_grid(1, 0.4, cfg["n_steps"] * cfg["dt"],
                                            cfg["dt"], -3.0, 3.0, 4)
    x0_lon = jnp.asarray([40.0, 8.0, 0.0], jnp.float32)
    x0_lat = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
    cl, ca, tl, goal_valid = grid_ops.stopping_candidates(
        x0_lon, x0_lat, jnp.float32(stop_s - 1.0), jnp.float32(stop_s + 1.0),
        jnp.asarray(False), static_grid)

    rollout = kin_ops.rollout(cl, ca, tl, cfg["ref"], cfg["veh"],
                              cfg["x0_theta"], cfg["dt"], cfg["n_steps"], False)
    want_costs = cost_ops.default_cost(
        rollout, w_a=jnp.float32(1.0), desired_d=jnp.float32(0.0),
        desired_speed=jnp.float32(0.0), desired_s=jnp.float32(stop_s))
    want = np.where(np.asarray(rollout.feasible & goal_valid),
                    np.asarray(want_costs), np.inf)

    packed = pallas_cycle.pack_ref_tables(cfg["ref"], cfg["corridor"])
    got = np.asarray(pallas_cycle.score_candidates_pallas(
        cl, ca, tl, goal_valid, packed, cfg["obstacles"], cfg["veh"],
        cfg["x0_theta"], cfg["dt"], jnp.asarray(False), jnp.float32(0.0),
        jnp.float32(0.0), jnp.float32(1.0),
        pallas_cycle.true_path_length(cfg["ref"]), jnp.float32(stop_s),
        n_steps=cfg["n_steps"], interpret=True)[0])

    np.testing.assert_array_equal(np.isfinite(got), np.isfinite(want))
    finite = np.isfinite(want)
    assert finite.sum() > 0
    np.testing.assert_allclose(got[finite], want[finite], rtol=2e-4, atol=1e-2)
    assert int(np.argmin(got)) == int(np.argmin(want))

def test_fleet_scoring_matches_per_problem():
    """score_fleet_pallas (grid over problems x K-tiles) must reproduce
    per-problem score_candidates_pallas for a heterogeneous fleet: different
    reference paths, obstacles, speeds, and a low-velocity member."""
    fleet_cfgs = [
        _setup(v0=15.0, low_vel=False, with_obstacle=True),
        _setup(v0=2.5, low_vel=True, with_obstacle=True),
        _setup(v0=10.0, low_vel=False, with_obstacle=False),
    ]
    # vary the geometry of problem 2 (different ref path + corridor width)
    xs = np.linspace(0.0, 180.0, 380)
    ys = 0.02 * xs + 3.0 * np.cos(xs / 45.0)
    ref2 = frenet_ops.from_polyline(np.stack([xs, ys], axis=1),
                                    dtype=jnp.float32)
    fleet_cfgs[2]["ref"] = ref2
    fleet_cfgs[2]["corridor"] = collision_ops.CorridorArrays(
        d_lo=jnp.full(ref2.s.shape[0], -3.2, jnp.float32),
        d_hi=jnp.full(ref2.s.shape[0], 3.2, jnp.float32))

    F = len(fleet_cfgs)
    n_steps = fleet_cfgs[0]["n_steps"]
    T = n_steps + 1
    K = fleet_cfgs[0]["cl"].shape[0]

    packed = [pallas_cycle.pack_ref_tables(c["ref"], c["corridor"])
              for c in fleet_cfgs]
    P = max(p.shape[0] for p in packed)
    padded_tables, want = [], []
    for c, p in zip(fleet_cfgs, packed):
        if p.shape[0] < P:
            n = P - p.shape[0]
            rows = jnp.tile(p[-1:], (n, 1))
            rows = rows.at[:, 0].add(
                1e7 * jnp.arange(1, n + 1, dtype=jnp.float32))
            p = jnp.concatenate([p, rows], axis=0)
        padded_tables.append(p)
        want.append(np.stack([np.asarray(row)
                              for row in pallas_cycle.score_candidates_pallas(
            c["cl"], c["ca"], c["tl"], jnp.ones(K, dtype=bool), p,
            c["obstacles"], c["veh"], c["x0_theta"], c["dt"], c["low_vel"],
            c["desired_v"], jnp.float32(0.0), jnp.float32(5.0),
            pallas_cycle.true_path_length(c["ref"]),
            n_steps=n_steps, interpret=True)]))  # [2, K]

    M = max(c["obstacles"].pose.shape[0] for c in fleet_cfgs)
    obs_pose = np.zeros((F, M, T, 3), np.float32)
    obs_ext = np.zeros((F, M, 2), np.float32)
    obs_valid = np.zeros((F, M, T), np.float32)
    for f, c in enumerate(fleet_cfgs):
        m = c["obstacles"].pose.shape[0]
        if m:
            obs_pose[f, :m] = np.asarray(c["obstacles"].pose)
            obs_ext[f, :m] = np.asarray(c["obstacles"].half_ext)
            obs_valid[f, :m] = np.asarray(c["obstacles"].valid)

    veh_stack = jnp.stack([pallas_cycle.pack_veh_stack(
        jax.tree.map(lambda x: x[None], c["veh"]))[0] for c in fleet_cfgs])

    got = np.stack([np.asarray(row)
                    for row in pallas_cycle.score_fleet_pallas(
        jnp.stack([c["cl"] for c in fleet_cfgs]),
        jnp.stack([c["ca"] for c in fleet_cfgs]),
        jnp.stack([c["tl"] for c in fleet_cfgs]),
        jnp.ones((F, K), dtype=bool),
        jnp.stack(padded_tables),
        jnp.asarray(obs_pose), jnp.asarray(obs_ext), jnp.asarray(obs_valid),
        veh_stack,
        jnp.stack([c["x0_theta"] for c in fleet_cfgs]),
        fleet_cfgs[0]["dt"],
        jnp.asarray([float(c["low_vel"]) for c in fleet_cfgs], jnp.float32),
        jnp.stack([c["desired_v"] for c in fleet_cfgs]),
        jnp.zeros(F, jnp.float32), jnp.full(F, 5.0, jnp.float32),
        jnp.stack([pallas_cycle.true_path_length(c["ref"])
                   for c in fleet_cfgs]),
        n_steps=n_steps, interpret=True)], axis=1)  # [F, 2, K]

    for f in range(F):
        np.testing.assert_array_equal(np.isfinite(got[f]),
                                      np.isfinite(want[f]),
                                      err_msg=f"problem {f} feasibility")
        fin = np.isfinite(want[f])
        assert fin.sum() > 0
        np.testing.assert_allclose(got[f][fin], want[f][fin],
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"problem {f} costs")


def test_windowed_gathers_match_full_table(monkeypatch):
    """The dynamic table window (_WINDOW_ROWS slice around the candidates'
    arclength span) must be BIT-IDENTICAL to the full-table gathers — the
    deep-start setup (x0_s = 40 on a 400-row path) makes the window start
    past row 0, which also exercises the inactive-step query clamp
    (_S_TABLE_S0): a zero query below the window would gather all-zero rows
    and NaN-poison short candidates' take_last sums."""
    cfg = _setup(level=2)
    packed = pallas_cycle.pack_ref_tables(cfg["ref"], cfg["corridor"])
    assert packed.shape[0] > pallas_cycle._WINDOW_ROWS  # window path active

    def run():
        masked, kin, reasons = pallas_cycle.score_candidates_pallas(
            cfg["cl"], cfg["ca"], cfg["tl"],
            jnp.ones(cfg["cl"].shape[0], dtype=bool), packed,
            cfg["obstacles"], cfg["veh"], cfg["x0_theta"], cfg["dt"],
            cfg["low_vel"], cfg["desired_v"], jnp.float32(0.0),
            jnp.float32(5.0), n_steps=cfg["n_steps"], interpret=True)
        return [np.asarray(x) for x in (masked, kin, reasons)]

    windowed = run()
    monkeypatch.setattr(pallas_cycle, "_WINDOW_ROWS", 10 ** 9)  # force full
    full = run()
    for name, a, b in zip(("masked", "kin", "reason"), windowed, full):
        assert np.array_equal(a, b, equal_nan=True), name
    # short candidates exist and are finitely scored (the NaN regression)
    assert (np.asarray(cfg["tl"]) < cfg["n_steps"] + 1).any()
    assert np.isfinite(windowed[0]).any()
    assert not np.isnan(windowed[0]).any()


def test_caller_span_matches_dense_prelude():
    """Caller-supplied window bounds (grid.candidate_lon_span lattice) must
    reproduce the dense [K, T] prelude's scoring bitwise — deep start so the
    window path is active, incl. short candidates (enlarge extension)."""
    cfg = _setup(level=2)
    packed = pallas_cycle.pack_ref_tables(cfg["ref"], cfg["corridor"])
    assert packed.shape[0] > pallas_cycle._WINDOW_ROWS

    static_grid = grid_ops.make_static_grid(2, 0.4, cfg["n_steps"] * cfg["dt"],
                                            cfg["dt"], -3.0, 3.0, 4)
    x0_lon = jnp.asarray([40.0, 15.0, 0.2], jnp.float32)
    span = grid_ops.candidate_lon_span(
        x0_lon, jnp.asarray(11.0, jnp.float32), jnp.asarray(19.0, jnp.float32),
        static_grid, cfg["dt"], cfg["n_steps"])

    def run(span_arg):
        masked, kin, reasons = pallas_cycle.score_candidates_pallas(
            cfg["cl"], cfg["ca"], cfg["tl"],
            jnp.ones(cfg["cl"].shape[0], dtype=bool), packed,
            cfg["obstacles"], cfg["veh"], cfg["x0_theta"], cfg["dt"],
            cfg["low_vel"], cfg["desired_v"], jnp.float32(0.0),
            jnp.float32(5.0), span=span_arg, n_steps=cfg["n_steps"],
            interpret=True)
        return [np.asarray(x) for x in (masked, kin, reasons)]

    with_span = run(span)
    dense = run(None)
    for name, a, b in zip(("masked", "kin", "reason"), with_span, dense):
        assert np.array_equal(a, b, equal_nan=True), name
    assert np.isfinite(with_span[0]).any()

    # a hopelessly tight span must fall back to the full table, not corrupt
    bogus = (jnp.float32(-1e5), jnp.float32(1e5))
    fallback = run(bogus)
    for name, a, b in zip(("masked", "kin", "reason"), fallback, dense):
        assert np.array_equal(a, b, equal_nan=True), name
