"""Per-step table windows vs the cycle-window scorer — BIT-IDENTICAL.

The long-horizon scorer runs its interval one-hots, probe step functions,
and MXU gathers over small per-step row windows (ops.pallas_cycle, enabled
by ``span_steps`` bounds from grid.candidate_lon_span_steps).  Windowing
must never change a value: the containing row is inside the window, a
one-hot dot is exact over any row subset, and the telescoping probe base
re-adds the window-start band exactly (quantization contract).  Interpret
mode here; hardware gate: scripts/pallas_fleet_tpu_check.py +
scripts/plan_scan_tpu_check.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from commonroad_rp_tpu.ops import collision as collision_ops
from commonroad_rp_tpu.ops import frenet as frenet_ops
from commonroad_rp_tpu.ops import grid as grid_ops
from commonroad_rp_tpu.ops import kinematics as kin_ops
from commonroad_rp_tpu.ops import pallas_cycle


def _setup61(v0=15.0, x0_s=40.0, level=1):
    """Deep-start long-horizon (T = 61) scoring problem on a 400-row path —
    the reference's default 6 s horizon (config.py:112-115), the config the
    per-step windows target."""
    dtype = jnp.float32
    n_steps, dt = 60, 0.1
    xs = np.linspace(0.0, 320.0, 400)
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
    x0_lon = jnp.asarray([x0_s, v0, 0.2], dtype)
    x0_lat = jnp.asarray([0.4, 0.05, 0.0], dtype)
    lon_min = jnp.asarray(max(0.0, v0 - 4.0), dtype)
    lon_max = jnp.asarray(v0 + 4.0, dtype)
    cl, ca, tl = grid_ops.velocity_keeping_candidates(
        x0_lon, x0_lat, lon_min, lon_max, jnp.asarray(False), static_grid)

    T = n_steps + 1
    pose = np.zeros((1, T, 3), np.float32)
    pose[0, :, 0] = 90.0
    pose[0, :, 1] = 5.2
    obstacles = collision_ops.ObstacleArrays(
        pose=jnp.asarray(pose),
        half_ext=jnp.asarray([[2.5, 1.0]], dtype),
        valid=jnp.ones((1, T), dtype=bool))

    span = grid_ops.candidate_lon_span(
        x0_lon, lon_min, lon_max, static_grid, dt, n_steps)
    span_steps = grid_ops.candidate_lon_span_steps(
        x0_lon, lon_min, lon_max, static_grid, dt, n_steps)
    return dict(ref=ref, corridor=corridor, veh=veh, cl=cl, ca=ca, tl=tl,
                obstacles=obstacles, dt=dt, n_steps=n_steps,
                x0_theta=jnp.asarray(0.08, dtype),
                desired_v=jnp.asarray(v0, dtype),
                span=span, span_steps=span_steps)


def _run(cfg, span_steps):
    packed = pallas_cycle.pack_ref_tables(cfg["ref"], cfg["corridor"])
    masked, kin, reasons = pallas_cycle.score_candidates_pallas(
        cfg["cl"], cfg["ca"], cfg["tl"],
        jnp.ones(cfg["cl"].shape[0], dtype=bool), packed,
        cfg["obstacles"], cfg["veh"], cfg["x0_theta"], cfg["dt"],
        jnp.asarray(False), cfg["desired_v"], jnp.float32(0.0),
        jnp.float32(5.0), span=cfg["span"], span_steps=span_steps,
        n_steps=cfg["n_steps"], interpret=True)
    return [np.asarray(x) for x in (masked, kin, reasons)]


def test_perstep_windows_enabled():
    """The T = 61 deep-start config actually takes the per-step path
    (guard against the enable condition silently excluding it)."""
    cfg = _setup61()
    packed = pallas_cycle.pack_ref_tables(cfg["ref"], cfg["corridor"])
    P = packed.shape[0]
    T = cfg["n_steps"] + 1
    assert T > 32 and pallas_cycle._PS_MAX + pallas_cycle._LANE <= P <= 4096
    # the lattice spans fit the static schedule (all_ok True on this config)
    lo, hi = [np.asarray(x) for x in cfg["span_steps"]]
    s_col = np.asarray(packed[:, 0])
    margin = 1.0 + float(cfg["veh"].wb_rear_axle + cfg["veh"].half_length
                         + cfg["veh"].half_width)
    ch = pallas_cycle._PS_CHUNK
    ws = np.array(pallas_cycle._ps_chunk_sched(T, ch))
    nch = len(ws)
    lo = np.pad(lo - margin, (0, nch * ch - T),
                constant_values=np.inf).reshape(nch, ch).min(axis=1)
    hi = np.pad(hi + margin, (0, nch * ch - T),
                constant_values=-np.inf).reshape(nch, ch).max(axis=1)
    cnt = (s_col[:, None] <= lo[None, :]).sum(axis=0)
    i0 = np.clip(cnt - 1, 0, P - ws - 1) // 16 * 16
    assert (hi < s_col[i0 + ws]).all()


@pytest.mark.parametrize("x0_s,v0", [(40.0, 15.0), (120.0, 8.0)])
def test_perstep_matches_cycle_window(x0_s, v0):
    cfg = _setup61(v0=v0, x0_s=x0_s)
    ps = _run(cfg, cfg["span_steps"])
    base = _run(cfg, None)
    for name, a, b in zip(("masked", "kin", "reason"), ps, base):
        assert np.array_equal(a, b, equal_nan=True), name
    assert np.isfinite(ps[0]).any()
    assert not np.isnan(ps[0]).any()
    # short candidates exist (enlarge extension + inactive-query clamp live)
    assert (np.asarray(cfg["tl"]) < cfg["n_steps"] + 1).any()


def test_perstep_impossible_bounds_fall_back():
    """Bounds no static window can cover must fall back to the cycle-window
    kernel (coverage cond), not corrupt the scores."""
    cfg = _setup61()
    T = cfg["n_steps"] + 1
    bogus = (jnp.full((T,), -1e5, jnp.float32),
             jnp.full((T,), 1e5, jnp.float32))
    fb = _run(cfg, bogus)
    base = _run(cfg, None)
    for name, a, b in zip(("masked", "kin", "reason"), fb, base):
        assert np.array_equal(a, b, equal_nan=True), name
