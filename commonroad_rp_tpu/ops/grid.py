"""Device-side terminal-manifold grid generation.

On-device counterpart of models.sampling (which generates grids on the host
with exact reference-set semantics for the conformance path).  The fleet/scan
execution path cannot round-trip to the host per cycle (SURVEY.md section 2.3:
no host round-trips in the replanning scan), so the grid — whose bounds depend
on the carried vehicle state via set_desired_velocity
(reference: reactive_planner.py:329-335) — is built on device.

Static per compilation: the time grid (depends only on t_min/horizon/level,
sampling.py:113-118), per-time-sample step counts, the base d grid, and the
sample counts.  Traced: the velocity window bounds and the current lateral
offset (the ``∪ {x_0_lat[0]}`` extra d sample, sampling.py:226).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from commonroad_rp_tpu.models.sampling import (PositionSampling, TimeSampling,
                                               traj_length_steps)
from commonroad_rp_tpu.ops import polynomial as poly


class StaticGrid(NamedTuple):
    """Host-precomputed static grid components for one sampling level."""

    t_values: Tuple[float, ...]       # time samples
    traj_len: Tuple[int, ...]         # valid steps per time sample
    d_values: Tuple[float, ...]       # base lateral offsets
    n_lon: int                        # number of longitudinal samples

    @property
    def size(self) -> int:
        return len(self.t_values) * self.n_lon * (len(self.d_values) + 1)


def make_static_grid(level: int, t_min: float, horizon: float, dt: float,
                     d_min: float, d_max: float, num_levels: int) -> StaticGrid:
    """Precompute the static grid parts for a sampling level (host)."""
    ts = TimeSampling(t_min, horizon, num_levels, dt).samples_at_level(level)
    ds = PositionSampling(d_min, d_max, num_levels).samples_at_level(level)
    n = 3
    for _ in range(level):
        n = n * 2 - 1
    return StaticGrid(t_values=tuple(float(t) for t in ts),
                      traj_len=tuple(int(v) for v in traj_length_steps(ts, dt)),
                      d_values=tuple(float(d) for d in ds),
                      n_lon=n)


def velocity_keeping_candidates(x0_lon: jnp.ndarray, x0_lat: jnp.ndarray,
                                v_min: jnp.ndarray, v_max: jnp.ndarray,
                                low_vel: jnp.ndarray, grid: StaticGrid):
    """Build the full candidate batch for velocity-keeping mode on device.

    Returns (coeffs_lon [K, 6], coeffs_lat [K, 6], traj_len [K]) with
    K = Nt * Nv * (Nd + 1).  Mirrors FixedIntervalSampling's triple loop
    (sampling.py:218-242) as one broadcasted evaluation; the quartic/quintic
    coefficients are the closed forms of ops.polynomial.
    """
    dtype = x0_lon.dtype
    t_g = jnp.asarray(grid.t_values, dtype)                          # [Nt]
    d_base = jnp.asarray(grid.d_values, dtype)                       # [Nd]
    d_g = jnp.concatenate([d_base, x0_lat[0][None]])                 # [Nd+1]
    v_g = jnp.linspace(v_min, v_max, grid.n_lon, dtype=dtype)        # [Nv]

    T, V, D = jnp.meshgrid(t_g, v_g, d_g, indexing="ij")             # [Nt,Nv,Nd+1]
    shape = T.shape

    coeffs_lon = poly.quartic_coeffs(jnp.broadcast_to(x0_lon, shape + (3,)), V, T)

    # low-velocity mode: lateral parameter span = travelled arclength
    # (sampling.py:229-238), falling back to t when non-positive
    s_goal = poly.eval_position(coeffs_lon, T) - x0_lon[0]
    tau_lat = jnp.where(low_vel, jnp.where(s_goal <= 0, T, s_goal), T)

    xd_lat = jnp.stack([D, jnp.zeros_like(D), jnp.zeros_like(D)], axis=-1)
    coeffs_lat = poly.quintic_coeffs(jnp.broadcast_to(x0_lat, shape + (3,)),
                                     xd_lat, tau_lat)

    traj_len = jnp.broadcast_to(
        jnp.asarray(grid.traj_len, jnp.int32)[:, None, None], shape)
    return (coeffs_lon.reshape(-1, 6), coeffs_lat.reshape(-1, 6),
            traj_len.reshape(-1))


def stopping_candidates(x0_lon: jnp.ndarray, x0_lat: jnp.ndarray,
                        s_min: jnp.ndarray, s_max: jnp.ndarray,
                        low_vel: jnp.ndarray, grid: StaticGrid):
    """Stopping-mode candidate batch: quintic longitudinal polynomials toward
    sampled stop positions with terminal velocity/acceleration zero
    (sampling.py:259-263).  Also returns the goal-validity mask
    (filter_goals_behind, trajectories.py:545-550)."""
    dtype = x0_lon.dtype
    t_g = jnp.asarray(grid.t_values, dtype)
    d_base = jnp.asarray(grid.d_values, dtype)
    d_g = jnp.concatenate([d_base, x0_lat[0][None]])
    s_g = jnp.linspace(s_min, s_max, grid.n_lon, dtype=dtype)

    T, S, D = jnp.meshgrid(t_g, s_g, d_g, indexing="ij")
    shape = T.shape

    xd_lon = jnp.stack([S, jnp.zeros_like(S), jnp.zeros_like(S)], axis=-1)
    coeffs_lon = poly.quintic_coeffs(jnp.broadcast_to(x0_lon, shape + (3,)),
                                     xd_lon, T)

    s_goal = poly.eval_position(coeffs_lon, T) - x0_lon[0]
    tau_lat = jnp.where(low_vel, jnp.where(s_goal <= 0, T, s_goal), T)
    xd_lat = jnp.stack([D, jnp.zeros_like(D), jnp.zeros_like(D)], axis=-1)
    coeffs_lat = poly.quintic_coeffs(jnp.broadcast_to(x0_lat, shape + (3,)),
                                     xd_lat, tau_lat)

    traj_len = jnp.broadcast_to(
        jnp.asarray(grid.traj_len, jnp.int32)[:, None, None], shape)
    goal_valid = (x0_lon[0] < S).reshape(-1)
    return (coeffs_lon.reshape(-1, 6), coeffs_lat.reshape(-1, 6),
            traj_len.reshape(-1), goal_valid)


def candidate_lon_span(x0_lon: jnp.ndarray, lon_min: jnp.ndarray,
                       lon_max: jnp.ndarray, grid: StaticGrid,
                       dt: float, n_steps: int, stopping: bool = False):
    """Exact arclength span (lo, hi) of a generated candidate set, including
    the constant-velocity enlarge extension — the scorer's dynamic-window
    bounds computed on the [Nt, Nlon] longitudinal LATTICE instead of the
    scorer's dense [K, T] prelude.

    The d axis of the candidate grid only replicates longitudinal
    polynomials, so the min/max over the K = Nt*Nlon*(Nd+1) flat candidates
    equals the min/max over the Nt*Nlon unique lattice — ~(Nd+1)-fold less
    work (hardware-measured: the dense prelude was 31% of a default-horizon
    scorer launch).  Bounds are SOUND by construction (same polynomials,
    dense per-step evaluation); the scorer's lax.cond full-table fallback
    guarantees exactness for any sound bounds.
    """
    dtype = x0_lon.dtype
    T = n_steps + 1
    t_g = jnp.asarray(grid.t_values, dtype)                       # [Nt]
    lon_g = jnp.linspace(lon_min, lon_max, grid.n_lon, dtype=dtype)
    T_, L_ = jnp.meshgrid(t_g, lon_g, indexing="ij")              # [Nt, Nl]
    shape = T_.shape
    if stopping:
        xd = jnp.stack([L_, jnp.zeros_like(L_), jnp.zeros_like(L_)], axis=-1)
        c = poly.quintic_coeffs(jnp.broadcast_to(x0_lon, shape + (3,)),
                                xd, T_)
    else:
        c = poly.quartic_coeffs(jnp.broadcast_to(x0_lon, shape + (3,)),
                                L_, T_)
    dt_c = jnp.asarray(dt, dtype)
    tq = (jnp.arange(T, dtype=dtype) * dt_c)[None, None, :]
    s_all = (((((c[..., 5:6] * tq + c[..., 4:5]) * tq + c[..., 3:4]) * tq
               + c[..., 2:3]) * tq + c[..., 1:2]) * tq + c[..., 0:1])
    lens = jnp.asarray(grid.traj_len, jnp.int32)[:, None]         # [Nt, 1]
    act = jnp.arange(T, dtype=jnp.int32)[None, None, :] < lens[..., None]
    s_min = jnp.min(jnp.where(act, s_all, jnp.inf))
    s_max = jnp.max(jnp.where(act, s_all, -jnp.inf))
    tau = (lens - 1).astype(dtype) * dt_c                         # [Nt, 1]
    sl = ((((c[..., 5] * tau + c[..., 4]) * tau + c[..., 3]) * tau
           + c[..., 2]) * tau + c[..., 1]) * tau + c[..., 0]
    sd = (((5.0 * c[..., 5] * tau + 4.0 * c[..., 4]) * tau
           + 3.0 * c[..., 3]) * tau + 2.0 * c[..., 2]) * tau + c[..., 1]
    t_ext = (T - lens).astype(dtype) * dt_c
    ext_hi = jnp.max(sl + t_ext * jnp.maximum(sd, 0.0))
    ext_lo = jnp.min(sl + t_ext * jnp.minimum(sd, 0.0))
    return jnp.minimum(s_min, ext_lo), jnp.maximum(s_max, ext_hi)
