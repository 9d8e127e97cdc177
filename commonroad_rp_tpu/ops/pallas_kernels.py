"""Pallas TPU kernels for the hot collision path.

The XLA path (ops.collision) materializes [K, T, M] intermediates in HBM for
the separating-axis tests; this Pallas kernel keeps a candidate tile plus the
full obstacle table resident in VMEM and accumulates the per-step hit mask
in-register across obstacles — one HBM read per ego array, one write for the
mask (reference counterpart: the pycrcc collide() loop at
reactive_planner.py:1039-1046).

Falls back to interpreter mode off-TPU so the same code path is testable on
the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from commonroad_rp_tpu.ops.collision import ObstacleArrays

_TILE_K = 256


def _collision_kernel(cx_ref, cy_ref, theta_ref, obs_ref, obs_valid_ref,
                      ego_half_ref, out_ref, *, n_obstacles: int):
    """One candidate tile vs. every obstacle at every step.

    cx/cy/theta: [TILE_K, T] ego OBB center poses.
    obs: [M, T, 5] (cx, cy, theta, half_l, half_w); obs_valid: [M, T].
    ego_half: [1, 2] (half_length, half_width) in SMEM.
    out: [TILE_K, T] float32 (1.0 where colliding).
    """
    ex = cx_ref[:]
    ey = cy_ref[:]
    etheta = theta_ref[:]
    e_cos = jnp.cos(etheta)
    e_sin = jnp.sin(etheta)
    ehl = ego_half_ref[0, 0]
    ehw = ego_half_ref[0, 1]

    hit = jnp.zeros_like(ex)
    for m in range(n_obstacles):                      # M is small and static
        ox = obs_ref[m, :, 0][None, :]
        oy = obs_ref[m, :, 1][None, :]
        otheta = obs_ref[m, :, 2][None, :]
        ohl = obs_ref[m, :, 3][None, :]
        ohw = obs_ref[m, :, 4][None, :]
        valid = obs_valid_ref[m, :][None, :] > 0.5

        o_cos = jnp.cos(otheta)
        o_sin = jnp.sin(otheta)
        dx = ox - ex
        dy = oy - ey
        # relative rotation between the two frames
        rel_cos = e_cos * o_cos + e_sin * o_sin       # cos(to - te)
        rel_sin = o_sin * e_cos - o_cos * e_sin       # sin(to - te)
        abs_c = jnp.abs(rel_cos)
        abs_s = jnp.abs(rel_sin)

        # SAT on the ego axes
        d_e_maj = jnp.abs(dx * e_cos + dy * e_sin)
        d_e_min = jnp.abs(-dx * e_sin + dy * e_cos)
        r_obs_maj = ohl * abs_c + ohw * abs_s
        r_obs_min = ohl * abs_s + ohw * abs_c
        sep = (d_e_maj > ehl + r_obs_maj) | (d_e_min > ehw + r_obs_min)
        # SAT on the obstacle axes
        d_o_maj = jnp.abs(dx * o_cos + dy * o_sin)
        d_o_min = jnp.abs(-dx * o_sin + dy * o_cos)
        r_ego_maj = ehl * abs_c + ehw * abs_s
        r_ego_min = ehl * abs_s + ehw * abs_c
        sep = sep | (d_o_maj > ohl + r_ego_maj) | (d_o_min > ohw + r_ego_min)

        hit = jnp.maximum(hit, jnp.where(valid & ~sep, 1.0, 0.0))
    out_ref[:] = hit


@functools.partial(jax.jit, static_argnames=("interpret",))
def obb_collision_pallas(x: jnp.ndarray, y: jnp.ndarray, theta: jnp.ndarray,
                         obstacles: ObstacleArrays,
                         half_length, half_width, wb_rear_axle,
                         interpret: bool = False) -> jnp.ndarray:
    """Collision mask [K] for ego trajectories [K, T] (rear-axle positions).

    Drop-in accelerated equivalent of ops.collision.check_collisions'
    obstacle pass (same center-shift construction,
    reactive_planner.py:1033-1041).
    """
    K, T = x.shape
    M = obstacles.pose.shape[0]
    if M == 0:
        return jnp.zeros(K, dtype=bool)

    dtype = jnp.float32
    cx = (x + wb_rear_axle * jnp.cos(theta)).astype(dtype)
    cy = (y + wb_rear_axle * jnp.sin(theta)).astype(dtype)
    th = theta.astype(dtype)

    # pad K to tile multiple
    K_pad = ((K + _TILE_K - 1) // _TILE_K) * _TILE_K
    pad = K_pad - K
    if pad:
        cx = jnp.pad(cx, ((0, pad), (0, 0)))
        cy = jnp.pad(cy, ((0, pad), (0, 0)))
        th = jnp.pad(th, ((0, pad), (0, 0)))

    obs = jnp.concatenate(
        [obstacles.pose.astype(dtype),
         jnp.broadcast_to(obstacles.half_ext[:, None, :], (M, T, 2)).astype(dtype)],
        axis=-1)                                                   # [M, T, 5]
    ego_half = jnp.asarray([[half_length, half_width]], dtype)

    grid = (K_pad // _TILE_K,)
    out = pl.pallas_call(
        functools.partial(_collision_kernel, n_obstacles=M),
        out_shape=jax.ShapeDtypeStruct((K_pad, T), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_K, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_K, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_K, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, T, 5), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_K, T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cx, cy, th, obs, obstacles.valid.astype(dtype), ego_half)

    return jnp.any(out[:K] > 0.5, axis=1)
