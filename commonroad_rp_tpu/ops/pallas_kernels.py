"""Pallas TPU kernels for the hot collision path.

The XLA path (ops.collision) materializes [T, M, K] intermediates in HBM for
the separating-axis tests; this Pallas kernel keeps a candidate tile plus the
full obstacle table resident in VMEM and accumulates the per-step hit mask
in-register across obstacles — one HBM read per ego array, one write for the
mask (reference counterpart: the pycrcc collide() loop at
reactive_planner.py:1039-1046).

Layout: T-major ([T, K] with the candidate axis on the 128-wide lanes), the
same convention as ops.kinematics.  float32 only — Mosaic rejects 64-bit
layouts, so inputs are downcast and the kernel must not run under x64 traces
of f64 values.

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

_TILE_K = 512


def _collision_kernel(cx_ref, cy_ref, theta_ref, obs_ref, obs_valid_ref,
                      ego_half_ref, out_ref, *, n_obstacles: int):
    """One candidate tile vs. every obstacle at every step.

    cx/cy/theta: [T, TILE_K] ego OBB center poses (T-major).
    obs: [M, T, 5] (cx, cy, theta, half_l, half_w); obs_valid: [M, T] f32.
    ego_half: [1, 2] (half_length, half_width) in SMEM.
    out: [T, TILE_K] float32 (1.0 where colliding).
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
        ox = obs_ref[m, :, 0][:, None]                # [T, 1]
        oy = obs_ref[m, :, 1][:, None]
        otheta = obs_ref[m, :, 2][:, None]
        ohl = obs_ref[m, :, 3][:, None]
        ohw = obs_ref[m, :, 4][:, None]
        valid = obs_valid_ref[m, :][:, None] > 0.5

        o_cos = jnp.cos(otheta)
        o_sin = jnp.sin(otheta)
        dx = ox - ex                                  # [T, TILE_K]
        dy = oy - ey
        # relative rotation between the two frames
        rel_cos = jnp.abs(e_cos * o_cos + e_sin * o_sin)
        rel_sin = jnp.abs(o_sin * e_cos - o_cos * e_sin)

        # SAT on the ego axes
        sep = (jnp.abs(dx * e_cos + dy * e_sin) >
               ehl + ohl * rel_cos + ohw * rel_sin)
        sep = sep | (jnp.abs(-dx * e_sin + dy * e_cos) >
                     ehw + ohl * rel_sin + ohw * rel_cos)
        # SAT on the obstacle axes
        sep = sep | (jnp.abs(dx * o_cos + dy * o_sin) >
                     ohl + ehl * rel_cos + ehw * rel_sin)
        sep = sep | (jnp.abs(-dx * o_sin + dy * o_cos) >
                     ohw + ehl * rel_sin + ehw * rel_cos)

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
    assert obstacles.radius is None and obstacles.poly_verts is None, \
        ("obb_collision_pallas handles OBB rows only; disc/polygon groups "
         "are fused in ops.pallas_cycle (a disc row's (0, 0) half extents "
         "would silently never collide here)")
    K, T = x.shape
    M = obstacles.pose.shape[0]
    if M == 0:
        return jnp.zeros(K, dtype=bool)

    dtype = jnp.float32
    theta_t = theta.T.astype(dtype)                               # [T, K]
    cx = x.T.astype(dtype) + wb_rear_axle.astype(dtype) * jnp.cos(theta_t)
    cy = y.T.astype(dtype) + wb_rear_axle.astype(dtype) * jnp.sin(theta_t)

    # pad K (the lane axis) to the tile multiple
    K_pad = ((K + _TILE_K - 1) // _TILE_K) * _TILE_K
    pad = K_pad - K
    if pad:
        cx = jnp.pad(cx, ((0, 0), (0, pad)))
        cy = jnp.pad(cy, ((0, 0), (0, pad)))
        theta_t = jnp.pad(theta_t, ((0, 0), (0, pad)))

    obs = jnp.concatenate(
        [obstacles.pose.astype(dtype),
         jnp.broadcast_to(obstacles.half_ext[:, None, :], (M, T, 2)).astype(dtype)],
        axis=-1)                                                   # [M, T, 5]
    ego_half = jnp.asarray([[half_length, half_width]], dtype)

    grid = (K_pad // _TILE_K,)
    out = pl.pallas_call(
        functools.partial(_collision_kernel, n_obstacles=M),
        out_shape=jax.ShapeDtypeStruct((T, K_pad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, _TILE_K), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, _TILE_K), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, _TILE_K), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, T, 5), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((T, _TILE_K), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cx, cy, theta_t, obs, obstacles.valid.astype(dtype), ego_half)

    return jnp.any(out[:, :K] > 0.5, axis=0)