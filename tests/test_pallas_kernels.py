"""Pallas collision kernel vs. the XLA reference implementation (interpret
mode on the CPU mesh; the compiled path runs on real TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from commonroad_rp_tpu.ops import collision as co
from commonroad_rp_tpu.ops.pallas_kernels import obb_collision_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla_collision(seed):
    rng = np.random.default_rng(seed)
    K, T, M = 300, 21, 3

    x = jnp.asarray(rng.uniform(0, 100, (K, T)), jnp.float32)
    y = jnp.asarray(rng.uniform(-5, 5, (K, T)), jnp.float32)
    theta = jnp.asarray(rng.uniform(-0.5, 0.5, (K, T)), jnp.float32)

    pose = np.stack([rng.uniform(0, 100, (M, T)),
                     rng.uniform(-5, 5, (M, T)),
                     rng.uniform(-np.pi, np.pi, (M, T))], axis=-1)
    obstacles = co.ObstacleArrays(
        pose=jnp.asarray(pose, jnp.float32),
        half_ext=jnp.asarray(rng.uniform(0.5, 3.0, (M, 2)), jnp.float32),
        valid=jnp.asarray(rng.random((M, T)) > 0.2))

    hl, hw, wb = jnp.float32(2.25), jnp.float32(0.8), jnp.float32(1.42)
    want = co.check_collisions(x, y, theta, obstacles, None, hl, hw, wb)
    got = obb_collision_pallas(x, y, theta, obstacles, hl, hw, wb,
                               interpret=True)
    assert bool(jnp.any(want)) and not bool(jnp.all(want)), "degenerate test"
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_empty_obstacles():
    x = jnp.zeros((10, 5), jnp.float32)
    obstacles = co.ObstacleArrays(pose=jnp.zeros((0, 5, 3)),
                                  half_ext=jnp.zeros((0, 2)),
                                  valid=jnp.zeros((0, 5), dtype=bool))
    out = obb_collision_pallas(x, x, x, obstacles, jnp.float32(1.0),
                               jnp.float32(1.0), jnp.float32(0.0),
                               interpret=True)
    assert not bool(jnp.any(out))
