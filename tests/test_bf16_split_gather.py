"""Exactness of the 3-term bfloat16 split used by the one-hot table gathers.

The TPU gather paths (ops.frenet.onehot_lookup float32 branch and the Pallas
scorer's ``_lookup_pair``) replace HIGHEST-precision f32 one-hot matmuls with
three native bf16 MXU passes.  These tests pin the invariant that makes the
substitution legal: the split reconstructs float32 bit-exactly, and the
split-gather result equals a direct row gather bit-for-bit.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from commonroad_rp_tpu.ops import frenet as frenet_ops
from commonroad_rp_tpu.ops.pallas_cycle import split3_bf16


def _random_f32(rng, n):
    # span many binades plus exact-zero and sign edge cases; stay above
    # ~1e-25 magnitude (exactness is documented to end near 2^-103 ~ 1e-31,
    # where the bf16 tail term underflows into subnormals — planner
    # quantities live 20+ orders of magnitude above that floor)
    mag = rng.uniform(-25, 25, n)
    vals = (rng.uniform(1.0, 10.0, n) * 10.0 ** mag).astype(np.float32)
    vals[:: max(1, n // 7)] = 0.0
    vals[1:: max(1, n // 5)] *= -1.0
    return vals


def test_split3_underflow_boundary():
    """Pin the documented exactness domain edge: exact at 2^-100, inexact
    somewhere below 2^-103 (bf16 subnormal underflow of the tail term)."""
    ok = jnp.asarray(np.float32(1.2345678) * 2.0 ** -100)
    t = split3_bf16(ok)
    rec = (t[0].astype(jnp.float32) + t[1].astype(jnp.float32)) \
        + t[2].astype(jnp.float32)
    assert float(rec) == float(ok)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_split3_reconstructs_f32_bitexact(seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(_random_f32(rng, 4096))
    t0, t1, t2 = split3_bf16(x)
    assert t0.dtype == t1.dtype == t2.dtype == jnp.bfloat16
    recon = (t0.astype(jnp.float32) + t1.astype(jnp.float32)) \
        + t2.astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(recon).view(np.uint32), np.asarray(x).view(np.uint32))


def test_onehot_lookup_f32_matches_take_bitexact():
    rng = np.random.default_rng(3)
    P, C, N = 257, 7, 1000
    tables = jnp.asarray(_random_f32(rng, P * C).reshape(P, C))
    idx = jnp.asarray(rng.integers(0, P, N), jnp.int32)
    got = frenet_ops.onehot_lookup(tables, idx)  # f32 -> bf16 split branch
    want = jnp.take(tables, idx, axis=0)
    np.testing.assert_array_equal(
        np.asarray(got).view(np.uint32), np.asarray(want).view(np.uint32))


def test_onehot_lookup_f64_path_unchanged():
    rng = np.random.default_rng(4)
    P, C = 64, 3
    tables = jnp.asarray(rng.standard_normal((P, C)), jnp.float64)
    idx = jnp.asarray(rng.integers(0, P, 50), jnp.int32)
    got = frenet_ops.onehot_lookup(tables, idx)
    want = jnp.take(tables, idx, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
