"""Interval-test one-hot construction of the Pallas scorer's table gathers.

``_onehot_at`` builds the gather one-hot as the containing-interval test
s_col[p] <= s < s_col[p+1] instead of count(s_vertex <= s) - 1 with
iota/equality.  These tests pin the equivalence on the exact table layout the
kernel sees (strictly increasing arclengths + monotone sentinel padding from
``pack_ref_tables``), including boundary queries, and the documented
divergence for s < 0 (all-zero row; such candidates are domain-masked).
"""

import numpy as np

import jax.numpy as jnp

from commonroad_rp_tpu.ops.collision import BAND_CLAMP, quantize_bands
from commonroad_rp_tpu.ops.pallas_cycle import (_onehot_at, _probe_band,
                                                _probe_band_prefix,
                                                band_delta_tab)


def _table_col(seed=0, n_real=37, n_pad=3):
    rng = np.random.default_rng(seed)
    s = np.concatenate([[0.0], np.cumsum(rng.uniform(0.3, 2.0, n_real - 1))])
    sent = s[-1] + 1e7 * np.arange(1, n_pad + 1)
    return np.concatenate([s, sent]).astype(np.float32), float(s[-1])


def _count_idx(s_col, queries):
    return np.sum(s_col[None, :] <= queries[:, None], axis=1) - 1


def test_interval_onehot_matches_count_index_in_domain():
    s_col, s_last = _table_col()
    P = s_col.shape[0]
    rng = np.random.default_rng(1)
    q = np.concatenate([
        rng.uniform(0.0, s_last, 200),
        s_col[:-3],                       # exactly on vertices
        [0.0, s_last],                    # span boundaries
    ]).astype(np.float32)

    onehot = np.asarray(_onehot_at(
        jnp.asarray(q)[None, :], jnp.asarray(s_col)[:, None], jnp.float32))
    assert onehot.shape == (P, q.shape[0])
    np.testing.assert_array_equal(onehot.sum(axis=0), 1.0)
    got_idx = np.argmax(onehot, axis=0)
    np.testing.assert_array_equal(got_idx, _count_idx(s_col, q))


def test_interval_onehot_negative_s_is_zero_row():
    s_col, _ = _table_col()
    P = s_col.shape[0]
    q = jnp.asarray(np.float32([-0.5, -1e-3]))[None, :]
    onehot = np.asarray(_onehot_at(q, jnp.asarray(s_col)[:, None],
                                   jnp.float32))
    np.testing.assert_array_equal(onehot, 0.0)


def test_probe_band_gathers_band_rows():
    s_col, s_last = _table_col(seed=2)
    P = s_col.shape[0]
    rng = np.random.default_rng(3)
    d_lo = rng.uniform(-5.0, -1.0, P).astype(np.float32)
    d_hi = rng.uniform(1.0, 5.0, P).astype(np.float32)
    q = rng.uniform(0.0, s_last, 64).astype(np.float32)

    lo, hi = _probe_band(jnp.asarray(q)[None, :],
                         jnp.asarray(s_col)[:, None],
                         jnp.asarray(d_lo)[:, None],
                         jnp.asarray(d_hi)[:, None])
    idx = _count_idx(s_col, q)
    np.testing.assert_array_equal(np.asarray(lo)[0], d_lo[idx])
    np.testing.assert_array_equal(np.asarray(hi)[0], d_hi[idx])


def test_quantize_bands_contract():
    """Bands become multiples of 2**-10 in [-32, 32], only ever shrinking
    the drivable band (floor on d_hi, ceil on d_lo)."""
    rng = np.random.default_rng(4)
    d_lo = np.concatenate([rng.uniform(-40.0, -0.5, 100), [-1e4, -1e9]])
    d_hi = np.concatenate([rng.uniform(0.5, 40.0, 100), [1e4, 1e9]])
    lo_q, hi_q = quantize_bands(d_lo, d_hi)
    assert np.all(np.abs(lo_q) <= BAND_CLAMP)
    assert np.all(np.abs(hi_q) <= BAND_CLAMP)
    np.testing.assert_array_equal(lo_q * 1024.0, np.round(lo_q * 1024.0))
    np.testing.assert_array_equal(hi_q * 1024.0, np.round(hi_q * 1024.0))
    assert np.all(hi_q <= np.clip(d_hi, -BAND_CLAMP, BAND_CLAMP))   # shrink
    assert np.all(lo_q >= np.clip(d_lo, -BAND_CLAMP, BAND_CLAMP))


def test_probe_band_prefix_matches_direct_gather_on_quantized_bands():
    """The prefix-difference MXU band gather reconstructs the direct f32
    gather bit-for-bit on contract-quantized bands — the exactness argument
    behind _probe_band_prefix (step function x split3 deltas telescopes to
    the band at the containing row)."""
    s_col, s_last = _table_col(seed=5)
    P = s_col.shape[0]
    rng = np.random.default_rng(6)
    d_lo_raw = rng.uniform(-32.5, -0.01, P)
    d_hi_raw = rng.uniform(0.01, 32.5, P)
    d_lo, d_hi = quantize_bands(d_lo_raw, d_hi_raw)
    d_lo = d_lo.astype(np.float32)
    d_hi = d_hi.astype(np.float32)
    q = np.concatenate([rng.uniform(0.0, s_last, 200),
                        s_col[:-3], [0.0, s_last]]).astype(np.float32)

    band_tab = band_delta_tab(jnp.asarray(d_lo), jnp.asarray(d_hi))
    lo, hi = _probe_band_prefix(jnp.asarray(q)[None, :],
                                jnp.asarray(s_col)[:, None], band_tab)
    idx = _count_idx(s_col, q)
    np.testing.assert_array_equal(np.asarray(lo)[0], d_lo[idx])
    np.testing.assert_array_equal(np.asarray(hi)[0], d_hi[idx])
