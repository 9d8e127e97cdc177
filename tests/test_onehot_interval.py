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

from commonroad_rp_tpu.ops.pallas_cycle import _onehot_at, _probe_band


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
