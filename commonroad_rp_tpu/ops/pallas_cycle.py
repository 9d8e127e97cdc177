"""Fused Pallas candidate-scoring kernel: the whole evaluation in VMEM.

The XLA cycle writes ~40 [K, T] intermediate arrays through HBM; for the
fleet path only the masked costs matter (the winner's trajectory is
recomputed afterwards for a single candidate).  This kernel fuses polynomial
rollout, the Werling transform (with MXU one-hot table gathers), the
kinematic constraint masks, Frenet->Cartesian conversion, the cost
reduction, the corridor road-boundary check, and the obstacle OBB SAT into
ONE VMEM-resident program per candidate tile, emitting three [K] rows
(masked selection costs, kinematic-feasible statistics costs, first-failure
reason codes) — candidate states never touch HBM.

Scope: fleet-path and facade fast-path scoring.  float32 only; do not trace
under x64 values.  Layout: T-major ([T, TILE_K]) like ops.kinematics.

Packed reference-table columns (``pack_ref_tables``):
    0: s      1: theta   2: curv   3: curv_d   4: d_lo   5: d_hi
    6: px     7: py      8: tx     9: ty      10: nx    11: ny
"""

from __future__ import annotations

import functools
from typing import NamedTuple

# Timing-ablation sections for kernel profiling scripts ONLY.  Always empty
# on the production import path (no env hook); an instrumented bench must
# assign ``pallas_cycle._ABLATE = {...}`` explicitly before tracing — results
# are WRONG while any section is ablated.
_ABLATE: frozenset = frozenset()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from commonroad_rp_tpu.ops import frenet as frenet_ops
from commonroad_rp_tpu.ops.collision import CorridorArrays, ObstacleArrays
from commonroad_rp_tpu.ops.kinematics import VehicleArrays, _EPS

_TILE_K = 128   # short-horizon default. Hardware sweeps 2026-08-19: at T=21
                # 128 beats 256/512 by 13-25% (smaller VMEM working set
                # pipelines better across the grid); at T=61 256 beats 128
                # by ~5-18% — the scorers switch to 256 for T > 32.
# steps per gather matmul: C steps' queries batch into one
# [48, P] x [P, C*TILE] MXU op — C-fold fewer op invocations, bitwise
# identical (dot columns are independent; same one-hot rows, same
# accumulation order along P).  The round-3 lane-axis CONCAT of the query
# rows had no Mosaic lowering ("result/input offset mismatch on non-concat
# dimension"); the sublane->lane RESHAPE [C, TILE] -> [1, C*TILE] of the
# contiguous step block lowers fine (hardware-validated 2026-08-20).
_GATHER_CHUNK = 1
# steps per corridor-probe matmul (same reshape batching for the band
# prefix queries; the 3 probe offsets stay separate loops)
_PROBE_CHUNK = 1
_LANE = 128
_NUM_COLS = 12
# dynamic-gather window rows for the single-problem scorer: candidates only
# reach a bounded arclength range per cycle, so long reference paths are
# sliced to this many contiguous rows (all per-step table work inside the
# kernel is row-count-proportional); exactness is preserved by the lax.cond
# full-table fallback in _score_candidates_pallas
_WINDOW_ROWS = 256
# long horizons (T > 32, e.g. the reference's default 6 s config) use a
# tighter window: the [P, TILE] compares are sublane-proportional in P and
# at T = 61 the table ops are ~48% of the launch (hardware ablation
# 2026-08-20); 192 rows still cover the default config's ~160 m span
# (the lax.cond fallback keeps faster fleets exact on the full table)
_WINDOW_ROWS_LONG = 192
# PER-STEP table windows (long horizons): each step's candidate arclengths
# span only (v_max - v_min) * t * dt plus margins, so the per-step table ops
# run over a schedule of small row windows instead of the whole cycle
# window.  Static per-step sizes (16-aligned for bf16 sublane slices),
# growing with the step index; a traced all-steps-covered check falls back
# to the cycle-window kernel, so the schedule only affects speed, never
# exactness.
_PS_BASE = 32
_PS_GROW = 1.0
_PS_MAX = 112
# steps per window chunk: adjacent steps share one (slightly larger) window
# so the slice/one-hot/dot fixed cost amortizes across the chunk — with
# per-step windows the per-op fixed cost is a measurable share (hardware
# ablation 2026-08-20: gather 110 us + probes 95 us per T=61 launch at
# chunk 1)
_PS_CHUNK = 4
# interval one-hot construction in the per-step gather: "interval" builds
# (s_i <= q) & (s_{i+1} > q) (two [ws, CT] compares); "stepdiff" builds ONE
# step function (s_i <= q) and takes the sublane-shifted difference
# step_i - step_{i+1} — bit-identical under the same coverage condition
# (the monotone step makes the difference exactly the interval indicator;
# the last row's successor is 0 because the all-chunks-covered lax.cond
# guarantees every query sits strictly below the window top), halving the
# dominant [ws, CT] compare stream (doc/architecture.md cost model)
_PS_ONEHOT = "stepdiff"


def _perstep_ws(t: int) -> int:
    """Static per-step window rows at step ``t`` (multiple of 16)."""
    want = int(_PS_BASE + _PS_GROW * t)
    return min(_PS_MAX, ((want + 15) // 16) * 16)


def _ps_chunk_sched(T: int, chunk: int) -> tuple:
    """Static per-CHUNK window rows: the last step's schedule plus one
    16-row block of union slack when chunking (adjacent steps' spans shift
    by ~v*dt each)."""
    slack = 16 if chunk > 1 else 0
    return tuple(min(_PS_MAX + slack,
                     _perstep_ws(min(T - 1, c0 + chunk - 1)) + slack)
                 for c0 in range(0, T, chunk))


_OBS_COLS = 7   # x, y, theta, half_len, half_wid, valid, radius

# scalar-parameter slots (SMEM row)
_NUM_SCALARS = 17
(_S_WHEELBASE, _S_WB_REAR, _S_A_MAX, _S_V_SWITCH, _S_KAPPA_MAX,
 _S_V_DELTA_MAX, _S_HALF_LEN, _S_HALF_WID, _S_X0_THETA, _S_DT, _S_LOW_VEL,
 _S_DESIRED_V, _S_DESIRED_D, _S_W_A, _S_REF_S_LAST, _S_DESIRED_S,
 _S_TABLE_S0) = range(_NUM_SCALARS)


def pack_ref_tables(ref: frenet_ops.RefPathTables,
                    corridor: CorridorArrays) -> jnp.ndarray:
    """[P_pad, 12] packed interpolation + corridor + geometry table.

    NOTE: padded rows carry sentinel arclengths; use ``true_path_length`` for
    the domain bound, NOT packed[:, 0].max().
    """
    packed = jnp.concatenate([
        jnp.stack([ref.s, ref.theta, ref.curv, ref.curv_d,
                   corridor.d_lo, corridor.d_hi], axis=1),
        ref.points, ref.tangent, ref.normal], axis=1).astype(jnp.float32)
    P = packed.shape[0]
    # always AT LEAST one sentinel row past the true path end (round up to
    # the next full lane block even when P is already lane-aligned): the
    # per-step table windows need a strictly-greater successor arclength
    # above ref_s_last so probes clamped exactly AT the path end stay
    # coverable by a window
    P_pad = ((P + _LANE) // _LANE) * _LANE
    # padded rows continue the final arclength monotonically so the
    # compare-count searchsorted is unchanged for in-domain queries
    pad_rows = jnp.tile(packed[-1:], (P_pad - P, 1))
    pad_rows = pad_rows.at[:, 0].add(
        1e7 * jnp.arange(1, P_pad - P + 1, dtype=jnp.float32))
    packed = jnp.concatenate([packed, pad_rows], axis=0)
    return packed


def true_path_length(ref: frenet_ops.RefPathTables) -> jnp.ndarray:
    """The real final arclength (the packed table's padded rows hold huge
    sentinel values that must not become the domain bound)."""
    return ref.s[-1].astype(jnp.float32)


def _atan(x):
    """float32 arctan (Cephes atanf construction) — Mosaic has no atan
    lowering.  Max error ~1e-7, matching libm atanf accuracy."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    # range reduction: [0, 0.4142), [0.4142, 2.4142), [2.4142, inf)
    hi = ax > 2.414213562373095
    mid = ax > 0.4142135623730950
    x_hi = -pl.reciprocal(jnp.where(hi, ax, 1.0), approx=False)
    x_mid = (ax - 1.0) / (ax + 1.0)
    xr = jnp.where(hi, x_hi, jnp.where(mid, x_mid, ax))
    y0 = jnp.where(hi, jnp.float32(np.pi / 2),
                   jnp.where(mid, jnp.float32(np.pi / 4), 0.0))
    z = xr * xr
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xr + xr
    return sign * (y0 + poly)


_PAIR_ROWS = 16  # 12 lo columns + 4 hi interpolation columns (s/θ/κ/κ')

# exact truncation-based f32 -> 3x bf16 split (see frenet.split3_bf16)
split3_bf16 = frenet_ops.split3_bf16


def _onehot_at(s_chunk, s_col, dtype):
    """[P, TILE] one-hot of idx = count(s_vertex <= s) - 1, built as the
    containing-interval test s_col[p] <= s < s_col[p+1] (successor column
    shifted; the table's arclengths are strictly increasing, incl. the
    monotone sentinel padding).  Two compares + AND instead of the
    count/iota/equality construction — cheaper on the VPU and identical for
    every in-domain query.  Divergence from the reference's idx == -1
    wrap-to-last only occurs for s < 0, where the row is all-zero instead:
    such candidates are domain-masked to +inf cost on every path, so masked
    costs (the kernel outputs) are unaffected."""
    s_next_col = jnp.concatenate(
        [s_col[1:, :], s_col[-1:, :] + jnp.float32(1e7)], axis=0)  # [P, 1]
    return ((s_col <= s_chunk) & (s_next_col > s_chunk)).astype(dtype)


def _lookup_pair_pre(s_chunk, s_col_b, s_next_b, pair_stack):
    """``_lookup_pair`` with PREBROADCAST table columns.

    s_col_b / s_next_b: [P, TILE] lane-broadcast copies of the table
    arclength column and its successor column (built ONCE outside the
    per-step loop).  The interval compare itself is unchanged — bit-identical
    one-hot, bit-identical gather — but the [P, 1] -> [P, TILE] lane
    broadcast is hoisted out of the T-step loop (Mosaic does not CSE the
    per-step broadcast subgraphs; at T=61 the rebuilt broadcasts were the
    dominant table cost, hardware ablation 2026-08-20)."""
    onehot = ((s_col_b <= s_chunk) & (s_next_b > s_chunk)).astype(jnp.bfloat16)
    if "gather_dot" in _ABLATE:                             # timing ablation
        keep = jnp.max(onehot.astype(jnp.float32), axis=0, keepdims=True)
        wide3 = pair_stack[:, 0:1].astype(jnp.float32) * keep  # [48, TILE]
        return (wide3[0:_PAIR_ROWS] + wide3[_PAIR_ROWS:2 * _PAIR_ROWS]) \
            + wide3[2 * _PAIR_ROWS:3 * _PAIR_ROWS]
    wide = jax.lax.dot_general(pair_stack, onehot, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [48, TILE]
    return (wide[0:_PAIR_ROWS] + wide[_PAIR_ROWS:2 * _PAIR_ROWS]) \
        + wide[2 * _PAIR_ROWS:3 * _PAIR_ROWS]


def _probe_band_prefix_pre(s_chunk, s_col_b, band_tab):
    """``_probe_band_prefix`` with a PREBROADCAST arclength column (same
    hoist as ``_lookup_pair_pre``; step function and telescoping dot are
    bit-identical)."""
    step = (s_col_b <= s_chunk).astype(jnp.bfloat16)
    if "probe_dot" in _ABLATE:                              # timing ablation
        keep = jnp.max(step.astype(jnp.float32), axis=0, keepdims=True)
        return -30.0 * keep, 30.0 * keep
    wide = jax.lax.dot_general(band_tab, step, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [6, TILE]
    d_lo = (wide[0:1, :] + wide[1:2, :]) + wide[2:3, :]
    d_hi = (wide[3:4, :] + wide[4:5, :]) + wide[5:6, :]
    return d_lo, d_hi


def _lookup_pair(s_chunk, s_col, pair_stack):
    """One-chunk table gather, strictly 2-D (Mosaic layout discipline).

    s_chunk: [1, TILE] query arclengths; s_col: [P, 1] table arclengths;
    pair_stack: [48, P] — the three exact bf16 split terms (``split3_bf16``)
    of the packed lo-row table (12 cols) stacked with the hi-row
    interpolation columns (s/θ/κ/κ', 4 cols), concatenated along the row
    axis (rows 0..15 term 0, 16..31 term 1, 32..47 term 2).  Returns
    [16, TILE] float32 rows at idx = count(s_vertex <= s) - 1; for s < 0
    (``_onehot_at``'s all-zero row) every column reads 0 — callers must
    domain-mask such candidates, there is NO wrap-to-last here.  Rows 0..11
    are the lo columns, rows 12..15 the hi interpolation columns.

    Exact: the one-hot is 0/1 (exact in bf16), each bf16 dot row selects one
    term with f32 accumulation, and the 3-term sum reconstructs float32
    exactly, matching the XLA path's HIGHEST-precision one-hot gather
    bit-for-bit.  The single [48, P] x [P, TILE] matmul computes the same
    three [16, TILE] blocks as three separate dots (independent output rows)
    at 3x the MXU row utilization, and the sum order (t0 + t1) + t2 is
    preserved.
    """
    onehot = _onehot_at(s_chunk, s_col, jnp.bfloat16)
    if "gather_dot" in _ABLATE:                             # timing ablation
        # keep the one-hot build, skip the MXU dot (cheap reduce keeps the
        # compare alive against DCE) — separates compare vs MXU cost
        keep = jnp.max(onehot.astype(jnp.float32), axis=0, keepdims=True)
        wide3 = pair_stack[:, 0:1].astype(jnp.float32) * keep  # [48, TILE]
        return (wide3[0:_PAIR_ROWS] + wide3[_PAIR_ROWS:2 * _PAIR_ROWS]) \
            + wide3[2 * _PAIR_ROWS:3 * _PAIR_ROWS]
    wide = jax.lax.dot_general(pair_stack, onehot, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [48, TILE]
    return (wide[0:_PAIR_ROWS] + wide[_PAIR_ROWS:2 * _PAIR_ROWS]) \
        + wide[2 * _PAIR_ROWS:3 * _PAIR_ROWS]


def _probe_band(s_chunk, s_col, d_lo_col, d_hi_col):
    """Corridor-band gather on the VPU: (d_lo, d_hi) each [1, TILE] at the
    probe arclength's table row.  A broadcast-multiply-reduce against the
    [P, 1] band columns — exact (0/1 mask, single nonzero per column).
    Reference construction for ``_probe_band_prefix`` (the kernel's fast form);
    kept for the conformance tests.  Probe arclengths are clamped into
    [0, ref_s_last], so ``_onehot_at``'s interval test always hits a row."""
    onehot = _onehot_at(s_chunk, s_col, jnp.float32)
    d_lo = jnp.sum(onehot * d_lo_col, axis=0, keepdims=True)
    d_hi = jnp.sum(onehot * d_hi_col, axis=0, keepdims=True)
    return d_lo, d_hi


def _probe_band_prefix(s_chunk, s_col, band_tab):
    """Corridor-band gather as an MXU prefix sum: (d_lo, d_hi) each [1, TILE].

    ``band_tab`` is the [6, P] bf16 stack of split3 terms of the band
    PREFIX DIFFERENCES (``band_delta_tab``): rows 0..2 hold
    delta_lo[p] = d_lo[p] - d_lo[p-1] (row 0: d_lo[0]), rows 3..5 delta_hi.
    With the step function step[p] = (s_col[p] <= s) as the right operand,
    dot(delta, step) telescopes to the band value at the containing row
    idx = count(s_col <= s) - 1 — the exact value ``_probe_band`` gathers —
    from ONE [P, TILE] compare instead of the interval one-hot's two
    compares + AND (the probe one-hot builds were the kernel's largest cost,
    measured 2026-08-19).

    Exactness rests on the corridor band-value contract
    (ops.collision.quantize_bands): every band is a multiple of 2**-10 m
    with magnitude <= 32.  Then every difference, every bf16 split term
    (truncation keeps multiples of 2**-10 at these magnitudes), and every
    in-order partial sum along the contraction is a multiple of 2**-10 well
    below 2**13 — exactly representable in f32, so the MXU accumulation
    reproduces the gathered f32 band bit-for-bit (hardware-gated by
    scripts/pallas_fleet_tpu_check.py parity vs the XLA gather path).
    Padded/sentinel rows may violate the contract but their step entries are
    always 0 (sentinel arclengths exceed any clamped probe), contributing an
    exact 0 to every partial sum."""
    step = (s_col <= s_chunk).astype(jnp.bfloat16)
    if "probe_dot" in _ABLATE:                              # timing ablation
        keep = jnp.max(step.astype(jnp.float32), axis=0, keepdims=True)
        return -30.0 * keep, 30.0 * keep
    wide = jax.lax.dot_general(band_tab, step, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [6, TILE]
    d_lo = (wide[0:1, :] + wide[1:2, :]) + wide[2:3, :]
    d_hi = (wide[3:4, :] + wide[4:5, :]) + wide[5:6, :]
    return d_lo, d_hi


def band_delta_tab(d_lo_col, d_hi_col):
    """[6, P] bf16 prefix-difference band table for ``_probe_band_prefix``.

    Rows 0..2: split3 terms of delta(d_lo); rows 3..5: of delta(d_hi), where
    delta(col) = [col[0], col[1]-col[0], ...].  Differences of
    contract-quantized bands (multiples of 2**-10, |.| <= 32, see
    ops.collision.quantize_bands) are exact in f32; sentinel-padded rows
    need not satisfy the contract (their step entries are always 0).
    """
    delta = lambda col: jnp.concatenate([col[:1], col[1:] - col[:-1]])
    band = jnp.stack([delta(d_lo_col), delta(d_hi_col)])        # [2, P]
    b0, b1, b2 = split3_bf16(band)
    return jnp.concatenate([b0[0:1], b1[0:1], b2[0:1],
                            b0[1:2], b1[1:2], b2[1:2]], axis=0)  # [6, P]


def band_abs_tab(d_lo_col, d_hi_col):
    """[6, P] bf16 split3 stack of the ABSOLUTE band values (row layout as
    ``band_delta_tab``).  Column p is exactly the column-0 a windowed
    ``band_delta_tab`` would build for a window starting at row p — the
    per-window correction for slicing precomputed delta tables."""
    band = jnp.stack([d_lo_col, d_hi_col])                      # [2, P]
    b0, b1, b2 = split3_bf16(band)
    return jnp.concatenate([b0[0:1], b1[0:1], b2[0:1],
                            b0[1:2], b1[1:2], b2[1:2]], axis=0)  # [6, P]


class ScorerTables(NamedTuple):
    """Precomputed full-table kernel operands (build ONCE per scan/bundle,
    slice per cycle).  The per-cycle XLA prelude — transpose + split3 +
    concat chains on the windowed table — measured 236 us/launch at T=61
    (38% of the launch, 2026-08-20); with these precomputed the prelude
    reduces to a handful of dynamic slices.

    table: [P, 12] f32 packed table (pack_ref_tables);
    pair:  [48, P] bf16 split3 pair stack where column p pairs row p with
           row p+1 (wrap at P — the wrapped column is never read: windows
           exclude their final row via window_ok, and full-table queries
           are clamped below the sentinel rows);
    band_delta: [6, P] prefix-difference band stack (band_delta_tab);
    band_abs:   [6, P] absolute band stack (band_abs_tab) — column i0
           replaces the delta column when a window starts at row i0.
    """
    table: jnp.ndarray
    pair: jnp.ndarray
    band_delta: jnp.ndarray
    band_abs: jnp.ndarray
    # per-step-window operands (sublane-major so PER-STEP dynamic slices land
    # on the 8/16-sublane alignment grid; lane-axis slices would need
    # 128-alignment):
    snext: jnp.ndarray      # [P, 1] successor arclengths s[p+1] (sentinel top)
    pair_sub: jnp.ndarray   # [P, 48] = pair.T
    band_sh: jnp.ndarray    # [P, 6] split3 terms of delta at ROW p+1 (last 0)


def precompute_scorer_tables(packed_table: jnp.ndarray) -> ScorerTables:
    """Full-table ScorerTables from a ``pack_ref_tables`` [P, 12] table."""
    tab = packed_table.astype(jnp.float32)
    tab_next = jnp.concatenate([tab[1:], tab[:1]], axis=0)
    pair_T = jnp.concatenate([tab.T, tab_next[:, :4].T], axis=0)   # [16, P]
    pair = jnp.concatenate(split3_bf16(pair_T), axis=0)            # [48, P]
    band_delta = band_delta_tab(tab[:, 4], tab[:, 5])
    snext = jnp.concatenate(
        [tab[1:, 0:1], tab[-1:, 0:1] + jnp.float32(1e7)], axis=0)  # [P, 1]
    # shifted delta stack: row p carries the split terms of
    # delta[p+1] = band[p+1] - band[p]; the final row is zero (its "step"
    # compares the sentinel successor arclength, which no clamped probe
    # ever reaches)
    band_sh = jnp.concatenate(
        [band_delta[:, 1:], jnp.zeros_like(band_delta[:, :1])], axis=1).T
    return ScorerTables(table=tab, pair=pair,
                        band_delta=band_delta,
                        band_abs=band_abs_tab(tab[:, 4], tab[:, 5]),
                        snext=snext, pair_sub=pair.T,
                        band_sh=band_sh)


def precompute_fleet_scorer_tables(packed_tables: jnp.ndarray) -> ScorerTables:
    """Per-problem ScorerTables ([F, ...] leaves) from [F, P, 12] tables."""
    return jax.vmap(precompute_scorer_tables)(packed_tables)


def _scoring_kernel(scalars_ref, coeffs_lon_ref, coeffs_lat_ref, traj_len_ref,
                    goal_valid_ref, table_ref, pair_ref, band_ref, obs_ref,
                    poly_ref, cost_ref, kin_cost_ref, reason_ref,
                    *, n_steps: int, n_obstacles: int, n_polys: int,
                    n_poly_verts: int, check_flags: tuple,
                    has_desired_s: bool = False,
                    has_desired_v: bool = True):
    """Single-problem kernel shell."""
    cost_ref[:], kin_cost_ref[:], reason_ref[:] = _scoring_body(
        lambda slot: scalars_ref[0, slot],
        coeffs_lon_ref[:], coeffs_lat_ref[:], traj_len_ref[:],
        goal_valid_ref[:], table_ref[:], pair_ref[:], band_ref[:],
        obs_ref,
        lambda m, col: obs_ref[:, m * _OBS_COLS + col:m * _OBS_COLS + col + 1],
        lambda m, col: poly_ref[m, :, col:col + 1],
        n_steps=n_steps, n_obstacles=n_obstacles, n_polys=n_polys,
        n_poly_verts=n_poly_verts,
        check_flags=check_flags, has_desired_s=has_desired_s,
        has_desired_v=has_desired_v)


def _scoring_kernel_ps(scalars_ref, wins_ref, winf_ref, coeffs_lon_ref,
                       coeffs_lat_ref, traj_len_ref, goal_valid_ref,
                       table_ref, snext_ref, pairT_ref, bandT_ref, obs_ref,
                       poly_ref, cost_ref, kin_cost_ref, reason_ref,
                       *, n_steps: int, n_obstacles: int, n_polys: int,
                       n_poly_verts: int, check_flags: tuple,
                       has_desired_s: bool = False,
                       has_desired_v: bool = True, ws_sched: tuple = ()):
    """Single-problem kernel shell with PER-STEP table windows (window
    starts from SMEM, sublane-major table operands sliced per step)."""
    # the prelude aligns every window start to a multiple of 16 (bf16
    # sublane tiling); pl.multiple_of carries that proof to Mosaic, which
    # cannot derive it from an SMEM-sourced value on its own
    _ds = lambda i0, ws: pl.ds(pl.multiple_of(i0, 16), ws)
    ps = _PerStepRefs(
        win_i=lambda t: wins_ref[0, t],
        win_f=lambda r, t: winf_ref[r, t],
        tbl_col=lambda i0, ws: table_ref[_ds(i0, ws), 0:1],
        snext_col=lambda i0, ws: snext_ref[_ds(i0, ws), :],
        pair_sub=lambda i0, ws: pairT_ref[_ds(i0, ws), :],
        band_sh=lambda i0, ws: bandT_ref[_ds(i0, ws), :],
        ws=ws_sched)
    cost_ref[:], kin_cost_ref[:], reason_ref[:] = _scoring_body(
        lambda slot: scalars_ref[0, slot],
        coeffs_lon_ref[:], coeffs_lat_ref[:], traj_len_ref[:],
        goal_valid_ref[:], None, None, None,
        obs_ref,
        lambda m, col: obs_ref[:, m * _OBS_COLS + col:m * _OBS_COLS + col + 1],
        lambda m, col: poly_ref[m, :, col:col + 1],
        n_steps=n_steps, n_obstacles=n_obstacles, n_polys=n_polys,
        n_poly_verts=n_poly_verts,
        check_flags=check_flags, has_desired_s=has_desired_s,
        has_desired_v=has_desired_v, perstep=ps)


def _fleet_scoring_kernel(scalars_ref, coeffs_lon_ref, coeffs_lat_ref,
                          traj_len_ref, goal_valid_ref, table_ref, pair_ref,
                          band_ref, obs_ref,
                          poly_ref, cost_ref, kin_cost_ref, reason_ref,
                          *, n_steps: int, n_obstacles: int, n_polys: int,
                          n_poly_verts: int, check_flags: tuple,
                          has_desired_s: bool = False):
    """Fleet kernel shell: every ref carries a leading per-problem block axis
    of size 1 (grid = (F, K_tiles), BlockSpec index maps select the problem)."""
    cost_ref[0], kin_cost_ref[0], reason_ref[0] = _scoring_body(
        lambda slot: scalars_ref[0, 0, slot],
        coeffs_lon_ref[0], coeffs_lat_ref[0], traj_len_ref[0],
        goal_valid_ref[0], table_ref[0], pair_ref[0], band_ref[0],
        obs_ref,
        lambda m, col: obs_ref[0][:, m * _OBS_COLS + col:
                                 m * _OBS_COLS + col + 1],
        lambda m, col: poly_ref[0, m, :, col:col + 1],
        n_steps=n_steps, n_obstacles=n_obstacles, n_polys=n_polys,
        n_poly_verts=n_poly_verts,
        check_flags=check_flags, has_desired_s=has_desired_s)


class _PerStepRefs(NamedTuple):
    """Per-step-window accessors handed to ``_scoring_body`` (all slices
    start at the step's 16-aligned window row ``i0`` so bf16 sublane
    alignment holds; successor/shifted tables absorb the +1 row offsets)."""
    win_i: object      # t -> i0 window start (SMEM i32 scalar)
    win_f: object      # (row, t) -> SMEM f32: 0 clamp-s0, 1 base d_lo, 2 base d_hi
    tbl_col: object    # (i0, ws) -> [ws, 1] arclength rows s[i0:i0+ws]
    snext_col: object  # (i0, ws) -> [ws, 1] successor rows s[i0+1:i0+ws+1]
    pair_sub: object   # (i0, ws) -> [ws, 48] pair split stack rows
    band_sh: object    # (i0, ws) -> [ws, 6] delta split terms at rows +1
    ws: tuple          # static per-step window rows


def _scoring_body(scal, c_lon_full, c_lat_full, traj_len_row,
                  goal_valid_row, table, pair_stack, band_tab,
                  obs_ref, obs_col, poly_col, *, n_steps: int,
                  n_obstacles: int, n_polys: int, n_poly_verts: int,
                  check_flags: tuple, has_desired_s: bool,
                  has_desired_v: bool = True,
                  perstep: _PerStepRefs | None = None):
    T = n_steps + 1
    TILE = c_lon_full.shape[1]
    dt = scal(_S_DT)
    low_vel = scal(_S_LOW_VEL) > 0.5
    wheelbase = scal(_S_WHEELBASE)
    a_max = scal(_S_A_MAX)
    v_switch = scal(_S_V_SWITCH)
    kappa_max = scal(_S_KAPPA_MAX)
    v_delta_max = scal(_S_V_DELTA_MAX)
    x0_theta = scal(_S_X0_THETA)
    ref_s_last = scal(_S_REF_S_LAST)

    c_lon = c_lon_full                                      # [6, TILE]
    c_lat = c_lat_full
    traj_len = traj_len_row[0, :]                           # [TILE] f32
    step = jax.lax.broadcasted_iota(jnp.int32, (T, TILE), 0).astype(jnp.float32)
    active = step < traj_len[None, :]
    t = step * dt

    def poly_eval(c, tau):
        tau2 = tau * tau
        tau3 = tau2 * tau
        tau4 = tau2 * tau2
        tau5 = tau4 * tau
        p = (c[0][None, :] + c[1][None, :] * tau + c[2][None, :] * tau2 +
             c[3][None, :] * tau3 + c[4][None, :] * tau4 + c[5][None, :] * tau5)
        v = (c[1][None, :] + 2.0 * c[2][None, :] * tau + 3.0 * c[3][None, :] * tau2
             + 4.0 * c[4][None, :] * tau3 + 5.0 * c[5][None, :] * tau4)
        a = (2.0 * c[2][None, :] + 6.0 * c[3][None, :] * tau
             + 12.0 * c[4][None, :] * tau2 + 20.0 * c[5][None, :] * tau3)
        return p, v, a

    s, s_dot, s_ddot = poly_eval(c_lon, t)
    s = jnp.where(active, s, 0.0)
    s_dot = jnp.where(active, s_dot, 0.0)
    s_ddot = jnp.where(active, s_ddot, 0.0)

    tau_lat = jnp.where(active, jnp.where(low_vel, s - s[:1, :], t), 0.0)
    d, d_dot, d_ddot = poly_eval(c_lat, tau_lat)
    d = jnp.where(active, d, 0.0)
    d_dot = jnp.where(active, d_dot, 0.0)
    d_ddot = jnp.where(active, d_ddot, 0.0)

    s_dot = jnp.where(jnp.abs(s_dot) < _EPS, 0.0, s_dot)
    d_dot = jnp.where(jnp.abs(d_dot) < _EPS, 0.0, d_dot)

    pre_acc = jnp.any(jnp.abs(s_ddot) > a_max, axis=0, keepdims=True)
    pre_vel = jnp.any(s_dot < -_EPS, axis=0, keepdims=True)
    prefiltered = pre_acc | pre_vel                                # [1, TILE]

    # ---- table gathers (MXU one-hot), strictly 2-D ------------------------
    # steps are gathered in chunks of _GATHER_CHUNK: the query rows concat
    # along the LANE axis into [1, C*TILE], one interval-test one-hot
    # [P, C*TILE] feeds one [16, P] x [P, C*TILE] matmul per bf16 split term
    # — C-fold fewer MXU invocations than the per-step form (exactness
    # unchanged: same one-hot rows, same 3-term f32 reconstruction); the
    # per-step [16, TILE] views are lane-aligned static slices
    TILE = s.shape[1]
    if perstep is None:
        s_col = table[:, 0:1]                               # [P, 1]
        # hoisted lane-broadcasts of the arclength/successor columns: one
        # [P, TILE] materialization each, shared by every step's interval
        # one-hot and probe step function (chunk width 1 only; the chunked
        # query paths keep the in-loop broadcast form)
        s_next_col = jnp.concatenate(
            [s_col[1:, :], s_col[-1:, :] + jnp.float32(1e7)], axis=0)
        s_col_b = jnp.broadcast_to(s_col, (s_col.shape[0], TILE))
        s_next_b = jnp.broadcast_to(s_next_col, (s_col.shape[0], TILE))
    # lookup queries only: inactive steps carry s = 0, which falls BELOW a
    # dynamic window's first row and would gather all-zero rows (lam = 0/0
    # NaN poisons the take_last sums of short-but-feasible candidates).
    # Clamp those queries to the table's first arclength (SMEM scalar
    # _S_TABLE_S0 — a VMEM [1,1] read would need an unimplemented
    # sublane+lane broadcast on Mosaic) — on the full table that value IS 0,
    # so full-table gathers are bit-unchanged; the gathered values at
    # inactive steps are overwritten by the enlarge extension / masked by
    # `active` on every consumer either way.
    if "gather" in _ABLATE:                                 # timing ablation
        one = jnp.abs(s) * 1e-6 + 1.0
        lo_s, lo_theta, lo_curv, lo_curv_d = s - 0.5, one * 0.01, one * 0.001, one * 0.001
        hi_s, hi_theta, hi_curv, hi_curv_d = s + 0.5, one * 0.01, one * 0.001, one * 0.001
        lo_px, lo_py, lo_tx, lo_ty, lo_nx, lo_ny = (one,) * 6
    else:
        lo_s = None
    lo_cols = [[] for _ in range(_NUM_COLS)]
    hi_cols = [[] for _ in range(4)]
    if perstep is not None and lo_s is None:
        # ---- PER-STEP windows: the interval one-hot, its compares, and
        # the MXU gather run over ws[k] rows around the chunk's arclength
        # span instead of the cycle window (bit-identical values: the
        # containing row is inside the window — the caller's coverage cond
        # guarantees it — and a one-hot dot is exact over any row subset).
        # _PS_CHUNK adjacent steps share one window; their queries batch
        # along the lane axis (sublane->lane reshape, dot columns
        # independent), amortizing the slice/dot fixed cost.
        for c0 in range(0, T, _PS_CHUNK):
            cN = min(c0 + _PS_CHUNK, T)
            C = cN - c0
            k = c0 // _PS_CHUNK
            ws_k = perstep.ws[k]
            i0 = perstep.win_i(k)
            # inactive queries clamp to the chunk window's FIRST arclength
            # (its row fires; lam = 0; values overwritten by enlarge/mask)
            q = jnp.where(active[c0:cN, :], s[c0:cN, :],
                          perstep.win_f(0, k))               # [C, TILE]
            q_w = q if C == 1 else q.reshape(1, C * TILE)
            s_blk = perstep.tbl_col(i0, ws_k)               # [ws, 1]
            if _PS_ONEHOT == "stepdiff":
                step_b = (s_blk <= q_w).astype(jnp.bfloat16)
                onehot = step_b - jnp.concatenate(
                    [step_b[1:], jnp.zeros((1, step_b.shape[1]),
                                           jnp.bfloat16)], axis=0)
            else:
                s_nx = perstep.snext_col(i0, ws_k)
                onehot = ((s_blk <= q_w) & (s_nx > q_w)).astype(jnp.bfloat16)
            if "gather_dot" in _ABLATE:                     # timing ablation
                keep = jnp.max(onehot.astype(jnp.float32), axis=0,
                               keepdims=True)
                wide = jnp.broadcast_to(keep, (3 * _PAIR_ROWS, C * TILE))
            else:
                pair_blk = perstep.pair_sub(i0, ws_k)       # [ws, 48]
                wide = jax.lax.dot_general(
                    pair_blk, onehot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [48, C*TILE]
            vals_w = (wide[0:_PAIR_ROWS] + wide[_PAIR_ROWS:2 * _PAIR_ROWS]) \
                + wide[2 * _PAIR_ROWS:3 * _PAIR_ROWS]
            for i in range(C):
                vals = vals_w[:, i * TILE:(i + 1) * TILE]
                for col in range(_NUM_COLS):
                    lo_cols[col].append(vals[col:col + 1, :])
                for col in range(4):
                    hi_cols[col].append(
                        vals[_NUM_COLS + col:_NUM_COLS + col + 1, :])
    elif lo_s is None:
        s_lookup = jnp.where(active, s, scal(_S_TABLE_S0))
    for c0 in ([] if (lo_s is not None or perstep is not None)
               else range(0, T, _GATHER_CHUNK)):            # static, small T
        c1 = min(c0 + _GATHER_CHUNK, T)
        if c1 - c0 == 1:
            s_wide = s_lookup[c0:c0 + 1, :]
            wide = _lookup_pair_pre(s_wide, s_col_b, s_next_b,
                                    pair_stack)             # [16, TILE]
        else:
            s_wide = s_lookup[c0:c1, :].reshape(1, (c1 - c0) * TILE)
            wide = _lookup_pair(s_wide, s_col, pair_stack)  # [16, C*TILE]
        for i in range(c1 - c0):
            vals = wide[:, i * TILE:(i + 1) * TILE]
            for col in range(_NUM_COLS):
                lo_cols[col].append(vals[col:col + 1, :])
            for col in range(4):
                hi_cols[col].append(
                    vals[_NUM_COLS + col:_NUM_COLS + col + 1, :])
    if lo_s is None:
        cat = lambda rows: jnp.concatenate(rows, axis=0)    # [T, TILE]
        lo_s, lo_theta, lo_curv, lo_curv_d = (cat(lo_cols[i]) for i in range(4))
        hi_s, hi_theta, hi_curv, hi_curv_d = (cat(hi_cols[i]) for i in range(4))
        lo_px, lo_py, lo_tx, lo_ty, lo_nx, lo_ny = (cat(lo_cols[i])
                                                    for i in range(6, 12))

    lam = (s - lo_s) / (hi_s - lo_s)
    two_pi = np.float32(2.0 * np.pi)
    raw = (hi_theta - lo_theta) * lam + lo_theta
    interp_theta = raw - two_pi * jnp.trunc(raw / two_pi)
    k_r = (hi_curv - lo_curv) * lam + lo_curv
    k_r_d = (hi_curv_d - lo_curv_d) * lam + lo_curv_d

    # Frenet -> Cartesian from the same gathered rows (divergence from the
    # clipped-segment convention only affects out-of-domain candidates,
    # which are masked infeasible below)
    ds = s - lo_s
    ego_x = lo_px + ds * lo_tx + d * lo_nx
    ego_y = lo_py + ds * lo_ty + d * lo_ny

    # ---- Werling transform ------------------------------------------------
    moving = s_dot > 0.001
    sv_safe = jnp.where(moving, s_dot, 1.0)
    dp_high = jnp.where(moving, d_dot / sv_safe, 0.0)
    ddot_w = d_ddot - dp_high * s_ddot
    dpp_high = jnp.where(moving, ddot_w / (sv_safe * sv_safe), 0.0)
    dp = jnp.where(low_vel, d_dot, dp_high)
    dpp = jnp.where(low_vel, d_ddot, dpp_high)

    theta_cl_move = dp if "werling" in _ABLATE else _atan(dp)
    theta_gl_move = theta_cl_move + interp_theta
    use_move = moving | low_vel

    if "hold" in _ABLATE:                                   # timing ablation
        theta_gl = theta_gl_move
    else:
        # standstill hold = rightmost-valid inclusive scan over the step
        # axis: theta_gl[c] is theta_gl_move at the last moving step <= c,
        # else x0_theta.  Log-shift selection network (ceil(log2 T) passes
        # of [T, TILE] selects) replaces the T-step serial loop of [1, TILE]
        # wheres (27 us/launch at T=61, hardware ablation 2026-08-21).
        # Pure selects propagating exact theta_gl_move values — the result
        # is structurally identical to the serial loop.
        hv = jnp.where(use_move, theta_gl_move,
                       jnp.full((T, TILE), x0_theta, jnp.float32))
        # flag carried as f32 0/1: Mosaic has no lowering for bool-mask
        # concat with a misaligned sublane slice ("invalid vector register
        # cast"); float concat + a > 0.5 compare lowers fine
        hf = use_move.astype(jnp.float32)
        sh = 1
        while sh < T:
            pad_v = jnp.full((sh, TILE), x0_theta, jnp.float32)
            pad_f = jnp.zeros((sh, TILE), jnp.float32)
            prev_v = jnp.concatenate([pad_v, hv[:T - sh]], axis=0)
            prev_f = jnp.concatenate([pad_f, hf[:T - sh]], axis=0)
            hv = jnp.where(hf > 0.5, hv, prev_v)
            hf = jnp.maximum(hf, prev_f)
            sh *= 2
        theta_gl = hv
    theta_cl = jnp.where(use_move, theta_cl_move, theta_gl - interp_theta)

    if "werling" in _ABLATE:                                # timing ablation
        one_krd = 1.0 - k_r * d
        cos_t = 1.0 - theta_cl * theta_cl
        tan_t = theta_cl
        kappa_gl = dpp + k_r
        v = s_dot * one_krd
        a = s_ddot + kappa_gl
    else:
        one_krd = 1.0 - k_r * d
        cos_t = jnp.cos(theta_cl)
        tan_t = jnp.tan(theta_cl)
        kappa_gl = ((dpp + (k_r * dp + k_r_d * d) * tan_t) * cos_t *
                    (cos_t / one_krd) ** 2 + (cos_t / one_krd) * k_r)
        v = s_dot * (one_krd / cos_t)
        a = (s_ddot * one_krd / cos_t + ((s_dot ** 2) / cos_t) *
             (one_krd * tan_t * (kappa_gl * one_krd / cos_t - k_r) -
              (k_r_d * d + k_r * dp)))

    # ---- constraint masks + first-failure reason --------------------------
    # reason semantics mirror ops.kinematics.rollout: flat priority index
    # step * 5 + constraint_rank, first (step, rank) violation wins; the
    # rank IS the reason code (REASON_VELOCITY..REASON_ACCELERATION = 0..4)
    cv, ca_f, ck, ckd, cy = ((False,) * 5 if "constraints" in _ABLATE
                             else check_flags)
    first_row = step < 1.0
    big = jnp.float32(1e9)
    min_flat = jnp.full((1, TILE), big, jnp.float32)

    def track(viol_c, rank):
        flat = step * 5.0 + jnp.float32(rank)
        masked = jnp.where(viol_c & active, flat, big)
        return jnp.min(masked, axis=0, keepdims=True)

    if cv:
        min_flat = jnp.minimum(min_flat, track(v < -_EPS, 0))
    if ck:
        min_flat = jnp.minimum(min_flat, track(jnp.abs(kappa_gl) > kappa_max, 1))
    if cy:
        prev_theta = jnp.concatenate([theta_gl[:1], theta_gl[:-1]], axis=0)
        yaw = jnp.where(first_row, 0.0, (theta_gl - prev_theta) / dt)
        yaw_r = jnp.round(yaw * 1e5) / 1e5
        min_flat = jnp.minimum(min_flat, track(jnp.abs(yaw_r) > kappa_max * v, 2))
    if ckd:
        steer = _atan(wheelbase * kappa_gl)
        kd_max = v_delta_max / (wheelbase * jnp.cos(steer) ** 2)
        prev_k = jnp.concatenate([kappa_gl[:1], kappa_gl[:-1]], axis=0)
        kd = jnp.where(first_row, 0.0, (kappa_gl - prev_k) / dt)
        min_flat = jnp.minimum(min_flat, track(jnp.abs(kd) > kd_max, 3))
    if ca_f:
        v_safe = jnp.where(v > v_switch, v, 1.0)
        a_hi = jnp.where(v > v_switch, a_max * v_switch / v_safe, a_max)
        min_flat = jnp.minimum(min_flat, track((a < -a_max) | (a > a_hi), 4))

    any_viol = min_flat < big
    kin_feasible = ~prefiltered & ~any_viol
    # domain: s inside the table span + the lateral projection-domain limits
    # (normal-crossing 1 - kappa_r*d <= 0 and the CLCS 20 m default cap),
    # matching ops.kinematics.rollout
    lat_ok = (one_krd > 0.0) & (jnp.abs(d) < jnp.float32(19.9))
    domain_ok = jnp.all(((s >= 0.0) & (s <= ref_s_last) & lat_ok) | ~active,
                        axis=0, keepdims=True)
    feasible = kin_feasible & domain_ok & (goal_valid_row > 0.5)  # [1, TILE]

    # first-failure reason row (kinematics.rollout:257-279 ordering):
    # prefilter reason beats the scan; DOMAIN only for kinematically
    # feasible candidates; -1 = feasible
    # exact-integer f32 division (NOT * 0.2, which is inexact)
    scan_rank = min_flat - 5.0 * jnp.floor(min_flat / 5.0)
    reason = jnp.where(any_viol, scan_rank, jnp.float32(-1.0))
    pre_reason = jnp.where(pre_acc, jnp.float32(4.0), jnp.float32(0.0))
    reason = jnp.where(prefiltered, pre_reason, reason)
    reason = jnp.where(kin_feasible & ~domain_ok, jnp.float32(5.0), reason)

    # ---- enlarge (constant-acceleration extension) ------------------------
    ext = ~active
    last = traj_len - 1.0
    last_sel = (step == last[None, :]).astype(jnp.float32)
    take_last = lambda arr: jnp.sum(arr * last_sel, axis=0, keepdims=True)
    t_rel = (step - last[None, :]) * dt

    a_last = take_last(a)
    v_temp = take_last(v) + t_rel * a_last
    v_temp = v_temp * (v_temp >= 0)
    theta_last = take_last(theta_gl)
    cos_last = jnp.cos(theta_last)
    sin_last = jnp.sin(theta_last)
    # positions: running sum of dt * v_temp along T for extended steps
    # (Mosaic has no cumsum lowering; T is small and static)
    incr_x = jnp.where(ext, dt * v_temp * cos_last, 0.0)
    incr_y = jnp.where(ext, dt * v_temp * sin_last, 0.0)
    if "enlarge" in _ABLATE:                                # timing ablation
        cum_x, cum_y = incr_x, incr_y
    else:
        acc_x = jnp.zeros((1, TILE), jnp.float32)
        acc_y = jnp.zeros((1, TILE), jnp.float32)
        cum_x_rows = []
        cum_y_rows = []
        for c in range(T):
            acc_x = acc_x + incr_x[c:c + 1, :]
            acc_y = acc_y + incr_y[c:c + 1, :]
            cum_x_rows.append(acc_x)
            cum_y_rows.append(acc_y)
        cum_x = jnp.concatenate(cum_x_rows, axis=0)
        cum_y = jnp.concatenate(cum_y_rows, axis=0)
    ego_x = jnp.where(ext, take_last(ego_x) + cum_x, ego_x)
    ego_y = jnp.where(ext, take_last(ego_y) + cum_y, ego_y)
    v = jnp.where(ext, v_temp, v)
    a = jnp.where(ext, a_last, a)
    theta_gl = jnp.where(ext, theta_last, theta_gl)
    theta_cl = jnp.where(ext, take_last(theta_cl), theta_cl)
    s_dot_last = take_last(s_dot)
    s = jnp.where(ext, take_last(s) + t_rel * s_dot_last, s)
    d = jnp.where(ext, take_last(d) + t_rel * take_last(d_dot), d)

    # ---- cost (DefaultCostFunction) ---------------------------------------
    w_a = scal(_S_W_A)
    desired_v = scal(_S_DESIRED_V)
    desired_d = scal(_S_DESIRED_D)
    v_end = v[T - 1:T, :]
    v_mid = v[T // 2:T // 2 + 1, :]
    if "cost" in _ABLATE:                                   # timing ablation
        costs = jnp.sum(v + a + d + s + theta_cl, axis=0, keepdims=True)
    else:
        costs = jnp.sum((w_a * a) ** 2, axis=0, keepdims=True)
        if has_desired_v:
            costs = costs + (jnp.sum((5.0 * (v - desired_v)) ** 2, axis=0,
                                     keepdims=True)
                             + 50.0 * (v_end - desired_v) ** 2
                             + 100.0 * (v_mid - desired_v) ** 2)
        if has_desired_s:
            # stopping cost (cost_function.py:60-62)
            desired_s = scal(_S_DESIRED_S)
            costs = costs + (jnp.sum((0.25 * (desired_s - s)) ** 2, axis=0,
                                     keepdims=True)
                             + (20.0 * (desired_s - s[T - 1:T, :])) ** 2)
        costs = costs + (jnp.sum((0.25 * (desired_d - d)) ** 2, axis=0,
                                 keepdims=True)
                         + (20.0 * (desired_d - d[T - 1:T, :])) ** 2)
        costs = costs + (jnp.sum((0.25 * jnp.abs(theta_cl)) ** 2, axis=0,
                                 keepdims=True)
                         + (5.0 * jnp.abs(theta_cl[T - 1:T, :])) ** 2)

    # ---- corridor road-boundary check (post-enlarge states, 3 probes) -----
    half_len = scal(_S_HALF_LEN)
    half_wid = scal(_S_HALF_WID)
    wb_rear = scal(_S_WB_REAR)
    s_center = s + wb_rear * jnp.cos(theta_cl)
    d_center = d + wb_rear * jnp.sin(theta_cl)
    lat_ext = (half_wid * jnp.abs(jnp.cos(theta_cl)) +
               half_len * jnp.abs(jnp.sin(theta_cl)))
    lon_ext = (half_len * jnp.abs(jnp.cos(theta_cl)) +
               half_wid * jnp.abs(jnp.sin(theta_cl)))
    collides = jnp.zeros((1, TILE), dtype=jnp.bool_)
    d_plus = d_center + lat_ext
    d_minus = d_center - lat_ext
    if perstep is not None and "probes" not in _ABLATE:
        # ---- PER-STEP corridor probes: the telescoping band dot runs over
        # the step window's SHIFTED delta rows (rows i0+1..i0+ws) with the
        # window-start band value added from SMEM.  Exact under the band
        # quantization contract: every partial sum is a difference of
        # contract-quantized band values (multiples of 2**-10, |.| <= 64 —
        # exact in f32), so base + dot reconstructs the gathered band
        # bit-for-bit, same as the rebased cycle-window telescoping.
        # The three probe offsets AND the chunk's steps batch into ONE
        # [ws, 3*C*TILE] step build + dot via the sublane->lane reshape
        # (bit-identical per column; with per-step windows the per-op fixed
        # cost is no longer negligible — fewer, wider ops measurably help,
        # unlike the flat cycle-window chunk sweep).
        for c0 in range(0, T, _PS_CHUNK):
            cN = min(c0 + _PS_CHUNK, T)
            C = cN - c0
            k = c0 // _PS_CHUNK
            ws_k = perstep.ws[k]
            i0 = perstep.win_i(k)
            s_nx = perstep.snext_col(i0, ws_k)              # [ws, 1]
            delta_blk = perstep.band_sh(i0, ws_k)           # [ws, 6]
            base_lo = perstep.win_f(1, k)
            base_hi = perstep.win_f(2, k)
            # offset-major batching: THREE [C, TILE] slices (one per probe
            # offset) instead of 3C per-(step, offset) row concats — the
            # dot's columns are independent, so only the column->(c, off)
            # mapping below changes (bit-identical per column)
            sc = s_center[c0:cN, :]
            le = lon_ext[c0:cN, :]
            q3 = jnp.concatenate(
                [jnp.clip(sc - le, 0.0, ref_s_last),
                 jnp.clip(sc, 0.0, ref_s_last),
                 jnp.clip(sc + le, 0.0, ref_s_last)], axis=0)   # [3C, TILE]
            q_w = q3.reshape(1, 3 * C * TILE)
            step_m = (s_nx <= q_w).astype(jnp.bfloat16)     # [ws, 3C*TILE]
            if "probe_dot" in _ABLATE:                      # timing ablation
                keep = jnp.max(step_m.astype(jnp.float32), axis=0,
                               keepdims=True)
                band_lo_w, band_hi_w = -30.0 * keep, 30.0 * keep
            else:
                wide = jax.lax.dot_general(
                    delta_blk, step_m, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [6, 3C*TILE]
                band_lo_w = base_lo + ((wide[0:1, :] + wide[1:2, :])
                                       + wide[2:3, :])
                band_hi_w = base_hi + ((wide[3:4, :] + wide[4:5, :])
                                       + wide[5:6, :])
            for i in range(3 * C):
                c = c0 + i % C                   # offset-major q3 layout
                band_lo = band_lo_w[:, i * TILE:(i + 1) * TILE]
                band_hi = band_hi_w[:, i * TILE:(i + 1) * TILE]
                collides = collides | ((d_plus[c:c + 1, :] > band_hi)
                                       | (d_minus[c:c + 1, :] < band_lo))
    for offset in (() if ("probes" in _ABLATE or perstep is not None)
                   else (-1.0, 0.0, 1.0)):
        # clamp into the table span: mirrors the XLA path's clipped-segment
        # gather convention for probes beyond the path ends
        s_probe = jnp.clip(s_center + offset * lon_ext, 0.0, ref_s_last)
        for c0 in range(0, T, _PROBE_CHUNK):
            c1 = min(c0 + _PROBE_CHUNK, T)
            C = c1 - c0
            if C == 1:
                q = s_probe[c0:c0 + 1, :]
                dp_w = d_plus[c0:c0 + 1, :]
                dm_w = d_minus[c0:c0 + 1, :]
                band_lo, band_hi = _probe_band_prefix_pre(q, s_col_b, band_tab)
            else:
                # sublane->lane reshape batches C steps' band queries into
                # ONE telescoping matmul — bitwise identical per column
                q = s_probe[c0:c1, :].reshape(1, C * TILE)
                dp_w = d_plus[c0:c1, :].reshape(1, C * TILE)
                dm_w = d_minus[c0:c1, :].reshape(1, C * TILE)
                band_lo, band_hi = _probe_band_prefix(q, s_col, band_tab)
            viol_w = (dp_w > band_hi) | (dm_w < band_lo)    # [1, C*TILE]
            for i in range(C):
                collides = collides | viol_w[:, i * TILE:(i + 1) * TILE]
    # ---- obstacle OBB SAT (ego center poses vs obstacle table) ------------
    e_theta = theta_gl
    e_cos = jnp.cos(e_theta)
    e_sin = jnp.sin(e_theta)
    ecx = ego_x + wb_rear * e_cos
    ecy = ego_y + wb_rear * e_sin
    for m in range(0 if "obb" in _ABLATE else n_obstacles):
        ox = obs_col(m, 0)
        oy = obs_col(m, 1)
        otheta = obs_col(m, 2)
        ohl = obs_col(m, 3)
        ohw = obs_col(m, 4)
        valid = obs_col(m, 5) > 0.5
        radius = obs_col(m, 6)

        o_cos = jnp.cos(otheta)
        o_sin = jnp.sin(otheta)
        dx = ox - ecx
        dy = oy - ecy
        rel_cos = jnp.abs(e_cos * o_cos + e_sin * o_sin)
        rel_sin = jnp.abs(o_sin * e_cos - o_cos * e_sin)
        lx = jnp.abs(dx * e_cos + dy * e_sin)
        ly = jnp.abs(-dx * e_sin + dy * e_cos)
        sep = lx > half_len + ohl * rel_cos + ohw * rel_sin
        sep = sep | (ly > half_wid + ohl * rel_sin + ohw * rel_cos)
        sep = sep | (jnp.abs(dx * o_cos + dy * o_sin) >
                     ohl + half_len * rel_cos + half_wid * rel_sin)
        sep = sep | (jnp.abs(-dx * o_sin + dy * o_cos) >
                     ohw + half_len * rel_sin + half_wid * rel_cos)
        # exact disc rows (radius > 0, zero half extents): closest-point
        # test in the ego frame, matching ops.collision.check_collisions.
        # boolean select (a where on i1 vectors hits an unsupported Mosaic
        # i8->i1 truncation)
        qx = jnp.maximum(lx - half_len, 0.0)
        qy = jnp.maximum(ly - half_wid, 0.0)
        disc_hit = qx * qx + qy * qy <= radius * radius
        is_disc = radius > 0.0
        hit = (is_disc & disc_hit) | (~is_disc & ~sep)
        collides = collides | jnp.any(valid & hit, axis=0, keepdims=True)

    # ---- exact convex-polygon SAT (polygon obstacle group) ----------------
    # per piece: ego box axes (candidate-dependent projections of the V
    # world vertices) + the V edge normals (candidate-independent [T, 1]
    # intervals); padded duplicate vertices yield zero normals that never
    # separate — matching ops.collision._poly_obb_overlap_tmajor
    for m in range(n_polys):
        V = n_poly_verts
        vxs = [poly_col(m, 2 * v) for v in range(V)]          # each [T, 1]
        vys = [poly_col(m, 2 * v + 1) for v in range(V)]
        pvalid = poly_col(m, 2 * V) > 0.5

        pm_min = pm_max = pn_min = pn_max = None
        for v in range(V):
            rx = vxs[v] - ecx                                  # [T, TILE]
            ry = vys[v] - ecy
            pm = rx * e_cos + ry * e_sin
            pn = -rx * e_sin + ry * e_cos
            pm_min = pm if v == 0 else jnp.minimum(pm_min, pm)
            pm_max = pm if v == 0 else jnp.maximum(pm_max, pm)
            pn_min = pn if v == 0 else jnp.minimum(pn_min, pn)
            pn_max = pn if v == 0 else jnp.maximum(pn_max, pn)
        sep_p = (pm_min > half_len) | (pm_max < -half_len) | \
                (pn_min > half_wid) | (pn_max < -half_wid)

        for e in range(V):
            e2 = (e + 1) % V
            nx = -(vys[e2] - vys[e])                           # [T, 1]
            ny = vxs[e2] - vxs[e]
            lo = hi = None
            for v in range(V):
                pv = nx * vxs[v] + ny * vys[v]                 # [T, 1]
                lo = pv if v == 0 else jnp.minimum(lo, pv)
                hi = pv if v == 0 else jnp.maximum(hi, pv)
            c_proj = nx * ecx + ny * ecy                       # [T, TILE]
            r_ego = (half_len * jnp.abs(nx * e_cos + ny * e_sin) +
                     half_wid * jnp.abs(-nx * e_sin + ny * e_cos))
            sep_p = sep_p | (c_proj - r_ego > hi) | (c_proj + r_ego < lo)
        collides = collides | jnp.any(pvalid & ~sep_p, axis=0, keepdims=True)

    # two [1, TILE] rows: masked cost (the selection row) and the
    # kinematic-feasible raw cost (statistics row — lets the facade fast path
    # reconstruct the reference's rejection counters incl. the
    # lazy-iteration collision count, without the [K, T] state arrays)
    inf = jnp.float32(np.inf)
    return (jnp.where(feasible & ~collides, costs, inf),
            jnp.where(feasible, costs, inf),
            reason)


def score_candidates_pallas(*args, **kwargs):
    """(masked_costs [K], kin_costs [K]) from the fused VMEM scoring kernel.

    Wrapper that disables x64 for the trace — Mosaic rejects 64-bit layouts
    and the library enables x64 globally for the conformance path.
    """
    with jax.enable_x64(False):
        return _score_candidates_pallas(*args, **kwargs)


@functools.partial(jax.jit, static_argnames=("n_steps", "check_flags",
                                             "interpret", "tile_k",
                                             "has_desired_v"))
def _score_candidates_pallas(coeffs_lon: jnp.ndarray, coeffs_lat: jnp.ndarray,
                            traj_len: jnp.ndarray, goal_valid: jnp.ndarray,
                            packed_table: jnp.ndarray,
                            obstacles: ObstacleArrays,
                            veh: VehicleArrays,
                            x0_orientation, dt: float,
                            low_vel, desired_speed, desired_d, w_a,
                            ref_s_last=None, desired_s=None, span=None,
                            span_steps=None,
                            pre: ScorerTables | None = None,
                            *, n_steps: int,
                            check_flags: tuple = (True,) * 5,
                            interpret: bool = False,
                            tile_k: int | None = None,
                            has_desired_v: bool = True) -> jnp.ndarray:
    """(masked_costs, kin_costs) each [K] from the fused VMEM scoring kernel.

    ``masked_costs`` is the selection row — equivalent (for velocity-keeping
    fleet scoring) of rollout + default_cost + check_corridor +
    check_collisions with infeasible/colliding candidates at +inf.
    ``kin_costs`` is the statistics row: the same cost with ONLY the
    kinematic/domain/goal mask applied (collision not yet), letting callers
    reconstruct the reference's rejection counters (kinematic = inf in
    kin_costs; colliding = finite in kin_costs but inf in masked_costs;
    the lazy-iteration collision count = colliding & kin_cost < winner cost)
    without reading back any [K, T] state arrays.

    ``span``: optional (lo, hi) traced scalars — a SOUND arclength span of
    the candidate set incl. the enlarge extension (grid.candidate_lon_span).
    When provided, the dense [K, T] window-bounds prelude is skipped
    (hardware-measured at 31% of a T=61 launch); exactness is independent
    of the bounds via the lax.cond full-table fallback.
    """
    dtype = jnp.float32
    K = coeffs_lon.shape[0]
    T = n_steps + 1
    P = packed_table.shape[0]
    M = obstacles.pose.shape[0]
    # tile heuristic (hardware sweeps): 128 at short horizons, 256 at the
    # default 6 s horizon (T=61: 10.56M vs 10.01M cand/s, bitwise equal)
    tile = tile_k or (_TILE_K if T <= 32 else 256)
    if ref_s_last is None:
        # fall back: largest non-sentinel arclength (sentinels are >= 1e7
        # beyond the true end, see pack_ref_tables)
        s_col = packed_table[:, 0]
        ref_s_last = jnp.max(jnp.where(s_col < s_col[0] + 9e6, s_col, -jnp.inf))

    K_pad = ((K + tile - 1) // tile) * tile
    pad = K_pad - K
    cl = jnp.pad(coeffs_lon.T.astype(dtype), ((0, 0), (0, pad)))
    ca = jnp.pad(coeffs_lat.T.astype(dtype), ((0, 0), (0, pad)))
    tl = jnp.pad(traj_len.astype(dtype)[None, :], ((0, 0), (0, pad)))
    gv = jnp.pad(goal_valid.astype(dtype)[None, :], ((0, 0), (0, pad)))

    if M > 0:
        radius = obstacles.radius if obstacles.radius is not None \
            else jnp.zeros((M,), dtype)
        obs = jnp.concatenate(
            [obstacles.pose.astype(dtype),
             jnp.broadcast_to(obstacles.half_ext[:, None, :], (M, T, 2)).astype(dtype),
             obstacles.valid.astype(dtype)[..., None],
             jnp.broadcast_to(radius.astype(dtype)[:, None, None],
                              (M, T, 1))], axis=-1)                # [M, T, 7]
        # sublane-major 2-D layout [T, M*7]: in-kernel column reads become
        # clean [T, 1] lane slices — the 3-D [M, T, 7] minor-dim-7 slicing
        # relayouts measured 69 us/launch for ONE obstacle at T=61
        # (hardware ablation 2026-08-21)
        obs = jnp.transpose(obs, (1, 0, 2)).reshape(T, M * _OBS_COLS)
    else:
        obs = jnp.zeros((T, _OBS_COLS), dtype)

    # polygon group: [Mp, T, 2V + 1] interleaved world vertex coords + valid
    if obstacles.poly_verts is not None:
        Mp = obstacles.poly_verts.shape[0]
        Vp = obstacles.poly_verts.shape[2]
        poly = jnp.concatenate(
            [obstacles.poly_verts.astype(dtype).reshape(Mp, T, 2 * Vp),
             obstacles.poly_valid.astype(dtype)[..., None]], axis=-1)
    else:
        Mp, Vp = 0, 1
        poly = jnp.zeros((1, T, 3), dtype)
    poly_cols = poly.shape[-1]

    scalars = jnp.zeros((1, _NUM_SCALARS), dtype)
    values = [
        (_S_WHEELBASE, veh.wheelbase), (_S_WB_REAR, veh.wb_rear_axle),
        (_S_A_MAX, veh.a_max), (_S_V_SWITCH, veh.v_switch),
        (_S_KAPPA_MAX, veh.kappa_max), (_S_V_DELTA_MAX, veh.v_delta_max),
        (_S_HALF_LEN, veh.half_length), (_S_HALF_WID, veh.half_width),
        (_S_X0_THETA, x0_orientation), (_S_DT, dt),
        (_S_LOW_VEL, jnp.asarray(low_vel, dtype)),
        (_S_DESIRED_V, desired_speed), (_S_DESIRED_D, desired_d),
        (_S_W_A, w_a), (_S_REF_S_LAST, ref_s_last),
        (_S_DESIRED_S, desired_s if desired_s is not None else 0.0)]
    for slot, value in values:
        scalars = scalars.at[0, slot].set(jnp.asarray(value, dtype))

    if pre is None:
        pre = precompute_scorer_tables(packed_table)
    table = pre.table

    def call_kernel(tab, pair_stack, band):
        """pallas_call over (possibly windowed) [Pw, 12] / [48, Pw] / [6, Pw]
        operands sliced from the precomputed ScorerTables."""
        Pw = tab.shape[0]
        scal_tab = scalars.at[0, _S_TABLE_S0].set(tab[0, 0])
        grid = (K_pad // tile,)
        if "launch" in _ABLATE:                             # timing ablation
            # skip the pallas_call entirely (XLA prelude + window machinery
            # only; cheap reductions keep every operand alive against DCE)
            keep = (jnp.sum(pair_stack.astype(dtype)) + jnp.sum(band)
                    + jnp.sum(scal_tab) + jnp.sum(cl) + jnp.sum(ca)
                    + jnp.sum(tl) + jnp.sum(obs) + jnp.sum(poly)
                    + jnp.sum(gv.astype(dtype)))
            row = jnp.full((1, K_pad), 1.0, dtype) * keep
            return row, row, row
        return pl.pallas_call(
            functools.partial(_scoring_kernel, n_steps=n_steps,
                              n_obstacles=M, n_polys=Mp, n_poly_verts=Vp,
                              check_flags=check_flags,
                              has_desired_s=desired_s is not None,
                              has_desired_v=has_desired_v),
            out_shape=(jax.ShapeDtypeStruct((1, K_pad), dtype),
                       jax.ShapeDtypeStruct((1, K_pad), dtype),
                       jax.ShapeDtypeStruct((1, K_pad), dtype)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, _NUM_SCALARS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((6, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Pw, _NUM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * _PAIR_ROWS, Pw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, Pw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, max(M, 1) * _OBS_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((max(Mp, 1), T, poly_cols), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((1, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(scal_tab, cl, ca, tl, gv, tab, pair_stack, band, obs, poly)

    margin = (jnp.asarray(veh.wb_rear_axle, dtype)
              + jnp.asarray(veh.half_length, dtype)
              + jnp.asarray(veh.half_width, dtype) + dtype(1.0))

    def call_kernel_ps(wins, winf, ws_sched):
        """pallas_call with PER-STEP table windows over the FULL precomputed
        tables (sublane-major operands; window starts/bases from SMEM)."""
        grid = (K_pad // tile,)
        if "launch" in _ABLATE:                             # timing ablation
            keep = (jnp.sum(pre.pair_sub.astype(dtype)) + jnp.sum(pre.band_sh.astype(dtype))
                    + jnp.sum(scalars) + jnp.sum(cl) + jnp.sum(ca)
                    + jnp.sum(tl) + jnp.sum(obs) + jnp.sum(poly)
                    + jnp.sum(winf) + jnp.sum(gv.astype(dtype)))
            row = jnp.full((1, K_pad), 1.0, dtype) * keep
            return row, row, row
        return pl.pallas_call(
            functools.partial(_scoring_kernel_ps, n_steps=n_steps,
                              n_obstacles=M, n_polys=Mp, n_poly_verts=Vp,
                              check_flags=check_flags,
                              has_desired_s=desired_s is not None,
                              has_desired_v=has_desired_v,
                              ws_sched=ws_sched),
            out_shape=(jax.ShapeDtypeStruct((1, K_pad), dtype),
                       jax.ShapeDtypeStruct((1, K_pad), dtype),
                       jax.ShapeDtypeStruct((1, K_pad), dtype)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, _NUM_SCALARS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(wins.shape, lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(winf.shape, lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((6, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, _NUM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 3 * _PAIR_ROWS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 6), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, max(M, 1) * _OBS_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((max(Mp, 1), T, poly_cols), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((1, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(scalars, wins, winf, cl, ca, tl, gv, pre.table, pre.snext,
          pre.pair_sub, pre.band_sh, obs, poly)

    def dispatch_cycle():
        return _dispatch_cycle_window()

    # hardware-measured 2026-08-19: halving the window for short horizons
    # gains nothing (37.3M vs 37.2M at T=21) — at 256 rows the kernel is no
    # longer table-dominated there; LONG horizons (T > 32) are
    # table-dominated (48% at T=61, ablation 2026-08-20) and use the tighter
    # 192-row window (tests monkeypatch _WINDOW_ROWS/_WINDOW_ROWS_LONG huge
    # to force the full-table path)
    W = _WINDOW_ROWS if T <= 32 else _WINDOW_ROWS_LONG

    def _dispatch_cycle_window():
        if P <= W:
            return call_kernel(table, pre.pair, pre.band_delta)
        # ---- dynamic table window (exactness-preserving) ----------------
        # Every per-step table query (gather + the three corridor probes)
        # is P-proportional work inside the kernel; candidates only touch
        # the arclength range their rollouts reach, so slice a fixed
        # W-row window around it (bounds from the caller's ``span`` — the
        # exact lattice evaluation in grid.candidate_lon_span — or a dense
        # XLA eval of the longitudinal polynomials, incl. the
        # constant-velocity enlarge extension and the probe extent margin)
        # and fall back to the full table via lax.cond when the window
        # cannot cover the span.  Window rows are contiguous original rows,
        # so the interval one-hot, the pair interpolation, and the band
        # prefix telescoping are bit-identical to the full-table gathers;
        # window_ok excludes the window's final row so its wrapped
        # "next row" is never read.
        if span is not None:
            qmin = jnp.asarray(span[0], dtype) - margin
            qmax = jnp.asarray(span[1], dtype) + margin
        else:
            c = coeffs_lon.astype(dtype)                       # [K, 6]
            tq = (jnp.arange(T, dtype=dtype) * dtype(dt))[None, :]
            s_all = (((((c[:, 5:6] * tq + c[:, 4:5]) * tq + c[:, 3:4]) * tq
                       + c[:, 2:3]) * tq + c[:, 1:2]) * tq + c[:, 0:1])
            lens = traj_len.astype(jnp.int32)
            act = jnp.arange(T, dtype=jnp.int32)[None, :] < lens[:, None]
            s_act_min = jnp.min(jnp.where(act, s_all, jnp.inf))
            s_act_max = jnp.max(jnp.where(act, s_all, -jnp.inf))
            tau_last = (lens - 1).astype(dtype) * dtype(dt)    # [K]
            sl = ((((c[:, 5] * tau_last + c[:, 4]) * tau_last + c[:, 3])
                   * tau_last + c[:, 2]) * tau_last + c[:, 1]) * tau_last \
                + c[:, 0]
            sd = (((5.0 * c[:, 5] * tau_last + 4.0 * c[:, 4]) * tau_last
                   + 3.0 * c[:, 3]) * tau_last + 2.0 * c[:, 2]) * tau_last \
                + c[:, 1]
            t_ext = (T - lens).astype(dtype) * dtype(dt)
            s_ext_hi = jnp.max(sl + t_ext * jnp.maximum(sd, 0.0))
            s_ext_lo = jnp.min(sl + t_ext * jnp.minimum(sd, 0.0))
            qmin = jnp.minimum(s_act_min, s_ext_lo) - margin
            qmax = jnp.maximum(s_act_max, s_ext_hi) + margin

        s_col_full = table[:, 0]
        i0 = jnp.clip(jnp.sum(s_col_full <= qmin).astype(jnp.int32) - 1,
                      0, P - W)
        s_top = jax.lax.dynamic_slice_in_dim(
            s_col_full, i0 + W - 1, 1)[0]
        window_ok = qmax < s_top
        window = jax.lax.dynamic_slice_in_dim(table, i0, W, axis=0)
        pair_w = jax.lax.dynamic_slice(pre.pair, (0, i0), (48, W))
        # the delta-stack's column i0 is a difference vs row i0-1; the
        # window's telescoping needs the ABSOLUTE band there (exactly what
        # band_delta_tab builds as its own column 0)
        band_w = jnp.concatenate(
            [jax.lax.dynamic_slice(pre.band_abs, (0, i0), (6, 1)),
             jax.lax.dynamic_slice(pre.band_delta, (0, i0 + 1), (6, W - 1))],
            axis=1)
        return jax.lax.cond(
            window_ok,
            lambda: call_kernel(window, pair_w, band_w),
            lambda: call_kernel(table, pre.pair, pre.band_delta))

    # ---- PER-STEP table windows (long horizons) -------------------------
    # Requires per-step bounds from the caller (grid.candidate_lon_span_steps
    # / corridor_lon_span_steps).  Enabled only where the win is real: long
    # horizons (the [rows, TILE] compare/cast streaming dominates there) and
    # tables big enough that the full-table VMEM residency is still modest.
    use_perstep = (span_steps is not None and T > 32
                   and P >= _PS_MAX + _LANE and P <= 4096)
    if use_perstep:
        ws_sched = _ps_chunk_sched(T, _PS_CHUNK)
        nch = len(ws_sched)
        pad_t = nch * _PS_CHUNK - T
        lo_t = jnp.asarray(span_steps[0], dtype) - margin      # [T]
        hi_t = jnp.asarray(span_steps[1], dtype) + margin
        if pad_t:
            lo_t = jnp.concatenate([lo_t, jnp.full((pad_t,), jnp.inf, dtype)])
            hi_t = jnp.concatenate([hi_t, jnp.full((pad_t,), -jnp.inf,
                                                   dtype)])
        # union bounds per _PS_CHUNK-step window chunk
        lo_t = jnp.min(lo_t.reshape(nch, _PS_CHUNK), axis=1)   # [nch]
        hi_t = jnp.max(hi_t.reshape(nch, _PS_CHUNK), axis=1)
        s_col_full = table[:, 0]
        ws_arr = jnp.asarray(ws_sched, jnp.int32)
        cnt = jnp.sum(s_col_full[:, None] <= lo_t[None, :],
                      axis=0).astype(jnp.int32)                # [nch]
        i0 = jnp.clip(cnt - 1, 0, P - ws_arr - 1)
        i0 = (i0 // 16) * 16          # bf16 sublane slice alignment
        # coverage: every step's query range must sit strictly below the
        # window's successor top s[i0+ws] (rounding i0 DOWN only widens the
        # low side; the low side never needs a check — queries below s[0]
        # belong to domain-masked candidates, matching full-table gathers)
        top = jnp.take(s_col_full, i0 + ws_arr)
        all_ok = jnp.all(hi_t < top)
        wins = i0[None, :]                                     # [1, nch] i32
        winf = jnp.stack([jnp.take(s_col_full, i0),
                          jnp.take(table[:, 4], i0),
                          jnp.take(table[:, 5], i0)], axis=0)  # [3, nch]
        out = jax.lax.cond(
            all_ok,
            lambda: call_kernel_ps(wins, winf, ws_sched),
            dispatch_cycle)
    else:
        out = dispatch_cycle()
    return out[0][0, :K], out[1][0, :K], out[2][0, :K]
def score_fleet_pallas(*args, **kwargs):
    """(masked_costs, kin_costs) each [F, K] for a fleet of planning problems.

    x64-disabling wrapper around :func:`_score_fleet_pallas` (Mosaic rejects
    64-bit layouts; the context manager must wrap the jit CALL, not the body).
    """
    with jax.enable_x64(False):
        return _score_fleet_pallas(*args, **kwargs)


@functools.partial(jax.jit, static_argnames=("n_steps", "check_flags",
                                             "has_desired_s", "interpret",
                                             "tile_k"))
def _score_fleet_pallas(coeffs_lon: jnp.ndarray, coeffs_lat: jnp.ndarray,
                        traj_len: jnp.ndarray, goal_valid: jnp.ndarray,
                        packed_tables: jnp.ndarray,
                        obs_pose: jnp.ndarray, obs_half_ext: jnp.ndarray,
                        obs_valid: jnp.ndarray,
                        veh_stack: jnp.ndarray,
                        x0_orientation: jnp.ndarray, dt: float,
                        low_vel: jnp.ndarray, desired_speed: jnp.ndarray,
                        desired_d: jnp.ndarray, w_a: jnp.ndarray,
                        ref_s_last: jnp.ndarray,
                        desired_s: jnp.ndarray | None = None,
                        obs_radius: jnp.ndarray | None = None,
                        poly_table: jnp.ndarray | None = None,
                        span: jnp.ndarray | None = None,
                        pre: ScorerTables | None = None,
                        *, n_steps: int,
                        check_flags: tuple = (True,) * 5,
                        has_desired_s: bool = False,
                        interpret: bool = False,
                        tile_k: int | None = None) -> jnp.ndarray:
    """Fleet-batched fused scoring: one pallas grid over (problem, K-tile);
    returns (masked_costs, kin_costs) each [F, K] (see
    ``_score_candidates_pallas`` for the two rows' semantics).

    Every per-problem quantity carries a leading F axis:
      coeffs_lon/lat [F, K, 6], traj_len/goal_valid [F, K],
      packed_tables [F, P, 12] (pack each problem with ``pack_ref_tables``
      and sentinel-pad to a common P), obs_pose [F, M, T, 3],
      obs_half_ext [F, M, 2], obs_valid [F, M, T] (pad with valid=False),
      obs_radius [F, M] optional (disc rows: radius > 0, half_ext (0, 0)),
      veh_stack [F, 8] (VehicleArrays leaves in field order),
      x0_orientation/low_vel/desired_speed/desired_d/w_a/ref_s_last [F].

    The kernel grid is (F, K_pad // TILE); BlockSpec index maps route each
    program instance to its problem's tables/obstacles/scalars, so F
    heterogeneous planning problems score in one launch with zero host
    round-trips.  ``has_desired_s`` (stopping-mode cost term) is a static
    structural flag for the whole fleet.
    """
    dtype = jnp.float32
    F, K = coeffs_lon.shape[0], coeffs_lon.shape[1]
    T = n_steps + 1
    P = packed_tables.shape[1]
    M = obs_pose.shape[1]

    tile = tile_k or (_TILE_K if T <= 32 else 256)
    K_pad = ((K + tile - 1) // tile) * tile
    pad = K_pad - K
    cl = jnp.pad(jnp.swapaxes(coeffs_lon, 1, 2).astype(dtype),
                 ((0, 0), (0, 0), (0, pad)))                     # [F, 6, Kp]
    ca = jnp.pad(jnp.swapaxes(coeffs_lat, 1, 2).astype(dtype),
                 ((0, 0), (0, 0), (0, pad)))
    tl = jnp.pad(traj_len.astype(dtype)[:, None, :], ((0, 0), (0, 0), (0, pad)))
    gv = jnp.pad(goal_valid.astype(dtype)[:, None, :], ((0, 0), (0, 0), (0, pad)))

    if M > 0:
        if obs_radius is None:
            obs_radius = jnp.zeros((F, M), dtype)
        obs = jnp.concatenate(
            [obs_pose.astype(dtype),
             jnp.broadcast_to(obs_half_ext[:, :, None, :],
                              (F, M, T, 2)).astype(dtype),
             obs_valid.astype(dtype)[..., None],
             jnp.broadcast_to(obs_radius.astype(dtype)[:, :, None, None],
                              (F, M, T, 1))], axis=-1)           # [F, M, T, 7]
        # sublane-major per-problem layout [F, T, M*7] (see the
        # single-problem prelude)
        obs = jnp.transpose(obs, (0, 2, 1, 3)).reshape(F, T, M * _OBS_COLS)
    else:
        obs = jnp.zeros((F, T, _OBS_COLS), dtype)

    scalars = jnp.zeros((F, 1, _NUM_SCALARS), dtype)
    veh_stack = veh_stack.astype(dtype)
    values = [
        (_S_WHEELBASE, veh_stack[:, 0]), (_S_WB_REAR, veh_stack[:, 1]),
        (_S_A_MAX, veh_stack[:, 2]), (_S_V_SWITCH, veh_stack[:, 3]),
        (_S_KAPPA_MAX, veh_stack[:, 4]), (_S_V_DELTA_MAX, veh_stack[:, 5]),
        (_S_HALF_LEN, veh_stack[:, 6]), (_S_HALF_WID, veh_stack[:, 7]),
        (_S_X0_THETA, x0_orientation), (_S_DT, jnp.full((F,), dt, dtype)),
        (_S_LOW_VEL, low_vel), (_S_DESIRED_V, desired_speed),
        (_S_DESIRED_D, desired_d), (_S_W_A, w_a),
        (_S_REF_S_LAST, ref_s_last),
        (_S_DESIRED_S, desired_s if desired_s is not None
         else jnp.zeros((F,), dtype))]
    for slot, value in values:
        scalars = scalars.at[:, 0, slot].set(jnp.asarray(value, dtype))

    if pre is None:
        pre = precompute_fleet_scorer_tables(packed_tables)
    tables = pre.table                                           # [F, P, 12]

    # polygon group: [F, Mp, T, 2V + 1] (pack with interleaved world vertex
    # coords + validity); dummy when the fleet has no polygon obstacles
    if poly_table is None:
        poly_table = jnp.zeros((F, 1, T, 3), dtype)
        Mp, Vp = 0, 1
    else:
        Mp = poly_table.shape[1]
        Vp = (poly_table.shape[-1] - 1) // 2
    poly = poly_table.astype(dtype)

    def call_kernel(tabs, pair_stack, band):
        """pallas_call over (possibly windowed) [F, Pw, 12] / [F, 48, Pw] /
        [F, 6, Pw] operands sliced from the precomputed ScorerTables."""
        Pw = tabs.shape[1]
        scal_tab = scalars.at[:, 0, _S_TABLE_S0].set(tabs[:, 0, 0])
        grid = (F, K_pad // tile)
        return pl.pallas_call(
            functools.partial(_fleet_scoring_kernel, n_steps=n_steps,
                              n_obstacles=M, n_polys=Mp, n_poly_verts=Vp,
                              check_flags=check_flags,
                              has_desired_s=has_desired_s),
            out_shape=(jax.ShapeDtypeStruct((F, 1, K_pad), dtype),
                       jax.ShapeDtypeStruct((F, 1, K_pad), dtype),
                       jax.ShapeDtypeStruct((F, 1, K_pad), dtype)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, _NUM_SCALARS), lambda f, i: (f, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 6, tile), lambda f, i: (f, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 6, tile), lambda f, i: (f, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda f, i: (f, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda f, i: (f, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Pw, _NUM_COLS), lambda f, i: (f, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * _PAIR_ROWS, Pw), lambda f, i: (f, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 6, Pw), lambda f, i: (f, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, max(M, 1) * _OBS_COLS),
                             lambda f, i: (f, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, max(Mp, 1), T, poly.shape[-1]),
                             lambda f, i: (f, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((1, 1, tile), lambda f, i: (f, 0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 1, tile), lambda f, i: (f, 0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 1, tile), lambda f, i: (f, 0, i),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(scal_tab, cl, ca, tl, gv, tabs, pair_stack, band, obs, poly)

    W = _WINDOW_ROWS if T <= 32 else _WINDOW_ROWS_LONG
    if P <= W:
        out = call_kernel(tables, pre.pair, pre.band_delta)
    else:
        # per-problem dynamic table windows (see _score_candidates_pallas;
        # bounds from the caller's per-problem ``span`` [F, 2] or a dense
        # XLA eval of the lon polynomials; lax.cond full-table fallback
        # keeps exactness when any problem's span cannot fit W contiguous
        # rows)
        margin = (veh_stack[:, 1] + veh_stack[:, 6] + veh_stack[:, 7]
                  + dtype(1.0))                              # [F]
        if span is not None:
            qmin = span[:, 0].astype(dtype) - margin
            qmax = span[:, 1].astype(dtype) + margin
        else:
            c = coeffs_lon.astype(dtype)                     # [F, K, 6]
            tq = (jnp.arange(T, dtype=dtype) * dtype(dt))[None, None, :]
            s_all = (((((c[..., 5:6] * tq + c[..., 4:5]) * tq
                        + c[..., 3:4]) * tq
                       + c[..., 2:3]) * tq + c[..., 1:2]) * tq + c[..., 0:1])
            lens = traj_len.astype(jnp.int32)                # [F, K]
            act = jnp.arange(T, dtype=jnp.int32)[None, None, :] \
                < lens[..., None]
            s_min_f = jnp.min(jnp.where(act, s_all, jnp.inf), axis=(1, 2))
            s_max_f = jnp.max(jnp.where(act, s_all, -jnp.inf), axis=(1, 2))
            tau_last = (lens - 1).astype(dtype) * dtype(dt)  # [F, K]
            sl = ((((c[..., 5] * tau_last + c[..., 4]) * tau_last
                    + c[..., 3])
                   * tau_last + c[..., 2]) * tau_last + c[..., 1]) \
                * tau_last + c[..., 0]
            sd = (((5.0 * c[..., 5] * tau_last + 4.0 * c[..., 4]) * tau_last
                   + 3.0 * c[..., 3]) * tau_last + 2.0 * c[..., 2]) \
                * tau_last + c[..., 1]
            t_ext = (T - lens).astype(dtype) * dtype(dt)
            ext_hi = jnp.max(sl + t_ext * jnp.maximum(sd, 0.0), axis=1)
            ext_lo = jnp.min(sl + t_ext * jnp.minimum(sd, 0.0), axis=1)
            qmin = jnp.minimum(s_min_f, ext_lo) - margin
            qmax = jnp.maximum(s_max_f, ext_hi) + margin

        s_cols = tables[:, :, 0]                             # [F, P]
        i0 = jnp.clip(jnp.sum(s_cols <= qmin[:, None],
                              axis=1).astype(jnp.int32) - 1,
                      0, P - W)
        s_top = jnp.take_along_axis(
            s_cols, (i0 + W - 1)[:, None], axis=1)[:, 0]
        window_ok = jnp.all(qmax < s_top)
        windows = jax.vmap(
            lambda t, i: jax.lax.dynamic_slice_in_dim(
                t, i, W, axis=0))(tables, i0)
        pairs_w = jax.vmap(
            lambda p, i: jax.lax.dynamic_slice(p, (0, i), (48, W)))(
                pre.pair, i0)
        # delta column i0 is a difference vs row i0-1; the window needs the
        # ABSOLUTE band there (band_delta_tab's own column-0 construction)
        bands_w = jnp.concatenate(
            [jax.vmap(lambda b, i: jax.lax.dynamic_slice(
                b, (0, i), (6, 1)))(pre.band_abs, i0),
             jax.vmap(lambda b, i: jax.lax.dynamic_slice(
                 b, (0, i + 1), (6, W - 1)))(pre.band_delta, i0)], axis=2)
        out = jax.lax.cond(
            window_ok,
            lambda: call_kernel(windows, pairs_w, bands_w),
            lambda: call_kernel(tables, pre.pair, pre.band_delta))
    return out[0][:, 0, :K], out[1][:, 0, :K], out[2][:, 0, :K]


def pack_veh_stack(veh: VehicleArrays) -> jnp.ndarray:
    """[F, 8] vehicle-parameter stack for ``score_fleet_pallas`` from a
    VehicleArrays whose leaves are [F] (parallel.fleet.FleetScene.veh)."""
    return jnp.stack([veh.wheelbase, veh.wb_rear_axle, veh.a_max,
                      veh.v_switch, veh.kappa_max, veh.v_delta_max,
                      veh.half_length, veh.half_width],
                     axis=-1).astype(jnp.float32)
