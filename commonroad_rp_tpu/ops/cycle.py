"""The fused per-level planning-cycle program (single jitted call).

This is the device heart of the planner: one compiled XLA program per
(candidate-count, horizon, mode) signature that takes the candidate batch and
scene tables and returns the selected optimal candidate plus dense
feasibility/cost/collision masks and statistics.  It replaces the reference's
entire ``_get_optimal_trajectory`` stage chain — multiprocessing kinematic
check, Python sort, lazy collision iteration (reference:
commonroad_rp/reactive_planner.py:1065-1136) — with mask + argmin semantics
(SURVEY.md section 7): compute everything dense, mask infeasible candidates
with +inf cost, take one argmin.

Selection statistics are derived to match the reference's lazy iteration:
``infeasible_count_collision`` counts kinematically feasible candidates that
collide AND rank before the winner in cost order — exactly the candidates the
reference's sorted loop would have visited (:1031-1046).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from commonroad_rp_tpu.ops import collision as collision_ops
from commonroad_rp_tpu.ops import cost as cost_ops
from commonroad_rp_tpu.ops import frenet as frenet_ops
from commonroad_rp_tpu.ops import kinematics


class CostParams(NamedTuple):
    """Traced cost-function parameters (models.cost_functions.DefaultCostFunction)."""

    w_a: jnp.ndarray
    desired_d: jnp.ndarray
    desired_speed: jnp.ndarray   # ignored unless has_desired_speed
    desired_s: jnp.ndarray       # ignored unless has_desired_s


class LevelResult(NamedTuple):
    """Output of one level evaluation (everything the host needs)."""

    found: jnp.ndarray            # scalar bool: any feasible & collision-free
    best_idx: jnp.ndarray         # scalar int32 (valid iff found)
    best_cost: jnp.ndarray        # scalar (inf if not found)
    feasible: jnp.ndarray         # [K] kinematic+domain feasibility
    collides: jnp.ndarray         # [K] collision mask
    reason: jnp.ndarray           # [K] infeasibility reason codes
    costs: jnp.ndarray            # [K] costs (all candidates)
    n_infeasible_kinematics: jnp.ndarray  # scalar int32
    n_collision_before_best: jnp.ndarray  # scalar int32 (lazy-order count)
    rollout: kinematics.RolloutResult     # dense [K, T] state arrays


@functools.partial(
    jax.jit,
    static_argnames=("dt", "n_steps", "low_vel_mode", "cost_structure",
                     "constraint_flags", "boundary_mode", "continuous_check"))
def evaluate_level(coeffs_lon: jnp.ndarray,
                   coeffs_lat: jnp.ndarray,
                   traj_len: jnp.ndarray,
                   goal_valid: jnp.ndarray,
                   ref: frenet_ops.RefPathTables,
                   veh: kinematics.VehicleArrays,
                   obstacles: collision_ops.ObstacleArrays,
                   boundary: Optional[collision_ops.BoundaryArrays],
                   corridor: Optional[collision_ops.CorridorArrays],
                   x0_orientation: jnp.ndarray,
                   cost_params: CostParams,
                   *,
                   dt: float,
                   n_steps: int,
                   low_vel_mode: bool,
                   cost_structure: tuple,
                   constraint_flags: tuple,
                   boundary_mode: str,
                   continuous_check: bool = False) -> LevelResult:
    """Evaluate one sampling level end to end on device.

    ``goal_valid`` [K] pre-masks candidates (filter_goals_behind semantics,
    trajectories.py:545-550 — all-true in velocity mode).
    ``cost_structure`` is the static cost signature
    (models.cost_functions.*.structure); ``constraint_flags`` the 5-tuple of
    active kinematic constraints in reference order.  ``boundary_mode``
    selects the road-boundary check: 'corridor' (fast d-band gathers),
    'segments' (exact OBB-vs-segment SAT), or 'none'.
    """
    cv, ca, ck, ckd, cy = constraint_flags
    rollout = kinematics.rollout(
        coeffs_lon, coeffs_lat, traj_len, ref, veh, x0_orientation,
        dt, n_steps, low_vel_mode,
        check_velocity=cv, check_acceleration=ca, check_kappa=ck,
        check_kappa_dot=ckd, check_yaw_rate=cy)

    kind = cost_structure[0]
    if kind == "default":
        _, has_speed, has_s = cost_structure
        costs = cost_ops.default_cost(
            rollout, w_a=cost_params.w_a, desired_d=cost_params.desired_d,
            desired_speed=cost_params.desired_speed if has_speed else None,
            desired_s=cost_params.desired_s if has_s else None)
    elif kind == "fail_safe":
        costs = cost_ops.fail_safe_cost(rollout)
    else:
        raise ValueError(f"unknown cost structure {cost_structure}")

    collides = collision_ops.check_collisions(
        rollout.x, rollout.y, rollout.theta_gl, obstacles,
        boundary if boundary_mode == "segments" else None,
        veh.half_length, veh.half_width, veh.wb_rear_axle)
    if boundary_mode == "corridor":
        collides = collides | collision_ops.check_corridor(
            rollout.s, rollout.d, rollout.theta_cl, ref.s, corridor,
            veh.half_length, veh.half_width, veh.wb_rear_axle)
    if continuous_check:
        # swept-OBB pass between consecutive steps (reactive_planner.py:1049-1058)
        collides = collides | collision_ops.check_collisions_continuous(
            rollout.x, rollout.y, rollout.theta_gl, obstacles,
            veh.half_length, veh.half_width, veh.wb_rear_axle)

    feasible = rollout.feasible & goal_valid
    ok = feasible & ~collides
    inf = jnp.asarray(jnp.inf, dtype=costs.dtype)
    masked = jnp.where(ok, costs, inf)
    best_idx = jnp.argmin(masked).astype(jnp.int32)
    best_cost = masked[best_idx]
    found = jnp.any(ok)

    # goal-filtered candidates are removed from the bundle BEFORE the
    # kinematic check in the reference (reactive_planner.py:1076-1077), so
    # they do not count as kinematically infeasible
    n_inf_kin = jnp.sum(goal_valid & ~rollout.feasible).astype(jnp.int32)
    # lazy-iteration collision count: feasible, colliding, cheaper than winner
    n_coll = jnp.sum(feasible & collides & (costs < best_cost)).astype(jnp.int32)
    # if nothing survives, the lazy loop visits every feasible candidate
    n_coll_nofind = jnp.sum(feasible & collides).astype(jnp.int32)
    n_coll = jnp.where(found, n_coll, n_coll_nofind)

    return LevelResult(found=found, best_idx=best_idx, best_cost=best_cost,
                       feasible=feasible, collides=collides,
                       reason=rollout.reason, costs=costs,
                       n_infeasible_kinematics=n_inf_kin,
                       n_collision_before_best=n_coll,
                       rollout=rollout)


@functools.partial(jax.jit, static_argnames=())
def gather_candidate(rollout: kinematics.RolloutResult, idx: jnp.ndarray):
    """Extract one candidate's [T] state arrays (small host transfer)."""
    take = lambda arr: arr[idx]
    return {
        "s": take(rollout.s), "s_dot": take(rollout.s_dot),
        "s_ddot": take(rollout.s_ddot), "d": take(rollout.d),
        "d_dot": take(rollout.d_dot), "d_ddot": take(rollout.d_ddot),
        "theta_cl": take(rollout.theta_cl), "x": take(rollout.x),
        "y": take(rollout.y), "theta_gl": take(rollout.theta_gl),
        "v": take(rollout.v), "a": take(rollout.a),
        "kappa_gl": take(rollout.kappa_gl), "kappa_dot": take(rollout.kappa_dot),
    }
