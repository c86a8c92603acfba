"""Iterative IK solvers: damped least squares and box-constrained QP.

The reference ships three IK backends selected in wb_interface.py:10-11:

* ``inverse_kinematics_numeric_mujoco.py:34-122`` — damped least squares over a
  stacked 12-DoF MuJoCo Jacobian, 5 iterations, crossing the Python<->C boundary per
  iteration;
* ``inverse_kinematics_numeric_adam.py:15-102`` — the same scheme on adam's CasADi
  kinematics;
* ``inverse_kinematics_qp.py:79-116`` — a CasADi Opti + ipopt NLP over the full
  configuration with joint limits.

Here the analytic closed-form IK (leg_ik.py) is the production default; these two
solvers cover the same API surface for robots whose leg geometry has no closed form,
and they run entirely on-device:

* :class:`NumericIK` — damped-LS Gauss-Newton on the analytic FK, a fixed 5-iteration
  `lax.fori_loop` (one fused kernel instead of 5 host round trips);
* :class:`QPIK` — per-iteration box-constrained QP ``min ||J dq - e||^2 + lam||dq||^2
  s.t. lb <= q + dq <= ub`` solved with the same interior-point kernel as the MPC
  (controllers/gradient/qp.py), so joint limits are hard constraints.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RobotParams
from .leg_ik import SIDE_SIGN, LegKinematics


class NumericIK:
    """Damped least-squares IK over all 4 legs (12 DoF), fully on-device.

    Counterpart of InverseKinematicsNumeric (reference
    inverse_kinematics_numeric_mujoco.py:57-122): fixed iteration count, damping
    ``lam`` on the 3x3 normal equations, iterates from a nominal crouch posture.
    """

    def __init__(self, robot: RobotParams, iterations: int = 5, damping: float = 1e-3):
        self.legs = LegKinematics(robot)
        self.iterations = iterations
        self.damping = damping
        # Nominal posture seed: feet directly under the hips at hip_height.
        seed_p = jnp.tile(jnp.asarray([0.0, 0.0, -robot.hip_height], jnp.float32),
                          (4, 1))
        seed_p = seed_p.at[:, 1].add(jnp.asarray(SIDE_SIGN) * robot.hip_offset_y)
        self.q_seed = self.legs.ik_all(seed_p)
        self._q_last = self.q_seed  # warm start across ticks (the reference seeds
        # from the measured joint state, inverse_kinematics_numeric_mujoco.py:57-77)
        self._solve = jax.jit(self._solve_impl)

    def _solve_impl(self, p_hip, q0):
        """p_hip (4, 3) hip-frame targets, q0 (4, 3) initial guess -> (4, 3)."""
        side = jnp.asarray(SIDE_SIGN)
        lam = self.damping * jnp.eye(3)

        def body(_, q):
            e = p_hip - self.legs._fk_all(q, side)  # (4, 3)
            J = self.legs._jac(q, side)  # (4, 3, 3)
            JtJ = jnp.einsum("lji,ljk->lik", J, J) + lam  # (4, 3, 3)
            rhs = jnp.einsum("lji,lj->li", J, e)
            dq = jnp.linalg.solve(JtJ, rhs[..., None])[..., 0]
            return q + dq

        return jax.lax.fori_loop(0, self.iterations, body, q0)

    def solve_hip_frame(self, p_hip, q0=None):
        q0 = self.q_seed if q0 is None else jnp.asarray(q0, jnp.float32).reshape(4, 3)
        return self._solve(jnp.asarray(p_hip, jnp.float32), q0)

    def compute_solution(self, base_pos, base_rpy, des_foot_FL, des_foot_FR,
                         des_foot_RL, des_foot_RR):
        """Reference-compatible entry: world-frame targets -> 12 joint angles."""
        from ..utils.frames import euler_xyz_to_rot

        R = euler_xyz_to_rot(jnp.asarray(base_rpy))
        feet = jnp.stack([jnp.asarray(des_foot_FL).reshape(3),
                          jnp.asarray(des_foot_FR).reshape(3),
                          jnp.asarray(des_foot_RL).reshape(3),
                          jnp.asarray(des_foot_RR).reshape(3)])
        hips = self.legs.hips_world(jnp.asarray(base_pos), R)
        p_hip = jnp.einsum("ij,lj->li", R.T, feet - hips)
        q = self.solve_hip_frame(p_hip, q0=self._q_last)
        self._q_last = q
        return np.asarray(q).reshape(12)


class QPIK:
    """Sequential-QP IK with hard joint-limit box constraints.

    Counterpart of InverseKinematicsQP (reference inverse_kinematics_qp.py:79-116,
    CasADi Opti + ipopt); each Gauss-Newton step is a 3-variable QP per leg solved by
    the MPC's interior-point kernel, vmapped over the 4 legs.
    """

    def __init__(self, robot: RobotParams, iterations: int = 5, reg: float = 1e-4,
                 qp_iters: int = 14):
        from ..controllers.gradient.qp import pdip_solve

        self.legs = LegKinematics(robot)
        self.iterations = iterations
        self.reg = reg
        self.lb = jnp.asarray([l for l, _ in robot.joint_limits], jnp.float32)
        self.ub = jnp.asarray([u for _, u in robot.joint_limits], jnp.float32)
        seed_p = jnp.tile(jnp.asarray([0.0, 0.0, -robot.hip_height], jnp.float32),
                          (4, 1))
        seed_p = seed_p.at[:, 1].add(jnp.asarray(SIDE_SIGN) * robot.hip_offset_y)
        seed = self.legs.ik_all(seed_p)
        self.q_seed = jnp.clip(seed, self.lb, self.ub)
        self._q_last = self.q_seed
        self._pdip = pdip_solve
        self._qp_iters = qp_iters
        self._solve = jax.jit(self._solve_impl)

    def _solve_impl(self, p_hip, q0):
        side = jnp.asarray(SIDE_SIGN)
        I3 = jnp.eye(3)
        C = jnp.concatenate([I3, -I3], axis=0)  # dq <= ub - q; -dq <= q - lb

        def leg_qp(J, e, q):
            Hm = J.T @ J + self.reg * I3
            g = -J.T @ e
            d = jnp.concatenate([self.ub - q, q - self.lb])
            sol = self._pdip(Hm, g, C, d, iters=self._qp_iters)
            return sol.z

        v_leg_qp = jax.vmap(leg_qp)

        def body(_, q):
            e = p_hip - self.legs._fk_all(q, side)
            J = self.legs._jac(q, side)
            dq = v_leg_qp(J, e, q)
            return jnp.clip(q + dq, self.lb, self.ub)

        return jax.lax.fori_loop(0, self.iterations, body, q0)

    def solve_hip_frame(self, p_hip, q0=None):
        q0 = self.q_seed if q0 is None else jnp.asarray(q0, jnp.float32).reshape(4, 3)
        return self._solve(jnp.asarray(p_hip, jnp.float32), q0)

    def compute_solution(self, base_pos, base_rpy, des_foot_FL, des_foot_FR,
                         des_foot_RL, des_foot_RR):
        from ..utils.frames import euler_xyz_to_rot

        R = euler_xyz_to_rot(jnp.asarray(base_rpy))
        feet = jnp.stack([jnp.asarray(des_foot_FL).reshape(3),
                          jnp.asarray(des_foot_FR).reshape(3),
                          jnp.asarray(des_foot_RL).reshape(3),
                          jnp.asarray(des_foot_RR).reshape(3)])
        hips = self.legs.hips_world(jnp.asarray(base_pos), R)
        p_hip = jnp.einsum("ij,lj->li", R.T, feet - hips)
        q = self.solve_hip_frame(p_hip, q0=self._q_last)
        self._q_last = q
        return np.asarray(q).reshape(12)
