"""Gradient-MPC variant family on a generalized augmented-state RTI core.

The reference implements each variant as a separate ~1800-line acados controller
with its own CasADi model:

* input_rates (controllers/gradient/input_rates/centroidal_model_input_rates.py:79-125)
  — GRFs move into the state, inputs become GRF rates (smooth force profiles);
* lyapunov (lyapunov/centroidal_model_lyapunov.py:216-263,
  centroidal_nmpc_lyapunov.py:299-341) — transverse states z1/z2 + adaptive phi with
  nominal stabilizing force F* = m(-(K1+K2) z2 + K1^2 z1 - g) - phi redistributed to
  stance legs, a Lyapunov-decrease constraint V_dot <= 0 and a residual bound
  eta^T eta <= ub;
* collaborative (collaborative/centroidal_model_collaborative.py:250-275) — a 6-dim
  passive-arm wrench state with spring dynamics f_dot = -K_bar v_base entering the SRB
  wrench balance.

Here each variant only declares (a) its augmented discrete dynamics on top of the
shared SRB fd, (b) cost diagonals/references, and (c) a stage inequality residual
c(x, u) <= 0. One generalized Gauss-Newton RTI core linearizes dynamics AND
constraints with jax.jacfwd, condenses to a dense QP over the input sequence (state
constraint rows map through the prediction operator), and solves with the same
fixed-iteration interior point (qp.py). Everything stays jittable and vmappable over
gait candidates.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config
from ...dynamics.srbd import SRBDParams, fd, make_params
from .ocp import OCPDims, build_feet_trajectory, q_diag_gradient, r_diag_gradient


@dataclasses.dataclass(frozen=True)
class VariantSpec:
    """Static description of one gradient-MPC variant."""

    name: str
    nx: int  # augmented state dimension (first 12 = base state)
    nu: int
    # dynamics(x_aug, u, feet, contact, dt, wrench6) -> x_aug_next (discrete);
    # wrench6 is the per-stage external [force, torque] estimate (world frame)
    dynamics: Callable
    # stage_ineq(x_aug, u, contact, fz_max, feet, k) -> residual c <= 0 (fixed
    # length); k is the stage index (for stage-dependent bounds)
    stage_ineq: Callable
    n_ineq: int
    q_diag: np.ndarray  # (nx,)
    r_diag: np.ndarray  # (nu,)
    # grfs(u, x_aug) -> (12,) force vector applied at the feet
    grfs_of: Callable
    # Levenberg-Marquardt scale: the base lm (1e-3) is tuned for force-scale inputs
    # (O(100 N)); rate-scale inputs (O(1000 N/s)) need it shrunk or it acts as a
    # dominant hidden smoothness penalty.
    lm_scale: float = 1.0
    # Per-stage soft-constraint mask (n_ineq,): True rows get L1/L2 slack penalties
    # (acados zl/Zl soft h-constraints, centroidal_nmpc_nominal.py:147-163). None =
    # all rows hard.
    soft_mask: np.ndarray | None = None


def _add_wrench(d, x, wk, srbd):
    """Add a world-frame external [force, torque] to the SRB state derivative
    (reference centroidal_model_nominal.py external-wrench params)."""
    from ...utils.frames import world_to_body_rot

    d = d.at[3:6].add(wk[:3] / srbd.mass)
    tau_b = world_to_body_rot(x[6:9]) @ wk[3:]
    return d.at[9:12].add(jnp.asarray(srbd.inertia_inv) @ tau_b)


def _cone_residual(f12, contact, fz_max, mu, grf_min, stance_min: float = 0.0):
    """Friction-cone + fz-bound residuals for a 12-vector of GRFs: 6 rows/leg.

    ``stance_min`` (config gradient.stance_min_force) raises the fz lower bound
    on STANCE legs only — swing legs keep fz >= grf_min."""
    rows = []
    for leg in range(4):
        fx, fy, fz = f12[leg * 3], f12[leg * 3 + 1], f12[leg * 3 + 2]
        rows += [
            grf_min + stance_min * contact[leg] - fz,
            fz - fz_max[leg],
            fx - mu * fz,
            -fx - mu * fz,
            fy - mu * fz,
            -fy - mu * fz,
        ]
    return jnp.stack(rows)


# ---------------------------------------------------------------------------
def make_input_rates_spec(cfg: Config, srbd: SRBDParams) -> VariantSpec:
    """GRFs in the state, inputs are GRF rates (reference input_rates family)."""
    mu, grf_min = cfg.mpc.mu, cfg.mpc.grf_min
    smf = cfg.mpc.gradient.stance_min_force
    q = np.concatenate([q_diag_gradient(), r_diag_gradient(cfg.robot.name)])  # force states
    # Rate cost: stance transitions need O(1e3 N/s) ramps (100 N over a few stages),
    # so the weight must keep rate^2 * r well below the state-error terms or the
    # forces respond too slowly to stand on (observed closed-loop sinking at 1e-4).
    r = np.full(12, 1e-5, dtype=np.float32)

    def dynamics(x, u, feet, contact, dt, wk):
        base, f = x[:12], x[12:]
        d = _add_wrench(fd(base, feet, f.reshape(4, 3), contact, srbd), base, wk, srbd)
        return jnp.concatenate([base + dt * d, f + dt * u])

    def stage_ineq(x, u, contact, fz_max, feet, k):
        return _cone_residual(x[12:], contact, fz_max, mu, grf_min, smf)

    return VariantSpec("input_rates", 24, 12, dynamics, stage_ineq, 24, q, r,
                       grfs_of=lambda u, x: x[12:], lm_scale=1e-3)


def make_collaborative_spec(cfg: Config, srbd: SRBDParams,
                            arm_stiffness=(30.0, 30.0, 0.0)) -> VariantSpec:
    """SRB + passive-arm wrench state (reference collaborative family).

    f_arm (6,): linear x/y components follow -K_bar * v_base_xy, the angular z
    component follows -K_yaw * omega_z (centroidal_model_collaborative.py:255-263);
    when passive_arm_compensation the predicted wrench enters the dynamics (:266-271).
    """
    mu, grf_min = cfg.mpc.mu, cfg.mpc.grf_min
    smf = cfg.mpc.gradient.stance_min_force
    Kx, Ky, _ = arm_stiffness
    K_yaw = 5.0
    # passive_arm_compensation (config.py:163, reference
    # centroidal_model_collaborative.py:266-271): True = the PREDICTED arm-wrench
    # state enters the dynamics; False = the static estimate (the stage wrench
    # parameter) enters instead. The arm state evolves either way.
    passive_arm = cfg.mpc.gradient.passive_arm_compensation
    q = np.concatenate([q_diag_gradient(), np.zeros(6, np.float32)])
    r = r_diag_gradient(cfg.robot.name)

    def dynamics(x, u, feet, contact, dt, wk):
        base, w_arm = x[:12], x[12:]
        d = fd(base, feet, u.reshape(4, 3), contact, srbd)
        if passive_arm:
            # Predicted wrench state: linear part scaled by mass, angular via inertia.
            dv = w_arm[:3] / srbd.mass
            dw = jnp.asarray(srbd.inertia_inv) @ w_arm[3:]
            d = d.at[3:6].add(dv).at[9:12].add(dw)
        else:
            d = _add_wrench(d, base, wk, srbd)
        w_dot = jnp.asarray(
            [-Kx * base[3], -Ky * base[4], 0.0, 0.0, 0.0, 0.0], jnp.float32
        ).at[5].set(-K_yaw * base[11])
        return jnp.concatenate([base + dt * d, w_arm + dt * w_dot])

    def stage_ineq(x, u, contact, fz_max, feet, k):
        return _cone_residual(u, contact, fz_max, mu, grf_min, smf)

    return VariantSpec("collaborative", 18, 12, dynamics, stage_ineq, 24, q, r,
                       grfs_of=lambda u, x: u)


def make_lyapunov_spec(cfg: Config, srbd: SRBDParams) -> VariantSpec:
    """SRB + transverse states z1/z2 + adaptive phi, with the V_dot <= 0 and
    eta^T eta <= ub constraints (reference lyapunov family)."""
    gp = cfg.mpc.gradient
    mu, grf_min = cfg.mpc.mu, cfg.mpc.grf_min
    smf = cfg.mpc.gradient.stance_min_force
    K1 = np.asarray(gp.K_z1, np.float32)
    K2 = np.asarray(gp.K_z2, np.float32)
    ub_res = gp.residual_dynamics_upper_bound
    g_vec = np.array([0.0, 0.0, -cfg.gravity], np.float32)
    q = np.concatenate([q_diag_gradient(), np.zeros(9, np.float32)])
    r = r_diag_gradient(cfg.robot.name)

    def _f_star(z1, z2, phi):
        # (model :216-237): F* = m(-(K1+K2) z2 + K1^2 z1 - g) - phi
        return srbd.mass * (-(K1 + K2) * z2 + K1 * K1 * z1 - g_vec) - phi

    use_decay = cfg.mpc.gradient.use_residual_dynamics_decay

    def dynamics(x, u, feet, contact, dt, wk):
        base, z1, z2, phi = x[:12], x[12:15], x[15:18], x[18:21]
        f = u.reshape(4, 3)
        F_star = _f_star(z1, z2, phi)
        n_st = jnp.maximum(jnp.sum(contact), 1.0)
        # Redistribute the stabilizing force to stance legs (model :240-245).
        f_final = (f + F_star[None, :] / n_st) * contact[:, None]
        d = fd(base, feet, f_final, jnp.ones(4), srbd)
        # linear_com_acc also subtracts phi (model :262).
        d = d.at[3:6].add(-phi)
        d = _add_wrench(d, base, wk, srbd)
        F_delta = jnp.sum(f * contact[:, None], axis=0)
        z1_dot = -K1 * z1 + z2
        z2_dot = -K2 * z2 + (F_delta + F_star) / srbd.mass + g_vec + phi
        phi_dot = -z2
        return jnp.concatenate([base + dt * d, z1 + dt * z1_dot, z2 + dt * z2_dot,
                                phi + dt * phi_dot])

    def stage_ineq(x, u, contact, fz_max, feet, k):
        cone = _cone_residual(u, contact, fz_max, mu, grf_min, smf)
        z1, z2 = x[12:15], x[15:18]
        F_delta = jnp.sum(u.reshape(4, 3) * contact[:, None], axis=0)
        # V_dot <= 0 (controller :299-328).
        v_dot = (-z1 @ (K1 * z1) - z2 @ (K2 * z2) + z1 @ z2
                 + z2 @ F_delta / srbd.mass)
        # eta^T eta <= ub with eta = (rpy, omega) (controller :331-341). With
        # use_residual_dynamics_decay the bound tightens 1/(k+1) along the horizon
        # (reference centroidal_nmpc_lyapunov.py:667-687).
        ub_k = ub_res / (k + 1.0) if use_decay else ub_res
        eta = x[6:12]
        res = eta @ eta - ub_k
        return jnp.concatenate([cone, v_dot[None], res[None]])

    return VariantSpec("lyapunov", 21, 12, dynamics, stage_ineq, 26, q, r,
                       grfs_of=lambda u, x: u)


def make_kinodynamic_spec(cfg: Config, srbd: SRBDParams) -> VariantSpec:
    """SRB + joints (reference kinodynamic family, kinodynamic_model.py:175-236):
    states add 12 joint positions, inputs are 12 joint velocities + 12 GRFs; foot
    positions come from the analytic leg FK instead of being stage parameters, and
    stance feet get world-velocity constraints (controller :303-337). The reference
    needs adam/Pinocchio symbolic kinematics; here the closed-form FK/Jacobian of
    kinematics/leg_ik.py differentiates through jacfwd."""
    from ...kinematics.leg_ik import SIDE_SIGN, LegKinematics
    from ...utils.frames import euler_xyz_to_rot

    kin = LegKinematics(cfg.robot)
    mu, grf_min = cfg.mpc.mu, cfg.mpc.grf_min
    smf = cfg.mpc.gradient.stance_min_force
    side = np.asarray(SIDE_SIGN)
    hip_off = kin.hip_offsets_b  # (4,3) numpy

    q = np.concatenate([q_diag_gradient(), np.full(12, 10.0, np.float32)])
    r = np.concatenate([np.full(12, 1e-3, np.float32),  # joint velocity cost
                        r_diag_gradient(cfg.robot.name)])

    def feet_world(base_pos, rpy, q12):
        R = euler_xyz_to_rot(rpy)
        p_hip = kin.fk(q12.reshape(4, 3), side)  # (4,3) hip frame (vmap-free broadcast)
        return base_pos + (hip_off + p_hip) @ R.T

    def dynamics(x, u, feet_unused, contact, dt, wk):
        base, q12 = x[:12], x[12:]
        qd, grf = u[:12], u[12:]
        feet = feet_world(base[0:3], base[6:9], q12)
        d = fd(base, feet, grf.reshape(4, 3), contact, srbd)
        d = _add_wrench(d, base, wk, srbd)
        return jnp.concatenate([base + dt * d, q12 + dt * qd])

    def stage_ineq(x, u, contact, fz_max, feet_unused, k):
        qd, grf = u[:12], u[12:]
        cone = _cone_residual(grf, contact, fz_max, mu, grf_min, smf)
        # Stance-foot world velocity ~ 0: v = d(feet)/dt along the trajectory.
        base, q12 = x[:12], x[12:]

        def feet_flat(bp, rpy, qq):
            return feet_world(bp, rpy, qq).reshape(-1)

        Jq = jax.jacfwd(lambda qq: feet_flat(base[0:3], base[6:9], qq))(q12)
        Jp = jax.jacfwd(lambda bp: feet_flat(bp, base[6:9], q12))(base[0:3])
        Jr = jax.jacfwd(lambda rr: feet_flat(base[0:3], rr, q12))(base[6:9])
        rpy_rate_approx = x[9:12]  # omega ~ rpy rates to first order
        v_feet = Jq @ qd + Jp @ base[3:6] + Jr @ rpy_rate_approx  # (12,)
        eps = 0.05
        big = 100.0
        relax = (1.0 - jnp.repeat(contact, 3)) * big + eps
        return jnp.concatenate([cone, v_feet - relax, -v_feet - relax])

    return VariantSpec("kinodynamic", 24, 24, dynamics, stage_ineq, 48, q, r,
                       grfs_of=lambda u, x: u[12:])


def make_foothold_spec(cfg: Config, srbd: SRBDParams) -> VariantSpec:
    """Nominal SRB with ON-DEVICE FOOTHOLD OPTIMIZATION (reference nominal OCP's
    full form: nx=30 with 12 foot-position states, nu=24 with 12 foot velocities,
    centroidal_model_nominal.py:24-119; selected by config use_foothold_optimization).

    Foot-velocity inputs are gated by (1 - stance) exactly like the reference model
    (:283-286), so stance feet are pinned and swing feet are decision variables that
    settle on the optimized touchdown location. With use_foothold_constraints the
    foot xy states are box-constrained around the reference foothold (the VFA/TAMOLS
    box emission, visual_foothold_adaptation.py:213-222 and controller :384-427)."""
    gp = cfg.mpc.gradient
    mu, grf_min = cfg.mpc.mu, cfg.mpc.grf_min
    smf = cfg.mpc.gradient.stance_min_force
    hw_x, hw_y = gp.foothold_box_halfwidth
    use_stab = gp.use_static_stability or gp.use_zmp_stability
    support_residual, n_stab = make_support_residual(cfg, srbd)
    q = np.concatenate([q_diag_gradient(), np.full(12, 300.0, np.float32)])
    r = np.concatenate([np.full(12, 1e-4, np.float32),  # foot velocity cost
                        r_diag_gradient(cfg.robot.name)])

    # The per-stage feet array for THIS spec is (4, 4): columns 0:3 are the
    # reference foothold (box centers), column 3 is the STANCE PROXIMITY flag —
    # 1 on the last swing stage before a touchdown. Foot velocity is gated by
    # (1 - stance)(1 - proximity) exactly like the reference model
    # (centroidal_model_nominal.py:283-286): the optimizer cannot move a foothold
    # at the last moment, which is physically unrealizable.
    def dynamics(x, u, feet_aux, contact, dt, wk):
        base, feet12 = x[:12], x[12:]
        v_feet, grf = u[:12], u[12:]
        feet = feet12.reshape(4, 3)
        d = fd(base, feet, grf.reshape(4, 3), contact, srbd)
        d = _add_wrench(d, base, wk, srbd)
        prox = feet_aux[:, 3]
        gate = jnp.repeat((1.0 - contact) * (1.0 - prox), 3)
        return jnp.concatenate([base + dt * d, feet12 + dt * gate * v_feet])

    def stage_ineq(x, u, contact, fz_max, feet_aux, k):
        feet_ref = feet_aux[:, :3]
        cone = _cone_residual(u[12:], contact, fz_max, mu, grf_min, smf)
        rows = [cone]
        if gp.use_foothold_constraints:
            feet = x[12:].reshape(4, 3)
            dx = feet[:, 0] - feet_ref[:, 0]
            dy = feet[:, 1] - feet_ref[:, 1]
            rows.append(jnp.concatenate([dx - hw_x, -dx - hw_x,
                                         dy - hw_y, -dy - hw_y]))
        if use_stab:
            # Stability over the OPTIMIZED foot states, not the fixed reference.
            rows.append(support_residual(x[:12], u[12:], contact,
                                         x[12:].reshape(4, 3)))
        return jnp.concatenate(rows)

    n_ineq = 24 + (16 if gp.use_foothold_constraints else 0) + (n_stab if use_stab else 0)
    # Foothold-box and stability rows are SOFT (acados slacks them with zl/Zl =
    # 1000/1, centroidal_nmpc_nominal.py:147-163); friction cones stay hard.
    soft = np.zeros(n_ineq, bool)
    soft[24:] = True
    return VariantSpec("foothold", 24, 24, dynamics, stage_ineq, n_ineq, q, r,
                       grfs_of=lambda u, x: u[12:],
                       soft_mask=soft if n_ineq > 24 else None)


def make_support_residual(cfg: Config, srbd: SRBDParams):
    """Support-polygon stability residuals (reference
    centroidal_nmpc_nominal.py:277-381 + per-stage activation :880-985):

    * use_static_stability: the CoM xy is the support point;
    * use_zmp_stability: the ZMP approx p = com_xy - (com_z/g) * a_xy with
      a_xy = sum(c_i f_xy,i)/m (linear in the forces given the state).

    Two static shapes, selected by the (jit-static) gait type:

    * trot/pace/bound — ONE row: during 2-stance phases the support point must stay
      within ``margin`` of the stance support segment (the reference's two-sided
      diagonal band, :914-934);
    * crawl gaits — SIX rows, one per foot pair (4 perimeter edges + 2 diagonals,
      :938-969): during 3-stance phases the support point must sit at least
      ``margin`` INSIDE each edge of the stance triangle ("inside" = the side
      holding the stance centroid). This is what makes a statically-walked crawl
      pre-shift the CoM before each lift-off; without it the trunk tips about the
      new support edge the moment the fourth leg leaves (measured on the
      stepping-stones deck: roll-over within one crawl cycle).

    The trot/pace/crawl margins come from config (config.py:263-267). Full stance
    deactivates every row (reference :890-908). Returns ``(residual_fn, n_rows)``
    with ``residual_fn(x, grf12, contact, feet) -> (n_rows,) (<= 0 when satisfied)``.
    """
    gp = cfg.mpc.gradient
    gait = int(cfg.gait_params.gait_type)
    from ...config import GaitType
    crawl_like = gait in (int(GaitType.CIRCULARCRAWL), int(GaitType.BFDIAGONALCRAWL),
                          int(GaitType.BACKDIAGONALCRAWL),
                          int(GaitType.FRONTDIAGONALCRAWL),
                          int(GaitType.REGISTERCRAWL))
    margin = {0: gp.trot_stability_margin, 1: gp.pace_stability_margin}.get(
        gait, gp.crawl_stability_margin)
    m_robot = float(srbd.mass)
    grav = float(srbd.gravity)

    def support_point(x, grf12, contact):
        p = x[0:2]
        if gp.use_zmp_stability:
            a_xy = jnp.sum(grf12.reshape(4, 3)[:, :2] * contact[:, None],
                           axis=0) / m_robot
            p = p - (x[2] / grav) * a_xy
        return p

    if crawl_like:
        # FL-FR, FR-RR, RR-RL, RL-FL perimeter + FL-RR, FR-RL diagonals
        # (reference constraint order :949-961).
        pairs = ((0, 1), (1, 3), (3, 2), (2, 0), (0, 3), (1, 2))

        def residual(x, grf12, contact, feet):
            p = support_point(x, grf12, contact)
            n_st = jnp.sum(contact)
            cen = jnp.sum(feet[:, :2] * contact[:, None], axis=0) \
                / jnp.maximum(n_st, 1.0)
            three_stance = (n_st > 2.5) & (n_st < 3.5)
            rows = []
            for i, j in pairs:
                a, b = feet[i, :2], feet[j, :2]
                e = b - a
                nvec = jnp.array([-e[1], e[0]]) / jnp.maximum(
                    jnp.linalg.norm(e), 1e-6)
                sd_p = jnp.dot(nvec, p - a)
                # Orient "inside" toward the stance centroid (strictly interior
                # for any non-degenerate stance triangle). sign() carries no
                # gradient — each row linearizes as a fixed half-plane.
                sgn = jnp.where(jnp.dot(nvec, cen - a) >= 0.0, 1.0, -1.0)
                act = (contact[i] * contact[j] > 0.5) & three_stance
                rows.append(jnp.where(act, margin - sgn * sd_p, -1.0))
            return jnp.stack(rows)

        return residual, len(pairs)

    def residual(x, grf12, contact, feet):
        p = support_point(x, grf12, contact)
        # Distance to the 2-stance support segment, selected by contact masks.
        def seg_dist(i, j):
            a, b = feet[i, :2], feet[j, :2]
            v = b - a
            t = jnp.clip(jnp.dot(p - a, v) / jnp.maximum(jnp.dot(v, v), 1e-9), 0.0, 1.0)
            d = p - (a + t * v)
            return jnp.sqrt(jnp.dot(d, d) + 1e-12)
        # Diagonal pairs (trot) and lateral pairs (pace/bound) covered.
        pair_masks = [
            (0, 3, contact[0] * contact[3] * (1 - contact[1]) * (1 - contact[2])),
            (1, 2, contact[1] * contact[2] * (1 - contact[0]) * (1 - contact[3])),
            (0, 2, contact[0] * contact[2] * (1 - contact[1]) * (1 - contact[3])),
            (1, 3, contact[1] * contact[3] * (1 - contact[0]) * (1 - contact[2])),
            (0, 1, contact[0] * contact[1] * (1 - contact[2]) * (1 - contact[3])),
            (2, 3, contact[2] * contact[3] * (1 - contact[0]) * (1 - contact[1])),
        ]
        res = jnp.float32(-1.0)  # inactive by default (3+ stance feet)
        for i, j, mask in pair_masks:
            res = jnp.where(mask > 0.5, seg_dist(i, j) - margin, res)
        return res[None]

    return residual, 1


def make_nominal_spec(cfg: Config, srbd: SRBDParams) -> VariantSpec:
    """Plain SRB nominal OCP on the generalized core, with OPTIONAL support-polygon
    stability constraints (see make_support_residual)."""
    gp = cfg.mpc.gradient
    mu, grf_min = cfg.mpc.mu, cfg.mpc.grf_min
    smf = cfg.mpc.gradient.stance_min_force
    use_stab = gp.use_static_stability or gp.use_zmp_stability
    support_residual, n_stab = make_support_residual(cfg, srbd)

    def dynamics(x, u, feet, contact, dt, wk):
        d = fd(x, feet, u.reshape(4, 3), contact, srbd)
        return x + dt * _add_wrench(d, x, wk, srbd)

    def stage_ineq(x, u, contact, fz_max, feet, k):
        cone = _cone_residual(u, contact, fz_max, mu, grf_min, smf)
        if not use_stab:
            return cone
        return jnp.concatenate([cone, support_residual(x, u, contact, feet)])

    n_ineq = 24 + (n_stab if use_stab else 0)
    # Stability rows are SOFT (acados slacks them, centroidal_nmpc_nominal.py:147-163).
    soft = None
    if use_stab:
        soft = np.zeros(n_ineq, bool)
        soft[24:] = True
    return VariantSpec("nominal", 12, 12, dynamics, stage_ineq, n_ineq,
                       q_diag_gradient(), r_diag_gradient(cfg.robot.name),
                       grfs_of=lambda u, x: u, soft_mask=soft)


# ---------------------------------------------------------------------------
class VariantSolution(NamedTuple):
    U: jnp.ndarray
    X: jnp.ndarray  # (H+1, nx) optimized rollout
    grfs: jnp.ndarray  # (4, 3)
    predicted_state: jnp.ndarray  # (12,)
    cost: jnp.ndarray
    qp_gap: jnp.ndarray


def make_variant_solver(cfg: Config, spec: VariantSpec, return_assembler: bool = False):
    """Generalized condensed RTI solve for an augmented-state variant.

    Returns ``solve(x0_aug, feet_traj, contact_seq, Xref, Uref, U_warm)
    -> VariantSolution`` (jitted). With ``return_assembler`` additionally
    returns ``(assemble_qp, S_big)``: the jitted QP assembly at the warm-start
    linearization (the exact condensed matrices the first GN step solves) and
    the static slack-selection matrix — the seam the f64 soft-slack
    verification ladder uses (utils/verification.py)."""
    H = cfg.mpc.horizon
    nx, nu, m = spec.nx, spec.nu, spec.n_ineq
    dts = cfg.mpc.dts()
    gp = cfg.mpc.gradient
    from .ocp import _stage_wrench
    from .qp import soft_qp_solve
    from .sqp import qp_solver_for
    qp_fn, iters = qp_solver_for(gp)
    lm = gp.levenberg_marquardt * spec.lm_scale
    sqp_iters = 1 if gp.use_RTI else max(1, gp.num_qp_iterations)
    grf_max = cfg.mpc.grf_max
    stage_idx = np.arange(H, dtype=np.float32)
    # Soft rows: one slack per soft row per stage, block-diagonal selection.
    use_soft = spec.soft_mask is not None and bool(np.any(spec.soft_mask))
    if use_soft:
        ns_local = int(np.sum(spec.soft_mask))
        S_single = np.zeros((m, ns_local), np.float32)
        S_single[np.where(spec.soft_mask)[0], np.arange(ns_local)] = 1.0
        S_big = np.kron(np.eye(H, dtype=np.float32), S_single)  # (H*m, H*ns_local)

    def _rollout(x0, U, feet_traj, contact_seq, w):
        def body(x, inp):
            u, feet, c, dt, wk = inp
            xn = spec.dynamics(x, u, feet, c, dt, wk)
            return xn, xn
        _, xs = jax.lax.scan(body, x0, (U, feet_traj, contact_seq.T, dts, w))
        return jnp.concatenate([x0[None], xs], axis=0)

    def _build_qp(x0, Ubar, feet_traj, contact_seq, Xref, Uref, w):
        xbar = _rollout(x0, Ubar, feet_traj, contact_seq, w)

        def jac(x, u, feet, c, dt, wk):
            A = jax.jacfwd(lambda xx: spec.dynamics(xx, u, feet, c, dt, wk))(x)
            B = jax.jacfwd(lambda uu: spec.dynamics(x, uu, feet, c, dt, wk))(u)
            return A, B
        A, B = jax.vmap(jac)(xbar[:-1], Ubar, feet_traj, contact_seq.T, dts, w)

        # Condense: x_{k+1} deviation = (G dU)_k rows (dx0 = 0).
        G = [[None] * H for _ in range(H)]
        G[0][0] = B[0]
        for k in range(1, H):
            for j in range(k):
                G[k][j] = A[k] @ G[k - 1][j]
            G[k][k] = B[k]
        zero = jnp.zeros_like(B[0])
        Gm = jnp.stack([jnp.stack([G[k][j] if j <= k else zero for j in range(H)])
                        for k in range(H)])  # (H, H, nx, nu)
        Gt = Gm.transpose(1, 3, 0, 2).reshape(H * nu, H * nx)

        Qw = jnp.tile(jnp.asarray(spec.q_diag), (H,))
        Rw = jnp.tile(jnp.asarray(spec.r_diag), (H,))
        e = (xbar[1:] - Xref).reshape(-1)
        g = Gt @ (Qw * e) + Rw * (Ubar - Uref).reshape(-1)
        Hm = (Gt * Qw[None, :]) @ Gt.T + jnp.diag(Rw) + lm * jnp.eye(H * nu)

        # Stage inequalities linearized at (xbar_k, ubar_k); state rows map through
        # the prediction operator (x_k row k-1 of G), k=0 rows act on u only.
        fz_max = grf_max * contact_seq.T + 1e-3  # (H, 4)

        def lin_con(x, u, c, fzm, feet, k):
            cval = spec.stage_ineq(x, u, c, fzm, feet, k)
            Cx = jax.jacfwd(lambda xx: spec.stage_ineq(xx, u, c, fzm, feet, k))(x)
            Cu = jax.jacfwd(lambda uu: spec.stage_ineq(x, uu, c, fzm, feet, k))(u)
            return cval, Cx, Cu
        cval, Cx, Cu = jax.vmap(lin_con)(xbar[:-1], Ubar, contact_seq.T, fz_max,
                                         feet_traj, stage_idx)

        # Build C_big (H*m, H*nu): block-diag Cu + Cx_k @ G[k-1] rows for k >= 1.
        Cb = jnp.zeros((H * m, H * nu))
        for k in range(H):
            Cb = Cb.at[k * m:(k + 1) * m, k * nu:(k + 1) * nu].set(Cu[k])
            if k >= 1:
                row = jnp.einsum("mx,jxu->mju", Cx[k], Gm[k - 1]).reshape(m, H * nu)
                Cb = Cb.at[k * m:(k + 1) * m, :].add(row)
        d = (-cval).reshape(-1)
        return Hm, g, Cb, d

    def _gn_step(x0, Ubar, feet_traj, contact_seq, Xref, Uref, w):
        Hm, g, Cb, d = _build_qp(x0, Ubar, feet_traj, contact_seq, Xref, Uref, w)
        if use_soft:
            sol = soft_qp_solve(Hm, g, Cb, d, S_big, zl=gp.slack_l1,
                                Zl=gp.slack_l2, solver=qp_fn, iters=iters)
        else:
            sol = qp_fn(Hm, g, Cb, d, iters=iters)
        return Ubar + sol.z.reshape(H, nu), sol

    def solve(x0, feet_traj, contact_seq, Xref, Uref, U_warm, wrench_stages=None):
        w = _stage_wrench(wrench_stages, H)
        U = U_warm
        for _ in range(sqp_iters):
            U, sol = _gn_step(x0, U, feet_traj, contact_seq, Xref, Uref, w)
        X = _rollout(x0, U, feet_traj, contact_seq, w)
        ex = X[1:] - Xref
        eu = U - Uref
        cost = jnp.sum(ex * ex * jnp.asarray(spec.q_diag)) + \
            jnp.sum(eu * eu * jnp.asarray(spec.r_diag))
        # Variants with force states report the post-first-stage force X[1]
        # (X[2] under use_input_prediction, compensating control latency —
        # reference config.py:144-147, input_rates controller :52).
        x_for_grf = X[2] if (spec.name == "input_rates" and gp.use_input_prediction) else X[1]
        grfs = spec.grfs_of(U[0], x_for_grf).reshape(4, 3) * contact_seq[:, 0:1]
        return VariantSolution(U, X, grfs, X[1][:12], cost, sol.gap)

    if return_assembler:
        def assemble(x0, feet_traj, contact_seq, Xref, Uref, U_warm,
                     wrench_stages=None):
            return _build_qp(x0, U_warm, feet_traj, contact_seq, Xref, Uref,
                             _stage_wrench(wrench_stages, H))
        return (jax.jit(solve), OCPDims(nx=nx, nu=nu, horizon=H),
                jax.jit(assemble), S_big if use_soft else None)
    return jax.jit(solve), OCPDims(nx=nx, nu=nu, horizon=H)


class VariantGradientMPC:
    """Host wrapper for the input_rates / lyapunov / collaborative controllers.

    Same dict-based API as GradientMPC; extra augmented states initialize from the
    current state/reference at each tick (z1/z2 from tracking errors for lyapunov,
    carried wrench/phi states otherwise)."""

    def __init__(self, cfg: Config, variant: str):
        self.cfg = cfg
        srbd = make_params(cfg)
        if variant == "nominal":
            self.spec = (make_foothold_spec(cfg, srbd)
                         if cfg.mpc.gradient.use_foothold_optimization
                         else make_nominal_spec(cfg, srbd))
        elif variant == "input_rates":
            self.spec = make_input_rates_spec(cfg, srbd)
        elif variant == "collaborative":
            self.spec = make_collaborative_spec(cfg, srbd)
        elif variant == "lyapunov":
            self.spec = make_lyapunov_spec(cfg, srbd)
        elif variant == "kinodynamic":
            self.spec = make_kinodynamic_spec(cfg, srbd)
        else:
            raise ValueError(variant)
        self.solve, self.dims = make_variant_solver(cfg, self.spec)
        H = cfg.mpc.horizon
        self.U_warm = np.zeros((H, self.spec.nu), np.float32)
        self.extra_state = np.zeros(self.spec.nx - 12, np.float32)
        self.previous_grfs = np.zeros((4, 3), np.float32)
        self.last_X = None  # optimized rollout of the LAST SUCCESSFUL solve

    def compute_control(self, state, reference, contact_sequence, constraint=None,
                        external_wrenches=None):
        cfg = self.cfg
        H = self.dims.horizon
        seq = np.asarray(contact_sequence, np.float32)[:, :H]
        feet_now = np.stack([np.asarray(state[f"foot_{leg}"]).reshape(3)
                             for leg in ("FL", "FR", "RL", "RR")])
        ref_feet = np.stack([np.asarray(reference[f"ref_foot_{leg}"]).reshape(-1, 3)
                             for leg in ("FL", "FR", "RL", "RR")])
        feet_traj = build_feet_trajectory(feet_now, ref_feet, seq, H)

        x_base = np.concatenate([
            np.asarray(state["position"]).reshape(3),
            np.asarray(state["linear_velocity"]).reshape(3),
            np.asarray(state["orientation"]).reshape(3),
            np.asarray(state["angular_velocity"]).reshape(3)]).astype(np.float32)
        xref_base = np.concatenate([
            np.asarray(reference["ref_position"]).reshape(3),
            np.asarray(reference["ref_linear_velocity"]).reshape(3),
            np.asarray(reference["ref_orientation"]).reshape(3),
            np.asarray(reference["ref_angular_velocity"]).reshape(3)]).astype(np.float32)

        extra = self.extra_state.copy()
        if self.spec.name == "input_rates":
            # The carried force state goes stale across contact switches: zero it for
            # swing legs and re-seed newly-stance legs at their gravity share (the
            # reference re-initializes the force states from the applied GRFs each
            # tick, input_rates controller x0 fill).
            n0 = max(seq[:, 0].sum(), 1.0)
            share0 = cfg.robot.mass * cfg.gravity / n0
            f = extra.reshape(4, 3)
            for leg in range(4):
                if seq[leg, 0] == 0:
                    f[leg] = 0.0
                elif f[leg, 2] < 1.0:
                    f[leg] = [0.0, 0.0, share0]
            extra = f.reshape(12)
        if self.spec.name == "foothold":
            extra = feet_now.reshape(12).astype(np.float32)
        if self.spec.name == "kinodynamic":
            extra = np.concatenate([
                np.asarray(state[f"joint_{leg}"]).reshape(3)
                for leg in ("FL", "FR", "RL", "RR")]).astype(np.float32)
        if self.spec.name == "lyapunov":
            # z1 = p - p_ref; z2 = (v - v_ref) + K1 z1 (transverse coordinates).
            z1 = x_base[0:3] - xref_base[0:3]
            z2 = (x_base[3:6] - xref_base[3:6]) + np.asarray(cfg.mpc.gradient.K_z1) * z1
            extra[0:3], extra[3:6] = z1, z2  # phi (6:9) carried across ticks
        x0 = np.concatenate([x_base, extra])

        Xref = np.tile(np.concatenate([xref_base, np.zeros(self.spec.nx - 12,
                                                           np.float32)]), (H, 1))
        n_st = np.maximum(seq.sum(axis=0), 1.0)
        share = cfg.robot.mass * cfg.gravity / n_st
        if self.spec.name == "kinodynamic":
            # Joint reference from the analytic IK of the reference footholds.
            from ...kinematics.leg_ik import LegKinematics
            from ...utils.frames import euler_xyz_to_rot
            import jax.numpy as _jnp
            kin = getattr(self, "_kin", None) or LegKinematics(cfg.robot)
            self._kin = kin
            R = euler_xyz_to_rot(_jnp.asarray(xref_base[6:9]))
            q_ref = np.asarray(kin.ik_world(
                _jnp.asarray(ref_feet[:, 0, :], _jnp.float32),
                _jnp.asarray(x_base[0:3] * 0 + np.array([x_base[0], x_base[1], xref_base[2]],
                                                        np.float32)), R)).reshape(12)
            Xref[:, 12:24] = q_ref
            Uref = np.zeros((H, 24), np.float32)
            for leg in range(4):
                Uref[:, 12 + leg * 3 + 2] = share * seq[leg]
        elif self.spec.name == "foothold":
            # Foot-state reference tracks the per-stage reference foothold
            # trajectory; GRF references carry the gravity share.
            Xref[:, 12:24] = feet_traj.reshape(H, 12)
            Uref = np.zeros((H, 24), np.float32)
            for leg in range(4):
                Uref[:, 12 + leg * 3 + 2] = share * seq[leg]
        elif self.spec.name == "input_rates":
            # Force references live in the STATE reference; rate reference is zero.
            for leg in range(4):
                Xref[:, 12 + leg * 3 + 2] = share * seq[leg]
            Uref = np.zeros((H, 12), np.float32)
        else:
            Uref = np.zeros((H, 12), np.float32)
            for leg in range(4):
                Uref[:, leg * 3 + 2] = share * seq[leg]
            if self.spec.name == "lyapunov":
                Uref[:] = 0.0  # forces are deltas over the stabilizing F*

        # Fresh (all-zero) warm starts linearize at f = 0 where the SRB torque has no
        # foothold/force sensitivity (d tau / d p = skew(.) f = 0); seed from the
        # gravity-share reference instead (the reference warm-starts analogously,
        # centroidal_nmpc_nominal.py:1048-1113).
        U_ws = Uref if not np.any(self.U_warm) else self.U_warm
        feet_solver = np.asarray(feet_traj, np.float32)
        if self.spec.name == "foothold":
            # Append the stance-proximity column (1 on the last swing stage before
            # a touchdown): the spec freezes foot states there, mirroring the
            # reference's (1-stance)(1-stance_proximity) velocity gate.
            prox = np.zeros((H, 4), np.float32)
            for k in range(H - 1):
                prox[k] = (seq[:, k] == 0) & (seq[:, k + 1] == 1)
            feet_solver = np.concatenate([feet_solver, prox[:, :, None]], axis=2)
        from .sqp import build_stage_wrench
        wrench = build_stage_wrench(cfg, external_wrenches, H)
        out = jax.device_get(
            self.solve(np.asarray(x0, np.float32), feet_solver,
                       seq, Xref, Uref, np.asarray(U_ws, np.float32), wrench))
        U = np.asarray(out.U)
        if not np.all(np.isfinite(U)):
            grfs, status, predicted = self.previous_grfs, 1, x_base
            self.U_warm[:] = 0.0
        else:
            grfs = np.asarray(out.grfs)
            if self.spec.name == "lyapunov":
                # Applied force = delta + redistributed F* (model :240-245).
                z1, z2, phi = extra[0:3], extra[3:6], extra[6:9]
                K1 = np.asarray(cfg.mpc.gradient.K_z1)
                K2 = np.asarray(cfg.mpc.gradient.K_z2)
                F_star = cfg.robot.mass * (-(K1 + K2) * z2 + K1 * K1 * z1
                                           - np.array([0, 0, -cfg.gravity])) - phi
                n0 = max(seq[:, 0].sum(), 1.0)
                grfs = (grfs + (F_star / n0)[None, :]) * seq[:, 0:1]
                # Advance phi with its adaptive law.
                self.extra_state[6:9] = phi + cfg.mpc.dt * (-z2)
            if self.spec.name in ("collaborative", "input_rates"):
                self.extra_state = np.asarray(out.X[1][12:])
            if self.spec.name == "kinodynamic":
                # Joint trajectories consumed directly by the swing controller
                # (reference srbd_controller_interface.py:184-207).
                self.nmpc_joints_pos = np.asarray(out.X[1:, 12:24])
                self.nmpc_joints_vel = np.asarray(out.U[:, :12])
            self.previous_grfs = grfs.copy()
            self.U_warm = np.concatenate([U[1:], U[-1:]], axis=0)
            status = 0
            predicted = np.asarray(out.predicted_state)
            self.last_X = np.asarray(out.X)  # optimized rollout, for observability

        fh = np.empty((4, 3), np.float32)
        X_opt = np.asarray(out.X) if status == 0 else None
        hw = np.asarray(cfg.mpc.gradient.foothold_box_halfwidth)
        for leg in range(4):
            fh[leg] = feet_traj[-1, leg]
            for k in range(1, H):
                if seq[leg, k] == 1 and seq[leg, k - 1] == 0:
                    fh[leg] = feet_traj[k, leg]
                    if self.spec.name == "foothold" and X_opt is not None:
                        # Optimized touchdown location from the foot STATE, clipped
                        # to the constraint box (reference :1455-1627).
                        opt = X_opt[k, 12 + leg * 3: 12 + leg * 3 + 3]
                        fh[leg, :2] = np.clip(opt[:2],
                                              feet_traj[k, leg, :2] - hw,
                                              feet_traj[k, leg, :2] + hw)
                    break
        return grfs, fh, predicted, status, float(out.cost)

    def reset(self):
        # Rebind (never zero in place): returned arrays may alias these.
        self.U_warm = np.zeros_like(self.U_warm)
        self.extra_state = np.zeros_like(self.extra_state)
        self.previous_grfs = np.zeros_like(self.previous_grfs)
        self.last_X = None
