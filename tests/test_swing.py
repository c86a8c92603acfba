"""Bezier swing generator: boundary conditions, apex constraint, batched evaluation
(mirrors the reference's own self-checks,
swing_generators/bezier_ref_swing_trajectory_generator.py:389-424)."""
import jax.numpy as jnp
import numpy as np

from quadruped_pympc_tamols_tpu.gait.swing import (
    SwingTrajectoryController,
    bezier_swing_refs,
    explicit_swing_refs,
)

LO = np.array([0.0, 0.0, 0.0])
TD = np.array([0.2, 0.05, 0.02])
H = 0.08
T = 0.4


def test_boundary_conditions():
    for t, target in [(0.0, LO), (T, TD)]:
        pos, vel, acc = bezier_swing_refs(t, T, H, jnp.asarray(LO), jnp.asarray(TD))
        np.testing.assert_allclose(np.asarray(pos), target, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vel), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-3)


def test_midpoint_height():
    pos, _, _ = bezier_swing_refs(T / 2, T, H, jnp.asarray(LO), jnp.asarray(TD))
    z_expected = max(LO[2], TD[2]) + H
    np.testing.assert_allclose(float(pos[2]), z_expected, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pos[:2]), 0.5 * (LO[:2] + TD[:2]), atol=1e-5)


def test_batched_over_legs():
    los = jnp.asarray(np.tile(LO, (4, 1)), jnp.float32)
    tds = jnp.asarray(np.tile(TD, (4, 1)), jnp.float32)
    times = jnp.asarray([0.0, 0.1, 0.2, 0.3])
    pos, vel, acc = bezier_swing_refs(times, T, H, los, tds)
    assert pos.shape == (4, 3) and vel.shape == (4, 3) and acc.shape == (4, 3)


def test_velocity_is_derivative_of_position():
    eps = 1e-4
    t = 0.13
    p1, v, _ = bezier_swing_refs(t, T, H, jnp.asarray(LO), jnp.asarray(TD))
    p2, _, _ = bezier_swing_refs(t + eps, T, H, jnp.asarray(LO), jnp.asarray(TD))
    fd = (np.asarray(p2) - np.asarray(p1)) / eps
    np.testing.assert_allclose(fd, np.asarray(v), atol=1e-2)


def test_explicit_generator_reaches_apex():
    pos, _, _ = explicit_swing_refs(T / 2, T, H, jnp.asarray(LO), jnp.asarray(TD))
    np.testing.assert_allclose(float(pos[2]), max(LO[2], TD[2]) + H, atol=1e-5)
    pos0, _, _ = explicit_swing_refs(0.0, T, H, jnp.asarray(LO), jnp.asarray(TD))
    posT, _, _ = explicit_swing_refs(T, T, H, jnp.asarray(LO), jnp.asarray(TD))
    np.testing.assert_allclose(np.asarray(pos0), LO, atol=1e-6)
    np.testing.assert_allclose(np.asarray(posT), TD, atol=1e-6)


def test_controller_events():
    stc = SwingTrajectoryController(H, T, 500.0, 10.0)
    contact = [0, 1, 1, 0]
    # drive leg 0 close to apex
    stc.swing_time = [T / 2, 0.0, 0.0, 0.1]
    assert stc.check_apex_condition(contact) == 1
    assert stc.check_full_stance_condition([1, 1, 1, 1]) == 1
    assert stc.check_full_stance_condition(contact) == 0

    seq = np.ones((4, 12))
    seq[:, 3] = 0  # first 3 columns stable stance, leg lifts at the lookahead column
    assert stc.check_touch_down_condition(np.array([1, 1, 1, 1]), np.array([1, 0, 1, 1]),
                                          seq, lookahead=3) == 1


def test_reflex_replanning_raises_apex():
    stc = SwingTrajectoryController(H, T, 500.0, 10.0, reflex_max_step_height=0.2)
    hit = np.array([0.1, 0.02, 0.05])
    t_mid_of_replanned = 0.1 + (T - 0.1) / 2
    pos, _, _ = stc.compute_trajectory_references(t_mid_of_replanned, LO, TD,
                                                  hitmoment=0.1, hitpoint=hit)
    assert pos[2] > max(hit[2], TD[2]) + 0.19


def test_numpy_twins_match_jitted():
    """Host numpy twins (per-tick path) match the jitted kernels exactly."""
    import jax.numpy as jnp

    from quadruped_pympc_tamols_tpu import ROBOTS
    from quadruped_pympc_tamols_tpu.gait.swing import (
        bezier_swing_refs,
        explicit_swing_refs,
        swing_refs_np,
    )
    from quadruped_pympc_tamols_tpu.kinematics import LegKinematics

    t = np.array([0.05, 0.12, 0.2, 0.0])
    period = np.full(4, 0.25)
    sh = np.full(4, 0.11)
    lo = np.array([[0.25, 0.15, 0.0], [0.25, -0.15, 0.02],
                   [-0.25, 0.15, 0.0], [-0.25, -0.15, 0.0]])
    td = lo + np.array([0.07, 0.01, 0.0])
    for gen, fn in (("bezier_ref", bezier_swing_refs), ("explicit", explicit_swing_refs)):
        p_np, v_np, a_np = swing_refs_np(gen, t, period, sh, lo, td)
        import jax
        p_j, v_j, a_j = jax.vmap(fn)(jnp.asarray(t, jnp.float32),
                                     jnp.asarray(period, jnp.float32),
                                     jnp.asarray(sh, jnp.float32),
                                     jnp.asarray(lo, jnp.float32),
                                     jnp.asarray(td, jnp.float32))
        np.testing.assert_allclose(p_np, np.asarray(p_j), atol=1e-5)
        np.testing.assert_allclose(v_np, np.asarray(v_j), atol=1e-4)
        np.testing.assert_allclose(a_np, np.asarray(a_j), atol=2e-3)

    kin = LegKinematics(ROBOTS["aliengo"])
    p_hip = np.array([[0.02, 0.1, -0.33], [-0.04, -0.12, -0.3],
                      [0.0, 0.09, -0.35], [0.05, -0.1, -0.28]])
    np.testing.assert_allclose(kin.ik_all_np(p_hip), np.asarray(kin.ik_all(p_hip)),
                               atol=1e-5)


def test_swing_retarget_replans_to_new_target():
    """After retarget(), the remaining swing re-plans from the retarget point and
    lands exactly on the (new) touchdown at the end of the period."""
    from quadruped_pympc_tamols_tpu.gait.swing import SwingTrajectoryController

    stc = SwingTrajectoryController(step_height=0.1, swing_period=0.3,
                                    position_gain_fb=1000, velocity_gain_fb=20)
    stc.swing_time[1] = 0.15
    mid = np.array([0.30, -0.15, 0.08])
    stc.retarget(1, mid, 0.15)
    new_td = np.array([0.45, -0.15, 0.0])
    # The control entry picks up the retarget automatically (normal apex).
    stc.swing_time[1] = 0.3 - 1e-9
    tau, pos, vel = stc.compute_swing_control_cartesian_space(
        leg_id=1, q_dot=np.zeros(3), J=np.eye(3), J_dot=np.zeros((3, 3)),
        lift_off=np.array([0.25, -0.15, 0.0]), touch_down=new_td,
        foot_pos=mid, foot_vel=np.zeros(3), h=np.zeros(3),
        mass_matrix=np.eye(3))
    np.testing.assert_allclose(pos, new_td, atol=1e-3)
    # Touchdown clears the retarget.
    stc.update_swing_time([1, 1, 1, 1], 0.002)
    assert stc.retarget_points[1] is None
