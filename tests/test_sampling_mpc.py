"""Sampling-MPC tests: spline-basis parity with the reference formulas, constraint
satisfaction, optimizer behavior, and a closed-loop height-regulation check."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_pympc_tamols_tpu import make_config, replace_config
from quadruped_pympc_tamols_tpu.controllers.sampling import (
    SamplingMPC,
    make_spline_basis,
    num_params_per_leg,
)
from quadruped_pympc_tamols_tpu.dynamics import integrate_euler, make_params


# --- independent numpy re-implementations of the reference spline formulas ----------
def ref_linear_spline(params, step, horizon, S):
    boundaries = np.linspace(0, horizon, S + 1)
    index = int(np.max(np.where(step >= boundaries, np.arange(S + 1), 0)))
    tau = step / (horizon / S) - index
    q = tau
    shift = S + 1
    fx = (1 - q) * params[index] + q * params[index + 1]
    fy = (1 - q) * params[index + shift] + q * params[index + shift + 1]
    fz = (1 - q) * params[index + 2 * shift] + q * params[index + 2 * shift + 1]
    return fx, fy, fz


def ref_cubic_spline(params, step, horizon, S):
    boundaries = np.linspace(0, horizon, S + 1)
    index = int(np.max(np.where(step >= boundaries, np.arange(S + 1), 0)))
    tau = step / (horizon / S) - index
    q = tau
    si = 10 * index
    a = 2 * q**3 - 3 * q**2 + 1
    b = q**3 - 2 * q**2 + q
    c = -2 * q**3 + 3 * q**2
    d = q**3 - q**2
    out = []
    for ax in range(3):
        base = si + 4 * ax
        phi = 0.5 * (params[base + 2] - params[base + 0])
        phi_next = 0.5 * (params[base + 3] - params[base + 1])
        out.append(a * params[base + 1] + b * phi + c * params[base + 2] + d * phi_next)
    return tuple(out)


@pytest.mark.parametrize("param", ["zero_order", "linear_spline", "cubic_spline"])
def test_basis_matches_reference_formulas(param):
    H, S = 12, 2
    P = num_params_per_leg(param, H, S)
    W = make_spline_basis(param, H, S)
    rng = np.random.default_rng(1)
    p = rng.normal(0, 3, P).astype(np.float32)
    for n in range(H):
        got = p @ W[:, n, :]
        if param == "zero_order":
            want = (p[n], p[n + H], p[n + 2 * H])
        elif param == "linear_spline":
            want = ref_linear_spline(p, n, H, S)
        else:
            want = ref_cubic_spline(p, n, H, S)
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def _make(method="random_sampling", parametrization="cubic_spline", n=512):
    cfg = make_config("aliengo", mpc_type="sampling")
    cfg = replace_config(
        cfg,
        **{"mpc.sampling.method": method, "mpc.sampling.parametrization": parametrization,
           "mpc.sampling.num_samples": n},
    )
    return cfg, SamplingMPC(cfg, seed=0)


def _standing_problem(cfg, z=None):
    z = cfg.sim.ref_z if z is None else z
    state = dict(
        position=np.array([0.0, 0.0, z]),
        linear_velocity=np.zeros(3),
        orientation=np.zeros(3),
        angular_velocity=np.zeros(3),
        foot_FL=np.array([0.25, 0.15, 0.0]),
        foot_FR=np.array([0.25, -0.15, 0.0]),
        foot_RL=np.array([-0.25, 0.15, 0.0]),
        foot_RR=np.array([-0.25, -0.15, 0.0]),
    )
    ref = dict(
        ref_position=np.array([0.0, 0.0, cfg.sim.ref_z]),
        ref_linear_velocity=np.zeros(3),
        ref_orientation=np.zeros(3),
        ref_angular_velocity=np.zeros(3),
        ref_foot_FL=state["foot_FL"], ref_foot_FR=state["foot_FR"],
        ref_foot_RL=state["foot_RL"], ref_foot_RR=state["foot_RR"],
    )
    return state, ref


@pytest.mark.parametrize("method", ["random_sampling", "mppi", "cem_mppi"])
def test_solver_runs_and_respects_constraints(method):
    cfg, mpc = _make(method=method)
    state, ref = _standing_problem(cfg)
    seq = np.ones((4, cfg.mpc.horizon))
    seq[1, :] = 0.0  # FR in swing the whole horizon
    out = mpc.compute_control(state, ref, seq, seq[:, 0], np.ones(4))
    grfs = np.asarray(out.grfs)
    assert grfs.shape == (4, 3)
    # Swing leg carries zero force.
    np.testing.assert_allclose(grfs[1], 0.0, atol=1e-6)
    # Friction cone and z-limits.
    assert np.all(grfs[:, 2] >= cfg.mpc.grf_min - 1e-5)
    assert np.all(grfs[:, 2] <= cfg.mpc.grf_max + 1e-5)
    assert np.all(np.abs(grfs[:, 0]) <= cfg.mpc.mu * grfs[:, 2] + 1e-4)
    assert np.all(np.abs(grfs[:, 1]) <= cfg.mpc.mu * grfs[:, 2] + 1e-4)
    assert np.isfinite(float(out.best_cost))


def test_incumbent_never_worse_than_best():
    """Row 0 carries zero noise, so the best cost can only improve on the incumbent."""
    cfg, mpc = _make()
    state, ref = _standing_problem(cfg, z=0.30)  # height error -> nonzero incumbent cost
    seq = np.ones((4, cfg.mpc.horizon))
    out1 = mpc.compute_control(state, ref, seq, seq[:, 0], np.ones(4))
    costs = np.asarray(out1.costs)
    assert float(out1.best_cost) <= costs[0] + 1e-5


def test_liftoff_edge_resets_leg_parameters():
    cfg, mpc = _make(parametrization="zero_order", n=64)
    state, ref = _standing_problem(cfg)
    seq = np.ones((4, cfg.mpc.horizon))
    mpc.compute_control(state, ref, seq, seq[:, 0], np.ones(4))
    # Force nonzero params, then signal a lift-off edge on leg 2 (RL).
    P = mpc.num_parameters
    P_leg = P // 4
    mpc.state.best_parameters = jnp.ones(P)
    cur = np.array([1.0, 1.0, 0.0, 1.0])
    out = mpc.compute_control(state, ref, seq, cur, np.ones(4))
    bp = np.asarray(out.best_parameters).reshape(4, P_leg)
    # RL params were zeroed before sampling; other legs kept their warm start basis.
    # (After optimization they may move, but RL started from zero: with the standing
    # problem the optimizer has no reason to produce the exact all-ones vector back.)
    assert not np.allclose(bp[2], 1.0)


def test_closed_loop_height_regulation():
    """Drop the robot 5 cm below the reference height and let the MPC (full stance)
    pull it back by integrating the SRB model with the returned GRFs."""
    cfg, mpc = _make(method="random_sampling", n=1024)
    params = make_params(cfg)
    state, ref = _standing_problem(cfg, z=cfg.sim.ref_z - 0.05)
    seq = np.ones((4, cfg.mpc.horizon))
    feet = jnp.asarray(np.stack([state[f"foot_{leg}"] for leg in ("FL", "FR", "RL", "RR")]),
                       jnp.float32)
    x = jnp.asarray(np.concatenate([state["position"], state["linear_velocity"],
                                    state["orientation"], state["angular_velocity"]]),
                    jnp.float32)
    err0 = abs(float(x[2]) - cfg.sim.ref_z)
    for _ in range(150):
        sd = dict(state)
        sd["position"] = np.asarray(x[0:3])
        sd["linear_velocity"] = np.asarray(x[3:6])
        sd["orientation"] = np.asarray(x[6:9])
        sd["angular_velocity"] = np.asarray(x[9:12])
        out = mpc.compute_control(sd, ref, seq, seq[:, 0], np.ones(4))
        x = integrate_euler(x, feet, out.grfs, jnp.ones(4), params, 0.01)
    err_final = abs(float(x[2]) - cfg.sim.ref_z)
    assert err_final < err0 * 0.5, f"height error {err0:.3f} -> {err_final:.3f}"
    assert abs(float(x[6])) < 0.1 and abs(float(x[7])) < 0.1  # stayed level


def test_determinism_same_key():
    cfg, a = _make(n=128)
    _, b = _make(n=128)
    state, ref = _standing_problem(cfg, z=0.3)
    seq = np.ones((4, cfg.mpc.horizon))
    oa = a.compute_control(state, ref, seq, seq[:, 0], np.ones(4))
    ob = b.compute_control(state, ref, seq, seq[:, 0], np.ones(4))
    np.testing.assert_allclose(np.asarray(oa.grfs), np.asarray(ob.grfs), atol=1e-6)


def test_zmp_band_cost_penalizes_off_support_rollouts():
    """sampling.zmp_weight (round 5): the ZMP-band rollout cost — the sampling
    family's analogue of the gradient family's soft ZMP band
    (gradient.use_zmp_stability) — charges rollouts whose ZMP leaves the
    2-stance support segment, and compiles to NOTHING at weight 0 (parity)."""
    import jax.numpy as jnp

    from quadruped_pympc_tamols_tpu.config import make_config
    from quadruped_pympc_tamols_tpu.controllers.sampling.rollout import (
        ForceModelParams,
        rollout_costs_soa,
    )
    from quadruped_pympc_tamols_tpu.dynamics.srbd import make_params

    cfg = make_config("aliengo", mpc_type="sampling")
    srbd = make_params(cfg)
    sp = cfg.mpc.sampling
    fm = ForceModelParams(sp.max_force_x / sp.max_force_z,
                          sp.max_force_y / sp.max_force_z,
                          cfg.mpc.grf_min, cfg.mpc.grf_max, cfg.mpc.mu)
    H = cfg.mpc.horizon
    state12 = jnp.zeros(12).at[2].set(0.33)
    feet = jnp.asarray([[0.25, 0.15, 0], [0.25, -0.15, 0],
                        [-0.25, 0.15, 0], [-0.25, -0.15, 0]], jnp.float32)
    ref12 = jnp.zeros(12).at[2].set(0.33)
    # Trot 2-stance: FL+RR support, diagonal segment through the origin.
    seq = jnp.asarray(np.tile([[1.0], [0.0], [0.0], [1.0]], (1, H)), jnp.float32)
    share = srbd.mass * 9.81 / jnp.full(H, 2.0)
    dts = jnp.asarray(cfg.mpc.dts())
    q0 = np.zeros(12)  # isolate the ZMP term
    # Sample 0: zero deltas (ZMP rides gravity near the diagonal).
    # Sample 1: strong +y lateral force on both stance legs -> a_y pushes the
    # ZMP laterally off the diagonal segment.
    raw = np.zeros((H, 12, 2), np.float32)
    raw[:, 0 * 3 + 1, 1] = 60.0  # FL fy (scaled by scale_y inside the model)
    raw[:, 3 * 3 + 1, 1] = 60.0  # RR fy
    costs = rollout_costs_soa(state12, feet, ref12, jnp.asarray(raw), seq,
                              share, dts, q0, srbd, fm,
                              zmp_weight=1000.0, zmp_margin=0.02)
    assert float(costs[1]) > float(costs[0]) + 1.0, \
        f"lateral-ZMP rollout not penalized: {np.asarray(costs)}"
    # Weight 0 = parity: both rollouts cost exactly zero under a zero Q.
    c0 = rollout_costs_soa(state12, feet, ref12, jnp.asarray(raw), seq,
                           share, dts, q0, srbd, fm, zmp_weight=0.0)
    np.testing.assert_allclose(np.asarray(c0), 0.0, atol=1e-6)
