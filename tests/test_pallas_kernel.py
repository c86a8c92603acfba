"""Fused Pallas sampling kernel: parity with the XLA rollout in (TPU-semantics)
interpret mode. The same kernel compiles via Mosaic on real TPU hardware (bench.py
reports its timing)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_pympc_tamols_tpu import make_config, replace_config
from quadruped_pympc_tamols_tpu.controllers.sampling.rollout import (
    ForceModelParams,
    rollout_costs_soa,
)
from quadruped_pympc_tamols_tpu.controllers.sampling.splines import make_step_major_basis
from quadruped_pympc_tamols_tpu.dynamics import make_params
from quadruped_pympc_tamols_tpu.ops import make_pallas_iteration, pallas_available

pytestmark = pytest.mark.skipif(not pallas_available(), reason="pallas unavailable")


def _xla_cost_of(cfg, params_vec, state12, feet, ref12, seq, share):
    W = make_step_major_basis(cfg.mpc.sampling.parametrization, cfg.mpc.horizon,
                              cfg.mpc.sampling.num_splines)
    sp = cfg.mpc.sampling
    fm = ForceModelParams(sp.max_force_x / sp.max_force_z, sp.max_force_y / sp.max_force_z,
                          cfg.mpc.grf_min, cfg.mpc.grf_max, cfg.mpc.mu)
    raw = (W @ params_vec.reshape(-1, 1)).reshape(cfg.mpc.horizon, 12, 1)
    c = rollout_costs_soa(state12, feet.reshape(4, 3), ref12, jnp.asarray(raw), seq,
                          share, jnp.asarray(cfg.mpc.dts()), cfg.mpc.cost.as_vector(),
                          make_params(cfg), fm)
    return float(c[0])


def test_kernel_matches_xla_rollout_interpret():
    cfg = make_config("aliengo")
    it = make_pallas_iteration(cfg, num_samples=1024, interpret=True)
    state12 = jnp.zeros(12).at[2].set(0.31)
    feet12 = jnp.asarray([0.25, 0.15, 0, 0.25, -0.15, 0,
                          -0.25, 0.15, 0, -0.25, -0.15, 0], jnp.float32)
    ref12 = jnp.zeros(12).at[2].set(0.35)
    seq = jnp.ones((4, 12), jnp.float32)
    share = jnp.full((12,), cfg.robot.mass * 9.81 / 4, jnp.float32)

    costs, winners = it.fn(jnp.zeros(it.P), jnp.int32(7), state12, feet12, ref12,
                           seq, share)
    c_inc = _xla_cost_of(cfg, np.zeros(it.P, np.float32), state12, feet12, ref12,
                         seq, share)
    # Tile 0 contains the zero-noise incumbent: the winner can only improve on it.
    assert float(costs[0]) <= c_inc + 1e-3
    # Re-evaluating the winner through the XLA pipeline must reproduce the kernel's
    # cost (same dynamics, same force model).
    c_win = _xla_cost_of(cfg, np.asarray(winners[0]), state12, feet12, ref12, seq, share)
    assert abs(c_win - float(costs[0])) < 0.05 * max(1.0, abs(c_win))


def test_kernel_zero_noise_equals_incumbent():
    cfg = make_config("aliengo")
    cfg = replace_config(cfg, **{"mpc.sampling.sigma_random": (0.0, 0.0, 0.0)})
    it = make_pallas_iteration(cfg, num_samples=1024, interpret=True)
    state12 = jnp.zeros(12).at[2].set(0.30)
    feet12 = jnp.asarray([0.25, 0.15, 0, 0.25, -0.15, 0,
                          -0.25, 0.15, 0, -0.25, -0.15, 0], jnp.float32)
    ref12 = jnp.zeros(12).at[2].set(0.35)
    seq = jnp.ones((4, 12), jnp.float32)
    share = jnp.full((12,), cfg.robot.mass * 9.81 / 4, jnp.float32)
    costs, winners = it.fn(jnp.zeros(it.P), jnp.int32(3), state12, feet12, ref12,
                           seq, share)
    c_inc = _xla_cost_of(cfg, np.zeros(it.P, np.float32), state12, feet12, ref12,
                         seq, share)
    np.testing.assert_allclose(float(costs[0]), c_inc, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(winners[0]), 0.0, atol=1e-7)
