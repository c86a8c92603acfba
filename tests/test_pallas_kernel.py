"""Fused Pallas sampling kernels: parity with the XLA pipeline in (TPU-semantics)
interpret mode, plus exactness of the cross-tile optimizer combines. The same
kernels compile via Mosaic on real TPU hardware (bench.py reports their timing)."""
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
from quadruped_pympc_tamols_tpu.ops import (
    cem_sigma_update,
    make_pallas_iteration,
    mppi_combine,
    pallas_available,
)

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


def _scene(cfg):
    state12 = jnp.zeros(12).at[2].set(0.31)
    feet12 = jnp.asarray([0.25, 0.15, 0, 0.25, -0.15, 0,
                          -0.25, 0.15, 0, -0.25, -0.15, 0], jnp.float32)
    ref12 = jnp.zeros(12).at[2].set(0.35)
    seq = jnp.ones((4, 12), jnp.float32)
    share = jnp.full((12,), cfg.robot.mass * 9.81 / 4, jnp.float32)
    return state12, feet12, ref12, seq, share


def _run(cfg, it, best, seed, state12, feet12, ref12, seq, share, sigma=None):
    W = make_step_major_basis(cfg.mpc.sampling.parametrization, cfg.mpc.horizon,
                              cfg.mpc.sampling.num_splines)
    if sigma is None:
        sigma = jnp.full(it.P, cfg.mpc.sampling.sigma_cem_mppi, jnp.float32)
    return it.fn(best, jnp.int32(seed), state12, feet12, ref12, seq[None],
                 share[None], jnp.asarray(W, jnp.float32)[None],
                 jnp.zeros(1, jnp.float32), sigma)


def test_kernel_matches_xla_rollout_interpret():
    cfg = make_config("aliengo")
    it = make_pallas_iteration(cfg, num_samples=1024, interpret=True)
    state12, feet12, ref12, seq, share = _scene(cfg)

    outs = _run(cfg, it, jnp.zeros(it.P), 7, state12, feet12, ref12, seq, share)
    c_inc = _xla_cost_of(cfg, np.zeros(it.P, np.float32), state12, feet12, ref12,
                         seq, share)
    # Tile 0 contains the zero-noise incumbent: the winner can only improve on it.
    assert float(outs.costs[0]) <= c_inc + 1e-3
    # Re-evaluating the winner through the XLA pipeline must reproduce the kernel's
    # cost (same dynamics, same force model).
    c_win = _xla_cost_of(cfg, np.asarray(outs.winners[0]), state12, feet12, ref12,
                         seq, share)
    assert abs(c_win - float(outs.costs[0])) < 0.05 * max(1.0, abs(c_win))


def test_kernel_zero_noise_equals_incumbent():
    cfg = make_config("aliengo")
    cfg = replace_config(cfg, **{"mpc.sampling.sigma_random": (0.0, 0.0, 0.0)})
    it = make_pallas_iteration(cfg, num_samples=1024, interpret=True)
    state12, feet12, ref12, seq, share = _scene(cfg)
    outs = _run(cfg, it, jnp.zeros(it.P), 3, state12, feet12, ref12, seq, share)
    c_inc = _xla_cost_of(cfg, np.zeros(it.P, np.float32), state12, feet12, ref12,
                         seq, share)
    np.testing.assert_allclose(float(outs.costs[0]), c_inc, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(outs.winners[0]), 0.0, atol=1e-7)


def test_mppi_kernel_partials_and_combine():
    """The fused MPPI update equals a direct softmax over the winner-reconstructed
    sample population? We can't read every sample, but the combine algebra is exact
    on synthetic partials and the kernel's own partials must satisfy the
    softmax-bound invariants."""
    cfg = make_config("aliengo")
    it = make_pallas_iteration(cfg, num_samples=2048, interpret=True, method="mppi")
    state12, feet12, ref12, seq, share = _scene(cfg)
    outs = _run(cfg, it, jnp.zeros(it.P), 11, state12, feet12, ref12, seq, share)
    z = np.asarray(outs.z)
    assert outs.costs.shape == (2,) and z.shape == (2,)
    # Z_t in [1, tile]: weights are exp(-(c - cmin_t)/T) with max weight exactly 1.
    assert np.all(z >= 1.0) and np.all(z <= 1024.0)
    new_params, beta = mppi_combine(outs.costs, outs.z, outs.s,
                                    cfg.mpc.sampling.mppi_temperature)
    assert float(beta) == pytest.approx(float(np.min(np.asarray(outs.costs))))
    assert np.all(np.isfinite(np.asarray(new_params)))
    # Weighted-mean parameters re-evaluate to a finite, sane cost.
    c_new = _xla_cost_of(cfg, np.asarray(new_params), state12, feet12, ref12, seq, share)
    assert np.isfinite(c_new)


def test_mppi_combine_exact_vs_direct_softmax():
    """Log-sum-exp tile combination == one global softmax (synthetic data)."""
    rng = np.random.default_rng(0)
    GT, tile, P, temp = 3, 64, 5, 1.7
    costs = rng.uniform(0, 50, (GT, tile)).astype(np.float32)
    params = rng.normal(size=(GT, tile, P)).astype(np.float32)
    # Direct global softmax.
    flat_c = costs.reshape(-1)
    w = np.exp(-(flat_c - flat_c.min()) / temp)
    direct = (w[:, None] * params.reshape(-1, P)).sum(0) / w.sum()
    # Per-tile partials as the kernel computes them.
    cmins = costs.min(axis=1)
    wt = np.exp(-(costs - cmins[:, None]) / temp)
    z = wt.sum(axis=1)
    s = (wt[:, :, None] * params).sum(axis=1)
    combined, beta = mppi_combine(jnp.asarray(cmins), jnp.asarray(z), jnp.asarray(s), temp)
    np.testing.assert_allclose(np.asarray(combined), direct, rtol=2e-5, atol=2e-6)
    assert float(beta) == pytest.approx(flat_c.min())


def test_cem_sigma_update_exact_vs_direct_topk():
    """Global top-K from per-tile top-K == top-K over all samples (synthetic)."""
    rng = np.random.default_rng(1)
    GT, tile, P, K = 4, 32, 6, 5
    costs = rng.uniform(0, 100, (GT, tile)).astype(np.float32)
    params = rng.normal(size=(GT, tile, P)).astype(np.float32)
    # Direct: top-K over all samples, ddof=1 variance of their params.
    flat_c, flat_p = costs.reshape(-1), params.reshape(-1, P)
    order = np.argsort(flat_c)[:K]
    direct = np.clip(np.sqrt(flat_p[order].var(axis=0, ddof=1) + 1e-8), 0.2, 5.0)
    # Per-tile elites (each tile reports its K best).
    tile_order = np.argsort(costs, axis=1)[:, :K]
    ecosts = np.take_along_axis(costs, tile_order, axis=1)
    eparams = np.stack([params[t][tile_order[t]] for t in range(GT)])
    got = cem_sigma_update(jnp.asarray(ecosts), jnp.asarray(eparams), K, 0.2, 5.0)
    np.testing.assert_allclose(np.asarray(got), direct, rtol=1e-5)


def test_cem_kernel_elites_sorted_and_reproducible():
    cfg = make_config("aliengo")
    it = make_pallas_iteration(cfg, num_samples=1024, interpret=True,
                               method="cem_mppi")
    state12, feet12, ref12, seq, share = _scene(cfg)
    sigma = jnp.full(it.P, 2.0, jnp.float32)
    outs = _run(cfg, it, jnp.zeros(it.P), 5, state12, feet12, ref12, seq, share,
                sigma=sigma)
    ec = np.asarray(outs.ecosts)[0]  # (K,)
    assert np.all(np.diff(ec) >= -1e-6), "elite costs must come out ascending"
    # ec carries the tie-break epsilon (<= 3e-4 relative).
    np.testing.assert_allclose(ec[0], float(outs.costs[0]), rtol=1e-3)
    # Each elite's parameters re-evaluate to its reported cost.
    for k in (0, len(ec) - 1):
        c_k = _xla_cost_of(cfg, np.asarray(outs.eparams[0, k]), state12, feet12,
                           ref12, seq, share)
        assert abs(c_k - ec[k]) < 0.05 * max(1.0, abs(c_k))


def test_group_cost_offsets_shift_tile_costs():
    cfg = make_config("aliengo")
    cfg = replace_config(cfg, **{"mpc.sampling.sigma_random": (0.0, 0.0, 0.0)})
    it = make_pallas_iteration(cfg, num_samples=2048, interpret=True, num_groups=2)
    state12, feet12, ref12, seq, share = _scene(cfg)
    W = make_step_major_basis(cfg.mpc.sampling.parametrization, cfg.mpc.horizon,
                              cfg.mpc.sampling.num_splines)
    Wg = jnp.tile(jnp.asarray(W, jnp.float32)[None], (2, 1, 1))
    outs = it.fn(jnp.zeros(it.P), jnp.int32(9), state12, feet12, ref12,
                 jnp.tile(seq[None], (2, 1, 1)), jnp.tile(share[None], (2, 1)),
                 Wg, jnp.asarray([0.0, 7.5], jnp.float32),
                 jnp.full(it.P, 1.0, jnp.float32))
    c = np.asarray(outs.costs)
    assert c.shape == (2,)
    np.testing.assert_allclose(c[1] - c[0], 7.5, rtol=1e-5)
