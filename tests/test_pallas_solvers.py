"""Fused Pallas sampling SOLVERS (all methods + gait-adaptive) vs the XLA path.

Zero-noise configurations make the optimizers deterministic (every candidate
equals the incumbent), so the Pallas and XLA solvers must agree exactly on GRFs,
predicted state, best cost and — for the gait-adaptive variant — the chosen step
frequency, despite using different PRNG streams."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_pympc_tamols_tpu import make_config, replace_config
from quadruped_pympc_tamols_tpu.controllers.sampling import (
    SamplingState,
    make_sampling_solver,
)
from quadruped_pympc_tamols_tpu.controllers.sampling.gait_adaptive import (
    make_gait_adaptive_solver,
)
from quadruped_pympc_tamols_tpu.ops import (
    make_pallas_gait_adaptive_solver,
    make_pallas_sampling_solver,
    pallas_available,
)

pytestmark = pytest.mark.skipif(not pallas_available(), reason="pallas unavailable")


def _zero_noise_cfg(method):
    cfg = make_config("aliengo", mpc_type="sampling")
    over = {"mpc.sampling.method": method,
            "mpc.sampling.sigma_random": (0.0, 0.0, 0.0),
            "mpc.sampling.sigma_mppi": 0.0}
    return replace_config(cfg, **over)


def _scene(cfg):
    state12 = jnp.zeros(12, jnp.float32).at[2].set(cfg.sim.ref_z - 0.04).at[3].set(0.1)
    feet = jnp.asarray([[0.25, 0.15, 0], [0.25, -0.15, 0],
                        [-0.25, 0.15, 0], [-0.25, -0.15, 0]], jnp.float32)
    ref12 = jnp.zeros(12, jnp.float32).at[2].set(cfg.sim.ref_z).at[3].set(0.2)
    seq = np.ones((4, cfg.mpc.horizon), np.float32)
    seq[1, 6:] = 0.0
    seq[2, 6:] = 0.0
    return state12, feet, ref12, jnp.asarray(seq)


def _state(P, sigma=0.0):
    return SamplingState(jnp.zeros(P, jnp.float32), jax.random.PRNGKey(0),
                         jnp.full(P, sigma, jnp.float32))


@pytest.mark.parametrize("method", ["random_sampling", "mppi", "cem_mppi"])
def test_pallas_solver_matches_xla_zero_noise(method):
    cfg = _zero_noise_cfg(method)
    xla_solve, P = make_sampling_solver(cfg, num_samples=256)
    pls_solve, P2 = make_pallas_sampling_solver(cfg, num_samples=256, interpret=True,
                                                tile=128)
    assert P == P2
    state12, feet, ref12, seq = _scene(cfg)
    cur, prev = seq[:, 0], jnp.ones(4, jnp.float32)

    out_x, _ = xla_solve(state12, feet, ref12, feet, seq, cur, prev, _state(P))
    out_p, _ = pls_solve(state12, feet, ref12, feet, seq, cur, prev, _state(P))

    np.testing.assert_allclose(np.asarray(out_p.grfs), np.asarray(out_x.grfs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.predicted_state),
                               np.asarray(out_x.predicted_state), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(out_p.best_cost), float(out_x.best_cost),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.best_parameters),
                               np.asarray(out_x.best_parameters), atol=1e-6)


def test_pallas_mppi_update_moves_toward_lower_cost():
    """With real noise, one fused MPPI tick from a zero incumbent produces finite
    parameters whose cost the next tick can only see as its (weighted) incumbent —
    and the solve chain keeps the cost finite and bounded."""
    cfg = make_config("aliengo", mpc_type="sampling")
    cfg = replace_config(cfg, **{"mpc.sampling.method": "mppi",
                                 "mpc.sampling.sigma_mppi": 1.0})
    solve, P = make_pallas_sampling_solver(cfg, num_samples=256, interpret=True,
                                           tile=128)
    state12, feet, ref12, seq = _scene(cfg)
    cur, prev = seq[:, 0], jnp.ones(4, jnp.float32)
    st = _state(P, sigma=1.0)
    costs = []
    for _ in range(3):
        out, st = solve(state12, feet, ref12, feet, seq, cur, prev, st)
        costs.append(float(out.best_cost))
        assert np.all(np.isfinite(np.asarray(out.grfs)))
    assert all(np.isfinite(c) and c < 1e6 for c in costs)


def test_pallas_cem_sigma_refit_changes_sigma():
    cfg = make_config("aliengo", mpc_type="sampling")
    cfg = replace_config(cfg, **{"mpc.sampling.method": "cem_mppi"})
    solve, P = make_pallas_sampling_solver(cfg, num_samples=256, interpret=True,
                                           tile=128)
    state12, feet, ref12, seq = _scene(cfg)
    cur, prev = seq[:, 0], jnp.ones(4, jnp.float32)
    st = _state(P, sigma=3.0)
    out, st2 = solve(state12, feet, ref12, feet, seq, cur, prev, st)
    s = np.asarray(st2.sigma)
    assert s.shape == (P,)
    assert np.all(s >= cfg.mpc.sampling.cem_sigma_min - 1e-6)
    assert np.all(s <= cfg.mpc.sampling.cem_sigma_max + 1e-6)
    assert not np.allclose(s, 3.0)  # the refit actually ran


def test_pallas_cem_fused_merge_matches_host_topk():
    """The in-kernel global elite merge + sigma refit (sequential-grid
    accumulator, replace-max insertion) is EXACT: on the same PRNG stream it
    reproduces the host path (per-tile top-K outputs -> jax.lax.top_k over all
    tiles' elites -> variance refit, ops.cem_sigma_update) bit-for-bit up to
    f32 accumulation order — softmax mean, best cost and refitted sigma."""
    from quadruped_pympc_tamols_tpu.controllers.sampling.splines import (
        make_step_major_basis,
    )
    from quadruped_pympc_tamols_tpu.dynamics.srbd import make_params
    from quadruped_pympc_tamols_tpu.ops.rollout_pallas import (
        advance_seed,
        cem_sigma_update,
        make_pallas_iteration,
        mppi_combine,
    )

    cfg = make_config("aliengo", mpc_type="sampling")
    cfg = replace_config(cfg, **{"mpc.sampling.method": "cem_mppi"})
    sp = cfg.mpc.sampling
    solve, P = make_pallas_sampling_solver(cfg, num_samples=384, interpret=True,
                                           tile=128)  # 3 tiles
    state12, feet, ref12, seq = _scene(cfg)
    cur, prev = seq[:, 0], jnp.ones(4, jnp.float32)
    st = _state(P, sigma=3.0)
    out_f, st_f = solve(state12, feet, ref12, feet, seq, cur, prev, st)

    # Host path: the NON-fused iteration on the same seed (same per-tile PRNG
    # streams), combined outside the kernel.
    it = make_pallas_iteration(cfg, 384, interpret=True, method="cem_mppi",
                               tile=128, fuse_combine=False)
    seed, _ = advance_seed(st.key)
    srbd = make_params(cfg)
    share = (srbd.mass * 9.81 / jnp.maximum(jnp.sum(seq, axis=0), 1.0)).astype(
        jnp.float32)
    W = jnp.asarray(make_step_major_basis(sp.parametrization, cfg.mpc.horizon,
                                          sp.num_splines), jnp.float32)[None]
    outs = it.fn(jnp.zeros(P, jnp.float32), seed, state12, feet.reshape(12),
                 ref12, seq[None], share[None], W, jnp.zeros(1, jnp.float32),
                 jnp.full(P, 3.0, jnp.float32))
    mean_h, beta_h = mppi_combine(outs.costs, outs.z, outs.s,
                                  sp.mppi_temperature)
    sigma_h = cem_sigma_update(outs.ecosts, outs.eparams, sp.cem_elite,
                               sp.cem_sigma_min, sp.cem_sigma_max)

    np.testing.assert_allclose(np.asarray(out_f.best_parameters),
                               np.asarray(mean_h), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(out_f.best_cost), float(beta_h), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_f.sigma), np.asarray(sigma_h),
                               rtol=2e-5, atol=2e-5)


def test_pallas_cem_chained_iterations():
    """cem_mppi iterations chain inside one kernel launch too (the elite merge
    and sigma refit live in the accumulator, so no host round-trip is needed):
    outputs stay finite and the refitted sigma respects its clamp."""
    cfg = make_config("aliengo", mpc_type="sampling")
    cfg3 = replace_config(cfg, **{"mpc.sampling.method": "cem_mppi",
                                  "mpc.sampling.num_iterations": 3})
    solve, P = make_pallas_sampling_solver(cfg3, num_samples=256, interpret=True,
                                           tile=128)
    state12, feet, ref12, seq = _scene(cfg3)
    out, st2 = solve(state12, feet, ref12, feet, seq, seq[:, 0], jnp.ones(4),
                     _state(P, sigma=3.0))
    assert np.isfinite(float(out.best_cost))
    assert np.all(np.isfinite(np.asarray(out.grfs)))
    s = np.asarray(st2.sigma)
    sp = cfg3.mpc.sampling
    assert np.all(s >= sp.cem_sigma_min - 1e-6)
    assert np.all(s <= sp.cem_sigma_max + 1e-6)
    assert not np.allclose(s, 3.0)


@pytest.mark.parametrize("optimize_swing", [False, True])
def test_pallas_gait_adaptive_matches_xla_zero_noise(optimize_swing):
    cfg = _zero_noise_cfg("random_sampling")
    K = len(cfg.mpc.step_freq_available)
    xla_solve, P = make_gait_adaptive_solver(cfg, num_samples=K * 128)
    pls_solve, P2 = make_pallas_gait_adaptive_solver(cfg, num_samples=K * 128,
                                                     interpret=True, tile=128)
    assert P == P2
    state12, feet, ref12, seq = _scene(cfg)
    cur, prev = seq[:, 0], jnp.ones(4, jnp.float32)
    phase = jnp.asarray([0.1, 0.6, 0.6, 0.1], jnp.float32)
    nominal = jnp.asarray(cfg.gait_params.step_freq, jnp.float32)
    osw = jnp.asarray(bool(optimize_swing))

    out_x, _ = xla_solve(state12, feet, ref12, feet, phase, nominal, osw, seq,
                         cur, prev, _state(P))
    out_p, _ = pls_solve(state12, feet, ref12, feet, phase, nominal, osw, seq,
                         cur, prev, _state(P))

    np.testing.assert_allclose(np.asarray(out_p.grfs), np.asarray(out_x.grfs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(out_p.best_freq), float(out_x.best_freq))
    np.testing.assert_allclose(float(out_p.best_cost), float(out_x.best_cost),
                               rtol=1e-4)


def test_pallas_chained_iterations_improve_best_cost():
    """num_iterations > 1 for random_sampling/mppi runs ALL iterations inside
    ONE kernel launch (num_chained grid axis). Iteration 0 of the chained build
    draws the same PRNG stream as the single-iteration build (seed offsets are
    iteration-indexed from the same base), and the running incumbent is
    re-evaluated as sample 0 of every later iteration, so the chained best cost
    is exactly monotone: best(3 iters) <= best(1 iter)."""
    cfg = make_config("aliengo", mpc_type="sampling")
    cfg1 = replace_config(cfg, **{"mpc.sampling.num_samples": 256})
    cfg3 = replace_config(cfg1, **{"mpc.sampling.num_iterations": 3})
    s1, P = make_pallas_sampling_solver(cfg1, num_samples=256, interpret=True,
                                        tile=128)
    s3, _ = make_pallas_sampling_solver(cfg3, num_samples=256, interpret=True,
                                        tile=128)
    state12, feet, ref12, seq = _scene(cfg1)
    st = _state(P)
    out1, _ = s1(state12, feet, ref12, feet, seq, seq[:, 0], jnp.ones(4), st)
    out3, _ = s3(state12, feet, ref12, feet, seq, seq[:, 0], jnp.ones(4), st)
    assert float(out3.best_cost) <= float(out1.best_cost) + 1e-5
    assert np.all(np.isfinite(np.asarray(out3.grfs)))

    # mppi chains through the in-kernel S/Z incumbent hand-off: finite outputs.
    cfgm = replace_config(cfg3, **{"mpc.sampling.method": "mppi"})
    sm, Pm = make_pallas_sampling_solver(cfgm, num_samples=256, interpret=True,
                                         tile=128)
    outm, _ = sm(state12, feet, ref12, feet, seq, seq[:, 0], jnp.ones(4),
                 _state(Pm))
    assert np.isfinite(float(outm.best_cost))
    assert np.all(np.isfinite(np.asarray(outm.grfs)))
