"""Headline benchmark: 10,000-rollout sampling-MPC solve on one chip.

Reference baseline: <2 ms for 10k parallel rollouts on an RTX 4050 mobile GPU
(/root/reference/README.md:23, BASELINE.md); the driver metric is MPC solves/s per
chip (BASELINE.json). We report the per-solve device time measured by chaining K full
solves inside one jitted loop (controller state threads through, so every solve does
real work: fresh noise, 10k rollouts, optimizer update, GRF extraction). Single-call
wall latency (includes host->device dispatch through this environment's TPU tunnel)
is reported alongside as sync_ms/p99.

Prints ONE JSON line:
{"metric": ..., "value": per_solve_ms, "unit": "ms", "vs_baseline": 2.0/value, ...}.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_pympc_tamols_tpu import make_config, replace_config
from quadruped_pympc_tamols_tpu.controllers.sampling import (
    SamplingState,
    make_sampling_solver,
)

BASELINE_MS = 2.0
CHAIN = 50


def best_of(thunk, divisor, n=3):
    """Minimum normalized elapsed time over n runs of thunk() (tunnel-variance
    resistant; thunk must block until device completion)."""
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        thunk()
        best = min(best, (time.perf_counter() - t0) / divisor * 1e3)
    return best


def main():
    cfg = make_config("aliengo", mpc_type="sampling")
    cfg = replace_config(cfg, **{"mpc.sampling.num_samples": 10000,
                                 "mpc.sampling.method": "random_sampling",
                                 "mpc.sampling.parametrization": "cubic_spline"})
    solve, P = make_sampling_solver(cfg)

    state12 = jnp.asarray(
        np.array([0.0, 0.0, cfg.sim.ref_z - 0.03, 0.1, 0, 0, 0, 0, 0, 0, 0, 0]), jnp.float32)
    feet = jnp.asarray([[0.25, 0.15, 0], [0.25, -0.15, 0],
                        [-0.25, 0.15, 0], [-0.25, -0.15, 0]], jnp.float32)
    ref12 = jnp.asarray(
        np.array([0.0, 0.0, cfg.sim.ref_z, 0.2, 0, 0, 0, 0, 0, 0, 0, 0]), jnp.float32)
    seq = np.ones((4, cfg.mpc.horizon), np.float32)
    seq[1, 6:] = 0.0
    seq[2, 6:] = 0.0
    seq_j = jnp.asarray(seq)
    cur = seq_j[:, 0]
    prev = jnp.ones(4, jnp.float32)

    st = SamplingState(jnp.zeros(P, jnp.float32), jax.random.PRNGKey(0),
                       jnp.full(P, cfg.mpc.sampling.sigma_cem_mppi, jnp.float32))

    @jax.jit
    def solve_chain(st):
        def body(_, s):
            _, s = solve(state12, feet, ref12, feet, seq_j, cur, prev, s)
            return s
        return jax.lax.fori_loop(0, CHAIN, body, st)

    # Warmup / compile both programs.
    out, st1 = solve(state12, feet, ref12, feet, seq_j, cur, prev, st)
    jax.block_until_ready(out)
    st2 = solve_chain(st)
    jax.block_until_ready(st2)

    # Device throughput: K chained solves per jitted call, best-of-3.
    reps = 10

    def run_chain():
        s = st
        for _ in range(reps):
            s = solve_chain(s)
        jax.block_until_ready(s)

    per_solve_ms = best_of(run_chain, reps * CHAIN)

    # Per-tick latency THROUGH THIS ENVIRONMENT'S TPU TUNNEL, decomposed
    # honestly (round-3's pipelined number mixed these up and read slower than
    # sync). A control loop needs fresh GRFs on host every tick, and a
    # fresh-result readback costs a full tunnel round trip here (~26 ms
    # measured; PCIe-local / TPU-VM deployments pay microseconds for the same
    # 12-float transfer). Three numbers:
    #  * dispatch_fence_ms — enqueue + device completion, no readback: the
    #    tick cost a PCIe-local deployment would see (its readback is ~us);
    #  * sync_call_median_ms — enqueue + completion + fresh GRF readback: the
    #    synchronous tick through the tunnel;
    #  * pipelined_tick_ms — enqueue tick k, read back tick k-1 (one-tick-
    #    stale control; sampling.pipelined / ControllerNode 'pipelined' mode):
    #    async dispatch hides the whole device solve + fence behind the
    #    readback, so this sits BELOW the sync tick by about that much. The
    #    readback RTT itself is the serialized transfer — no host-side
    #    pipelining can hide it, only a local interconnect removes it.
    fence = []
    s2 = st
    for _ in range(40):
        t0 = time.perf_counter()
        out, s2 = solve(state12, feet, ref12, feet, seq_j, cur, prev, s2)
        jax.block_until_ready(out)
        fence.append((time.perf_counter() - t0) * 1e3)
    fence = np.asarray(fence[2:])

    sync = []
    s2 = st
    for _ in range(40):
        t0 = time.perf_counter()
        out, s2 = solve(state12, feet, ref12, feet, seq_j, cur, prev, s2)
        np.asarray(out.grfs)  # fresh host readback of the control
        sync.append((time.perf_counter() - t0) * 1e3)
    sync = np.asarray(sync[2:])

    pipe = []
    s3, pending = st, None
    for _ in range(40):
        t0 = time.perf_counter()
        out, s3 = solve(state12, feet, ref12, feet, seq_j, cur, prev, s3)
        if pending is not None:
            np.asarray(pending.grfs)
        pending = out
        pipe.append((time.perf_counter() - t0) * 1e3)
    jax.block_until_ready(pending)
    pipe = np.asarray(pipe[2:])  # first tick has no completed predecessor

    rti_ms, rti_fb_ms = bench_gradient(cfg)
    qp_ladder = bench_qp_ladder()
    pallas = bench_pallas(cfg) or {}
    pallas_ms = pallas.get("random_sampling")
    tamols_ms = bench_tamols(cfg)
    wb_ms = bench_wb_tick(cfg)
    fleet_sps = bench_fleet(cfg)
    headline = min(per_solve_ms, pallas_ms) if pallas_ms else per_solve_ms

    # Speed-of-light accounting for the fused rollout: ~430 f32 FLOPs per
    # sample-step (spline eval 4x~30 + cone clamp 4x~12 + SRB fd ~220 + Euler 24 +
    # cost ~24), VPU-bound (no MXU-shaped matmuls in the rollout body). The
    # N/H sweeps (`python bench.py --roofline`) show the solve is dominated by an
    # N- and H-independent fixed overhead (PRNG + per-launch latency + optimizer
    # partials), with a marginal rollout rate of ~2.9e9 sample-steps/s — the
    # binding limit is VPU instruction issue on (8,128) vector ops, not FLOPs.
    FLOPS_PER_SAMPLE_STEP = 430.0
    VPU_PEAK_F32 = 3.0e12  # v5e VPU estimate: 8 lanes*128*2 ops * ~1.4e9 Hz * 8 cores
    sample_steps_per_s = 10000 * cfg.mpc.horizon / (headline * 1e-3)
    vpu_util = sample_steps_per_s * FLOPS_PER_SAMPLE_STEP / VPU_PEAK_F32

    def r4(x):
        return round(x, 4) if x is not None else None

    result = {
        "metric": "sampling_mpc_10k_rollout_solve_ms",
        "value": round(headline, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / headline, 3),
        "xla_solve_ms": round(per_solve_ms, 4),
        "pallas_fused_solve_ms": r4(pallas_ms),
        "pallas_mppi_ms": r4(pallas.get("mppi")),
        "pallas_cem_mppi_ms": r4(pallas.get("cem_mppi")),
        "pallas_gait_adaptive_ms": r4(pallas.get("gait_adaptive")),
        "closed_loop_solve_ms": r4(pallas.get("closed_loop")),
        "solves_per_s_per_chip": round(1e3 / headline, 1),
        "dispatch_fence_ms": round(float(np.median(fence)), 3),
        "sync_call_median_ms": round(float(np.median(sync)), 3),
        "sync_call_p99_ms": round(float(np.percentile(sync, 99)), 3),
        "pipelined_tick_ms": round(float(np.median(pipe)), 3),
        "tunnel_readback_note": ("sync/pipelined include a fresh-GRF host "
                                 "readback (~1 tunnel RTT here; ~us on "
                                 "PCIe-local deployments, whose tick is "
                                 "dispatch_fence_ms); pipelined hides the "
                                 "solve+fence behind the readback"),
        "rti_sqp_solve_ms": round(rti_ms, 4),
        "rti_sqp_vs_5ms_baseline": round(5.0 / rti_ms, 3),
        "rti_feedback_phase_ms": round(rti_fb_ms, 4),
        "qp_ladder_n_ticks": qp_ladder.get("n_ticks"),
        "qp_gap_vs_f64_max_N": r4(qp_ladder.get("qp_gap_vs_f64_max_N")),
        "qp_gap_vs_f64_rel": (round(qp_ladder["qp_gap_vs_f64_rel"], 6)
                              if qp_ladder else None),
        "rollout_gap_vs_f64_rel": (round(qp_ladder["rollout_gap_vs_f64_rel"], 9)
                                   if "rollout_gap_vs_f64_rel" in qp_ladder
                                   else None),
        "tamols_score_ms": r4(tamols_ms),
        "wb_swing_ik_tick_ms": r4(wb_ms),
        "fleet_scenario_steps_per_s": (round(fleet_sps, 1)
                                       if fleet_sps is not None else None),
        "fleet_note": ("64 on-device closed-loop MPC scenarios with perlin "
                       "terrain, fused TAMOLS and the reflex analogue, one "
                       "chip"),
        "rollout_sample_steps_per_s": round(sample_steps_per_s, 0),
        "est_vpu_utilization": round(vpu_util, 4),
        "device": str(jax.devices()[0]),
        "num_samples": 10000,
        "horizon": cfg.mpc.horizon,
    }
    result["regressions"] = compare_to_previous(result)
    print(json.dumps(result))


def bench_qp_ladder():
    """Solver-accuracy ladder (tests/test_f64_ladder.py run as a bench metric):
    max/mean first-stage GRF gap between the production fixed-iteration f32 IPM
    and a machine-precision f64 reference on 20 REAL closed-loop tick QPs — the
    SAME window as the regression test, so this reports the conservative
    measured gap rather than a lucky short window (an 8-tick window once read
    1000x rosier than the test's own number). (BASELINE.md <=1e-3 parity bar.)
    Returns {} on failure so the headline bench never dies on the ladder."""
    try:
        from quadruped_pympc_tamols_tpu.utils.verification import qp_ladder_report

        cfg = make_config("aliengo", mpc_type="nominal",
                          **{"sim.visual_foothold_adaptation": "blind"})
        rep = qp_ladder_report(cfg, n_ticks=20)
        try:
            from quadruped_pympc_tamols_tpu.utils.verification import (
                rollout_ladder_report,
            )
            rep.update(rollout_ladder_report())
        except Exception:
            pass
        return rep
    except Exception:
        import traceback
        traceback.print_exc()
        return {}


def compare_to_previous(result: dict) -> dict:
    """Regression tracking: compare this run against the most recent driver
    round record (BENCH_r*.json next to this script) and flag >20% moves in
    the wrong direction. ``*_ms``/gap fields regress upward; throughput /
    vs-baseline / utilization fields regress downward."""
    import glob
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not paths:
        return {"vs": None, "flagged": []}
    try:
        with open(paths[-1]) as f:
            prev = json.load(f).get("parsed") or {}
    except Exception:
        return {"vs": os.path.basename(paths[-1]), "flagged": ["unreadable"]}
    flagged = []
    for k, new in result.items():
        old = prev.get(k)
        if not isinstance(new, (int, float)) or isinstance(new, bool) \
                or not isinstance(old, (int, float)) or old <= 0 or new <= 0:
            continue
        if k.endswith("_ms") or "gap" in k:
            if new > 1.2 * old:
                flagged.append(f"{k}: {old} -> {new} (+{(new / old - 1) * 100:.0f}%)")
        elif "per_s" in k or k.startswith("vs_") or "utilization" in k:
            if new < old / 1.2:
                flagged.append(f"{k}: {old} -> {new} ({(new / old - 1) * 100:.0f}%)")
    return {"vs": os.path.basename(paths[-1]), "flagged": flagged}


def bench_pallas(cfg):
    """Fully-fused Pallas sampling solves: all three optimizers + the
    gait-adaptive variant share the kernel (ops/rollout_pallas.py). Returns a dict
    of per-solve ms. ``closed_loop`` chains solves through the predicted state
    (nothing dead-code-eliminated): the honest per-tick device cost."""
    try:
        from quadruped_pympc_tamols_tpu.controllers.sampling import SamplingState
        from quadruped_pympc_tamols_tpu.ops import (
            make_pallas_gait_adaptive_solver,
            make_pallas_sampling_solver,
        )

        state12 = jnp.zeros(12).at[2].set(cfg.sim.ref_z - 0.03)
        feet = jnp.asarray([[0.25, 0.15, 0], [0.25, -0.15, 0],
                            [-0.25, 0.15, 0], [-0.25, -0.15, 0]], jnp.float32)
        ref12 = jnp.zeros(12).at[2].set(cfg.sim.ref_z)
        seq = jnp.ones((4, cfg.mpc.horizon), jnp.float32)
        reps = 10

        def measure(solve, P, closed_loop=False):
            st = SamplingState(jnp.zeros(P, jnp.float32), jax.random.PRNGKey(0),
                               jnp.full(P, cfg.mpc.sampling.sigma_cem_mppi,
                                        jnp.float32))

            @jax.jit
            def chain(carry):
                def body(_, carry):
                    x, s = carry
                    out, s = solve(x, feet, ref12, feet, seq, seq[:, 0],
                                   jnp.ones(4), s)
                    return (out.predicted_state if closed_loop else x, s)
                return jax.lax.fori_loop(0, CHAIN, body, carry)

            jax.block_until_ready(chain((state12, st)))

            def run_chain():
                r = (state12, st)
                for _ in range(reps):
                    r = chain(r)
                jax.block_until_ready(r)

            return best_of(run_chain, reps * CHAIN)

        out = {}
        # Tile size is a per-method tuning knob: cem_mppi pays a per-tile
        # top-K extraction + merge, so it prefers FEWER, larger tiles
        # (measured: 2 x 5120 beats 5 x 2048 by ~25% for cem while plain
        # methods prefer 2048).
        for method, tl in (("random_sampling", 2048), ("mppi", 2048),
                           ("cem_mppi", 5120)):
            solve, P = make_pallas_sampling_solver(cfg, num_samples=10240,
                                                   method=method, tile=tl)
            out[method] = measure(solve, P)
        solve, P = make_pallas_sampling_solver(cfg, num_samples=10240,
                                               method="random_sampling", tile=2048)
        out["closed_loop"] = measure(solve, P, closed_loop=True)

        ga_solve, P = make_pallas_gait_adaptive_solver(cfg, num_samples=9216,
                                                       tile=1024)
        st = SamplingState(jnp.zeros(P, jnp.float32), jax.random.PRNGKey(0),
                           jnp.full(P, cfg.mpc.sampling.sigma_cem_mppi, jnp.float32))
        phase = jnp.asarray([0.1, 0.6, 0.6, 0.1], jnp.float32)

        @jax.jit
        def ga_chain(s):
            def body(_, s):
                _, s = ga_solve(state12, feet, ref12, feet, phase,
                                jnp.float32(1.4), jnp.asarray(True), seq,
                                seq[:, 0], jnp.ones(4), s)
                return s
            return jax.lax.fori_loop(0, CHAIN, body, s)

        jax.block_until_ready(ga_chain(st))

        def run_ga():
            r = st
            for _ in range(reps):
                r = ga_chain(r)
            jax.block_until_ready(r)

        out["gait_adaptive"] = best_of(run_ga, reps * CHAIN)
        return out
    except Exception:
        import traceback
        traceback.print_exc()
        return None


def bench_tamols(cfg):
    """Fused TAMOLS heightmap scoring (4 legs x all cells x all costs) — the
    reference's biggest pure-Python hot loop (visual_foothold_adaptation.py:176-228)."""
    try:
        from quadruped_pympc_tamols_tpu.planner.heightmap import GridHeightMap
        from quadruped_pympc_tamols_tpu.planner.tamols import make_tamols_scorer

        adapt = make_tamols_scorer(cfg, strategy="tamols")
        R, C = 13, 7
        hms = GridHeightMap(jnp.asarray(np.tile([[0.25, 0.15]], (4, 1)), jnp.float32),
                            jnp.zeros(4), jnp.full(4, 0.04),
                            jnp.zeros((4, R, C), jnp.float32))
        seeds = jnp.asarray([[0.25, 0.15, 0], [0.25, -0.15, 0],
                             [-0.25, 0.15, 0], [-0.25, -0.15, 0]], jnp.float32)
        hips = seeds.at[:, 2].set(cfg.robot.hip_height)
        args = (hms, seeds, hips, jnp.zeros(3).at[2].set(cfg.sim.ref_z),
                jnp.zeros(3).at[0].set(0.3), jnp.ones(4), seeds, seeds)

        @jax.jit
        def chain(x):
            def body(_, acc):
                out = adapt(*args)
                return acc + out[0][:, :2].sum()
            return jax.lax.fori_loop(0, CHAIN, body, x)

        jax.block_until_ready(chain(jnp.float32(0.0)))
        return best_of(lambda: jax.block_until_ready(chain(jnp.float32(0.0))), CHAIN)
    except Exception:
        import traceback
        traceback.print_exc()
        return None


def bench_wb_tick(cfg):
    """Fused per-control-step whole-body kernel (all-leg swing refs + IK)."""
    try:
        from quadruped_pympc_tamols_tpu.gait.swing import make_swing_ik_step

        step = make_swing_ik_step(cfg.robot)
        t = jnp.asarray([0.1, 0.0, 0.0, 0.1])
        period = jnp.full(4, 0.25)
        sh = jnp.full(4, cfg.sim.step_height)
        lo = jnp.asarray([[0.25, 0.15, 0], [0.25, -0.15, 0],
                          [-0.25, 0.15, 0], [-0.25, -0.15, 0]], jnp.float32)
        td = lo + jnp.asarray([0.06, 0.0, 0.0])
        mask = jnp.asarray([1.0, 0.0, 0.0, 1.0])
        bp = jnp.zeros(3).at[2].set(cfg.sim.ref_z)

        @jax.jit
        def chain(x):
            def body(_, acc):
                p, v, a, q = step(t, period, sh, lo, td, mask, td, bp + acc * 0,
                                  jnp.zeros(3))
                return acc + q.sum()
            return jax.lax.fori_loop(0, CHAIN, body, x)

        jax.block_until_ready(chain(jnp.float32(0.0)))
        return best_of(lambda: jax.block_until_ready(chain(jnp.float32(0.0))), CHAIN)
    except Exception:
        return None


def bench_fleet(cfg):
    """On-device scenario-fleet throughput (SURVEY P3): vmapped closed-loop
    MPC scenarios — gait timing, Raibert + fused TAMOLS footholds against
    per-scenario PERLIN heightfields, sampling solve, SRB physics, kinematic
    swing feet with the early-stance reflex analogue — chained on one chip.
    Returns scenario-steps/s (64 scenarios x 25 chained control ticks)."""
    try:
        from quadruped_pympc_tamols_tpu.parallel import (
            init_scenario_state,
            make_scenario_step,
            make_terrain_generator,
        )

        fcfg = replace_config(cfg, **{"mpc.sampling.num_samples": 128})
        B, CH = 64, 25
        step, P = make_scenario_step(fcfg, num_samples=128, terrain="perlin",
                                     reflexes=True)
        gen = make_terrain_generator("perlin")
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        states = jax.vmap(lambda k: init_scenario_state(fcfg, P, k, gen))(keys)
        cmd = jnp.asarray([0.25, 0.0, 0.0], jnp.float32)

        @jax.jit
        def chain(s):
            def body(_, s):
                s2, _ = jax.vmap(step, in_axes=(0, None))(s, cmd)
                return s2
            return jax.lax.fori_loop(0, CH, body, s)

        jax.block_until_ready(chain(states))
        ms_per_fleet_step = best_of(
            lambda: jax.block_until_ready(chain(states)), CH)
        return B * 1e3 / ms_per_fleet_step
    except Exception:
        import traceback
        traceback.print_exc()
        return None


def bench_gradient(cfg):
    """Gradient RTI-SQP solve time (reference baseline: <5 ms full feedback loop on
    an i7-13700H, README.md:13). Returns (full_solve_ms, feedback_phase_ms): the
    feedback phase is the latency-critical path of the RTI split (gradient refresh
    at the measured x0 + IP solve, reusing the preparation's linearization)."""
    from quadruped_pympc_tamols_tpu.controllers.gradient import make_rti_solver_split

    gcfg = make_config("aliengo", mpc_type="nominal")
    solve, prepare, feedback, dims = make_rti_solver_split(gcfg)
    H = dims.horizon
    x0 = jnp.zeros(12).at[2].set(0.30)
    feet_traj = jnp.tile(jnp.asarray([[0.25, 0.15, 0], [0.25, -0.15, 0],
                                      [-0.25, 0.15, 0], [-0.25, -0.15, 0]], jnp.float32),
                         (H, 1, 1))
    seq = jnp.ones((4, H))
    Xref = jnp.tile(jnp.zeros(12).at[2].set(0.35), (H, 1))
    Uref = jnp.zeros((H, 12)).at[:, 2::3].set(gcfg.robot.mass * 9.81 / 4)
    Uw = jnp.zeros((H, 12))

    @jax.jit
    def chain(U):
        def body(_, U):
            return solve(x0, feet_traj, seq, Xref, Uref, U).U
        return jax.lax.fori_loop(0, CHAIN, body, U)

    @jax.jit
    def fb_chain(prep, x):
        def body(_, x):
            out = feedback(prep, x, feet_traj, seq, Xref, Uref)
            # Data dependency serializes the chained solves.
            return x0 + 1e-9 * out.U[0, 0]
        return jax.lax.fori_loop(0, CHAIN, body, x)

    prep = prepare(x0, feet_traj, seq, Xref, Uref, Uref)
    jax.block_until_ready(chain(Uw))
    jax.block_until_ready(fb_chain(prep, x0))
    reps = 5

    def run_chain():
        r = Uw
        for _ in range(reps):
            r = chain(r)
        jax.block_until_ready(r)

    def run_fb_chain():
        r = x0
        for _ in range(reps):
            r = fb_chain(prep, r)
        jax.block_until_ready(r)

    return best_of(run_chain, reps * CHAIN), best_of(run_fb_chain, reps * CHAIN)


def roofline_main():
    """`python bench.py --roofline`: empirical speed-of-light decomposition of the
    fused sampling kernel.

    Two sweeps over the REAL kernel (chained solves, best-of-3):
    * sample-count sweep at fixed horizon -> fixed overhead (intercept) vs
      marginal per-sample cost (slope). The marginal rate is the rollout's true
      throughput; the intercept is PRNG + launch + optimizer-partial latency.
    * horizon sweep at fixed N -> per-step marginal cost (near zero: the rollout
      body hides behind the fixed overhead at production sizes).

    Against peaks: the rollout body issues ~230 vector ops per sample-step on
    (8,128) f32 tiles, mostly single-op (non-FMA) adds/muls, so the FLOP
    "utilization" ceiling for this op stream is the VPU ISSUE rate, not the FMA
    peak. utilization_of_issue_bound reports measured marginal throughput over
    that issue-bound model."""
    from quadruped_pympc_tamols_tpu.controllers.sampling import SamplingState
    from quadruped_pympc_tamols_tpu.ops import make_pallas_sampling_solver

    cfg = make_config("aliengo", mpc_type="sampling")
    feet = jnp.asarray([[0.25, 0.15, 0], [0.25, -0.15, 0],
                        [-0.25, 0.15, 0], [-0.25, -0.15, 0]], jnp.float32)
    ref12 = jnp.zeros(12).at[2].set(cfg.sim.ref_z)
    state12 = jnp.zeros(12).at[2].set(cfg.sim.ref_z - 0.03)
    seq = jnp.ones((4, cfg.mpc.horizon), jnp.float32)

    def measure(num_samples, tile=2048):
        solve, P = make_pallas_sampling_solver(cfg, num_samples=num_samples,
                                               tile=tile)
        st = SamplingState(jnp.zeros(P, jnp.float32), jax.random.PRNGKey(0),
                           jnp.full(P, 3.0, jnp.float32))

        @jax.jit
        def chain(s):
            def body(_, s):
                _, s = solve(state12, feet, ref12, feet, seq, seq[:, 0],
                             jnp.ones(4), s)
                return s
            return jax.lax.fori_loop(0, CHAIN, body, s)

        jax.block_until_ready(chain(st))
        reps = 5

        def run():
            r = st
            for _ in range(reps):
                r = chain(r)
            jax.block_until_ready(r)

        return best_of(run, reps * CHAIN)

    def measure_kernel_only(num_samples, tile=2048):
        """The bare fused iteration (no solver wrapper): isolates the Mosaic
        kernel-invocation cost from the wrapper's XLA ops."""
        from quadruped_pympc_tamols_tpu.controllers.sampling.splines import (
            make_step_major_basis,
        )
        from quadruped_pympc_tamols_tpu.ops.rollout_pallas import (
            make_pallas_iteration,
        )

        it = make_pallas_iteration(cfg, num_samples, tile=tile, fuse_combine=True)
        sp = cfg.mpc.sampling
        W = jnp.asarray(make_step_major_basis(sp.parametrization, cfg.mpc.horizon,
                                              sp.num_splines), jnp.float32)[None]
        feet12 = feet.reshape(12)
        seqg = seq[None]
        share = jnp.full((1, cfg.mpc.horizon), 60.0, jnp.float32)
        offs = jnp.zeros((1,), jnp.float32)
        sigma = jnp.full((it.P,), 3.0, jnp.float32)

        @jax.jit
        def chain(p):
            def body(i, p):
                return it.fn(p, i, state12, feet12, ref12, seqg, share, W, offs,
                             sigma).winner
            return jax.lax.fori_loop(0, CHAIN, body, p)

        p0 = jnp.zeros((it.P,), jnp.float32)
        jax.block_until_ready(chain(p0))
        reps = 5

        def run():
            r = p0
            for _ in range(reps):
                r = chain(r)
            jax.block_until_ready(r)

        return best_of(run, reps * CHAIN)

    ns = [2048, 10240, 40960]
    times = {n: measure(n) for n in ns}
    # Least-squares line t = fixed + slope * N over the sweep.
    A = np.stack([np.ones(len(ns)), np.asarray(ns, float)], axis=1)
    fixed_ms, slope_ms = np.linalg.lstsq(A, np.asarray([times[n] for n in ns]),
                                         rcond=None)[0]
    marginal_rate = cfg.mpc.horizon / (slope_ms * 1e-3)  # sample-steps/s

    # Issue-bound model: ~230 vector ops per sample-step, one (8,128) tile of
    # 1024 f32 per op-instruction, ~0.94 GHz issue.
    OPS_PER_SAMPLE_STEP = 230.0
    ISSUE_HZ = 0.94e9
    issue_bound_rate = ISSUE_HZ * 1024 / OPS_PER_SAMPLE_STEP

    # Launch-bound decomposition at the production point: solve = kernel-only +
    # wrapper; kernel-only at two tile sizes separates per-tile cost (PRNG seed,
    # block writeback) from the N- and tile-independent invocation cost.
    kern_2048 = measure_kernel_only(10240, tile=2048)  # 5 tiles
    kern_4096 = measure_kernel_only(12288, tile=4096)  # 3 tiles, 2048 extra samples
    # Solve the 3-unknown model t(N, tile) = launch + (N/tile)*p + N*pm
    # consistently: the sweep slope at tile=2048 already includes the per-tile
    # cost amortized per sample (slope = pm + p/2048), so
    #   kern_2048 - kern_4096 = 2p - 2048*pm = 3p - 2048*slope
    # => p = (kern_2048 - kern_4096 + 2048*slope)/3 (the old expression divided
    # by 2 instead of 3, overstating p by 1.5x and pushing ~7.5 per-tile units
    # out of the launch term).
    marg = float(slope_ms)
    per_tile_ms = max(0.0, (kern_2048 - kern_4096 + 2048 * marg) / 3.0)
    pm_ms = marg - per_tile_ms / 2048.0
    launch_ms = kern_2048 - 5 * per_tile_ms - 10240 * pm_ms
    wrapper_ms = times[10240] - kern_2048

    print(json.dumps({
        "metric": "pallas_roofline",
        "sweep_ms": {str(n): round(times[n], 4) for n in ns},
        "fixed_overhead_ms": round(float(fixed_ms), 4),
        "marginal_ns_per_sample": round(float(slope_ms) * 1e6 / 1.0, 3),
        "marginal_sample_steps_per_s": round(float(marginal_rate), 0),
        "issue_bound_sample_steps_per_s": round(issue_bound_rate, 0),
        "utilization_of_issue_bound": round(float(marginal_rate) / issue_bound_rate, 3),
        "kernel_only_10k_ms": round(float(kern_2048), 4),
        "wrapper_overhead_ms": round(float(wrapper_ms), 4),
        "per_tile_us": round(float(per_tile_ms) * 1e3, 2),
        "launch_overhead_ms": round(float(launch_ms), 4),
        "binding_limit": "VPU instruction issue (non-FMA op stream) at large N; "
                         "the N-independent intercept is LAUNCH-BOUND: it sits "
                         "inside the bare kernel invocation (in-kernel combine + "
                         "LCG seeding cut the wrapper to ~5 us and per-tile cost "
                         "to ~2 us; the remainder is Mosaic dispatch)",
    }))


def scaling_main():
    """`python bench.py --scaling`: multi-host weak-scaling efficiency table.

    Forks real jax.distributed process groups on local CPU (the only multi-host
    stand-in available here — the bench box has one TPU chip) and reports fleet
    throughput + parallel efficiency per mesh shape (BASELINE.md: scaling measured
    at 1 chip / 1 host / N>=2 hosts)."""
    from quadruped_pympc_tamols_tpu.parallel.multihost import scaling_table

    # Production-shaped per-host work (4 scenarios x 512 rollouts per step) so the
    # one cross-host psum per step is amortized the way it would be on real DCN.
    rows = scaling_table(proc_counts=(1, 2, 4), local_devices=2, n_steps=8,
                         scenarios_per_device=4, num_samples=512)
    print(json.dumps({"metric": "multihost_scaling", "rows": rows}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_main()
    elif "--roofline" in sys.argv:
        roofline_main()
    else:
        main()
