"""Headline benchmark: 10,000-rollout sampling-MPC solve on one chip.

Reference baseline: <2 ms for 10k parallel rollouts on an RTX 4050 mobile GPU
(/root/reference/README.md:23, BASELINE.md); the driver metric is MPC solves/s per
chip (BASELINE.json). We report the per-solve device time measured by chaining K full
solves inside one jitted loop (controller state threads through, so every solve does
real work: fresh noise, 10k rollouts, optimizer update, GRF extraction).

NOISE MODEL (round-5 redesign): every metric is measured in THREE interleaved
passes over pre-built, pre-warmed thunks — the per-metric value is the MEDIAN
across passes and ``spread_pct`` records (max-min)/median per metric. Regression
tracking compares against BOTH the previous driver round and the per-metric BEST
recorded round, and a move is only flagged when it exceeds the measured spread
(rounds 2-4 showed the tunnel rewriting history: a noisy capture doubled sync
latencies while sub-threshold headline creep went unflagged).

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
PASSES = 3


def best_of(thunk, divisor, n=2):
    """Minimum normalized elapsed time over n runs of thunk() (tunnel-variance
    resistant; thunk must block until device completion). The cross-pass median
    in main() provides the second robustness layer."""
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        thunk()
        best = min(best, (time.perf_counter() - t0) / divisor * 1e3)
    return best


def build_sampling_xla(cfg, inputs):
    """XLA (non-Pallas) sampling solve + the tick-latency thunks."""
    state12, feet, ref12, seq_j, cur, prev = inputs
    solve, P = make_sampling_solver(cfg)
    st = SamplingState(jnp.zeros(P, jnp.float32), jax.random.PRNGKey(0),
                       jnp.full(P, cfg.mpc.sampling.sigma_cem_mppi, jnp.float32))

    @jax.jit
    def solve_chain(st):
        def body(_, s):
            _, s = solve(state12, feet, ref12, feet, seq_j, cur, prev, s)
            return s
        return jax.lax.fori_loop(0, CHAIN, body, st)

    out, _ = solve(state12, feet, ref12, feet, seq_j, cur, prev, st)
    jax.block_until_ready(out)
    jax.block_until_ready(solve_chain(st))
    reps = 10

    def xla_thunk():
        def run_chain():
            s = st
            for _ in range(reps):
                s = solve_chain(s)
            jax.block_until_ready(s)
        return {"xla_solve_ms": best_of(run_chain, reps * CHAIN)}

    def latency_thunk():
        # Per-tick latency THROUGH THIS ENVIRONMENT'S TPU TUNNEL. All of these
        # are TUNNEL-BOUND LOWER-BOUND observations, not deployment
        # predictions: even the completion fence costs a full tunnel RTT here
        # (r04 measured fence 60.4 ~ sync 60.2), so the honest PCIe-local tick
        # proxy is the device solve time + a modeled ~10 us local readback —
        # reported separately as local_tick_model_ms.
        #  * enqueue_ms — dispatch only (async futures returned, no fence): the
        #    host-side cost of issuing a tick;
        #  * dispatch_fence_ms — enqueue + device-completion fence (>= 1 RTT);
        #  * sync_call_median_ms — enqueue + completion + fresh-GRF readback;
        #  * pipelined_tick_ms — enqueue tick k, read back tick k-1
        #    (sampling.pipelined mode): hides the solve behind the readback.
        n_it = 25
        enq = []
        s2 = st
        for _ in range(n_it):
            t0 = time.perf_counter()
            out, s2 = solve(state12, feet, ref12, feet, seq_j, cur, prev, s2)
            enq.append((time.perf_counter() - t0) * 1e3)
        jax.block_until_ready(s2)

        fence = []
        s2 = st
        for _ in range(n_it):
            t0 = time.perf_counter()
            out, s2 = solve(state12, feet, ref12, feet, seq_j, cur, prev, s2)
            jax.block_until_ready(out)
            fence.append((time.perf_counter() - t0) * 1e3)

        sync = []
        s2 = st
        for _ in range(n_it):
            t0 = time.perf_counter()
            out, s2 = solve(state12, feet, ref12, feet, seq_j, cur, prev, s2)
            np.asarray(out.grfs)  # fresh host readback of the control
            sync.append((time.perf_counter() - t0) * 1e3)

        pipe = []
        s3, pending = st, None
        for _ in range(n_it):
            t0 = time.perf_counter()
            out, s3 = solve(state12, feet, ref12, feet, seq_j, cur, prev, s3)
            if pending is not None:
                np.asarray(pending.grfs)
            pending = out
            pipe.append((time.perf_counter() - t0) * 1e3)
        jax.block_until_ready(pending)
        return {
            "enqueue_ms": float(np.median(enq[2:])),
            "dispatch_fence_ms": float(np.median(fence[2:])),
            "sync_call_median_ms": float(np.median(sync[2:])),
            "sync_call_p99_ms": float(np.percentile(sync[2:], 99)),
            "pipelined_tick_ms": float(np.median(pipe[1:])),
        }

    return [xla_thunk, latency_thunk]


def build_pallas(cfg, inputs):
    """Fully-fused Pallas sampling solves: all three optimizers + the
    gait-adaptive variant share the kernel (ops/rollout_pallas.py), plus the
    solve-time-vs-N curve (10k/40k/160k samples — the 2 ms budget's headroom;
    VERDICT r4 ask #5)."""
    try:
        from quadruped_pympc_tamols_tpu.ops import (
            make_pallas_gait_adaptive_solver,
            make_pallas_sampling_solver,
        )

        state12, feet, ref12, seq, cur, prev = inputs
        reps = 10

        def make_chain(solve, P, closed_loop=False):
            st = SamplingState(jnp.zeros(P, jnp.float32), jax.random.PRNGKey(0),
                               jnp.full(P, cfg.mpc.sampling.sigma_cem_mppi,
                                        jnp.float32))

            @jax.jit
            def chain(carry):
                def body(_, carry):
                    x, s = carry
                    out, s = solve(x, feet, ref12, feet, seq, cur, jnp.ones(4), s)
                    return (out.predicted_state if closed_loop else x, s)
                return jax.lax.fori_loop(0, CHAIN, body, carry)

            jax.block_until_ready(chain((state12, st)))

            def run():
                r = (state12, st)
                for _ in range(reps):
                    r = chain(r)
                jax.block_until_ready(r)

            return lambda: best_of(run, reps * CHAIN)

        chains = {}
        # Tile size is a per-method tuning knob: cem_mppi pays a per-tile
        # top-K extraction + merge, so it prefers FEWER, larger tiles
        # (measured: 2 x 5120 beats 5 x 2048 by ~25% for cem while plain
        # methods prefer 2048).
        for key, method, tl in (("pallas_fused_solve_ms", "random_sampling", 2048),
                                ("pallas_mppi_ms", "mppi", 2048),
                                ("pallas_cem_mppi_ms", "cem_mppi", 5120)):
            solve, P = make_pallas_sampling_solver(cfg, num_samples=10240,
                                                   method=method, tile=tl)
            chains[key] = make_chain(solve, P)
        solve, P = make_pallas_sampling_solver(cfg, num_samples=10240,
                                               method="random_sampling", tile=2048)
        chains["closed_loop_solve_ms"] = make_chain(solve, P, closed_loop=True)
        # Solve-time-vs-N: the marginal rollout rate says 160k samples still fit
        # far inside the 2 ms budget — publish the measured curve.
        for n in (40960, 163840):
            solve, P = make_pallas_sampling_solver(cfg, num_samples=n,
                                                   method="random_sampling",
                                                   tile=4096)
            chains[f"solve_ms_n{n}"] = make_chain(solve, P)

        # One tile per group: with the per-group fused accumulators the merge
        # degenerates to the init write (measured ~5% over 9 x 1024 tiles).
        ga_solve, P = make_pallas_gait_adaptive_solver(cfg, num_samples=9216,
                                                       tile=3072)
        st = SamplingState(jnp.zeros(P, jnp.float32), jax.random.PRNGKey(0),
                           jnp.full(P, cfg.mpc.sampling.sigma_cem_mppi, jnp.float32))
        phase = jnp.asarray([0.1, 0.6, 0.6, 0.1], jnp.float32)

        @jax.jit
        def ga_chain(s):
            def body(_, s):
                _, s = ga_solve(state12, feet, ref12, feet, phase,
                                jnp.float32(1.4), jnp.asarray(True), seq,
                                cur, jnp.ones(4), s)
                return s
            return jax.lax.fori_loop(0, CHAIN, body, s)

        jax.block_until_ready(ga_chain(st))

        def run_ga():
            r = st
            for _ in range(reps):
                r = ga_chain(r)
            jax.block_until_ready(r)

        chains["pallas_gait_adaptive_ms"] = lambda: best_of(run_ga, reps * CHAIN)

        def thunk():
            return {k: fn() for k, fn in chains.items()}
        return [thunk]
    except Exception:
        import traceback
        traceback.print_exc()
        return []


def build_gradient(cfg):
    """Gradient RTI-SQP solve time (reference baseline: <5 ms full feedback loop
    on an i7-13700H, README.md:13): full solve + the latency-critical RTI
    feedback phase."""
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

    def thunk():
        def run_chain():
            r = Uw
            for _ in range(reps):
                r = chain(r)
            jax.block_until_ready(r)

        def run_fb():
            r = x0
            for _ in range(reps):
                r = fb_chain(prep, r)
            jax.block_until_ready(r)

        return {"rti_sqp_solve_ms": best_of(run_chain, reps * CHAIN),
                "rti_feedback_phase_ms": best_of(run_fb, reps * CHAIN)}

    return [thunk]


def build_tamols(cfg):
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

        def thunk():
            return {"tamols_score_ms": best_of(
                lambda: jax.block_until_ready(chain(jnp.float32(0.0))), CHAIN)}
        return [thunk]
    except Exception:
        import traceback
        traceback.print_exc()
        return []


def build_wb_tick(cfg):
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

        def thunk():
            return {"wb_swing_ik_tick_ms": best_of(
                lambda: jax.block_until_ready(chain(jnp.float32(0.0))), CHAIN)}
        return [thunk]
    except Exception:
        return []


def build_fleet(cfg):
    """On-device scenario-fleet throughput (SURVEY P3): vmapped closed-loop
    MPC scenarios — gait timing, Raibert + fused TAMOLS footholds against
    per-scenario PERLIN heightfields, sampling solve, SRB physics, kinematic
    swing feet with the early-stance reflex analogue — chained on one chip."""
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

        def thunk():
            ms = best_of(lambda: jax.block_until_ready(chain(states)), CH)
            return {"fleet_scenario_steps_per_s": B * 1e3 / ms}
        return [thunk]
    except Exception:
        import traceback
        traceback.print_exc()
        return []


def bench_qp_ladder():
    """Solver-accuracy ladder (tests/test_f64_ladder.py run as a bench metric):
    max/mean first-stage GRF gap between the production fixed-iteration f32 IPM
    and a machine-precision f64 reference on 20 REAL closed-loop tick QPs — the
    SAME window as the regression test, so this reports the conservative
    measured gap rather than a lucky short window. Deterministic (no timing),
    so it runs ONCE outside the noise passes. Returns {} on failure so the
    headline bench never dies on the ladder."""
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


LOWER_IS_BETTER = ("_ms", "gap")


def _direction(k):
    """+1 when bigger is worse (latency/gap), -1 when smaller is worse."""
    if k.endswith("_ms") or "gap" in k:
        return 1
    if "per_s" in k or k.startswith("vs_") or "utilization" in k:
        return -1
    return 0


def compare_to_records(result: dict, spread_pct: dict) -> dict:
    """Regression tracking vs BOTH the previous driver round and the per-metric
    BEST recorded round (VERDICT r4 ask #4: previous-round-only comparison let
    the headline creep 0.0991 -> 0.1184 over two rounds sub-threshold, and one
    noisy capture rewrote the baseline). A move is flagged when it is worse by
    >20% AND exceeds this run's measured spread for that metric (so tunnel
    noise explains itself); vs-best drift is flagged at >30%."""
    import glob
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not paths:
        return {"vs_prev": None, "vs_best": None, "flagged": [],
                "flagged_vs_best": []}
    records = []
    for p in paths:
        try:
            with open(p) as f:
                records.append((os.path.basename(p),
                                json.load(f).get("parsed") or {}))
        except Exception:
            continue
    if not records:
        return {"vs_prev": paths[-1], "vs_best": None,
                "flagged": ["unreadable"], "flagged_vs_best": []}
    prev_name, prev = records[-1]

    def worse_by(k, new, old):
        sgn = _direction(k)
        if sgn == 0 or not isinstance(old, (int, float)) or old <= 0 or new <= 0:
            return None
        return (new / old - 1.0) * sgn  # > 0 means worse

    flagged, flagged_best = [], []
    for k, new in result.items():
        if not isinstance(new, (int, float)) or isinstance(new, bool):
            continue
        sgn = _direction(k)
        if sgn == 0:
            continue
        noise = max(0.20, 2.0 * spread_pct.get(k, 0.0) / 100.0)
        w = worse_by(k, new, prev.get(k))
        if w is not None and w > noise:
            flagged.append(f"{k}: {prev.get(k)} -> {new} "
                           f"(+{w * 100:.0f}% vs prev, spread {spread_pct.get(k, 0):.0f}%)")
        # Best across all rounds, direction-aware.
        vals = [r.get(k) for _, r in records
                if isinstance(r.get(k), (int, float)) and r.get(k) > 0]
        if vals:
            best = min(vals) if sgn > 0 else max(vals)
            wb = worse_by(k, new, best)
            if wb is not None and wb > max(0.30, noise):
                flagged_best.append(f"{k}: best {best} -> {new} (+{wb * 100:.0f}%)")
    return {"vs_prev": prev_name, "vs_best": f"per-metric over {len(records)} rounds",
            "flagged": flagged, "flagged_vs_best": flagged_best}


def main():
    cfg = make_config("aliengo", mpc_type="sampling")
    cfg = replace_config(cfg, **{"mpc.sampling.num_samples": 10000,
                                 "mpc.sampling.method": "random_sampling",
                                 "mpc.sampling.parametrization": "cubic_spline"})
    state12 = jnp.asarray(
        np.array([0.0, 0.0, cfg.sim.ref_z - 0.03, 0.1, 0, 0, 0, 0, 0, 0, 0, 0]),
        jnp.float32)
    feet = jnp.asarray([[0.25, 0.15, 0], [0.25, -0.15, 0],
                        [-0.25, 0.15, 0], [-0.25, -0.15, 0]], jnp.float32)
    ref12 = jnp.asarray(
        np.array([0.0, 0.0, cfg.sim.ref_z, 0.2, 0, 0, 0, 0, 0, 0, 0, 0]), jnp.float32)
    seq = np.ones((4, cfg.mpc.horizon), np.float32)
    seq[1, 6:] = 0.0
    seq[2, 6:] = 0.0
    seq_j = jnp.asarray(seq)
    inputs = (state12, feet, ref12, seq_j, seq_j[:, 0], jnp.ones(4, jnp.float32))

    # Build + warm every thunk ONCE (compiles cached), then measure in PASSES
    # interleaved sweeps so slow tunnel drift hits all metrics alike.
    thunks = []
    thunks += build_sampling_xla(cfg, inputs)
    thunks += build_pallas(cfg, inputs)
    thunks += build_gradient(cfg)
    thunks += build_tamols(cfg)
    thunks += build_wb_tick(cfg)
    thunks += build_fleet(cfg)

    samples: dict[str, list] = {}
    for _ in range(PASSES):
        for t in thunks:
            try:
                for k, v in t().items():
                    samples.setdefault(k, []).append(v)
            except Exception:
                import traceback
                traceback.print_exc()
    med = {k: float(np.median(v)) for k, v in samples.items()}
    spread_pct = {k: (100.0 * (max(v) - min(v)) / max(float(np.median(v)), 1e-9))
                  for k, v in samples.items()}

    qp_ladder = bench_qp_ladder()

    per_solve_ms = med.get("xla_solve_ms", 1e9)
    pallas_ms = med.get("pallas_fused_solve_ms")
    headline = min(per_solve_ms, pallas_ms) if pallas_ms else per_solve_ms

    # Speed-of-light accounting for the fused rollout: ~430 f32 FLOPs per
    # sample-step (spline eval 4x~30 + cone clamp 4x~12 + SRB fd ~220 + Euler 24 +
    # cost ~24), VPU-bound (no MXU-shaped matmuls in the rollout body). The
    # N/H sweeps (`python bench.py --roofline`) show the solve is dominated by an
    # N- and H-independent fixed overhead (PRNG + per-launch latency + optimizer
    # partials), with the binding limit VPU instruction issue, not FLOPs.
    FLOPS_PER_SAMPLE_STEP = 430.0
    VPU_PEAK_F32 = 3.0e12  # v5e VPU estimate: 8 lanes*128*2 ops * ~1.4e9 Hz * 8 cores
    sample_steps_per_s = 10000 * cfg.mpc.horizon / (headline * 1e-3)
    vpu_util = sample_steps_per_s * FLOPS_PER_SAMPLE_STEP / VPU_PEAK_F32

    def r4(x):
        return round(x, 4) if x is not None else None

    rti_ms = med.get("rti_sqp_solve_ms", 1e9)
    result = {
        "metric": "sampling_mpc_10k_rollout_solve_ms",
        "value": round(headline, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / headline, 3),
        "xla_solve_ms": round(per_solve_ms, 4),
        "pallas_fused_solve_ms": r4(pallas_ms),
        "pallas_mppi_ms": r4(med.get("pallas_mppi_ms")),
        "pallas_cem_mppi_ms": r4(med.get("pallas_cem_mppi_ms")),
        "pallas_gait_adaptive_ms": r4(med.get("pallas_gait_adaptive_ms")),
        "closed_loop_solve_ms": r4(med.get("closed_loop_solve_ms")),
        "solve_ms_n40960": r4(med.get("solve_ms_n40960")),
        "solve_ms_n163840": r4(med.get("solve_ms_n163840")),
        "solves_per_s_per_chip": round(1e3 / headline, 1),
        # The tick a PCIe-local / TPU-VM deployment would see: device solve +
        # modeled ~10 us local readback of 12 floats. The tunnel numbers below
        # are honest observations of THIS environment only (the completion
        # fence itself costs a tunnel RTT here, so none of them predict a
        # local deployment; VERDICT r4 ask #7).
        "local_tick_model_ms": round(headline + 0.01, 4),
        "enqueue_ms": r4(med.get("enqueue_ms")),
        "dispatch_fence_ms": r4(med.get("dispatch_fence_ms")),
        "sync_call_median_ms": r4(med.get("sync_call_median_ms")),
        "sync_call_p99_ms": r4(med.get("sync_call_p99_ms")),
        "pipelined_tick_ms": r4(med.get("pipelined_tick_ms")),
        "tunnel_readback_note": ("enqueue/fence/sync/pipelined are tunnel-bound "
                                 "observations (fence ~ 1 RTT here), lower "
                                 "bounds only; the PCIe-local tick estimate is "
                                 "local_tick_model_ms"),
        "rti_sqp_solve_ms": round(rti_ms, 4),
        "rti_sqp_vs_5ms_baseline": round(5.0 / rti_ms, 3),
        "rti_feedback_phase_ms": r4(med.get("rti_feedback_phase_ms")),
        "qp_ladder_n_ticks": qp_ladder.get("n_ticks"),
        "qp_gap_vs_f64_max_N": r4(qp_ladder.get("qp_gap_vs_f64_max_N")),
        "qp_gap_vs_f64_rel": (round(qp_ladder["qp_gap_vs_f64_rel"], 6)
                              if qp_ladder else None),
        "rollout_gap_vs_f64_rel": (round(qp_ladder["rollout_gap_vs_f64_rel"], 9)
                                   if "rollout_gap_vs_f64_rel" in qp_ladder
                                   else None),
        "tamols_score_ms": r4(med.get("tamols_score_ms")),
        "wb_swing_ik_tick_ms": r4(med.get("wb_swing_ik_tick_ms")),
        "fleet_scenario_steps_per_s": (round(med["fleet_scenario_steps_per_s"], 1)
                                       if "fleet_scenario_steps_per_s" in med
                                       else None),
        "fleet_note": ("64 on-device closed-loop MPC scenarios with perlin "
                       "terrain, fused TAMOLS and the reflex analogue, one "
                       "chip"),
        "rollout_sample_steps_per_s": round(sample_steps_per_s, 0),
        "est_vpu_utilization": round(vpu_util, 4),
        "device": str(jax.devices()[0]),
        "num_samples": 10000,
        "horizon": cfg.mpc.horizon,
        "noise_model": f"median of {PASSES} interleaved passes; spread_pct = (max-min)/median",
        "spread_pct": {k: round(v, 1) for k, v in sorted(spread_pct.items())},
    }
    result["regressions"] = compare_to_records(result, spread_pct)
    print(json.dumps(result))


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

        return best_of(run, reps * CHAIN, n=3)

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

        return best_of(run, reps * CHAIN, n=3)

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
